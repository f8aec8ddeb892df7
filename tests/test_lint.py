"""CI-style lint gate: the dependency-free linter (tools/lint.py) must
report zero issues.  (The image has no flake8/ruff; see tools/lint.py
for the rule set: line length, tabs, trailing whitespace, unused
top-level imports, compilability.)"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, "\n" + proc.stdout + proc.stderr
