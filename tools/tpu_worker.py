#!/usr/bin/env python
"""Persistent TPU job worker for tunneled single-chip environments.

The axon relay holds a per-process device lease; rapid process churn (or
killing an attached process) stalls all device work for many minutes (see
CLAUDE.md).  This worker attaches ONCE and then executes job files
in-process, serializing device access:

    python tools/tpu_worker.py [jobs_dir]    # default /tmp/jobs

Drop `NNN_name.py` files into the jobs dir; each is exec'd with
``jax / jnp / np / time`` in globals and the repo on sys.path, stdout and
tracebacks captured to `NNN_name.out`, and the job renamed to
`NNN_name.done`.  A `READY` file appears once the device answers.
"""

import contextlib
import io
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOBS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jobs"
os.makedirs(JOBS, exist_ok=True)

import jax  # noqa: E402  (attach once)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


@jax.jit
def _health(x):
    return jnp.sum(x @ x)


# The relay lease of a recently-killed process can take minutes to
# release; a hard-failed attach here used to kill the worker (round 7).
# Retry with a quiet backoff instead of churning processes.
for attempt in range(20):
    try:
        _x = jax.jit(lambda k: jax.random.uniform(k, (128, 128)))(
            jax.random.PRNGKey(0))
        print("worker health:", float(np.asarray(_health(_x))), flush=True)
        break
    except Exception as exc:  # noqa: BLE001 -- backend setup errors vary
        # >= 10 quiet minutes between attach attempts (CLAUDE.md rule 3:
        # rapid-succession attaches extend the relay stall)
        print(f"attach attempt {attempt} failed: {exc!r}; retrying in "
              f"600 s", flush=True)
        time.sleep(600.0)
else:
    sys.exit("device never became available")
with open(os.path.join(JOBS, "READY"), "w") as f:
    f.write("ok")

while True:
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(1.0)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    buf = io.StringIO()
    t0 = time.time()
    try:
        src = open(path).read()
        with contextlib.redirect_stdout(buf):
            exec(compile(src, name, "exec"),
                 {"jax": jax, "jnp": jnp, "np": np, "time": time})
        buf.write("\n[job OK %.1fs]\n" % (time.time() - t0))
    except BaseException:
        buf.write("\n" + traceback.format_exc())
        buf.write("\n[job FAILED %.1fs]\n" % (time.time() - t0))
    with open(path[:-3] + ".out", "w") as f:
        f.write(buf.getvalue())
    os.replace(path, path[:-3] + ".done")
