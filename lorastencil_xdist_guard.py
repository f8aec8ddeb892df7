"""pytest plugin shim: pyproject's ``addopts = "-n auto"`` assumes
pytest-xdist.  When xdist is absent, register a no-op ``-n`` option so
the suite still runs (sequentially) instead of aborting with
"unrecognized arguments" -- loaded via ``-p lorastencil_xdist_guard``
in addopts before option parsing."""


def pytest_addoption(parser):
    try:
        import xdist  # noqa: F401  (xdist registers -n itself)
    except ImportError:
        parser.addoption(
            "-n", "--numprocesses", action="store", default=None,
            help="no-op (pytest-xdist is not installed; tests run "
                 "sequentially)")
