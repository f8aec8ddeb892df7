"""Measurement-integrity gate of benchmarks/suite.py (round-4 VERDICT
item 1): physically impossible rows are quarantined, historical inflated
rows never poison the floor, and a failed fp32 control records nothing.

The two historical contamination events (PERF.md r9 items 1/8a: df64
rows ~6.8x inflated; a second session at 300-400% of physical bounds
across every tier), replayed through this gate, record ZERO rows --
asserted below by synthetic rows with the same signatures.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

import suite  # noqa: E402
from lorastencil_tpu.utils import metrics  # noqa: E402


def _result(name, interior, steps, gcells, bound):
    res = metrics.BenchResult(
        shape=name, interior=tuple(interior), steps=steps,
        time_ms=1.0, gstencil_per_s=gcells * 3, gcells_per_s=gcells,
        fuse_factor=3, backend="pallas-mxu_hybrid1", precision="highest",
        repeats=2)
    res.roofline_bound = "vpu"
    res.governing_bound_gcells = bound
    res.pct_of_governing_bound = gcells / bound
    return res


def _row(gcells, bound, shape="star2d1r", platform="tpu"):
    return {
        "shape": shape, "interior": [8192, 8192], "steps": 256,
        "gcells_per_s": gcells, "backend": "pallas-mxu_hybrid1",
        "backend_platform": platform,
        "pct_of_governing_bound": (gcells / bound
                                   if bound is not None else None),
        "governing_bound_gcells": bound,
    }


def test_row_disposition():
    assert suite.row_disposition(_row(60.0, 65.0)) == "record"
    # 10% model slack is allowed
    assert suite.row_disposition(_row(70.0, 65.0)) == "record"
    # beyond it = physically impossible
    assert suite.row_disposition(_row(200.0, 65.0)) == "quarantine"
    # rows without a roofline model always record
    assert suite.row_disposition(_row(200.0, None)) == "record"


def test_recorded_stats_drops_impossible_rows(tmp_path):
    out = tmp_path / "results.jsonl"
    with open(out, "w") as f:
        for g in (50.0, 52.0, 54.0):
            f.write(json.dumps(_row(g, 65.0)) + "\n")
        # the r9-style contamination row: 400% of the physical bound
        f.write(json.dumps(_row(260.0, 65.0)) + "\n")
    best, floor = suite.recorded_stats(str(out), "tpu")
    key = ("fp32", "star2d1r", (8192, 8192), 256)
    assert best[key] == 54.0  # not 260: the impossible row is dropped
    assert floor[key] <= 50.0


def test_quarantine_keeps_results_clean(tmp_path):
    out = tmp_path / "results.jsonl"

    def runner(name, interior, steps, **kw):
        # the r8 df64-style event: ~6.8x the honest ~5.3 GCells/s row,
        # far above the pair kernel's governing bound
        return _result(name, interior, steps, gcells=33.3, bound=12.3)

    status, rows, regs = suite.run_suite(
        [("star2d1r", (4096, 4096), 64, {"pipeline": 2})],
        str(out), "tpu", runner=runner)
    assert status == 0 and len(rows) == 1
    assert not os.path.exists(out) or open(out).read() == ""
    qpath = tmp_path / "quarantine.jsonl"
    (qrec,) = [json.loads(line) for line in open(qpath)]
    assert qrec["gcells_per_s"] == pytest.approx(33.3)
    assert any("QUARANTINED" in r for r in regs)


def test_honest_rows_record(tmp_path):
    out = tmp_path / "results.jsonl"

    def runner(name, interior, steps, **kw):
        return _result(name, interior, steps, gcells=60.0, bound=65.0)

    status, rows, regs = suite.run_suite(
        [("star2d1r", (8192, 8192), 256, {"pipeline": 2})],
        str(out), "tpu", runner=runner)
    assert status == 0 and not regs
    (rec,) = [json.loads(line) for line in open(out)]
    assert rec["gcells_per_s"] == pytest.approx(60.0)


def test_failed_control_records_nothing(tmp_path):
    out = tmp_path / "results.jsonl"
    calls = []

    def runner(name, interior, steps, **kw):
        calls.append(name)
        return _result(name, interior, steps, gcells=60.0, bound=65.0)

    # contaminated-session signature: control reads 4x the honest band
    status, rows, regs = suite.run_suite(
        suite.CONFIGS, str(out), "tpu", runner=runner,
        control=lambda: 230.0)
    assert status == 2
    assert not calls  # no config ever ran
    assert not os.path.exists(out) or open(out).read() == ""

    # an in-band control proceeds
    status, rows, _ = suite.run_suite(
        [("star2d1r", (8192, 8192), 256, {"pipeline": 2})],
        str(out), "tpu", runner=runner, control=lambda: 60.0)
    assert status == 0 and calls == ["star2d1r"]


@pytest.mark.parametrize("kind,interior", [
    ("custom2d_asym5", (24, 136)),
    ("custom3d_sep3", (6, 16, 136)),
])
def test_custom_suite_configs_are_correct(kind, interior):
    """The for_coeffs suite rows (CUSTOM) must compute the right answer
    before their device numbers mean anything: CPU golden at small size
    with the exact coefficients the suite measures."""
    import numpy as np

    from lorastencil_tpu.engine import StencilEngine
    from lorastencil_tpu.utils import reference

    eng = StencilEngine.for_coeffs(suite.custom_coeffs(kind), interior,
                                   name=kind)
    g0 = reference.random_padded(eng.spec, interior, seed=7)
    got = np.asarray(eng.run(g0.astype(np.float32), steps=3), np.float64)
    want = reference.run(g0, eng.spec, 3)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 5e-6, err


def test_control_band_matches_recorded_flagship():
    """The control band must bracket the honest recorded flagship rows
    (BENCH_r02/r04: 60.0-60.2 GCells/s)."""
    assert suite.control_ok(60.0)
    assert suite.control_ok(60.2)
    assert not suite.control_ok(33.0)   # CPU-fallback / wedged session
    assert not suite.control_ok(230.0)  # contaminated session
