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


def _bf16_row(gcells, bound):
    row = _row(gcells, bound)
    row["backend"] = "pallas-mxu_hybrid1-bfloat16"
    return row


def test_row_disposition_bf16_cap():
    """The bf16 ceiling model is bf16-specific since round 5
    (probe-measured pattern bandwidths + as-built stream pricing;
    tools/remodel_rooflines.py migrated the stored rows): honest rows
    read 0.05-1.00 of the bound, with the tightest config at 1.00
    exactly, so the tier cap is 1.25 (session spread margin) while
    contamination (>= 3x) still quarantines."""
    # the remodeled honest bf16 rows must pass the gate (box2d1r at
    # exactly 1.00 of its vpu bound; flagship at 0.95)
    assert suite.row_disposition(_bf16_row(91.3, 91.3)) == "record"
    assert suite.row_disposition(_bf16_row(99.6, 105.0)) == "record"
    # +-10% session spread above the tightest bound still records
    assert suite.row_disposition(_bf16_row(100.0, 91.3)) == "record"
    # pre-migration-scale readings (1.6x) and the r9 contamination
    # signature (300-400%) quarantine
    assert suite.row_disposition(_bf16_row(146.0, 91.3)) == "quarantine"
    assert suite.row_disposition(_bf16_row(300.0, 91.3)) == "quarantine"
    # ...and the fp32/df64 tiers keep the tight 1.10 cap
    assert suite.phys_cap("pallas-mxu_hybrid1") == suite.PHYS_CAP
    assert suite.phys_cap("pallas-df64-vpu_sep") == suite.PHYS_CAP


def test_recorded_stats_keeps_honest_bf16_rows(tmp_path):
    """Remodeled honest bf16 rows (pct <= ~1.0 of the bf16-specific
    model) keep baselining the bf16 gate floor; inflated rows drop."""
    out = tmp_path / "results.jsonl"
    with open(out, "w") as f:
        for g in (86.5, 88.4, 88.5):
            f.write(json.dumps(_bf16_row(g, 91.3)) + "\n")
        f.write(json.dumps(_bf16_row(300.0, 91.3)) + "\n")  # >= 3x: drop
    best, floor = suite.recorded_stats(str(out), "tpu")
    key = ("bf16", "star2d1r", (8192, 8192), 256)
    assert best[key] == 88.5  # not 300
    assert floor[key] <= 86.5


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


def test_accounting_regenerates(tmp_path):
    """tools/accounting.py renders a row for EVERY suite config from
    results.jsonl (round-5 VERDICT item 9: the north-star accounting is
    a generated table, not hand-maintained prose), excludes
    physically-impossible rows, and prefers the latest honest row."""
    tools_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    sys.path.insert(0, tools_dir)
    import accounting

    out = tmp_path / "results.jsonl"
    with open(out, "w") as f:
        f.write(json.dumps(_row(57.0, 65.7)) + "\n")
        f.write(json.dumps(_row(60.0, 65.7)) + "\n")     # latest honest
        f.write(json.dumps(_row(260.0, 65.7)) + "\n")    # impossible
    text = accounting.render(str(out))
    for key in accounting.suite_keys():
        tier, name, interior, steps = key
        cfg = f"{name} {'x'.join(str(s) for s in interior)} x{steps}"
        assert cfg in text, cfg
    # the flagship row shows the latest honest reading, not the
    # quarantine-level one
    row = [ln for ln in text.splitlines()
           if "| fp32 | star2d1r 8192x8192 x256 |" in ln]
    assert row and "60.0" in row[0] and "260" not in row[0], row
    # every OTHER config reports the missing-row marker, never a crash
    assert "no honest TPU row recorded yet" in text


def test_control_band_matches_recorded_flagship():
    """The control band must bracket the honest recorded flagship rows
    (BENCH_r02/r04: 60.0-60.2 GCells/s)."""
    assert suite.control_ok(60.0)
    assert suite.control_ok(60.2)
    assert not suite.control_ok(33.0)   # CPU-fallback / wedged session
    assert not suite.control_ok(230.0)  # contaminated session
