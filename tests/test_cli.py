"""CLI and metrics contract tests (CPU)."""

import json

import pytest

from lorastencil_tpu import cli
from lorastencil_tpu.models import shapes
from lorastencil_tpu.utils import metrics


def test_cli_check_2d(capsys):
    rc = cli.main(["star2d1r", "40", "200", "3", "--check", "--repeats", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "GStencil/s" in out and "Correct!" in out


def test_cli_check_1d(capsys):
    rc = cli.main(["1d2r", "300", "2", "--check", "--repeats", "1"])
    assert rc == 0
    assert "Correct!" in capsys.readouterr().out


def test_cli_check_3d_json(capsys):
    rc = cli.main(["box3d1r", "4", "16", "150", "2", "--check", "--json",
                   "--repeats", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    line = [l for l in out.splitlines() if l.startswith("{")][0]
    rec = json.loads(line)
    assert rec["shape"] == "box3d1r"
    assert rec["fuse_factor"] == 1
    assert rec["gstencil_per_s"] > 0


def test_cli_wrong_arity_exits():
    with pytest.raises(SystemExit):
        cli.main(["star2d1r", "40", "3"])


def test_cli_fill_modes():
    spec = shapes.get_shape("star2d1r")
    for fill in ("random", "index", "ones"):
        g = cli.make_input(spec, (8, 16), fill)
        assert g.shape == (16, 24)
        if fill != "random":
            # halo is zero for index/ones fills
            assert g[0, :].sum() == 0


def test_metric_contract_fuse_factors():
    spec = shapes.get_shape("star2d1r")
    res = metrics.bench_result(spec, (100, 100), 10, 0.001, "x", "y", 1)
    # GStencil/s = cells * steps * fuse / s / 1e9
    assert res.gstencil_per_s == pytest.approx(100 * 100 * 10 * 3 / 1e-3 / 1e9)
    assert res.gcells_per_s == pytest.approx(res.gstencil_per_s / 3)


def test_bench_smoke_cpu(capsys):
    import bench

    assert bench.main() == 0
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][0]
    rec = json.loads(line)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0


def test_cli_algorithm_flags(capsys):
    rc = cli.main(["star2d1r", "40", "200", "3", "--check", "--repeats", "1",
                   "--algorithm", "mxu_split", "--fused-steps", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "Correct!" in out
