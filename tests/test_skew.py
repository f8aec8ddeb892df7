"""Time-skewed 2-D fusion (fusion='skew') vs the NumPy fp64 ground
truth: zero-recompute k-step row-band streaming must match the
reference's per-step halo-decay semantics exactly (interpret mode).

Reference behavior being reproduced: the same per-step interior update
+ halo zeroing as /root/reference/src/2d/main.cu:282-328 -- the skew
kernel changes only the traversal, never the numerics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lorastencil_tpu import engine
from lorastencil_tpu.models import shapes
from lorastencil_tpu.utils import reference

SHAPES_2D = ["star2d1r", "star2d3r", "box2d3r", "box2d1r"]


def _run_skew(name, interior, steps, tile, k, **kw):
    spec = shapes.get_shape(name)
    g0 = reference.random_padded(spec, interior, seed=11)
    eng = engine.StencilEngine.for_shape(
        name, interior, fusion="skew", fused_steps=k, tile=tile, **kw)
    got = np.asarray(
        eng.run(jnp.asarray(g0, jnp.float32), steps).astype(jnp.float32),
        np.float64)
    want = reference.run(g0, spec, steps)
    return np.abs(got - want).max() / max(1.0, np.abs(want).max())


@pytest.mark.parametrize("name", SHAPES_2D)
@pytest.mark.parametrize("k", [2, 3])
def test_skew_matches_reference(name, k):
    # interior divisible by neither the band height nor the tile width
    assert _run_skew(name, (70, 300), steps=2 * k + 1,
                     tile=(16, 128), k=k) < 1e-6


@pytest.mark.parametrize("name", ["star2d1r", "star2d3r"])
def test_skew_vpu_roll(name):
    # the all-VPU branch of the skew kernel (auto resolves to
    # mxu_hybrid1 everywhere, so this needs the explicit algorithm)
    assert _run_skew(name, (70, 300), steps=4, tile=(16, 128), k=2,
                     algorithm="vpu_roll") < 1e-6


@pytest.mark.parametrize("steps", [0, 1, 2, 4, 5])
def test_skew_step_counts(steps):
    # remainder passes (steps % k) fall back to the extent kernel on
    # the same layout; steps < k runs a single short skewed pass
    assert _run_skew("star2d1r", (40, 200), steps=steps,
                     tile=(16, 128), k=2) < 1e-6


def test_skew_band_divisible_interior():
    # m % B == 0 forces the extra storage band (extra_row_tiles == 1)
    eng = engine.StencilEngine.for_shape(
        "star2d1r", (64, 256), fusion="skew", fused_steps=2,
        tile=(16, 128))
    assert eng.layout.extra_row_tiles == 1
    assert _run_skew("star2d1r", (64, 256), steps=4,
                     tile=(16, 128), k=2) < 1e-6


def test_skew_slack_absorbs_lag():
    # m % B big enough that the natural round-up covers the k*s lag
    eng = engine.StencilEngine.for_shape(
        "star2d1r", (70, 256), fusion="skew", fused_steps=2,
        tile=(48, 128))
    assert eng.layout.extra_row_tiles == 0
    assert _run_skew("star2d1r", (70, 256), steps=4,
                     tile=(48, 128), k=2) < 1e-6


@pytest.mark.parametrize("residue_mxu", ["off", "on"])
def test_skew_mxu_hybrid1(residue_mxu):
    # exact-grade split-bf16 MXU col convs inside the skewed traversal
    assert _run_skew("star2d1r", (70, 300), steps=4, tile=(16, 128),
                     k=2, algorithm="mxu_hybrid1",
                     residue_mxu=residue_mxu) < 5e-6


def test_skew_bf16_state():
    # bf16 state rounds per level exactly like the unfused bf16 tier
    spec = shapes.get_shape("star2d1r")
    g0 = reference.random_padded(spec, (70, 300), seed=5)
    eng = engine.StencilEngine.for_shape(
        "star2d1r", (70, 300), fusion="skew", fused_steps=2,
        tile=(16, 128), dtype="bfloat16")
    got = np.asarray(
        eng.run(jnp.asarray(g0, jnp.bfloat16), 4).astype(jnp.float32),
        np.float64)
    want = reference.run(g0, spec, 4)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-2


def test_skew_halo_contributes_then_decays():
    # the first pass must see the user halo (level-0 bands load it from
    # the guard ring); afterwards it decays to zero like the reference
    spec = shapes.get_shape("star2d1r")
    g0 = reference.random_padded(spec, (40, 200), seed=3)
    hm, hn = spec.halo
    assert np.abs(g0[:hm]).max() > 0  # the halo really is nonzero
    assert _run_skew("star2d1r", (40, 200), steps=2,
                     tile=(16, 128), k=2) < 1e-6


def test_skew_validation_errors():
    with pytest.raises(ValueError, match="skew"):
        engine.StencilEngine.for_shape("1d1r", (300,), fusion="skew")
    with pytest.raises(ValueError, match="dirichlet0"):
        engine.StencilEngine.for_shape("star2d1r", (40, 200),
                                       fusion="skew",
                                       boundary="periodic")
    with pytest.raises(ValueError, match="Pallas"):
        engine.StencilEngine.for_shape("star2d1r", (40, 200),
                                       fusion="skew", backend="xla")
    with pytest.raises(ValueError, match="vpu_roll"):
        engine.StencilEngine.for_shape("star2d1r", (40, 200),
                                       fusion="skew", algorithm="vpu")
    with pytest.raises(ValueError, match="fusion"):
        engine.StencilEngine.for_shape("star2d1r", (40, 200),
                                       fusion="diagonal")
    with pytest.raises(ValueError, match="fused_steps"):
        engine.StencilEngine.for_shape("star2d1r", (40, 200),
                                       fusion="skew", fused_steps=1)


def test_skew_deep_user_halo():
    # a user halo deeper than the k*s lag widens the guard instead of
    # tripping the layout assert at first run
    rng = np.random.default_rng(0)
    C = np.zeros((7, 7))
    C[3, :] = rng.normal(size=7)
    C[:, 3] += rng.normal(size=7)
    eng = engine.StencilEngine.for_coeffs(
        C, (64, 256), halo=(20, 20), fusion="skew", fused_steps=2,
        tile=(32, 128), algorithm="vpu_roll")
    assert eng.layout.guard[0] >= 24
    from lorastencil_tpu.utils import reference

    spec = eng.spec
    g0 = reference.random_padded(spec, (64, 256), seed=1)
    got = np.asarray(eng.run(jnp.asarray(g0, jnp.float32), 3), np.float64)
    want = reference.run(g0, spec, 3)
    assert np.abs(got - want).max() / max(1.0, np.abs(want).max()) < 1e-6


def test_skew_layout_unaffected_elsewhere():
    # extra_row_tiles defaults to 0 and extent layouts are unchanged
    eng = engine.StencilEngine.for_shape("star2d1r", (40, 200))
    assert eng.layout.extra_row_tiles == 0


def test_fusion_auto_consults_autotune_cache(tmp_path, monkeypatch):
    """fusion='auto' is backed by the per-device autotune cache, not a
    constant (round-3 VERDICT item 8): a cached params-stage skew win
    at the engine's exact operating point flips auto to 'skew'; any
    mismatch (algorithm, depth, no entry) resolves to 'extent'."""
    import json

    from lorastencil_tpu.utils import autotune

    monkeypatch.setenv("LORASTENCIL_CACHE", str(tmp_path))
    spec = shapes.get_shape("star2d1r")
    interior = (70, 300)

    # no cache entry -> extent
    eng = engine.StencilEngine.for_shape("star2d1r", interior)
    assert eng._fusion_mode() == "extent"

    # plant a measured skew win at this operating point
    key = autotune._key(spec, interior, "params2d", "-", "float32")
    cache_file = tmp_path / "autotune.json"
    cache_file.write_text(json.dumps({key: {"params": {
        "algorithm": "vpu_roll", "fusion": "skew", "fused_steps": 2},
        "secs": 1e-3}}))

    # matching operating point adopts skew AND stays exact
    eng = engine.StencilEngine.for_shape("star2d1r", interior,
                                         algorithm="vpu_roll",
                                         tile=(16, 128))
    assert eng._fusion_mode() == "skew"
    assert eng._fused_k() == 2
    g0 = reference.random_padded(spec, interior, seed=11)
    got = np.asarray(
        eng.run(jnp.asarray(g0, jnp.float32), 5).astype(jnp.float32),
        np.float64)
    want = reference.run(g0, spec, 5)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-6

    # different algorithm than the cached winner -> extent
    eng = engine.StencilEngine.for_shape("star2d1r", interior)
    assert eng.algorithm == "mxu_hybrid1"
    assert eng._fusion_mode() == "extent"
    # explicit depth differing from the cached winner -> extent
    eng = engine.StencilEngine.for_shape("star2d1r", interior,
                                         algorithm="vpu_roll",
                                         fused_steps=4)
    assert eng._fusion_mode() == "extent"
    # ghost boundaries can't skew regardless of the cache
    eng = engine.StencilEngine.for_shape("star2d1r", interior,
                                         algorithm="vpu_roll",
                                         boundary="periodic")
    assert eng._fusion_mode() == "extent"
