"""Measured tile autotuner with a per-device on-disk cache.

The reference hardcodes its block geometry per shape (32x64 output tiles,
``/root/reference/src/2d/gpu.cu:12-14``; 8x64 for 3-D,
``src/3d/gpu_box.cu:10-14``) -- correct for one GPU model.  On TPU the
right tile depends on grid size, algorithm, fusion depth and the chip's
VMEM/DMA balance, so this module MEASURES a small candidate set on the
actual device and caches the winner per
(device kind, spec, interior, algorithm, fused_steps, dtype).

Timing goes through ``metrics.time_run`` (pipelined dispatches, hard
device sync); candidates that fail to compile (scoped-VMEM overflow
surfaces as a runtime error on this backend) are skipped.

    from lorastencil_tpu.utils import autotune
    tile = autotune.autotune_tile("star2d1r", (8192, 8192))
    eng = engine.StencilEngine.for_shape("star2d1r", (8192, 8192),
                                         tile=tile)

or in one step: ``autotune.autotuned_engine("star2d1r", (8192, 8192))``.
CLI: ``--autotune``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..ops.layout import LANE, SUBLANE


def _cache_path() -> str:
    base = os.environ.get("LORASTENCIL_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "lorastencil_tpu")
    return os.path.join(base, "autotune.json")


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store_cache(cache: dict) -> None:
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind.replace(" ", "-")
    except Exception:
        return jax.default_backend()


# bump when the measurement methodology changes so stale cache entries
# are ignored (v2: round-3 sync-latency subtraction; v3: round-4 raised
# scoped-VMEM ceiling -- v2-era winners were chosen among candidates
# that OOM'd under the 16M default)
_KEY_VERSION = "v3"


def _key(spec, interior, algorithm, fused_steps, dtype) -> str:
    import hashlib

    coeffs = hashlib.sha1(
        np.ascontiguousarray(spec.dense_coeffs()).tobytes()).hexdigest()[:10]
    return "|".join([
        _KEY_VERSION, _device_kind(), spec.name, coeffs,
        "x".join(map(str, np.atleast_1d(interior))),
        str(algorithm), str(fused_steps), str(dtype),
    ])


def cached_fusion(spec, interior, algorithm, fused_steps,
                  dtype) -> str:
    """Read-only cache consult behind engine ``fusion='auto'`` (round-3
    VERDICT item 8): 'skew' when the measured 2-D params-stage winner
    for this (device kind, spec, interior, dtype) chose the time-skewed
    traversal AT this algorithm and fusion depth, else 'extent'.  Skew
    measured parity-at-best on v5e (PERF.md item 8), so it never wins
    by default there -- but a device where it does win flips 'auto'
    with no code change.  Never triggers a measurement or backend
    attach beyond the device-kind probe."""
    try:
        key = _key(spec, tuple(interior), "params2d", "-", dtype)
        rec = _load_cache().get(key) or {}
    except Exception:
        return "extent"
    p = rec.get("params") or {}
    if (p.get("fusion") == "skew"
            and p.get("algorithm") == algorithm
            and (fused_steps is None
                 or p.get("fused_steps") == fused_steps)):
        return "skew"
    return "extent"


def default_candidates_2d(interior) -> Tuple[Tuple[int, int], ...]:
    """A small measured-candidate set around the known-good geometry."""
    m, n = interior
    tiles = []
    # round-3 measurements moved the large-grid optimum to wide tiles
    # ((192, 2048) for vpu_roll, (128, 2048) for mxu_hybrid at 8192^2);
    # wider/taller candidates overflow scoped VMEM and are skipped by
    # the measure loop
    for tm in (128, 192, 256, 320):
        for tn in (512, 1024, 2048):
            tiles.append((min(tm, SUBLANE * (-(-m // SUBLANE))),
                          min(tn, LANE * (-(-n // LANE)))))
    # dedupe, preserve order
    seen, out = set(), []
    for t in tiles:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return tuple(out)


def _autotune(spec, interior, key, candidates, make_config, steps,
              use_cache, verbose):
    """Shared measure/cache loop: build an engine per candidate tile,
    time a ``steps``-step run (pipelined dispatches, hard sync), skip
    candidates that fail to compile (scoped-VMEM overflow surfaces as a
    runtime error on this backend), persist the winner."""
    from .. import engine as _engine
    from . import metrics

    cache = _load_cache()
    if use_cache and key in cache:
        return tuple(cache[key]["tile"])

    import jax
    import jax.numpy as jnp

    best, best_secs = None, float("inf")
    results = {}
    for tile in candidates:
        try:
            eng = _engine.StencilEngine(spec, interior,
                                        make_config(tuple(tile)))

            def run(key2, eng=eng):
                state = jax.random.uniform(
                    key2, eng.layout.shape, eng.dtype, 0.0, 0.01)
                return jnp.sum(eng._run_internal(state, steps) * 0.0)

            run = jax.jit(run)
            secs, _ = metrics.time_run(run, jax.random.PRNGKey(0),
                                       repeats=1, warmup=1, pipeline=2,
                                       subtract_sync=True)
            results[str(tuple(tile))] = secs
            if verbose:
                print(f"autotune {spec.name} tile={tuple(tile)}: "
                      f"{secs*1e3:.2f} ms", flush=True)
            if secs < best_secs:
                best, best_secs = tuple(tile), secs
        except Exception as e:
            results[str(tuple(tile))] = f"failed: {type(e).__name__}"
            if verbose:
                print(f"autotune {spec.name} tile={tuple(tile)}: failed "
                      f"({type(e).__name__})", flush=True)
    if best is None:
        raise RuntimeError(
            f"autotune: no candidate compiled for {spec.name} {interior}")
    cache = _load_cache()  # re-read: another process may have written
    cache[key] = {"tile": list(best), "secs": best_secs,
                  "measured": results}
    _store_cache(cache)
    return best


def autotune_tile(
    shape, interior, algorithm: str = "auto",
    fused_steps: Optional[int] = None, dtype: str = "float32",
    steps: int = 32, candidates: Optional[Sequence] = None,
    use_cache: bool = True, verbose: bool = False, **engine_kw,
) -> Tuple[int, int]:
    """Measure candidate tiles for a 2-D config and return the fastest.

    Results persist in ``~/.cache/lorastencil_tpu/autotune.json`` keyed by
    device kind + spec coefficients + config, so each (device, config)
    pair is measured once."""
    from .. import engine as _engine
    from ..models.shapes import StencilSpec, get_shape

    spec = shape if isinstance(shape, StencilSpec) else get_shape(shape)
    assert spec.ndim == 2, "autotune_tile is for 2-D configs"

    def make_config(tile):
        return _engine.EngineConfig(dtype=dtype, algorithm=algorithm,
                                    fused_steps=fused_steps, tile=tile,
                                    **engine_kw)

    return _autotune(
        spec, interior, _key(spec, interior, algorithm, fused_steps, dtype),
        tuple(candidates) if candidates is not None
        else default_candidates_2d(interior),
        make_config, steps, use_cache, verbose)


def default_candidates_3d(interior) -> Tuple[Tuple[int, int], ...]:
    _, m, n = interior
    tiles = []
    for tm in (64, 128, 256):
        for tn in (256, 512):
            tiles.append((min(tm, SUBLANE * (-(-m // SUBLANE))),
                          min(tn, LANE * (-(-n // LANE)))))
    seen, out = set(), []
    for t in tiles:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return tuple(out)


def autotune_tile_3d(
    shape, interior, algorithm: str = "auto",
    fused_steps_3d: int = 2, dtype: str = "float32",
    steps: int = 16, candidates: Optional[Sequence] = None,
    use_cache: bool = True, verbose: bool = False, **engine_kw,
) -> Tuple[int, int]:
    """Measure candidate in-plane tiles for a 3-D config (the z axis is
    swept inside the kernel; only the (rows, cols) tile is tunable)."""
    from .. import engine as _engine
    from ..models.shapes import StencilSpec, get_shape

    spec = shape if isinstance(shape, StencilSpec) else get_shape(shape)
    assert spec.ndim == 3

    def make_config(tile):
        return _engine.EngineConfig(dtype=dtype, algorithm=algorithm,
                                    fused_steps_3d=fused_steps_3d,
                                    tile=tile, **engine_kw)

    return _autotune(
        spec, interior,
        _key(spec, interior, algorithm, f"3d{fused_steps_3d}", dtype),
        tuple(candidates) if candidates is not None
        else default_candidates_3d(interior),
        make_config, steps, use_cache, verbose)


def _measure_engine(eng, steps):
    import jax
    import jax.numpy as jnp

    from . import metrics

    def run(key2):
        state = jax.random.uniform(
            key2, eng.layout.shape, eng.dtype, 0.0, 0.01)
        return jnp.sum(eng._run_internal(state, steps) * 0.0)

    # params candidates differ by a few percent (e.g. fusion depth at
    # the same tile); repeats=2/pipeline=4 resolves ~2-3% deltas that
    # the tile stage's coarser timing cannot (round-5: a 1-shot
    # pipeline=2 measurement inverted a 57.2-vs-55.7 pair)
    secs, _ = metrics.time_run(jax.jit(run), jax.random.PRNGKey(0),
                               repeats=2, warmup=1, pipeline=4,
                               subtract_sync=True)
    return secs


def _autotune_params(spec, interior, key, candidates, steps, use_cache,
                     verbose, base_kw):
    """Measure engine-kwarg candidate dicts; cache the winner (same
    on-disk cache as the tile tuner, value under 'params')."""
    from .. import engine as _engine

    cache = _load_cache()
    if use_cache and key in cache and "params" in cache[key]:
        return dict(cache[key]["params"])

    best, best_secs = None, float("inf")
    results = {}
    for cand in candidates:
        tag = json.dumps(cand, sort_keys=True)
        try:
            kw = dict(base_kw)
            kw.update(cand)
            cfg_kw = {k: v for k, v in kw.items()
                      if k in _engine.EngineConfig.__dataclass_fields__}
            eng = _engine.StencilEngine(spec, interior,
                                        _engine.EngineConfig(**cfg_kw))
            secs = _measure_engine(eng, steps)
            results[tag] = secs
            if verbose:
                print(f"autotune {spec.name} {tag}: {secs*1e3:.2f} ms",
                      flush=True)
            if secs < best_secs:
                best, best_secs = dict(cand), secs
        except Exception as e:
            results[tag] = f"failed: {type(e).__name__}"
            if verbose:
                print(f"autotune {spec.name} {tag}: failed "
                      f"({type(e).__name__})", flush=True)
    if best is None:
        raise RuntimeError(
            f"autotune: no candidate ran for {spec.name} {interior}")
    cache = _load_cache()
    cache[key] = {"params": best, "secs": best_secs, "measured": results}
    _store_cache(cache)
    return best


def candidates_1d():
    """1-D lane-geometry / fusion candidates: the engine's defaults plus
    the neighboring corners of the measured round-4 space (MXU lanes
    conv, k=4, deep tiles; tiny grids ignore all of this via the
    resident kernel)."""
    out = [{"fused_steps": k} for k in (2, 4, 8)]
    out += [{"fused_steps": 4, "lanes_width": w} for w in (1024, 2048)]
    out += [{"fused_steps": 4, "lanes_tile_rows": tr}
            for tr in (112, 224, 448)]
    return out


def exact_algorithms_2d(spec, dtype: str = "float32"):
    """Tier-preserving 2-D compute paths only -- autotune must never
    silently trade numerics for speed.  fp32 state: exact-fp32-grade
    paths ('mxu_hybrid' at ~6e-6/step stays opt-in).  bf16 state: the
    storage rounding is ~4e-3/step, so mxu_hybrid's matrix error is
    negligible WITHIN the tier and it joins the candidate set (it is
    the measured bf16 flagship winner, 88.5 vs 78.7 mxu_hybrid1)."""
    out = ["vpu_roll", "mxu_hybrid1"]
    if dtype == "bfloat16":
        out.append("mxu_hybrid")
    axes = sum((t.taps[-2] is not None) + (t.taps[-1] is not None)
               for t in spec.terms)
    if axes <= 2 and not spec.residue:
        out.append("mxu_hybrid3")
    return out


def candidates_2d_params(spec, dtype: str = "float32"):
    cands = []
    for alg in exact_algorithms_2d(spec, dtype):
        for k in (1, 2):
            cands.append({"algorithm": alg, "fused_steps": k})
        # the time-skewed traversal (zero-recompute k-step streaming):
        # parity-at-best on v5e (PERF.md round-7 item 8), but it is a
        # genuinely different DMA/compute balance, so let new devices
        # measure it rather than inherit the v5e verdict
        if alg in ("vpu_roll", "mxu_hybrid1"):
            cands.append({"algorithm": alg, "fusion": "skew",
                          "fused_steps": 2})
    return cands


def autotune_params(shape, interior, dtype: str = "float32",
                    steps: Optional[int] = None, use_cache: bool = True,
                    verbose: bool = False, **base_kw) -> dict:
    """Measure the device-dependent engine knobs for a config and return
    the winning engine kwargs (round-2 VERDICT item 5).

    1-D: fusion depth + overlapped-lane geometry.  2-D: exact algorithm
    choice + fusion depth, after (and composed with) the tile tuner.
    3-D: in-plane tile (autotune_tile_3d) + slab fusion depth.  Cached
    per (device kind, spec, interior, dtype) like the tile tuner."""
    from ..models.shapes import StencilSpec, get_shape

    spec = shape if isinstance(shape, StencilSpec) else get_shape(shape)
    interior = tuple(int(s) for s in np.atleast_1d(interior))
    if dtype in ("float64", "df64"):
        raise ValueError(
            f"autotune measures the Pallas kernel tiers; the {dtype} "
            f"correctness tier has no tile/algorithm knobs (its state "
            f"is not layout-shaped)")
    if spec.ndim == 1:
        key = _key(spec, interior, "params1d", "-", dtype)
        return _autotune_params(spec, interior, key, candidates_1d(),
                                steps or 16, use_cache, verbose,
                                dict(base_kw, dtype=dtype))
    if spec.ndim == 2:
        key = _key(spec, interior, "params2d", "-", dtype)
        # stage 1: tile per algorithm family is close to universal; tune
        # the tile once with the auto algorithm, then search
        # (algorithm, fused_steps) at that tile.
        tile = autotune_tile(spec, interior, dtype=dtype,
                             use_cache=use_cache, verbose=verbose)
        best = _autotune_params(
            spec, interior, key, candidates_2d_params(spec, dtype),
            steps or 24, use_cache, verbose,
            dict(base_kw, dtype=dtype, tile=tile))
        return dict(best, tile=tile)
    key = _key(spec, interior, "params3d", "-", dtype)
    tile = autotune_tile_3d(spec, interior, dtype=dtype,
                            use_cache=use_cache, verbose=verbose)
    best = _autotune_params(
        spec, interior, key,
        [{"fused_steps_3d": k} for k in (1, 2)],
        steps or 12, use_cache, verbose,
        dict(base_kw, dtype=dtype, tile=tile))
    return dict(best, tile=tile)


def autotuned_engine(shape, interior, **kw):
    """StencilEngine with an autotuned tile (2-D and 3-D; 1-D passes
    through to the default layout heuristics)."""
    from .. import engine as _engine
    from ..models.shapes import StencilSpec, get_shape

    spec = shape if isinstance(shape, StencilSpec) else get_shape(shape)
    if kw.get("tile") is None:
        if spec.ndim == 2:
            tune_kw = {k: v for k, v in kw.items()
                       if k in ("algorithm", "fused_steps", "dtype",
                                "precision", "interpret")}
            kw = dict(kw)
            kw["tile"] = autotune_tile(spec, tuple(interior), **tune_kw)
        elif spec.ndim == 3:
            tune_kw = {k: v for k, v in kw.items()
                       if k in ("algorithm", "fused_steps_3d", "dtype",
                                "precision", "interpret")}
            kw = dict(kw)
            kw["tile"] = autotune_tile_3d(spec, tuple(interior), **tune_kw)
    cfg_kw = {k: v for k, v in kw.items()
              if k in _engine.EngineConfig.__dataclass_fields__}
    return _engine.StencilEngine(spec, interior,
                                 _engine.EngineConfig(**cfg_kw))
