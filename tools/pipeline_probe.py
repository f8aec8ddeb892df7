"""Zero-compute DMA-pipeline probes for the fp32 / bf16 state tiers.

The MEASURED pattern-bandwidth ceilings in ``utils/profiling.py``
(``hbm_windowed_2d_gbps`` etc.) were calibrated with ad-hoc round-4
device jobs: a zero-compute (identity / minimal-shift) spec pushed
through the SAME Pallas kernel pipeline as the real row, so the reading
is that access pattern's practical DMA ceiling -- not the contiguous-
copy aggregate, which no windowed/slabbed traversal reaches.  This tool
makes those probes reproducible and extends them to the bf16 state
tier, whose ceilings were previously ASSUMED to be the fp32 pattern
rate at half the bytes ("ceiling measured on the fp32 pipeline" in
ACCOUNTING.md; round-5 TODO open item 4).  bf16 halves every DMA row's
byte length at the same cell tile, and HBM efficiency is strongly
row-length-dependent (PERF.md: 1024 B rows run ~60% of contiguous
rate), so the bf16 ceilings must be measured, not scaled.

Each probe builds a ``StencilEngine`` over a spec with the same radius
and layout geometry as the BASELINE configs but (near-)zero arithmetic:

  * 2-D: center-only taps on both axes (radius 3) via 'vpu_roll' --
    every roll/multiply is elided, leaving pure window DMA + the
    aligned interior slice (the round-4 65.9 GCells/s fp32 probe);
  * 3-D: a z-identity term (z taps (0, 1, 0), radius 1) -- pure slab
    DMA through the z-sweep pipeline (the round-4 64.1 probe);
  * 1-D: a CENTER-ONLY unit tap through the lanes layout at k=4 --
    the d=0 roll and the w==1 multiply are both elided, so the kernel
    is DMA + mask + fixup only.  (The earlier shift-tap variant paid
    one roll per substep, which BOUND the probe at bf16 rates: honest
    mxu kernel rows exceeded its implied GB/s.  Layout1DLanes.build
    clamps r_eff to >= 1, so the stored halo geometry matches the
    real rows'.)

Reported ``gbps_effective`` = GCells/s x the probe engine's OWN modeled
bytes/cell/step (``profiling.engine_roofline``), so the number
transfers to real rows through the same byte model.  Run from a
TPU-attached worker job (CLAUDE.md rules) after the suite control row:

    python tools/pipeline_probe.py [--dtype float32|bfloat16] [--quick]

Reference analog: the reference reports raw wall time per config
(``/root/reference/src/2d/gpu.cu:408-417``) with no roofline; these
probes are what make the repo's %-of-bound accounting honest.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from lorastencil_tpu import engine as engine_mod
from lorastencil_tpu.models.shapes import SeparableTerm, StencilSpec
from lorastencil_tpu.utils import metrics, profiling


def _center_taps(radius: int):
    t = [0.0] * (2 * radius + 1)
    t[radius] = 1.0
    return tuple(t)


def _shift_taps(radius: int):
    t = [0.0] * (2 * radius + 1)
    t[0] = 1.0  # extreme offset: preserves the effective radius
    return tuple(t)


def probe_spec(ndim: int) -> StencilSpec:
    """A spec with the BASELINE configs' layout geometry (radius 3 in
    2-D, 1 in 3-D, effective radius 4 in 1-D) and zero / one-roll
    arithmetic."""
    if ndim == 2:
        c = _center_taps(3)
        return StencilSpec(name="probe2d", ndim=2, radius=3, halo=(3, 3),
                           terms=(SeparableTerm(taps=(c, c)),),
                           residue=(), fuse_factor=1)
    if ndim == 3:
        return StencilSpec(name="probe3d", ndim=3, radius=1,
                           halo=(1, 1, 1),
                           terms=(SeparableTerm(
                               taps=(_center_taps(1), None, None)),),
                           residue=(), fuse_factor=1)
    return StencilSpec(name="probe1d", ndim=1, radius=4, halo=(4,),
                       terms=(SeparableTerm(taps=(_center_taps(4),),),),
                       residue=(), fuse_factor=1)


# (label, ndim, interior, steps, pipeline, config overrides) -- the
# geometries of the BASELINE rows whose bw ceilings the model uses
PROBES = [
    ("windowed_2d", 2, (8192, 8192), 256, 4,
     dict(algorithm="vpu_roll", tile=(256, 2048), fused_steps=1)),
    # steps=512: >= 0.4 s regions (the round-4 steps=64 calibration
    # ran 0.13 s and understated the ceiling 455 vs 659 GB/s)
    ("slab_3d", 3, (256, 256, 256), 512, 8,
     dict(algorithm="auto", tile=(128, 256), fused_steps_3d=2)),
    # steps=2048: a >= 0.4 s timed region (the round-4 "~97 GCells/s"
    # 1-D calibration and this tool's own first steps=256 run were
    # short-region artifacts)
    ("lanes_1d", 1, (16 * 1024 * 1024,), 2048, 8,
     dict(algorithm="vpu_roll", fused_steps=4)),
]


def run_probe(label, ndim, interior, steps, pipeline, overrides,
              dtype="float32", repeats=3, interpret=None):
    import jax.numpy as jnp

    cfg = engine_mod.EngineConfig(dtype=dtype, interpret=interpret,
                                  **overrides)
    eng = engine_mod.StencilEngine(probe_spec(ndim), interior, cfg)

    @jax.jit
    def f(key):
        state = jax.random.uniform(key, eng.layout.shape, eng.dtype,
                                   0.0, 0.01)
        return jnp.sum(eng._run_internal(state, steps) * 0.0)

    secs, _ = metrics.time_run(f, jax.random.PRNGKey(0), repeats=repeats,
                               warmup=1, pipeline=pipeline,
                               subtract_sync=True)
    cells = 1
    for s in interior:
        cells *= s
    gcells = cells * steps / secs / 1e9
    roof = profiling.engine_roofline(eng)
    bpc = roof.bytes_per_cell_step if roof else None
    return dict(probe=label, dtype=dtype, interior=list(interior),
                steps=steps, gcells_per_s=round(gcells, 2),
                bytes_per_cell_step=round(bpc, 3) if bpc else None,
                gbps_effective=(round(gcells * bpc, 1) if bpc else None),
                secs=round(secs, 5),
                platform=jax.default_backend())


def run_all(dtype="float32", quick=False, interpret=None):
    out = []
    for label, ndim, interior, steps, pipeline, overrides in PROBES:
        if quick:
            interior = tuple(min(s, 256 if ndim > 1 else 65536)
                             for s in interior)
            steps, pipeline = 4, 1
        res = run_probe(label, ndim, interior, steps, pipeline,
                        overrides, dtype=dtype, interpret=interpret)
        print(json.dumps(res), flush=True)
        out.append(res)
    return out


if __name__ == "__main__":
    dtypes = ["float32", "bfloat16"]
    if "--dtype" in sys.argv:
        dtypes = [sys.argv[sys.argv.index("--dtype") + 1]]
    for dt in dtypes:
        run_all(dtype=dt, quick="--quick" in sys.argv)
