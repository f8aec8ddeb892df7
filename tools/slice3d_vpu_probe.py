"""Compute-only 3-D slice-conv ceiling probe.

The dual of the zero-compute slab-DMA probes that calibrate
``MEASURED.hbm_slab_3d_gbps``: this runs the 3-D kernels' EXACT per-slab
compute (per-plane ``apply_spec_vpu`` shifted-slice convs, the z-tap
combine, identity-term slices, interior masks, the out-store cast) on
VMEM-RESIDENT data with no HBM traffic, at the production slab/tile
geometry.  The achieved rate, divided by the static model's
ops/cell (``profiling._vpu_ops_per_cell`` / ``_bf16_stream_costs``),
yields the EFFECTIVE elem-op rate of the 3-D slice mix -- replacing the
generic ``vpu_teraops`` (calibrated on 2-D roll kernels) for ndim == 3
VPU bounds, where Mosaic lowers the misaligned value slices to
rotate+select chains with a different cost per nominal op.

Usage (the TPU worker runs this as a job; CPU smoke via interpret):

    python tools/slice3d_vpu_probe.py [--interpret] [--iters N]

Prints one JSON line per (shape, dtype) case with ``slice_teraops``
(model-units/s) and the implied compute-bound GCells/s for the case.
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE, LANE = 8, 128


def slab_compute(src, out_store, convbuf, prev, i, *, spec, TM, TN,
                 slab, acc_dt=jnp.float32):
    """One fused-K=1 slab compute, exactly the
    ``pallas_3d._stencil3d_kernel`` inner loop (minus the DMAs): per
    buffered term one ``conv_plane`` per input plane into ``convbuf``,
    then per output plane the z-tap combine + identity slices + center
    convs, the interior masks, and the out-store cast.  ``src(jj)``
    yields input plane jj; ``out_store(j, val)`` stores output plane j;
    ``prev`` is a loop-carried value folded into plane 0 so repeated
    bodies can't be constant-folded; ``i`` is a traced scalar standing
    in for the kernel's program_id / slab index (mask sources)."""
    from lorastencil_tpu.models.shapes import SeparableTerm
    from lorastencil_tpu.ops.band_gemm import apply_spec_vpu
    from lorastencil_tpu.ops.pallas_3d import _Plane2D, _classify_terms

    r = spec.radius
    HR, HC = SUBLANE, LANE
    buffered_idx, identity_idx, center_idx = _classify_terms(spec)

    def conv_plane(t_idx, X):
        if X.dtype == jnp.bfloat16:
            X = X.astype(jnp.float32)
        term = spec.terms[t_idx]
        plane_term = SeparableTerm(taps=(term.taps[1], term.taps[2]))
        return apply_spec_vpu(X, _Plane2D(terms=(plane_term,)),
                              (HR, HC), (0, 0), TM, TN)

    # interior masks from a traced scalar (the real kernel derives
    # them from program_id / the z slab index)
    gr = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, TN), 1)
    rm = (gr >= (i * 0)).astype(acc_dt)
    cm = (gc >= (i * 0)).astype(acc_dt)

    for b, t_idx in enumerate(buffered_idx):
        for jj in range(slab + 2 * r):
            convbuf[b, jj] = conv_plane(t_idx, src(jj))

    def wmul(w, v):
        return v if w == 1.0 else -v if w == -1.0 else w * v

    for j in range(slab):
        acc = prev if j == 0 else jnp.zeros((TM, TN), acc_dt)
        for t_idx in center_idx:
            acc = acc + conv_plane(t_idx, src(j + r))
        for b, t_idx in enumerate(buffered_idx):
            tz = spec.terms[t_idx].taps[0]
            rz = (len(tz) - 1) // 2
            for dz in range(-rz, rz + 1):
                w = float(tz[rz + dz])
                if w != 0.0:
                    acc = acc + wmul(w, convbuf[b, j + r + dz])
        for t_idx in identity_idx:
            tz = spec.terms[t_idx].taps[0]
            rz = (len(tz) - 1) // 2
            for dz in range(-rz, rz + 1):
                w = float(tz[rz + dz])
                if w != 0.0:
                    acc = acc + wmul(w, src(j + r + dz)[
                        HR: HR + TM, HC: HC + TN].astype(acc_dt))
        zok = (i >= 0).astype(acc_dt)  # traced scalar, like zz >= zlo
        acc = acc * rm * cm * zok
        out_store(j, acc)


def _probe_kernel(win, _out_in, out_ref, convbuf, *, spec, TM, TN, slab,
                  iters: int, acc_dt=jnp.float32):
    def body(i, carry):
        # loop-carried dependency (negligible cost): fold the previous
        # iteration's first output plane back in so the body can't fold
        prev = out_ref[0].astype(acc_dt) * 1e-30
        slab_compute(lambda jj: win[jj],
                     lambda j, acc: out_ref.__setitem__(
                         j, acc.astype(out_ref.dtype)),
                     convbuf, prev, i, spec=spec, TM=TM, TN=TN,
                     slab=slab, acc_dt=acc_dt)
        return carry

    jax.lax.fori_loop(0, iters, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("spec", "TM", "TN", "slab", "iters",
                                    "interpret"))
def _probe(win, out0, spec, TM, TN, slab, iters, interpret):
    n_buf = sum(1 for t in spec.terms
                if (t.taps[1] is not None or t.taps[2] is not None)
                and t.taps[0] is not None and len(t.taps[0]) > 1)
    return pl.pallas_call(
        functools.partial(_probe_kernel, spec=spec, TM=TM, TN=TN,
                          slab=slab, iters=iters),
        out_shape=jax.ShapeDtypeStruct(out0.shape, out0.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((max(1, n_buf), slab + 2 * spec.radius, TM, TN),
                       jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )(win, out0)


def run_case(name: str, dtype: str, TM=128, TN=256, slab=32,
             iters=20000, interpret=False, repeats=3):
    import numpy as np

    from lorastencil_tpu.models import shapes
    from lorastencil_tpu.utils import profiling

    spec = shapes.get_shape(name)
    r = spec.radius
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    win = jax.random.uniform(key, (slab + 2 * r, TM + 2 * SUBLANE,
                                   TN + 2 * LANE), jnp.float32,
                             0.5, 1.0).astype(dt)
    out0 = jnp.zeros((slab, TM, TN), dt)
    out = _probe(win, out0, spec, TM, TN, slab, 1, interpret)
    float(np.asarray(jnp.sum(out.astype(jnp.float32))))  # compile+sync
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = _probe(win, out0, spec, TM, TN, slab, iters, interpret)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        secs = time.perf_counter() - t0
        best = secs if best is None else min(best, secs)
    if dtype == "bfloat16":
        ops_per_cell, _ = profiling._bf16_stream_costs(spec, "vpu")
    else:
        ops_per_cell = profiling._vpu_ops_per_cell(spec, "vpu")
    cells = slab * TM * TN * iters
    return {
        "shape": name,
        "dtype": dtype,
        "tile": [TM, TN],
        "slab": slab,
        "iters": iters,
        "model_ops_per_cell": ops_per_cell,
        "gcells_per_s": cells / best / 1e9,
        "slice_teraops": cells * ops_per_cell / best / 1e12,
        "secs": best,
        "platform": jax.default_backend(),
    }


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    interpret = "--interpret" in argv
    iters = 4 if interpret else 20000
    for i, a in enumerate(argv):
        if a == "--iters":
            iters = int(argv[i + 1])
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    cases = [("box3d1r", "float32", 128, 256),
             ("box3d1r", "bfloat16", 128, 256),
             ("star3d1r", "float32", 256, 256),
             ("star3d1r", "bfloat16", 256, 256)]
    for name, dtype, TM, TN in cases:
        res = run_case(name, dtype, TM=TM, TN=TN,
                       iters=iters, interpret=interpret,
                       repeats=1 if interpret else 3)
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
