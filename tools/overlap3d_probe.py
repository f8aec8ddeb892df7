"""DMA/compute OVERLAP probe for the 3-D slab pipeline.

The compute-only probe (tools/slice3d_vpu_probe.py) measures 132-190
GCells/s and the zero-compute slab-DMA probe measures 86-164 GCells/s
(fp32/bf16), yet the real 3-D kernels land almost exactly at the SERIAL
sum of the two legs (box3d1r bf16: predicted 75.0, measured 74.6) while
the 2-D kernels demonstrably overlap (star2d1r fp32: serial 34.3,
measured 60.0).  This probe isolates the mechanism: per iteration it
issues ONE double-buffered slab DMA (the 3-D kernel's exact in-DMA
shape and slot discipline, pallas_3d._stencil3d_kernel) plus ``reps``
repetitions of the exact slab compute, and reports the combined rate.

  reps=0  -> pure DMA pipeline rate through this loop structure
  reps=1  -> the real kernel's DMA:compute ratio
  combined ~ max(dma, compute)  => the engines overlap; the real
                                   kernel's serialization is elsewhere
  combined ~ dma + compute      => in-loop manual DMA does not overlap
                                   with VPU work in this pattern

Usage: exec'd by the TPU worker (importlib), or
    python tools/overlap3d_probe.py --interpret
"""

import functools
import importlib.util
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

_spec = importlib.util.spec_from_file_location(
    "slice3d_vpu_probe", os.path.join(REPO, "tools/slice3d_vpu_probe.py"))
_slice3d = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_slice3d)
slab_compute = _slice3d.slab_compute

SUBLANE, LANE = 8, 128


def _kernel(x_hbm, _o, out_ref, y_hbm, win, convbuf, outbuf, sem,
            sem_out, *, spec, TM, TN, slab, iters: int, reps: int,
            out_dma: bool, strided: bool, acc_dt=jnp.float32):
    r = spec.radius
    if strided:
        # x_hbm is one (Z, R, C) grid; slab slices at dynamic z offsets
        # (the real kernel's slab_dma shape, pallas_3d)
        nsl = (x_hbm.shape[0] - 2 * r) // slab

        def dma(i, s):
            z = jax.lax.rem(i, jnp.int32(nsl)) * slab
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(z, slab + 2 * r),
                         pl.ds(0, TM + 2 * SUBLANE),
                         pl.ds(0, TN + 2 * LANE)],
                win.at[s], sem.at[s])
    else:
        nsl = x_hbm.shape[0]

        def dma(i, s):
            return pltpu.make_async_copy(
                x_hbm.at[jax.lax.rem(i, jnp.int32(nsl))], win.at[s],
                sem.at[s])

    def odma(i, s):
        z = jax.lax.rem(i, jnp.int32(max(1, y_hbm.shape[0] // slab)))
        return pltpu.make_async_copy(
            outbuf.at[s],
            y_hbm.at[pl.ds(z * slab, slab), pl.ds(0, TM), pl.ds(0, TN)],
            sem_out.at[s])

    dma(0, 0).start()

    def sub_iter(i, s):
        @pl.when(i + 1 < iters)
        def _():
            dma(i + 1, 1 - s).start()

        dma(i, s).wait()
        if out_dma:
            @pl.when(i >= 2)
            def _():
                odma(i - 2, s).wait()

        for rep in range(reps):
            prev = out_ref[0].astype(acc_dt) * 1e-30
            dst = outbuf if out_dma else out_ref
            slab_compute(lambda jj, s=s: win[s, jj],
                         (lambda j, acc, s=s: outbuf.__setitem__(
                             (s, j), acc.astype(outbuf.dtype)))
                         if out_dma else
                         (lambda j, acc: out_ref.__setitem__(
                             j, acc.astype(out_ref.dtype))),
                         convbuf, prev, i, spec=spec, TM=TM, TN=TN,
                         slab=slab, acc_dt=acc_dt)
        if out_dma:
            odma(i, s).start()
            # drain exactly like the real kernel (pallas_3d: waits both
            # live out DMAs inside the last sub_iter)

            @pl.when(i == iters - 1)
            def _():
                odma(i, s).wait()

            @pl.when((i == iters - 1) & (iters >= 2))
            def _():
                odma(i - 1, 1 - s).wait()

    def pair(p, carry):
        i0 = 2 * p
        sub_iter(i0, 0)

        @pl.when(i0 + 1 < iters)
        def _():
            sub_iter(i0 + 1, 1)

        return carry

    jax.lax.fori_loop(0, pl.cdiv(iters, 2), pair, 0)
    if out_dma:
        for j in range(slab):
            out_ref[j] = outbuf[(iters - 1) % 2, j]


@functools.partial(jax.jit,
                   static_argnames=("nz_out", "spec", "TM", "TN", "slab",
                                    "iters", "reps", "out_dma", "strided",
                                    "interpret"))
def _probe(x_hbm, out0, nz_out, spec, TM, TN, slab, iters, reps,
           out_dma, strided, interpret):
    n_buf = sum(1 for t in spec.terms
                if (t.taps[1] is not None or t.taps[2] is not None)
                and t.taps[0] is not None and len(t.taps[0]) > 1)
    r = spec.radius
    out, _y = pl.pallas_call(
        functools.partial(_kernel, spec=spec, TM=TM, TN=TN, slab=slab,
                          iters=iters, reps=reps, out_dma=out_dma,
                          strided=strided),
        out_shape=[jax.ShapeDtypeStruct(out0.shape, out0.dtype),
                   jax.ShapeDtypeStruct((nz_out, TM, TN), out0.dtype)],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, slab + 2 * r, TM + 2 * SUBLANE,
                        TN + 2 * LANE), out0.dtype),
            pltpu.VMEM((max(1, n_buf), slab + 2 * r, TM, TN),
                       jnp.float32),
            pltpu.VMEM((2, slab, TM, TN), out0.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(x_hbm, out0)
    return out


def run_case(name: str, dtype: str, TM=128, TN=256, slab=32, nsl=16,
             iters=4000, reps=1, out_dma=False, strided=False,
             interpret=False, repeats=3):
    import numpy as np

    from lorastencil_tpu.models import shapes

    spec = shapes.get_shape(name)
    r = spec.radius
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    if strided:
        x = jax.random.uniform(key, (nsl * slab + 2 * r,
                                     TM + 2 * SUBLANE, TN + 2 * LANE),
                               jnp.float32, 0.5, 1.0).astype(dt)
        slab_bytes = ((slab + 2 * r) * (TM + 2 * SUBLANE)
                      * (TN + 2 * LANE) * x.itemsize)
    else:
        x = jax.random.uniform(key, (nsl, slab + 2 * r,
                                     TM + 2 * SUBLANE, TN + 2 * LANE),
                               jnp.float32, 0.5, 1.0).astype(dt)
        slab_bytes = x[0].size * x.itemsize
    nz_out = nsl * slab
    out0 = jnp.zeros((slab, TM, TN), dt)
    out = _probe(x, out0, nz_out, spec, TM, TN, slab, 2, reps,
                 out_dma, strided, interpret)
    float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = _probe(x, out0, nz_out, spec, TM, TN, slab, iters, reps,
                     out_dma, strided, interpret)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        secs = time.perf_counter() - t0
        best = secs if best is None else min(best, secs)
    cells = slab * TM * TN * iters
    gb = slab_bytes * iters / 1e9
    return {
        "shape": name, "dtype": dtype, "tile": [TM, TN], "slab": slab,
        "iters": iters, "reps": reps, "out_dma": out_dma,
        "strided": strided,
        "gcells_per_s": cells / best / 1e9,
        "dma_gbps": gb / best,
        "secs": best,
        "platform": jax.default_backend(),
    }


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    interpret = "--interpret" in argv
    iters = 4 if interpret else 4000
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    for name, dtype, TM, TN in [("box3d1r", "bfloat16", 128, 256),
                                ("box3d1r", "float32", 128, 256)]:
        for reps in (0, 1):
            res = run_case(name, dtype, TM=TM, TN=TN, iters=iters,
                           reps=reps, interpret=interpret,
                           repeats=1 if interpret else 3)
            print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
