"""Independent df64 VPU-EFT ceiling probe (round-5 VERDICT item 4).

Measures the sustainable rate of the EXACT op mix the df64 static cost
model prices (ops/pallas_df64: ROLL=3, FOLD=13, SPLIT=3, PRODUCT=20
cost units), on VMEM-RESIDENT data with no HBM traffic and no stencil
kernel in the loop -- the df64 analog of the zero-compute DMA probes
that calibrate the fp32 pattern-bandwidth ceilings.  The result
replaces the circular ``vpu_df64_costunits_teraops`` constant (which
was calibrated as "the max implied rate over the honest device rows",
so the best row sat at ~98% of its own bound by construction).

Per inner iteration the probe evaluates N_ENTRIES folded 'pair' tap
entries on a resident (R, C) fp32 pair -- per entry: 4 aligned lane
rolls of the pair words (4xROLL), one exact pair fold (FOLD), one
hoisted Veltkamp split (SPLIT), and one exact-partial-product scale
with its accumulating df_add (PRODUCT) -- 48 cost units/element/entry,
the same dataflow as one symmetric tap of the production pair kernels.

Usage (the TPU worker runs this as a job; CPU smoke via interpret):

    python tools/df64_eft_probe.py [--interpret] [--iters N]

Prints one JSON line: {"costunits_teraops": ..., "secs": ..., ...}.
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

from lorastencil_tpu.ops.df64 import df_add
from lorastencil_tpu.ops.pallas_df64 import (_COST_FOLD, _COST_PRODUCT,
                                             _COST_ROLL, _COST_SPLIT,
                                             _pair_scale, _split_weight)

# a representative non-trivial weight (full product path: w_l != 0)
_W4 = _split_weight(1.0 / 3.0)
N_ENTRIES = 4
UNITS_PER_ENTRY = 4 * _COST_ROLL + _COST_FOLD + _COST_SPLIT + _COST_PRODUCT


def _probe_kernel(in_ref, out_ref, *, iters: int, axis):
    """``axis``: 1 = lane rolls (the canonical priced mix), 0 = sublane
    (row) rolls -- same arithmetic, different shift engine -- and None =
    no rolls at all (pure EFT arithmetic).  The lane/row/no-roll triple
    over-determines the (arithmetic rate, roll cost) solve."""
    E = in_ref.shape[1 + (axis if axis is not None else 1)]

    def sh(v, d):
        if axis is None:
            return v
        return pltpu.roll(v, (-d) % E, axis)

    def body(_, carry):
        h = out_ref[0]
        lo = out_ref[1]
        acc_h = acc_l = None
        for e in range(N_ENTRIES):
            d = e + 1
            zh, zl = df_add(sh(h, d), sh(lo, d), sh(h, -d), sh(lo, -d))
            ph, pl_ = _pair_scale(zh, zl, _W4)  # splits zh (SPLIT+PRODUCT)
            acc_h, acc_l = ((ph, pl_) if acc_h is None
                            else df_add(acc_h, acc_l, ph, pl_))
        # keep the pair bounded across iterations (one extra multiply,
        # outside the priced mix -- <1% of the 192 units/elem/iter)
        out_ref[0] = acc_h * 0.25
        out_ref[1] = acc_l * 0.25
        return carry

    jax.lax.fori_loop(0, iters, body, 0)


@functools.partial(jax.jit, static_argnames=("iters", "interpret", "axis"))
def _probe(pair, iters: int, interpret: bool, axis):
    return pl.pallas_call(
        functools.partial(_probe_kernel, iters=iters, axis=axis),
        out_shape=jax.ShapeDtypeStruct(pair.shape, pair.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )(pair)


def run_probe(R=256, C=2048, iters=2000, interpret=False, repeats=3,
              axis=1):
    import numpy as np

    key = jax.random.PRNGKey(0)
    pair = jax.random.uniform(key, (2, R, C), jnp.float32, 0.5, 1.0)
    # warmup / compile
    out = _probe(pair, iters=1, interpret=interpret, axis=axis)
    float(np.asarray(jnp.sum(out)))
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = _probe(pair, iters=iters, interpret=interpret, axis=axis)
        float(np.asarray(jnp.sum(out)))  # device->host scalar sync
        secs = time.perf_counter() - t0
        best = secs if best is None else min(best, secs)
    units = R * C * iters * N_ENTRIES * UNITS_PER_ENTRY
    return {
        "costunits_teraops": units / best / 1e12,
        "secs": best,
        "shape": [R, C],
        "iters": iters,
        "axis": axis,
        "units_per_elem_iter": N_ENTRIES * UNITS_PER_ENTRY,
        "platform": jax.default_backend(),
    }


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    interpret = "--interpret" in argv
    iters = 2000
    for i, a in enumerate(argv):
        if a == "--iters":
            iters = int(argv[i + 1])
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    res = run_probe(iters=iters, interpret=interpret)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
