"""2-D low-rank stencil Pallas kernel.

TPU-native re-design of the reference's 2-D tensor-core engines
(``/root/reference/src/2d/gpu.cu:31-273``): each rank-1 term of the
coefficient matrix becomes two banded-matrix matmuls on the MXU
(column-axis conv ``X @ B``, then row-axis conv ``A @ Y``), the sparse
residue becomes shifted VPU adds on the halo'd window, and one-sided star
terms skip the identity-axis matmul entirely.  There is no analog of the
CUDA fragment-relayout / V2-permutation tricks -- chaining the two matmuls
through VMEM values is native on TPU (SURVEY.md section 0, closing note).

Per grid step (one (TM, TN) output tile):

  1. async-DMA the halo'd input window (TM+16, TN+256) from HBM to VMEM
     (replaces the reference's cp.async shared-memory staging,
     ``src/2d/gpu.cu:37-50``).  TPU DMA slices must be (8, 128)-aligned in
     offset and size, so the window halo is one sublane-tile of rows and
     one lane-tile of columns on each side rather than the stencil radius;
  2. for every separable term, banded GEMMs in 128-wide chunks so the
     contraction dim stays MXU-sized (K = 128 + 2r);
  3. add residue points as statically-shifted window slices;
  4. mask cells beyond the true interior (tile round-up) to zero;
  5. async-DMA the tile to the output buffer.

The output buffer is the *donated* spare buffer whose guard ring is zero,
so halo cells decay to zero after the first step exactly like the
reference's zero-initialized ping-pong buffers (``src/2d/gpu.cu:396-400``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .band_gemm import plane_conv, term_band_mats
from .layout import LANE, SUBLANE, Layout2D


def _stencil2d_kernel(
    # inputs
    in_hbm,
    donor_hbm,  # aliased to out; never read
    *mat_refs_and_out,
    # static
    spec: StencilSpec,
    layout: Layout2D,
    mats_meta,
    compute_dtype,
    precision,
):
    n_mats = sum(int(has_a) + int(has_b) for has_a, _, has_b, _ in mats_meta)
    mat_refs = mat_refs_and_out[:n_mats]
    out_hbm = mat_refs_and_out[n_mats]
    win = mat_refs_and_out[n_mats + 1]
    out_tile = mat_refs_and_out[n_mats + 2]
    sem_in = mat_refs_and_out[n_mats + 3]
    sem_out = mat_refs_and_out[n_mats + 4]

    TM, TN = layout.tile
    r = spec.radius
    m, n = layout.interior
    r0, c0 = layout.origin
    # DMA-alignment window halo (>= radius; (8, 128)-aligned)
    HR, HC = SUBLANE, LANE

    ti = pl.program_id(0)
    tj = pl.program_id(1)

    # 1. stage the halo'd window
    copy_in = pltpu.make_async_copy(
        in_hbm.at[
            pl.ds(r0 + ti * TM - HR, TM + 2 * HR),
            pl.ds(c0 + tj * TN - HC, TN + 2 * HC),
        ],
        win,
        sem_in,
    )
    copy_in.start()
    copy_in.wait()

    X = win[:]
    acc = jnp.zeros((TM, TN), dtype=jnp.float32)

    # 2. separable terms as chunked banded GEMMs
    mat_idx = 0
    for t, term in enumerate(spec.terms):
        has_A, rr, has_B, rc = mats_meta[t]
        A = B = None
        if has_A:
            A = mat_refs[mat_idx][:]
            mat_idx += 1
        if has_B:
            B = mat_refs[mat_idx][:]
            mat_idx += 1
        acc = acc + plane_conv(X, A, B, rr, rc, HR, HC, TM, TN,
                               compute_dtype, precision)

    # 3. sparse residue: statically shifted window slices on the VPU
    for (dr, dc), w in spec.residue:
        acc = acc + w * X[
            HR + dr: HR + dr + TM, HC + dc: HC + dc + TN
        ].astype(jnp.float32)

    # 4. zero cells beyond the true interior (tile round-up guard)
    if m % TM != 0 or n % TN != 0:
        gr = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0) + ti * TM
        gc = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) + tj * TN
        acc = jnp.where((gr < m) & (gc < n), acc, 0.0)

    out_tile[:] = acc.astype(out_tile.dtype)

    # 5. write the tile
    copy_out = pltpu.make_async_copy(
        out_tile,
        out_hbm.at[pl.ds(r0 + ti * TM, TM), pl.ds(c0 + tj * TN, TN)],
        sem_out,
    )
    copy_out.start()
    copy_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "compute_dtype", "precision",
                     "interpret"),
)
def stencil2d_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout2D,
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    """One stencil step on the internal layout.

    ``donor`` is consumed (donated) as the output buffer; its guard ring
    must already be zero and is preserved (the kernel writes interior
    tiles only).
    """
    layout.validate()
    TM, TN = layout.tile
    np_dtype = np.dtype(cur.dtype)
    mats_meta = []
    mat_args = []
    for term in spec.terms:
        A, B = term_band_mats(term, np_dtype)
        row_taps, col_taps = term.taps
        rr = (len(row_taps) - 1) // 2 if row_taps is not None else 0
        rc = (len(col_taps) - 1) // 2 if col_taps is not None else 0
        mats_meta.append((A is not None, rr, B is not None, rc))
        if A is not None:
            mat_args.append(jnp.asarray(A))
        if B is not None:
            mat_args.append(jnp.asarray(B))
    mats_meta = tuple(mats_meta)

    kernel = functools.partial(
        _stencil2d_kernel,
        spec=spec,
        layout=layout,
        mats_meta=mats_meta,
        compute_dtype=compute_dtype,
        precision=precision,
    )
    grid = layout.grid
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((TM + 2 * SUBLANE, TN + 2 * LANE), cur.dtype),  # win
            pltpu.VMEM((TM, TN), cur.dtype),                    # out tile
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cur, donor, *mat_args)
