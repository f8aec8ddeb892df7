"""3-D low-rank stencil Pallas kernel (2.5-D blocking).

TPU-native re-design of the reference's 3-D engines
(``/root/reference/src/3d/gpu_star.cu:22-133``, ``gpu_box.cu:21-140``):
each grid step owns one (TM, TN) in-plane tile *for all z* and sweeps the
z axis inside the kernel with a 3-deep rotating window buffer (the
reference's rotating shared-memory plane pipeline), so each input plane is
read from HBM exactly once per timestep.

Per z iteration (computing output plane z, reading planes z-1, z, z+1):
  * async-DMA the window of plane z+1 into rotation slot (z+1) % 3;
  * terms whose z-taps span multiple planes and have a real in-plane conv
    (box3d1r's [1,1,1]x[1,1,1]x[1,2,1]) evaluate the plane conv ONCE per
    input plane into a per-term rotating conv buffer (the analog of the
    reference's rotbuf + scratch reuse, ``gpu_box.cu:126-139``);
  * terms with identity plane ops (star3d1r's z +/- 1 copies,
    ``gpu_star.cu:44-54``) read window slices directly;
  * z-centered terms (star3d1r's in-plane cross) are evaluated on the
    center window only.

Banded-GEMM plane convs are shared with the 2-D kernel (band_gemm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .band_gemm import plane_conv, term_band_mats
from .layout import LANE, SUBLANE, Layout3D


def _classify_terms(spec: StencilSpec):
    """Split terms into (buffered_conv, identity_z, center_plane) groups.

    buffered: z-taps span planes AND a real in-plane conv -> rotate convs
    identity_z: z-taps span planes, identity plane op -> window slices
    center: z-taps is a delta -> plane op on the center window only
    """
    buffered, identity_z, center = [], [], []
    for i, t in enumerate(spec.terms):
        assert len(t.taps) == 3
        tz = t.taps[0]
        plane_identity = t.taps[1] is None and t.taps[2] is None
        if tz is None:
            center.append(i)
        elif plane_identity:
            identity_z.append(i)
        else:
            buffered.append(i)
    return buffered, identity_z, center


def _stencil3d_kernel(
    in_hbm, donor_hbm, *rest,
    spec: StencilSpec, layout: Layout3D, mats_meta,
    compute_dtype, precision,
):
    n_mats = sum(int(a) + int(b) for a, _, b, _ in mats_meta)
    mat_refs = rest[:n_mats]
    out_hbm = rest[n_mats]
    win = rest[n_mats + 1]       # (3, TM + 16, TN + 256)
    convbuf = rest[n_mats + 2]   # (n_buffered, 3, TM, TN) or (1,1,8,128) dummy
    out_tile = rest[n_mats + 3]
    sem_in = rest[n_mats + 4]    # (3,) DMA sems
    sem_out = rest[n_mats + 5]

    TM, TN = layout.tile
    H = layout.interior[0]
    m, n = layout.interior[1], layout.interior[2]
    z0, r0, c0 = layout.origin
    HR, HC = SUBLANE, LANE
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    buffered_idx, identity_idx, center_idx = _classify_terms(spec)
    # map each term to its (A, B, rr, rc) mats in order of spec.terms
    term_mats = {}
    mi = 0
    for t_idx, (has_a, rr, has_b, rc) in enumerate(mats_meta):
        A = B = None
        if has_a:
            A = mat_refs[mi][:]
            mi += 1
        if has_b:
            B = mat_refs[mi][:]
            mi += 1
        term_mats[t_idx] = (A, B, rr, rc)

    def start_plane_dma(zp, slot):
        return pltpu.make_async_copy(
            in_hbm.at[
                zp,
                pl.ds(r0 + ti * TM - HR, TM + 2 * HR),
                pl.ds(c0 + tj * TN - HC, TN + 2 * HC),
            ],
            win.at[slot],
            sem_in.at[slot],
        )

    def read_win(slot):
        return win[pl.ds(slot, 1)][0]

    def conv_term(t_idx, X):
        A, B, rr, rc = term_mats[t_idx]
        return plane_conv(X, A, B, rr, rc, HR, HC, TM, TN,
                          compute_dtype, precision)

    # ---- prologue: planes 0 and 1 --------------------------------------
    d0 = start_plane_dma(0, 0)
    d1 = start_plane_dma(1, 1)
    d0.start()
    d1.start()
    d0.wait()
    d1.wait()
    for b, t_idx in enumerate(buffered_idx):
        convbuf[b, 0] = conv_term(t_idx, read_win(0))
        convbuf[b, 1] = conv_term(t_idx, read_win(1))

    if (m % TM != 0) or (n % TN != 0):
        gr = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0) + ti * TM
        gc = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1) + tj * TN
        interior_mask = (gr < m) & (gc < n)
    else:
        interior_mask = None

    # ---- z sweep --------------------------------------------------------
    def body(z, _):
        zp2 = z + 2                      # abs input plane arriving now
        slot2 = jax.lax.rem(zp2, 3)
        dma = start_plane_dma(zp2, slot2)
        dma.start()
        dma.wait()
        for b, t_idx in enumerate(buffered_idx):
            convbuf[b, pl.ds(slot2, 1)] = conv_term(
                t_idx, read_win(slot2)
            )[None]

        acc = jnp.zeros((TM, TN), jnp.float32)
        zc = z + 1                       # abs center plane of the output
        for t_idx in center_idx:
            acc = acc + conv_term(t_idx, read_win(jax.lax.rem(zc, 3)))
        for b, t_idx in enumerate(buffered_idx):
            tz = spec.terms[t_idx].taps[0]
            for dz in (-1, 0, 1):
                w = float(tz[1 + dz])
                if w != 0.0:
                    slot = jax.lax.rem(zc + dz, 3)
                    acc = acc + w * convbuf[b, pl.ds(slot, 1)][0]
        for t_idx in identity_idx:
            tz = spec.terms[t_idx].taps[0]
            for dz in (-1, 0, 1):
                w = float(tz[1 + dz])
                if w != 0.0:
                    slot = jax.lax.rem(zc + dz, 3)
                    Xs = read_win(slot)
                    acc = acc + w * Xs[HR: HR + TM, HC: HC + TN].astype(
                        jnp.float32
                    )
        for (dz, dr, dc), w in spec.residue:
            slot = jax.lax.rem(zc + dz, 3)
            Xs = read_win(slot)
            acc = acc + w * Xs[
                HR + dr: HR + dr + TM, HC + dc: HC + dc + TN
            ].astype(jnp.float32)

        if interior_mask is not None:
            acc = jnp.where(interior_mask, acc, 0.0)
        out_tile[:] = acc.astype(out_tile.dtype)
        copy_out = pltpu.make_async_copy(
            out_tile,
            out_hbm.at[
                z0 + z,
                pl.ds(r0 + ti * TM, TM),
                pl.ds(c0 + tj * TN, TN),
            ],
            sem_out,
        )
        copy_out.start()
        copy_out.wait()
        return 0

    jax.lax.fori_loop(0, H, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "compute_dtype", "precision",
                     "interpret"),
)
def stencil3d_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout3D,
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    layout.validate()
    TM, TN = layout.tile
    np_dtype = np.dtype(cur.dtype)

    mats_meta = []
    mat_args = []
    for term in spec.terms:
        A, B = term_band_mats(term, np_dtype)
        rr = (len(term.taps[1]) - 1) // 2 if term.taps[1] is not None else 0
        rc = (len(term.taps[2]) - 1) // 2 if term.taps[2] is not None else 0
        mats_meta.append((A is not None, rr, B is not None, rc))
        if A is not None:
            mat_args.append(jnp.asarray(A))
        if B is not None:
            mat_args.append(jnp.asarray(B))
    mats_meta = tuple(mats_meta)

    buffered_idx, _, _ = _classify_terms(spec)
    n_buf = max(1, len(buffered_idx))

    kernel = functools.partial(
        _stencil3d_kernel,
        spec=spec, layout=layout, mats_meta=mats_meta,
        compute_dtype=compute_dtype, precision=precision,
    )
    return pl.pallas_call(
        kernel,
        grid=layout.grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, TM + 2 * SUBLANE, TN + 2 * LANE), cur.dtype),
            pltpu.VMEM((n_buf, 3, TM, TN), jnp.float32),
            pltpu.VMEM((TM, TN), cur.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cur, donor, *mat_args)
