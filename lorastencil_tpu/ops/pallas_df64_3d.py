"""df64 3-D stencil Pallas kernel: fp64-grade pair state through the
2.5-D slab sweep.

Closes the "df64 Pallas is 2-D only" tier boundary: 3-D df64 previously
ran the HBM-bound XLA dense pair path (~0.7-0.8 GCells/s measured).
This kernel streams the (hi, lo) pair window into VMEM in z-SLABS
(double-buffered, the fp32 slab kernel's pipeline -- ops/pallas_3d.py)
and runs the whole error-free tap chain on VMEM values, in the
SEPARABLE low-rank form (the reference's own axis-separation thesis,
``/root/reference/src/3d/gpu_box.cu:43-86`` per-plane conv chains +
``gpu_star.cu:101-133`` z-plane pipeline, transplanted into the pair
arithmetic):

  * buffered terms (real in-plane conv + z taps, box3d1r): each input
    plane's df64 plane conv is evaluated ONCE into a pair conv buffer
    (the analog of the reference's rotating rotbuf), then the z taps
    combine conv planes -- symmetric z taps fold two planes into one
    scale via an exact-class pair add;
  * identity-plane terms (star3d1r's z+-1 copies, ``gpu_star.cu:44-54``)
    fold/scale window plane pairs directly;
  * z-centered terms (star3d1r's in-plane cross) conv the center plane;
  * the sparse residue applies per-offset plane slices.

In-plane convs use statically shifted SLICES, not rolls: on the small
non-128-multiple 3-D plane extents rolls measured 28% slower (PERF.md
round 4) -- the opposite of the 2-D full-window case.  Taps with
w == +-1 (every tap of both 3-D registry shapes except box3d1r's
center-column 2) skip the product entirely (``_pair_scale``).

Numerics: identical EFT formulation to ops/df64.py (products exact via
12-bit Veltkamp halves, rounded corrections only enter plain adds --
FMA contraction cannot change any value); accuracy ~1e-14/step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .df64 import df_add, veltkamp_split
from .layout import LANE, SUBLANE, Layout3D
from .pallas_df64 import _pair_scale, _sep_plan
from .pallas_3d import _classify_terms, pick_slab


def _conv_axis_slices(ops, axis, vh, vl, margin, out_len):
    """df64 1-D correlation along ``axis`` with static slices.

    Input extent along ``axis`` is out_len + 2*margin; output extent is
    out_len; the other axis passes through at full extent.  Returns the
    accumulated pair (or None pair for empty ops)."""
    def sl(arr, d):
        if axis == 0:
            return arr[margin + d: margin + d + out_len, :]
        return arr[:, margin + d: margin + d + out_len]

    vhs = vhl = None
    ah = al = None
    for kind, d, w4 in ops:
        if kind == "pair":
            zh, zl = df_add(sl(vh, d), sl(vl, d), sl(vh, -d), sl(vl, -d))
            ph, pl_ = _pair_scale(zh, zl, w4)
        elif (abs(w4[0]), w4[1]) == (1.0, 0.0):
            ph, pl_ = _pair_scale(sl(vh, d), sl(vl, d), w4)
        else:
            if vhs is None:
                vhs, vhl = veltkamp_split(vh)
            ph, pl_ = _pair_scale(sl(vh, d), sl(vl, d), w4,
                                  split=(sl(vhs, d), sl(vhl, d)))
        ah, al = (ph, pl_) if ah is None else df_add(ah, al, ph, pl_)
    return ah, al


def _df64_3d_kernel(
    in_hbm,
    donor_hbm,  # aliased to out; never read
    *rest,
    spec: StencilSpec,
    layout: Layout3D,
    plan,
    slab: int,
    has_bounds: bool,
):
    bounds_ref = None
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    out_hbm = rest[0]
    win = rest[1]       # (2, 2, slab+2r, TM+2HR, TN+2HC) pair windows
    convbuf = rest[2]   # (n_buf, 2, slab+2r, TM, TN) pair conv planes
    out_sl = rest[3]    # (2, 2, slab, TM, TN)
    sem_in = rest[4]
    sem_out = rest[5]

    TM, TN = layout.tile
    r = spec.radius
    H, m, n = layout.interior
    z0, r0, c0 = layout.origin
    HR, HC = SUBLANE, LANE
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    nslabs = H // slab
    nplanes = slab + 2 * r

    terms_plan, res_plan = plan
    buffered_idx, identity_idx, center_idx = _classify_terms(spec)

    def slab_dma(si, s):
        return pltpu.make_async_copy(
            in_hbm.at[
                :,
                pl.ds(z0 + si * slab - r, nplanes),
                pl.ds(r0 + ti * TM - HR, TM + 2 * HR),
                pl.ds(c0 + tj * TN - HC, TN + 2 * HC),
            ],
            win.at[s],
            sem_in.at[s],
        )

    def out_dma(si, s):
        return pltpu.make_async_copy(
            out_sl.at[s],
            out_hbm.at[
                :,
                pl.ds(z0 + si * slab, slab),
                pl.ds(r0 + ti * TM, TM),
                pl.ds(c0 + tj * TN, TN),
            ],
            sem_out.at[s],
        )

    if has_bounds:
        # (4,) = (rlo, rhi, clo, chi), or (6,) = (zlo, zhi, rlo, ...)
        # -- ghost boundaries pass 6 so received ghost planes survive
        six = bounds_ref.shape[0] == 6
        b_zlo, b_zhi = (bounds_ref[0], bounds_ref[1]) if six else (0, H)
        off = 2 if six else 0
        b_rlo, b_rhi = bounds_ref[off], bounds_ref[off + 1]
        b_clo, b_chi = bounds_ref[off + 2], bounds_ref[off + 3]
    else:
        b_zlo, b_zhi = 0, H
        b_rlo, b_rhi, b_clo, b_chi = 0, m, 0, n

    gr = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0) + ti * TM
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, TN), 1) + tj * TN
    rm = ((gr >= b_rlo) & (gr < b_rhi)).astype(jnp.float32)
    cm = ((gc >= b_clo) & (gc < b_chi)).astype(jnp.float32)
    rcm = rm * cm

    def conv_plane_pair(t_idx, vh, vl):
        """Separable df64 plane conv: (TM+2HR, TN+2HC) pair ->
        (TM, TN) pair.  Rows first (shrink to TM at full col extent),
        one re-split, then cols."""
        _, row_ops, col_ops = terms_plan[t_idx]
        if row_ops is not None:
            yh, yl = _conv_axis_slices(row_ops, 0, vh, vl, HR, TM)
        else:
            yh, yl = vh[HR: HR + TM, :], vl[HR: HR + TM, :]
        if col_ops is not None:
            yh, yl = _conv_axis_slices(col_ops, 1, yh, yl, HC, TN)
        else:
            yh, yl = yh[:, HC: HC + TN], yl[:, HC: HC + TN]
        return yh, yl

    slab_dma(0, 0).start()

    def sub_iter(si, sslot):
        @pl.when(si + 1 < nslabs)
        def _():
            slab_dma(si + 1, 1 - sslot).start()

        slab_dma(si, sslot).wait()
        W = win[sslot]  # (2, nplanes, TM+2HR, TN+2HC)

        @pl.when(si >= 2)
        def _():
            out_dma(si - 2, sslot).wait()

        # each input plane's conv computed once per slab, per buffered
        # term (per-plane stores: stacking into a dynamic store recreates
        # the interpret-mode compile blowup, CLAUDE.md)
        for b, t_idx in enumerate(buffered_idx):
            for jj in range(nplanes):
                ch, cl = conv_plane_pair(t_idx, W[0, jj], W[1, jj])
                convbuf[b, 0, jj] = ch
                convbuf[b, 1, jj] = cl

        for j in range(slab):
            acc_h = acc_l = None

            def accum(ph, pl_):
                nonlocal acc_h, acc_l
                acc_h, acc_l = ((ph, pl_) if acc_h is None
                                else df_add(acc_h, acc_l, ph, pl_))

            for t_idx in center_idx:
                accum(*conv_plane_pair(t_idx, W[0, j + r], W[1, j + r]))
            for b, t_idx in enumerate(buffered_idx):
                for kind, dz, w4 in terms_plan[t_idx][0]:
                    if kind == "pair":
                        zh, zl = df_add(
                            convbuf[b, 0, j + r + dz],
                            convbuf[b, 1, j + r + dz],
                            convbuf[b, 0, j + r - dz],
                            convbuf[b, 1, j + r - dz])
                        accum(*_pair_scale(zh, zl, w4))
                    else:
                        accum(*_pair_scale(convbuf[b, 0, j + r + dz],
                                           convbuf[b, 1, j + r + dz],
                                           w4))
            def wslice(jj, dr, dc):
                sl = (slice(HR + dr, HR + dr + TM),
                      slice(HC + dc, HC + dc + TN))
                return W[0, jj][sl], W[1, jj][sl]

            for t_idx in identity_idx:
                for kind, dz, w4 in terms_plan[t_idx][0]:
                    if kind == "pair":
                        ph0, pl0 = wslice(j + r + dz, 0, 0)
                        ph1, pl1 = wslice(j + r - dz, 0, 0)
                        zh, zl = df_add(ph0, pl0, ph1, pl1)
                        accum(*_pair_scale(zh, zl, w4))
                    else:
                        vh, vl = wslice(j + r + dz, 0, 0)
                        accum(*_pair_scale(vh, vl, w4))
            for kind, off, w4 in res_plan:
                dz, dr, dc = off
                if kind == "pair":
                    ph0, pl0 = wslice(j + r + dz, dr, dc)
                    ph1, pl1 = wslice(j + r - dz, -dr, -dc)
                    zh, zl = df_add(ph0, pl0, ph1, pl1)
                    accum(*_pair_scale(zh, zl, w4))
                else:
                    vh, vl = wslice(j + r + dz, dr, dc)
                    accum(*_pair_scale(vh, vl, w4))
            if acc_h is None:
                acc_h = acc_l = jnp.zeros((TM, TN), jnp.float32)
            zz = si * slab + j
            zok = ((zz >= b_zlo) & (zz < b_zhi)).astype(jnp.float32)
            msk = rcm * zok
            out_sl[sslot, 0, j] = acc_h * msk
            out_sl[sslot, 1, j] = acc_l * msk

        out_dma(si, sslot).start()

        @pl.when(si == nslabs - 1)
        def _():
            out_dma(si, sslot).wait()

        @pl.when((si == nslabs - 1) & (nslabs >= 2))
        def _():
            out_dma(si - 1, 1 - sslot).wait()

    def pair_iter(bi, _):
        si0 = bi * 2
        sub_iter(si0, 0)

        @pl.when(si0 + 1 < nslabs)
        def _():
            sub_iter(si0 + 1, 1)

        return 0

    jax.lax.fori_loop(0, pl.cdiv(nslabs, 2), pair_iter, 0)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "interpret"),
)
def df64_3d_step(
    cur2: jax.Array,
    donor2: jax.Array,
    spec: StencilSpec,
    layout: Layout3D,
    interpret: bool = False,
    bounds: "jax.Array | None" = None,
) -> jax.Array:
    """One df64 3-D stencil step on stacked (2, Hp, Mp, Np) fp32 pairs.

    ``donor2`` is the zero-ringed spare buffer (aliased to the output).
    ``bounds`` (optional, (4,) or (6,) int32): dynamic global-interior
    bounds in local coordinates (ghost boundaries pass 6 with a z
    range)."""
    layout.validate()
    assert cur2.ndim == 4 and cur2.shape[0] == 2, cur2.shape
    assert cur2.dtype == jnp.float32
    assert layout.zguard >= spec.radius
    TM, TN = layout.tile
    H = layout.interior[0]
    r = spec.radius
    for t in spec.terms:
        if t.taps[0] is not None and len(t.taps[0]) > 2 * r + 1:
            raise ValueError("z taps longer than the spec radius allows")
    if interpret and layout.grid == (1, 1):
        raise ValueError(
            "df64 interpret mode needs a >= 2-tile plane grid (single-"
            "tile grids hit an XLA:CPU compile blowup); split the tile "
            "or use backend='xla'")
    plan = _sep_plan(spec)
    buffered_idx, _, _ = _classify_terms(spec)
    n_buf = max(1, len(buffered_idx))
    # pair state doubles both the window and the conv-buffer bytes
    slab = pick_slab(H, TM, TN, dtype_bytes=8, radius=r,
                     acc_bytes=8 * n_buf)
    nplanes = slab + 2 * r
    kernel = functools.partial(
        _df64_3d_kernel,
        spec=spec, layout=layout, plan=plan, slab=slab,
        has_bounds=bounds is not None,
    )
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        kernel,
        grid=layout.grid,
        out_shape=jax.ShapeDtypeStruct(cur2.shape, cur2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + bounds_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, nplanes, TM + 2 * SUBLANE, TN + 2 * LANE),
                       jnp.float32),
            pltpu.VMEM((n_buf, 2, nplanes, TM, TN), jnp.float32),
            pltpu.VMEM((2, 2, slab, TM, TN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
    )(cur2, donor2, *bounds_args)


def _vmem_limit() -> int:
    from .pallas_2d import vmem_limit_bytes

    return vmem_limit_bytes()
