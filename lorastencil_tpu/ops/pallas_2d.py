"""2-D low-rank stencil Pallas kernel.

TPU-native re-design of the reference's 2-D tensor-core engines
(``/root/reference/src/2d/gpu.cu:31-273``): each rank-1 term of the
coefficient matrix is a column-axis conv then a row-axis conv, the sparse
residue is shifted adds, and one-sided star terms skip the identity axis
entirely.  There is no analog of the CUDA fragment-relayout /
V2-permutation tricks -- chaining the per-axis convs through VMEM values
is native on TPU (SURVEY.md section 0, closing note).

Compute algorithms (see PERF.md for measurements and accuracy):

  * 'vpu_roll': (8,128)-aligned cyclic-roll multiply-adds at the fixed
    window extent -- exact fp32, fastest exact path for residue-bearing
    and rank-3 shapes;
  * 'mxu_hybrid3': separable terms as 3-pass split-bf16 banded MXU
    GEMMs (exact-fp32-grade) with the residue + mask co-issued on the
    VPU as rolls -- fastest exact path for MXU-friendly shapes;
  * 'mxu_hybrid': the 2-pass variant (~6e-6/step), the fast tier;
  * 'vpu': statically shifted slice multiply-adds (exact fp32);
  * 'mxu_split': ALL terms incl. the residue (peeled to separable
    form) as 2-pass split GEMMs (~6e-6/step);
  * 'mxu': banded MXU matmuls at a Mosaic precision (the most literal
    analog of the reference's DMMA formulation).

Per grid step (one (TM, TN) output tile):

  1. async-DMA the halo'd input window from HBM to VMEM, double-buffered
     ahead of compute (replaces the reference's cp.async shared-memory
     staging, ``src/2d/gpu.cu:37-50``).  TPU DMA slices must be
     (8, 128)-aligned in offset and size, so the window halo is the
     layout's guard band rather than the stencil radius;
  2. apply ``fused_steps`` timesteps in VMEM, shrinking the compute
     extent by the radius per substep (the reference fuses steps only in
     the coefficient domain; in-VMEM fusion is what beats the HBM
     roofline on TPU);
  3. after every substep, mask cells outside the global interior to zero
     (reference halo-decay semantics + tile round-up guard; dynamic
     bounds when domain-decomposed);
  4. async-DMA the tile to the output buffer, drained lazily.

The output buffer is the *donated* spare buffer whose guard ring is zero,
so halo cells decay to zero after the first step exactly like the
reference's zero-initialized ping-pong buffers (``src/2d/gpu.cu:396-400``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import SeparableTerm, StencilSpec
from ..models.factorize import banded_matrix
from .band_gemm import (apply_residue_mxu_extent, apply_spec_hybrid1,
                        apply_spec_vpu, apply_spec_vpu_rolled,
                        apply_spec_vpu_rolled_extent, apply_terms_mxu_split,
                        bf16_matrix_parts, plane_conv, residue_mxu_groups,
                        split_bf16, term_band_mats)
from .layout import LANE, SUBLANE, Layout2D


def skew_stride(radius: int) -> int:
    """Level-to-level frontier lag of the time-skewed kernel: the
    radius rounded up to a sublane (one definition, shared by the
    engine's layout construction and the kernel's validation)."""
    return SUBLANE * (-(-radius // SUBLANE))


def _unpack_res_mxu(mat_refs, start, meta):
    """Bind the residue-group matrix refs appended after the per-term
    parts (wire format: ``meta`` = ((n_parts, rc, drs), ...))."""
    groups = []
    for (npar, rrc, drs) in meta:
        groups.append(
            (tuple(mat_refs[start + i][:] for i in range(npar)), rrc, drs))
        start += npar
    return tuple(groups), start


def _unpack_band_mats(mat_refs, mats_meta, mxu_axis):
    """Per-term banded matrix parts for the hybrid1 kernels' MXU axis
    (wire format: A parts then B parts per ``mats_meta`` entry)."""
    band_mats = []
    mi = 0
    for (na, _rr, nb, _rc) in mats_meta:
        if mxu_axis == "col":
            mats_t = (tuple(mat_refs[mi + na + i][:] for i in range(nb))
                      if nb else None)
        else:
            mats_t = (tuple(mat_refs[mi + i][:] for i in range(na))
                      if na else None)
        band_mats.append(mats_t)
        mi += na + nb
    return band_mats


@functools.lru_cache(maxsize=None)
def _residue_only(residue):
    return _ResidueOnly(residue=residue)


class _ResidueOnly:
    """Spec view with terms stripped (hybrid path: residue on the VPU)."""

    terms = ()

    def __init__(self, residue):
        self.residue = residue


class _TermsView:
    """Static term/residue view for the hybrid1 kernels: the spec's
    terms plus the residue's peeled separable terms (stream-assigned
    col->MXU / row->VPU), with only the unpeelable leftover residue."""

    def __init__(self, terms, residue):
        self.terms = terms
        self.residue = residue


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
    algorithm,
    fused_steps,
    has_bounds,
    depth,
    region,
    bf16_state,
    h1_view=None,
    res_mxu_meta=(),
    residue_vpu=None,
):
    # mats_meta entries: (n_A_parts, rr, n_B_parts, rc); 0 parts =
    # identity axis.  mat_args order: A parts then B parts per term,
    # then res_mxu_meta's (n_parts, rc, drs) residue-group col matrices.
    n_mats = (sum(na + nb for na, _, nb, _ in mats_meta)
              + sum(npar for npar, _, _ in res_mxu_meta))
    bounds_ref = None
    rest = mat_refs_and_out
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    mat_refs = rest[:n_mats]
    out_hbm = rest[n_mats]
    win = rest[n_mats + 1]      # (2, TM+2HR, TN+2HC) dbl-buffered
    out_tile = rest[n_mats + 2]  # (2, TM, TN) dbl-buffered
    work = rest[n_mats + 3]      # (2, ...) fused-substep staging
    sem_in = rest[n_mats + 4]    # (2,)
    sem_out = rest[n_mats + 5]   # (2,)

    # residue-group col matrices (MXU residue offload, bf16 tier): the
    # refs after the per-term parts, grouped per res_mxu_meta entry
    res_mxu, _ = _unpack_res_mxu(
        mat_refs, sum(na + nb for na, _, nb, _ in mats_meta),
        res_mxu_meta)

    TM, TN = layout.tile
    m, n = layout.interior
    r0, c0 = layout.origin
    # DMA-alignment window halo (>= fused_steps*radius; (8, 128)-aligned)
    HR, HC = layout.guard

    # region = ((ti0, ti1), (tj0, tj1)): the tile-index window this call
    # owns (a sub-rectangle of the full grid -- used by the overlapped
    # sharded engine to split interior and boundary work).
    (ti0, ti1), (tj0, tj1) = region
    rw = tj1 - tj0
    total = (ti1 - ti0) * rw
    ti = ti0 + pl.program_id(0)
    tj = tj0 + pl.program_id(1)
    idx = pl.program_id(0) * rw + pl.program_id(1)  # last dim innermost
    slot = jax.lax.rem(idx, jnp.int32(depth)) if depth >= 2 else 0

    def in_dma(t_i, t_j, s):
        return pltpu.make_async_copy(
            in_hbm.at[
                pl.ds(r0 + t_i * TM - HR, TM + 2 * HR),
                pl.ds(c0 + t_j * TN - HC, TN + 2 * HC),
            ],
            win.at[s],
            sem_in.at[s],
        )

    def out_dma(t_i, t_j, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[pl.ds(r0 + t_i * TM, TM), pl.ds(c0 + t_j * TN, TN)],
            sem_out.at[s],
        )

    # software pipeline: prefetch windows depth-1 tiles ahead of compute,
    # drain output writes lazily (the TPU analog of the reference's
    # cp.async double buffering, src/2d/gpu.cu:37-50; depth > 2 keeps
    # more transfers in flight for latency-bound DMA chains).
    if depth >= 2:
        for p in range(min(depth - 1, total)):
            @pl.when(idx == 0)
            def _prologue(p=p):
                in_dma(ti0 + p // rw, tj0 + p % rw, p % depth).start()

        nidx = idx + depth - 1
        nti = ti0 + jax.lax.div(nidx, jnp.int32(rw))
        ntj = tj0 + jax.lax.rem(nidx, jnp.int32(rw))

        @pl.when(nidx < total)
        def _prefetch():
            in_dma(nti, ntj, jax.lax.rem(nidx, jnp.int32(depth))).start()
    else:
        in_dma(ti, tj, slot).start()

    in_dma(ti, tj, slot).wait()

    X = win[pl.ds(slot, 1)][0]
    r = spec.radius

    if has_bounds:
        # dynamic global-interior bounds in local coordinates (sharded
        # fused runs: interior devices must NOT mask ring-region
        # intermediates that hold exchanged neighbor data)
        b_rlo, b_rhi = bounds_ref[0], bounds_ref[1]
        b_clo, b_chi = bounds_ref[2], bounds_ref[3]
    else:
        b_rlo, b_rhi, b_clo, b_chi = 0, m, 0, n

    def mask_to_interior(val, er, ec, final=False):
        """Zero cells outside the true global interior (reference halo
        decay + tile round-up guard), on an extent-(er, ec) array.
        Separable (R,1)x(1,C) float masks: two broadcast multiplies,
        no full-size integer temporaries (VMEM).

        ``final``: this is the last substep, whose result is sliced to
        the (TM, TN) tile before the store -- when an axis's interior
        exactly divides the tile (no round-up cells) and bounds are
        static, that axis's mask is a no-op on the surviving cells and
        is elided (halo decay comes from the zero-ringed donor buffer,
        not the mask, at the final level)."""
        skip_r = final and not has_bounds and m % TM == 0
        skip_c = final and not has_bounds and n % TN == 0
        if skip_r and skip_c:
            return val
        R, C = TM + 2 * er, TN + 2 * ec
        if not skip_r:
            gr = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                  + ti * TM - er)
            val = val * ((gr >= b_rlo) & (gr < b_rhi)).astype(val.dtype)
        if not skip_c:
            gc = (jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
                  + tj * TN - ec)
            val = val * ((gc >= b_clo) & (gc < b_chi)).astype(val.dtype)
        return val

    # bf16 STATE (throughput tier): the HBM round trip is half the
    # bytes; compute still runs in fp32 in VMEM (out-tile stores round
    # back to bf16 -- ~4e-3/step storage rounding, documented in PERF)
    if X.dtype == jnp.bfloat16:
        X = X.astype(jnp.float32)

    if algorithm in ("vpu_roll", "mxu_hybrid1", "mxu_hybrid1r"):
        # cyclic-roll convolutions at the FIXED full window extent: every
        # shifted operand is (8, 128)-aligned, and the roll-wrap garbage
        # creeps <= radius per substep into the guard margin (see
        # band_gemm.apply_spec_vpu_rolled).  Substeps ping-pong through
        # full-extent VMEM scratch; the final interior slice is aligned
        # (HR % 8 == 0, HC == 128) and fuses into the out-tile store.
        # 'mxu_hybrid1' offloads the column convs to the MXU (state split
        # to full exactness depth) and keeps row convs + residue on the
        # VPU -- the streams co-issue, and both are lighter than either
        # single-stream exact path (round-2 VERDICT item 1).
        cur = X
        for s in range(fused_steps):
            if algorithm in ("mxu_hybrid1", "mxu_hybrid1r"):
                mxu_axis = "col" if algorithm == "mxu_hybrid1" else "row"
                xs = ((cur.astype(jnp.bfloat16),) if bf16_state
                      else split_bf16(cur, 3))
                band_mats = _unpack_band_mats(mat_refs, mats_meta,
                                              mxu_axis)
                val = apply_spec_hybrid1(cur, xs, h1_view, band_mats,
                                         mxu_axis=mxu_axis,
                                         res_mxu=res_mxu)
            else:
                val = apply_spec_vpu_rolled(cur, spec)
            val = mask_to_interior(val, HR, HC,
                                   final=(s == fused_steps - 1))
            if s < fused_steps - 1:
                work[s % 2] = val
                cur = work[s % 2]
            else:
                cur = val[HR: HR + TM, HC: HC + TN]
        acc = cur
    elif (algorithm in ("vpu", "mxu_split", "mxu_hybrid", "mxu_hybrid3")
          or fused_steps > 1):
        # k fused timesteps per HBM round trip: shrink the compute extent
        # by the radius per substep, masking intermediates to the global
        # interior so the reference's halo-decay semantics hold exactly.
        # Each substep materializes into ping-pong VMEM scratch so Mosaic
        # does not keep every unrolled substep's temporaries live at once
        # (that blows the 16M scoped-vmem budget for k >= 4).
        if algorithm.startswith("mxu_"):
            split_mats = []
            mi = 0
            for (na, rr, nb, rc) in mats_meta:
                Aparts = tuple(mat_refs[mi + i][:] for i in range(na))
                mi += na
                Bparts = tuple(mat_refs[mi + i][:] for i in range(nb))
                mi += nb
                split_mats.append((Aparts, Bparts, rr, rc))
        cur = X
        e_in = (HR, HC)
        for s in range(fused_steps):
            left = fused_steps - 1 - s
            e_out = (left * r, left * r)
            if algorithm in ("mxu_split", "mxu_hybrid", "mxu_hybrid3"):
                # bf16-state runs need only ONE part (the state has no
                # low bits to split off) -- halved matmul count
                xs = ((cur.astype(jnp.bfloat16),) if bf16_state else
                      split_bf16(cur, 3 if algorithm == "mxu_hybrid3"
                                 else 2))
                val = apply_terms_mxu_split(xs, split_mats, e_in, e_out,
                                            TM, TN)
                if res_mxu:
                    # MXU residue offload (bf16 tier): shared banded
                    # col matmuls + row-shifted adds per group
                    rv = apply_residue_mxu_extent(xs, res_mxu,
                                                  e_in, e_out, TM, TN)
                    if rv is not None:
                        val = val + rv
                vpu_res = (residue_vpu if residue_vpu is not None
                           else spec.residue)
                if algorithm.startswith("mxu_hybrid") and vpu_res:
                    # residue rides on the VPU as cyclic rolls; Mosaic
                    # co-issues it with the MXU matmuls above (measured:
                    # interleaved MXU+VPU beats either stream alone)
                    val = val + apply_spec_vpu_rolled_extent(
                        cur, _residue_only(vpu_res),
                        e_in, e_out, TM, TN)
            else:
                val = apply_spec_vpu(cur, spec, e_in, e_out, TM, TN)
            val = mask_to_interior(val, *e_out,
                                   final=(s == fused_steps - 1))
            if s < fused_steps - 1:
                R, C = TM + 2 * e_out[0], TN + 2 * e_out[1]
                work[s % 2, :R, :C] = val
                cur = work[s % 2, :R, :C]
            else:
                cur = val
            e_in = e_out
        acc = cur
    else:
        acc = jnp.zeros((TM, TN), dtype=jnp.float32)
        # separable terms as chunked banded GEMMs on the MXU
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
        # sparse residue: statically shifted window slices on the VPU
        for (dr, dc), w in spec.residue:
            acc = acc + w * X[
                HR + dr: HR + dr + TM, HC + dc: HC + dc + TN
            ].astype(jnp.float32)
        acc = mask_to_interior(acc, 0, 0, final=True)

    if depth >= 2:
        # before reusing this out slot, drain the write started depth
        # tiles ago
        @pl.when(idx >= depth)
        def _drain_prev():
            pti = ti0 + jax.lax.div(idx - depth, jnp.int32(rw))
            ptj = tj0 + jax.lax.rem(idx - depth, jnp.int32(rw))
            out_dma(pti, ptj, slot).wait()

        out_tile[pl.ds(slot, 1)] = acc.astype(out_tile.dtype)[None]
        out_dma(ti, tj, slot).start()

        # epilogue: drain the last min(depth, total) outstanding writes
        for q in range(depth):
            @pl.when((idx == total - 1) & (total >= q + 1))
            def _drain_tail(q=q):
                pti = ti0 + jax.lax.div(idx - q, jnp.int32(rw))
                ptj = tj0 + jax.lax.rem(idx - q, jnp.int32(rw))
                out_dma(pti, ptj,
                        jax.lax.rem(idx - q, jnp.int32(depth))).wait()
    else:
        out_tile[pl.ds(slot, 1)] = acc.astype(out_tile.dtype)[None]
        o = out_dma(ti, tj, slot)
        o.start()
        o.wait()


def _build_mxu_mats(spec, algorithm, np_dtype, residue_mxu):
    """Banded-matrix operand build for the mxu_* algorithms.

    Returns ``(eff_terms, h1_residue, mats_meta, mat_args,
    res_mxu_meta)``: the effective separable terms (spec terms plus any
    peeled residue terms), the residue left on the VPU, per-term part
    counts/radii, the bf16-split matrix operands in kernel order, and
    the residue-offload group metadata.  Shared by ``stencil2d_step``
    and the time-skewed kernel, which must bind identical operands.
    """
    from ..models import factorize

    eff_terms = list(spec.terms)
    h1_residue = spec.residue
    mats_meta = []
    mat_args = []
    res_mxu_meta = ()
    if spec.residue and algorithm == "mxu_split":
        # convert the sparse residue into separable terms (greedy
        # max-pivot peel); star2d1r's 8-point residue is rank 3.
        # NOT used by the hybrid1 variants: an MXU banded matmul
        # costs ~134 MACs/cell per stream REGARDLESS of tap
        # sparsity, so peeled residue streams quadruple the MXU
        # work to replace ~6 VPU ops -- measured 54 -> 34 GCells/s
        # on the flagship (round 4); hybrid1 keeps the residue as
        # grouped VPU rolls.
        full = 2 * spec.radius + 1
        Rm = np.zeros((full, full))
        for off, w in spec.residue:
            Rm[spec.radius + off[0], spec.radius + off[1]] += w
        pr = factorize.greedy_peel(Rm, max_rank=6)
        if np.abs(pr.residual).max() > 1e-12:
            raise ValueError(
                "residue not separable within rank 6; use "
                "algorithm='vpu'")

        def norm_taps(t):
            # centered delta == identity axis: skip its matmul
            t = np.asarray(t, np.float64)
            d = np.zeros_like(t)
            d[t.size // 2] = 1.0
            return None if np.array_equal(t, d) else tuple(t)

        eff_terms += [
            SeparableTerm(taps=(norm_taps(u), norm_taps(v)))
            for u, v in pr.terms
        ]
    # split each banded matrix into as many bf16 parts as needed to
    # represent its fp32 values exactly, capped at the state split
    # depth (integer reference taps: 1 part; arbitrary reals: up to
    # 3 for the exact-grade tiers).  The hybrid1 variants use only
    # one axis's matrices (col for 'mxu_hybrid1', row for '...1r');
    # the other axis runs on the VPU, so its parts are not built.
    max_parts = (3 if algorithm in ("mxu_hybrid1", "mxu_hybrid1r",
                                    "mxu_hybrid3") else 2)
    # how many terms' column convs ride the MXU stream under
    # 'mxu_hybrid1' (LORASTENCIL_H1_MXU_TERMS overrides).  Few-term
    # specs and bf16 state put every column conv there.  Many-term
    # (box) EXACT-fp32 specs saturate: each extra stream costs 3
    # bf16-split matmul passes, measured (8192^2, round 5)
    # 51.0 / 48.7 / 35.1 GCells/s at cap 1/2/3 -- cap 1 also beats
    # all-VPU vpu_roll (49.8).  bf16 state needs only ONE part per
    # stream, so deeper offload keeps winning: 62.4 / 74.4 / 88.3
    # at cap 1/2/3 (every VPU col conv removed relieves the binding
    # VPU stream) -> no cap.
    n_col_terms = sum(1 for t in eff_terms if t.taps[1] is not None)
    exact_split = np_dtype != np.dtype(jnp.bfloat16)
    default_cap = 1 if (exact_split and n_col_terms > 2) else 99
    h1_cap = int(os.environ.get("LORASTENCIL_H1_MXU_TERMS",
                                str(default_cap)))
    h1_built = 0
    for term in eff_terms:
        A, B = term_band_mats(term, np.float64)
        if algorithm == "mxu_hybrid1":
            A = None
            if h1_built >= h1_cap:
                B = None  # mixed assignment: this term stays VPU
            elif B is not None:
                h1_built += 1
        elif algorithm == "mxu_hybrid1r":
            B = None
        row_taps, col_taps = term.taps
        rr = (len(row_taps) - 1) // 2 if row_taps is not None else 0
        rc = (len(col_taps) - 1) // 2 if col_taps is not None else 0
        aparts = (bf16_matrix_parts(A, max_parts)
                  if A is not None else [])
        bparts = (bf16_matrix_parts(B, max_parts)
                  if B is not None else [])
        mats_meta.append((len(aparts), rr, len(bparts), rc))
        mat_args.extend(aparts)
        mat_args.extend(bparts)
    if (residue_mxu and h1_residue
            and algorithm in ("mxu_hybrid", "mxu_hybrid1")):
        # residue offload: tap-sharing row-offset groups become
        # extra banded col-matmul streams; the remainder stays on
        # the VPU rolls (see band_gemm.residue_mxu_groups)
        groups, rest_pts = residue_mxu_groups(h1_residue)
        for drs, gtaps, grc in groups:
            Bg = banded_matrix(gtaps, LANE, dtype=np.float64)
            parts = bf16_matrix_parts(Bg, max_parts)
            res_mxu_meta += ((len(parts), grc, drs),)
            mat_args.extend(parts)
        if groups:
            h1_residue = rest_pts
    return eff_terms, h1_residue, mats_meta, mat_args, res_mxu_meta


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "compute_dtype", "precision",
                     "interpret", "algorithm", "fused_steps", "region",
                     "residue_mxu"),
)
def stencil2d_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout2D,
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    algorithm: str = "mxu",
    fused_steps: int = 1,
    bounds: "jax.Array | None" = None,
    region=None,
    residue_mxu: bool = False,
) -> jax.Array:
    """``fused_steps`` timesteps on the internal layout in one kernel.

    ``donor`` is consumed (donated) as the output buffer; its guard ring
    must already be zero and is preserved (the kernel writes interior
    tiles only).  ``algorithm`` picks banded MXU GEMMs ('mxu') or exact
    fp32 VPU shift-adds ('vpu'); fused_steps > 1 requires 'vpu' and
    ``layout.guard[0] >= fused_steps * radius``.

    ``residue_mxu`` (static): offload tap-sharing residue groups to the
    MXU as banded col matmuls + row-shifted adds ('mxu_hybrid' /
    'mxu_hybrid1' only; the engine enables it for the bf16 tier, where
    one state part makes the extra streams nearly free and the relieved
    VPU residue stream is the binder -- PERF.md round-6).
    """
    layout.validate()
    TM, TN = layout.tile
    if algorithm not in ("vpu", "vpu_roll", "mxu", "mxu_split",
                         "mxu_hybrid", "mxu_hybrid1", "mxu_hybrid1r",
                         "mxu_hybrid3"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}; expected 'vpu', 'vpu_roll', "
            f"'mxu', 'mxu_split', 'mxu_hybrid', 'mxu_hybrid1', "
            f"'mxu_hybrid1r' or 'mxu_hybrid3'")
    if fused_steps > 1 and algorithm == "mxu":
        raise ValueError(
            "temporal fusion (fused_steps > 1) needs algorithm='vpu', "
            "'vpu_roll', 'mxu_split', 'mxu_hybrid' or 'mxu_hybrid3'")
    if (layout.guard[0] < fused_steps * spec.radius
            or layout.guard[1] < fused_steps * spec.radius):
        raise ValueError(
            f"fused_steps={fused_steps} needs a guard of "
            f">= {fused_steps * spec.radius} cells per axis; layout has "
            f"{layout.guard} (max fused_steps here: "
            f"{min(layout.guard) // max(1, spec.radius)})")
    np_dtype = np.dtype(cur.dtype)
    mats_meta = []
    mat_args = []
    res_mxu_meta = ()
    if algorithm == "mxu":
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
    elif algorithm.startswith("mxu_"):
        (eff_terms, h1_residue, mats_meta, mat_args,
         res_mxu_meta) = _build_mxu_mats(spec, algorithm, np_dtype,
                                         residue_mxu)
    mats_meta = tuple(mats_meta)

    grid = layout.grid
    if region is not None:
        (ti0, ti1), (tj0, tj1) = region
        assert 0 <= ti0 < ti1 <= grid[0] and 0 <= tj0 < tj1 <= grid[1]
        call_grid = (ti1 - ti0, tj1 - tj0)
    else:
        call_grid = grid
    HR, HC = layout.guard
    # double-buffer the window + output DMAs whenever the buffers fit the
    # scoped-VMEM budget, so transfers hide under compute even for fused
    # kernels (round 1 single-buffered all fused kernels: ~14% of wall
    # time was exposed DMA at the 8192^2 headline config).
    itemsize = np_dtype.itemsize
    full_extent = algorithm in ("vpu_roll", "mxu_hybrid1", "mxu_hybrid1r")
    work_rows = (TM + 2 * HR if full_extent
                 else TM + 2 * (fused_steps - 1) * spec.radius)
    work_cols = (TN + 2 * HC if full_extent
                 else TN + 2 * (fused_steps - 1) * spec.radius)
    win_bytes = (TM + 2 * HR) * (TN + 2 * HC) * itemsize
    out_bytes = TM * TN * itemsize
    work_bytes = (2 * work_rows * work_cols * itemsize
                  if fused_steps > 1 else 0)
    # buffer depth: how many window/output DMA slots stay in flight.
    # Depth 2 (classic double buffering) is the measured optimum; deeper
    # pipelines are available via LORASTENCIL_DMA_DEPTH for latency
    # experiments.  Leave ~40% of the scoped-VMEM ceiling for compute
    # transients.
    want_depth = int(os.environ.get("LORASTENCIL_DMA_DEPTH", "2"))
    budget = int(vmem_limit_bytes() * 0.6)

    def fits(d):
        return d * (win_bytes + out_bytes) + work_bytes <= budget

    depth = 1
    for d in range(2, want_depth + 1):
        if fits(d):
            depth = d
    if depth == 1 and want_depth >= 2 and fused_steps == 1:
        depth = 2  # k=1 buffers always fit the classic budget

    h1_view = None
    if algorithm in ("mxu_hybrid1", "mxu_hybrid1r"):
        h1_view = _TermsView(tuple(eff_terms), tuple(h1_residue))
    kernel = functools.partial(
        _stencil2d_kernel,
        spec=spec,
        layout=layout,
        mats_meta=mats_meta,
        h1_view=h1_view,
        compute_dtype=compute_dtype,
        precision=precision,
        algorithm=algorithm,
        fused_steps=fused_steps,
        has_bounds=bounds is not None,
        depth=depth,
        region=region if region is not None
        else ((0, grid[0]), (0, grid[1])),
        bf16_state=np_dtype == np.dtype(jnp.bfloat16),
        res_mxu_meta=res_mxu_meta,
        residue_vpu=(tuple(h1_residue) if res_mxu_meta else None),
    )
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        kernel,
        grid=call_grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + bounds_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((depth, TM + 2 * HR, TN + 2 * HC), cur.dtype),
            pltpu.VMEM((depth, TM, TN), cur.dtype),
            pltpu.VMEM(
                (2, work_rows, work_cols)
                if fused_steps > 1 else (1, SUBLANE, LANE),
                # vpu substeps accumulate in fp32 (fp64 under x64
                # interpret; bf16 state upcasts in-kernel)
                cur.dtype if np_dtype == np.float64 else jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((max(depth, 1),)),
            pltpu.SemaphoreType.DMA((max(depth, 1),)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes()),
    )(cur, donor, *bounds_args, *mat_args)


def _stencil2d_skew_kernel(
    # inputs
    in_hbm,
    donor_hbm,  # aliased to out; never read
    *mat_refs_and_out,
    # static
    spec: StencilSpec,
    layout: Layout2D,
    mats_meta,
    algorithm,
    skew_steps,
    s_skew,
    ni,
    bf16_state,
    h1_view=None,
    res_mxu_meta=(),
):
    """Time-skewed row-band streaming: ``skew_steps`` timesteps per HBM
    round trip with ZERO in-plane recompute (the extent-fused path
    recomputes guard regions every substep -- the VPU binder for
    residue-bearing specs, PERF.md).

    Bands of B rows stream top-to-bottom per column tile; level j's
    frontier lags level j-1 by ``s_skew`` rows (s >= radius, sublane
    multiple), so each level-j stripe is computed exactly once from the
    previous level's buffered rows.  Per level, a VMEM buffer of
    B + 2s rows carries the 2s-row overlap between consecutive bands;
    level 0 re-reads its 2s-row overlap from HBM instead (6% extra
    input traffic, no carry dependency).  The rolled/hybrid conv runs
    at the fixed (B+2s, Wc) extent -- aligned operands, wrap garbage
    creeps <= radius per level into the s-row margin and <= k*radius
    into the 128-col guard, and the extracted stripe [s, s+B) is always
    valid (s >= radius).  The analog in the CUDA literature is
    trapezoid/wavefront time tiling; the reference fuses steps only in
    the coefficient domain (/root/reference/src/1d/main.cu:77-78).
    """
    k = skew_steps
    s = s_skew
    n_mats = (sum(na + nb for na, _, nb, _ in mats_meta)
              + sum(npar for npar, _, _ in res_mxu_meta))
    rest = mat_refs_and_out
    mat_refs = rest[:n_mats]
    out_hbm = rest[n_mats]
    L0 = rest[n_mats + 1]        # (2, B+2s, Wc) dbl-buffered input bands
    Lmid = rest[n_mats + 2]      # (k-1, B+2s, Wc) per-level carries
    out_tile = rest[n_mats + 3]  # (2, B, TN) dbl-buffered output
    sem_in = rest[n_mats + 4]    # (2,)
    sem_out = rest[n_mats + 5]   # (2,)

    res_mxu, _ = _unpack_res_mxu(
        mat_refs, sum(na + nb for na, _, nb, _ in mats_meta),
        res_mxu_meta)

    B, TN = layout.tile
    m, n = layout.interior
    r0, c0 = layout.origin
    HR, HC = layout.guard
    Wc = TN + 2 * HC

    tj = pl.program_id(0)   # column tile OUTER
    i = pl.program_id(1)    # row band INNER (carries are row-adjacent)
    grid_cols = pl.num_programs(0)
    total = grid_cols * ni
    idx = tj * jnp.int32(ni) + i

    def ti_of(lin):
        return jax.lax.rem(lin, jnp.int32(ni))

    def tj_of(lin):
        return jax.lax.div(lin, jnp.int32(ni))

    def in_dma(lin):
        # band lin's input rows [i*B - 2s, i*B + B): the 2s-row overlap
        # with the previous band is re-read (no level-0 carry)
        return pltpu.make_async_copy(
            in_hbm.at[
                pl.ds(r0 + ti_of(lin) * B - 2 * s, B + 2 * s),
                pl.ds(c0 + tj_of(lin) * TN - HC, Wc),
            ],
            L0.at[jax.lax.rem(lin, jnp.int32(2))],
            sem_in.at[jax.lax.rem(lin, jnp.int32(2))],
        )

    def out_dma(lin):
        # the output stripe lags the input band by k*s rows; at i=0 it
        # starts at stored row r0 - k*s >= 0 and re-zeroes the top guard
        return pltpu.make_async_copy(
            out_tile.at[jax.lax.rem(lin, jnp.int32(2))],
            out_hbm.at[
                pl.ds(r0 + ti_of(lin) * B - k * s, B),
                pl.ds(c0 + tj_of(lin) * TN, TN),
            ],
            sem_out.at[jax.lax.rem(lin, jnp.int32(2))],
        )

    @pl.when(idx == 0)
    def _prologue():
        in_dma(idx).start()

    in_dma(idx).wait()

    @pl.when(idx + 1 < total)
    def _prefetch():
        in_dma(idx + 1).start()

    # per-level carries: the 2s-row tail of the previous band's stripe
    # becomes the head overlap (fresh column tile starts from zero --
    # rows above the first stripe are outside the interior)
    for lv in range(k - 1):
        @pl.when(i == 0)
        def _zero_carry(lv=lv):
            Lmid[lv, : 2 * s] = jnp.zeros((2 * s, Wc), Lmid.dtype)

        @pl.when(i > 0)
        def _carry(lv=lv):
            Lmid[lv, : 2 * s] = Lmid[lv, B: B + 2 * s]

    def mask_in_place(read, write, row0, col0, C):
        """Conditionally zero out-of-interior cells of a just-stored
        (B, C) stripe whose top-left cell is global (row0, col0) --
        reference halo-decay + round-up-guard semantics.  Most bands
        and column tiles are fully interior, so each axis's mask (and
        its VMEM round trip) runs under a ``pl.when`` predicate only on
        edge stripes -- the dynamic analog of the extent kernel's
        static divisible-axis mask elision."""
        @pl.when((row0 < 0) | (row0 + jnp.int32(B) > m))
        def _mask_rows():
            v = read()
            gr = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) + row0
            write(v * ((gr >= 0) & (gr < m)).astype(v.dtype))

        @pl.when((col0 < 0) | (col0 + jnp.int32(C) > n))
        def _mask_cols():
            v = read()
            gc = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + col0
            write(v * ((gc >= 0) & (gc < n)).astype(v.dtype))

    if algorithm == "mxu_hybrid1":
        band_mats = _unpack_band_mats(mat_refs, mats_meta, "col")

    src = L0[pl.ds(jax.lax.rem(idx, jnp.int32(2)), 1)][0]
    for j in range(1, k + 1):
        cur = src.astype(jnp.float32) if bf16_state else src
        if algorithm == "mxu_hybrid1":
            xs = ((cur.astype(jnp.bfloat16),) if bf16_state
                  else split_bf16(cur, 3))
            val = apply_spec_hybrid1(cur, xs, h1_view, band_mats,
                                     mxu_axis="col", res_mxu=res_mxu)
        else:
            val = apply_spec_vpu_rolled(cur, spec)
        # level-j stripe: rows [i*B - j*s, i*B - j*s + B) of the global
        # interior live at buffer rows [s, s+B) (aligned slice)
        row0 = i * jnp.int32(B) - j * s
        if j < k:
            Lmid[j - 1, 2 * s: 2 * s + B] = (
                val[s: s + B, :].astype(Lmid.dtype))
            mask_in_place(
                lambda j=j: Lmid[j - 1, 2 * s: 2 * s + B],
                lambda v, j=j: Lmid.__setitem__(
                    (j - 1, slice(2 * s, 2 * s + B)), v),
                row0, tj * jnp.int32(TN) - HC, Wc)
            src = Lmid[pl.ds(j - 1, 1)][0]
        else:
            # drain the write started 2 bands ago before slot reuse
            @pl.when(idx >= 2)
            def _drain_prev():
                out_dma(idx - 2).wait()

            oslot = jax.lax.rem(idx, jnp.int32(2))
            out_tile[pl.ds(oslot, 1)] = (
                val[s: s + B, HC: HC + TN].astype(out_tile.dtype)[None])
            mask_in_place(
                lambda: out_tile[pl.ds(oslot, 1)][0],
                lambda v: out_tile.__setitem__(pl.ds(oslot, 1), v[None]),
                row0, tj * jnp.int32(TN), TN)
            out_dma(idx).start()

    for q in range(2):
        @pl.when((idx == total - 1) & (total >= q + 1))
        def _drain_tail(q=q):
            out_dma(idx - q).wait()


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "interpret", "algorithm",
                     "skew_steps", "residue_mxu"),
)
def stencil2d_skew_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout2D,
    interpret: bool = False,
    algorithm: str = "vpu_roll",
    skew_steps: int = 2,
    residue_mxu: bool = False,
) -> jax.Array:
    """``skew_steps`` timesteps per HBM round trip via time-skewed
    row-band streaming (zero recompute -- see ``_stencil2d_skew_kernel``).

    Requirements (the engine builds conforming layouts):
      * ``layout.guard == (skew_steps * s, 128)`` at least, where
        ``s = 8 * ceil(radius / 8)`` (the output stripe lags the input
        band by ``skew_steps * s`` rows);
      * band height ``tile[0] >= 2 * s`` (the carry must fit inside the
        previous stripe);
      * ``layout.extra_row_tiles`` sized so storage covers
        ``ceil((m + skew_steps * s) / B)`` bands;
      * dirichlet0 boundary, unsharded (no ``bounds`` / ``region``).
    """
    layout.validate()
    B, TN = layout.tile
    m, _n = layout.interior
    r = spec.radius
    k = int(skew_steps)
    if algorithm not in ("vpu_roll", "mxu_hybrid1"):
        raise ValueError(
            f"skewed fusion supports algorithm 'vpu_roll' or "
            f"'mxu_hybrid1', got {algorithm!r}")
    if k < 2:
        raise ValueError("skew_steps must be >= 2 (use the plain step "
                         "for k=1)")
    s = skew_stride(r)
    HR, HC = layout.guard
    if HR < k * s:
        raise ValueError(
            f"skewed fusion needs guard rows >= skew_steps * "
            f"{s} = {k * s}; layout has {HR}")
    if k * r > HC:
        raise ValueError(
            f"skew_steps={k} creeps {k * r} columns into the "
            f"{HC}-col guard; max here: {HC // max(1, r)}")
    if B < 2 * s:
        raise ValueError(
            f"band height (tile rows) must be >= 2 * {s}; got {B}")
    ni = -(-(m + k * s) // B)
    if ni > layout.grid[0] + layout.extra_row_tiles:
        raise ValueError(
            f"storage covers {layout.grid[0] + layout.extra_row_tiles} "
            f"bands but the lagging schedule needs {ni}; set "
            f"layout.extra_row_tiles = "
            f"{ni - layout.grid[0]}")
    np_dtype = np.dtype(cur.dtype)
    mats_meta, mat_args, res_mxu_meta, h1_view = (), [], (), None
    if algorithm == "mxu_hybrid1":
        (eff_terms, h1_residue, mats_meta, mat_args,
         res_mxu_meta) = _build_mxu_mats(spec, algorithm, np_dtype,
                                         residue_mxu)
        mats_meta = tuple(mats_meta)
        h1_view = _TermsView(tuple(eff_terms), tuple(h1_residue))

    Wc = TN + 2 * HC
    kernel = functools.partial(
        _stencil2d_skew_kernel,
        spec=spec,
        layout=layout,
        mats_meta=mats_meta,
        algorithm=algorithm,
        skew_steps=k,
        s_skew=s,
        ni=ni,
        bf16_state=np_dtype == np.dtype(jnp.bfloat16),
        h1_view=h1_view,
        res_mxu_meta=res_mxu_meta,
    )
    return pl.pallas_call(
        kernel,
        grid=(layout.grid[1], ni),
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, B + 2 * s, Wc), cur.dtype),
            pltpu.VMEM((k - 1, B + 2 * s, Wc), cur.dtype),
            pltpu.VMEM((2, B, TN), cur.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes()),
    )(cur, donor, *mat_args)


def vmem_limit_bytes() -> int:
    """Scoped-VMEM ceiling passed to Mosaic.  The compiler default is
    16M -- a guardrail, not the hardware (v5e has 128M physical VMEM);
    raising it admits wider tiles (lower window-extent amplification).
    Override with LORASTENCIL_VMEM_MB."""
    return int(os.environ.get("LORASTENCIL_VMEM_MB", "64")) * 2**20


def _stencil2d_resident_kernel(in_ref, out_ref, *, spec, layout: Layout2D,
                               steps: int):
    """ALL ``steps`` timesteps on a VMEM-resident 2-D grid (the 2-D
    twin of pallas_1d._stencil1d_resident_kernel).

    Each step is one exact-fp32 full-buffer rolled convolution
    (band_gemm.apply_spec_vpu_rolled) + the interior mask: wrap garbage
    reaches <= radius cells from the buffer edge, which the guard ring
    keeps outside the interior, and the mask re-zeroes it every step
    (the reference's decaying Dirichlet-0 halo).  One dispatch for the
    whole run -- the small-grid fast path the reference covers with
    per-step launches on an L2-resident working set
    (``/root/reference/src/2d/main.cu:282-328`` CHECK regime); over the
    tunneled backend one dispatch per RUN beats one per step by orders
    of magnitude.  Steps go through the (aliased) output ref; it seeds
    from in_ref first (resident out VMEM arrives uninitialized on the
    real backend despite the HBM alias -- PERF r9 8b)."""
    m, n = layout.interior
    r0, c0 = layout.origin
    R, C = layout.shape
    gr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) - r0
    gc = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) - c0
    rmask = ((gr >= 0) & (gr < m)).astype(jnp.float32)
    cmask = ((gc >= 0) & (gc < n)).astype(jnp.float32)

    out_ref[:] = in_ref[:]

    def body(_, carry):
        cur = out_ref[:]
        if cur.dtype == jnp.bfloat16:  # bf16 state: compute fp32
            cur = cur.astype(jnp.float32)
        val = apply_spec_vpu_rolled(cur, spec) * rmask * cmask
        out_ref[:] = val.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, steps, body, 0)


# whole-grid residency cap: internal buffer bytes.  DEFAULT 0 (off):
# the round-5 device sweep measured the resident kernel SLOWER than
# the tiled pipeline at EVERY small-grid size (star2d1r vpu_roll
# fp32: 8.8 vs 10.4 at 64x128, 15.8 vs 19.3 at 128x256, 19.7-25.0 vs
# 20.6-27.3 at 512x512) -- unlike 1-D, the 2-D tiled path's whole run
# is already ONE jitted program, so there is no per-step dispatch to
# amortize, and the double-buffered window DMA beats whole-buffer
# rolls.  The kernel stays available for A/B and future hardware via
# LORASTENCIL_RESIDENT2D_KB.
RESIDENT_2D_BYTES = int(os.environ.get("LORASTENCIL_RESIDENT2D_KB",
                                       "0")) * 1024


def fits_resident_2d(layout, itemsize: int = 4) -> bool:
    if not isinstance(layout, Layout2D) or layout.extra_row_tiles:
        return False
    R, C = layout.shape
    return R * C * itemsize <= RESIDENT_2D_BYTES


@functools.partial(
    jax.jit, static_argnames=("spec", "layout", "interpret", "steps"),
)
def stencil2d_resident(
    cur: jax.Array,
    spec: StencilSpec,
    layout: Layout2D,
    steps: int,
    interpret: bool = False,
) -> jax.Array:
    """ALL ``steps`` timesteps in ONE kernel on a VMEM-resident 2-D
    grid (see the kernel docstring; exact fp32, dirichlet0 only --
    small grids are dispatch-bound through per-step kernels over the
    tunneled backend, round-5 VERDICT item 6)."""
    layout.validate()
    assert fits_resident_2d(layout, jnp.dtype(cur.dtype).itemsize), \
        "grid too large for the resident kernel"
    assert spec.radius <= min(layout.guard), "guard ring < radius"
    kernel = functools.partial(
        _stencil2d_resident_kernel, spec=spec, layout=layout, steps=steps,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes()),
    )(cur)
