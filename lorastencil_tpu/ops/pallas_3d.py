"""3-D low-rank stencil Pallas kernel (2.5-D slab blocking).

TPU-native re-design of the reference's 3-D engines
(``/root/reference/src/3d/gpu_star.cu:22-133``, ``gpu_box.cu:21-140``):
each grid step owns one (TM, TN) in-plane tile for all z and sweeps the z
axis in SLABS of several planes per DMA (the reference streams one plane
per ``cp.async`` round, ``gpu_box.cu:21-40``; on TPU, per-transfer latency
makes multi-plane slabs the right granularity).  Per slab iteration:

  * the next slab's (SLAB+2)-plane window streams in during compute
    (double-buffered; slab indices unrolled by 2 so every buffer index is
    a compile-time constant -- dynamic VMEM indices materialize copies);
  * terms whose z-taps span planes with a real in-plane conv (box3d1r)
    evaluate each input plane's conv ONCE into a slab conv buffer (the
    analog of the reference's rotating rotbuf + scratch,
    ``gpu_box.cu:126-139``);
  * identity-plane terms (star3d1r's z+-1 copies, ``gpu_star.cu:44-54``)
    read window slices; z-centered terms evaluate on the center plane;
  * the SLAB output planes write back in one DMA, double-buffered.

In-plane convolutions run on the VPU as exact-fp32 shifted multiply-adds
(``algorithm='vpu'``, default) or as banded MXU GEMMs (``'mxu'``).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import SeparableTerm, StencilSpec
from .band_gemm import (apply_spec_vpu, apply_spec_vpu_rolled_extent,
                        plane_conv, term_band_mats)
from .layout import LANE, SUBLANE, Layout3D


@dataclasses.dataclass(frozen=True)
class _Plane2D:
    """One 3-D term's in-plane taps as a 2-axis spec for apply_spec_vpu."""
    terms: tuple
    residue: tuple = ()


def _classify_terms(spec: StencilSpec):
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


def carry_plane_count(fused_steps: int, radius: int) -> int:
    """Total conv planes the cross-slab carry buffer holds per buffered
    term: level L of K reuses 2*(K-L+1)*r convs from the previous slab
    (consecutive slab windows overlap by that many src planes), so the
    buffer holds sum_L 2*(K-L+1)*r = r*K*(K+1) planes."""
    return radius * fused_steps * (fused_steps + 1)


def pick_slab(H: int, TM: int, TN: int, dtype_bytes: int = 4,
              budget: int = 0, fused_steps: int = 1,
              radius: int = 1, acc_bytes: int = 4,
              carry_nbuf: int = 0) -> int:
    """Largest slab in {32,16,8,4,2,1} dividing H whose buffers fit
    the VMEM budget.

    ``dtype_bytes`` sizes the state-dtype window/output slabs (2 for the
    bf16 tier); ``acc_bytes`` sizes the fp32 conv/level buffers."""
    wr, wc = TM + 2 * SUBLANE, TN + 2 * LANE
    k = fused_steps
    if not budget:
        # deeper fusion carries bigger per-level temporaries that the
        # static estimate below cannot see; leave more headroom.
        # Sized as a fraction of the actual scoped-VMEM ceiling
        # (pallas_2d.vmem_limit_bytes; 40M/24M at the 64M default) so a
        # LORASTENCIL_VMEM_MB override scales the slab choice instead
        # of overflowing the compile -- deeper slabs cut the z-lookback
        # amplification ((slab + 2k*r)/slab window planes per slab).
        from .pallas_2d import vmem_limit_bytes

        frac = 0.625 if k <= 2 else 0.375
        budget = max(6 * 2**20, int(vmem_limit_bytes() * frac))
    pe = (k - 1) * radius
    er = TM + 2 * (((pe + SUBLANE - 1) // SUBLANE) * SUBLANE or 0)
    ec = TN + 2 * (LANE if pe else 0)
    # slab-independent: the cross-slab conv-carry buffers
    # (2 parities x carry_nbuf buffered terms x r*K*(K+1) planes)
    carry = 2 * acc_bytes * carry_nbuf * carry_plane_count(k, radius) \
        * (TM + 2 * pe) * (TN + 2 * pe)
    for s in (32, 16, 8, 4, 2, 1):
        if H % s != 0:
            continue
        need = carry + dtype_bytes * (
            2 * (s + 2 * k) * wr * wc    # double-buffered window slabs
            + 2 * s * TM * TN            # double-buffered output slabs
        ) + acc_bytes * (
            (s + 2 * k) * TM * TN        # conv slab (per buffered term)
            + (2 * (s + 2 * k) * er * ec if k > 1 else 0)  # level buffers
        )
        if need <= budget:
            return s
    return 1


def _stencil3d_kernel(
    in_hbm, donor_hbm, *rest,
    spec: StencilSpec, layout: Layout3D, mats_meta,
    compute_dtype, precision, algorithm, slab: int, fused_steps: int,
    acc_dt=jnp.float32, has_bounds: bool = False,
    region=None, conv_carry: bool = False,
):
    bounds_ref = None
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    # mats_meta entries: (n_A_refs, rr, n_B_refs, rc) -- 0/1 for 'mxu',
    # up to 3 bf16 B parts per term for 'mxu_hybrid1'
    n_mats = sum(int(na) + int(nb) for na, _, nb, _ in mats_meta)
    mat_refs = rest[:n_mats]
    out_hbm = rest[n_mats]
    win = rest[n_mats + 1]       # (2, SLAB+2k, TM+16, TN+256)
    convbuf = rest[n_mats + 2]   # (n_buffered, SLAB+2k, TM+2pe', TN+2pe')
    out_sl = rest[n_mats + 3]    # (2, SLAB, TM, TN)
    lvlbuf = rest[n_mats + 4]    # (2, SLAB+2k, TM+2pe', TN+2pe') (fused)
    carrybuf = rest[n_mats + 5]  # (2, n_buffered, r*K*(K+1), TM+2pe', .)
    sem_in = rest[n_mats + 6]    # (2,)
    sem_out = rest[n_mats + 7]   # (2,)

    TM, TN = layout.tile
    K = fused_steps
    r = spec.radius
    H = layout.interior[0]
    m, n = layout.interior[1], layout.interior[2]
    z0, r0, c0 = layout.origin
    assert z0 >= K * r, "z guard must cover the fused lookback"
    HR, HC = SUBLANE, LANE
    # region = ((ti0, ti1), (tj0, tj1)): the in-plane tile window this
    # call owns (overlapped sharded engine splits interior/boundary)
    ti0 = region[0][0] if region is not None else 0
    tj0 = region[1][0] if region is not None else 0
    ti = ti0 + pl.program_id(0)
    tj = tj0 + pl.program_id(1)
    nslabs = H // slab

    buffered_idx, identity_idx, center_idx = _classify_terms(spec)
    term_mats = {}
    term_parts = {}
    mi = 0
    for t_idx, (na, rr, nb, rc) in enumerate(mats_meta):
        arefs = [mat_refs[mi + i][:] for i in range(int(na))]
        mi += int(na)
        brefs = [mat_refs[mi + i][:] for i in range(int(nb))]
        mi += int(nb)
        term_mats[t_idx] = (arefs[0] if arefs else None,
                            brefs[0] if (brefs and algorithm == "mxu")
                            else None, rr, rc)
        term_parts[t_idx] = tuple(brefs)

    def slab_dma(si, s):
        # input planes [z0 + si*slab - K*r, ...): K*r z-lookback planes on
        # each side of the slab's output planes
        return pltpu.make_async_copy(
            in_hbm.at[
                pl.ds(z0 + si * slab - K * r, slab + 2 * K * r),
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
                pl.ds(z0 + si * slab, slab),
                pl.ds(r0 + ti * TM, TM),
                pl.ds(c0 + tj * TN, TN),
            ],
            sem_out.at[s],
        )

    def conv_plane_hybrid1(t_idx, X, e_in, e_out):
        """Per-plane column conv on the MXU (state split to full
        bf16-exactness depth, lane-offset operand chunks -- fine on the
        MXU, unlike sublane offsets), then the row conv as VPU slices:
        the 3-D transplant of the 2-D mxu_hybrid1 assignment."""
        from .band_gemm import _dot_splitn, split_bf16

        term = spec.terms[t_idx]
        rt, ct = term.taps[1], term.taps[2]
        _, rr, nb, rc = mats_meta[t_idx]
        R = TM + 2 * e_out[0]
        C = TN + 2 * e_out[1]
        off_r = e_in[0] - e_out[0]
        off_c = e_in[1] - e_out[1]
        if ct is not None:
            Bparts = term_parts[t_idx]
            xs = split_bf16(X, 3)
            parts = []
            for c0 in range(0, C, LANE):
                sc = min(LANE, C - c0)
                bs = tuple(b[: sc + 2 * rc, :sc] for b in Bparts)
                xis = tuple(
                    x[:, off_c + c0 - rc: off_c + c0 + rc + sc]
                    for x in xs)
                parts.append(_dot_splitn(xis, bs))
            Y = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                 else parts[0])
        else:
            Y = X[:, off_c: off_c + C]
        if rt is not None:
            rv = (len(rt) - 1) // 2
            Z = None
            for k, w in enumerate(rt):
                if w == 0.0:
                    continue
                sl = Y[off_r + k - rv: off_r + k - rv + R, :]
                t = sl if w == 1.0 else w * sl
                Z = t if Z is None else Z + t
        else:
            Z = Y[off_r: off_r + R, :]
        return Z.astype(jnp.float32)

    def conv_plane(t_idx, X, e_in=None, e_out=(0, 0)):
        # plane convs use shifted slices: cyclic rolls lose on the small
        # non-128-multiple plane extents here (28.9 vs 40.0 GCells/s at
        # 256^3 measured on v5e), the opposite of the 2-D full-window
        # case -- hence the engine maps every vpu* setting to 'vpu'
        if X.dtype == jnp.bfloat16:  # bf16 state: compute fp32 in VMEM
            X = X.astype(jnp.float32)
        e_in = (HR, HC) if e_in is None else e_in
        if (algorithm == "mxu_hybrid1"
                and spec.terms[t_idx].taps[2] is not None):
            return conv_plane_hybrid1(t_idx, X, e_in, e_out)
        if algorithm.startswith("vpu") or algorithm == "mxu_hybrid1":
            term = spec.terms[t_idx]
            plane_term = SeparableTerm(taps=(term.taps[1], term.taps[2]))
            if algorithm == "vpu_roll":
                # aligned cyclic rolls at X's full extent + one slice
                # (wrap garbage stays within radius <= e_in - e_out);
                # extent-dependent vs 'vpu' slices -- measure per tile
                return apply_spec_vpu_rolled_extent(
                    X, _Plane2D(terms=(plane_term,)), e_in, e_out, TM, TN)
            return apply_spec_vpu(X, _Plane2D(terms=(plane_term,)),
                                  e_in, e_out, TM, TN)
        assert e_in == (HR, HC) and e_out == (0, 0)
        A, B, rr, rc = term_mats[t_idx]
        return plane_conv(X, A, B, rr, rc, HR, HC, TM, TN,
                          compute_dtype, precision)

    if has_bounds:
        # dynamic validity box: (4,) = (rlo, rhi, clo, chi) in local
        # coordinates (plane-only domain decomposition), or (6,) =
        # (zlo, zhi, rlo, rhi, clo, chi) (z-sharded meshes and ghost
        # boundaries: received ghost planes/rings must survive the
        # intermediate-level mask)
        six = bounds_ref.shape[0] == 6
        b_zlo, b_zhi = (bounds_ref[0], bounds_ref[1]) if six else (0, H)
        off = 2 if six else 0
        b_rlo, b_rhi = bounds_ref[off], bounds_ref[off + 1]
        b_clo, b_chi = bounds_ref[off + 2], bounds_ref[off + 3]
    else:
        b_zlo, b_zhi = 0, H
        b_rlo, b_rhi, b_clo, b_chi = 0, m, 0, n

    def interior_mask(er, ec):
        """(R,1) and (1,C) float masks for an extent-(er, ec) array."""
        R, C = TM + 2 * er, TN + 2 * ec
        gr = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + ti * TM - er
        gc = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + tj * TN - ec
        return ((gr >= b_rlo) & (gr < b_rhi)).astype(acc_dt), \
               ((gc >= b_clo) & (gc < b_chi)).astype(acc_dt)

    rm, cm = interior_mask(0, 0)

    def combine_plane(src, j, e_in, e_out, get_conv):
        """One 3-D timestep for output plane j (relative): sum the
        z-taps of every term over planes j-rz..j+rz of the previous
        level (each level consumes ``r`` lookback planes per side, so
        the output plane j maps to input plane j + r)."""
        R, C = TM + 2 * e_out[0], TN + 2 * e_out[1]
        off_r = e_in[0] - e_out[0]
        off_c = e_in[1] - e_out[1]

        def wmul(w, v):
            # unit-weight elision, like band_gemm.apply_spec_vpu (the
            # reference shapes' z taps are all +-1.0)
            return v if w == 1.0 else -v if w == -1.0 else w * v

        acc = jnp.zeros((R, C), acc_dt)
        for t_idx in center_idx:
            acc = acc + conv_plane(t_idx, src(j + r), e_in, e_out)
        for b, t_idx in enumerate(buffered_idx):
            tz = spec.terms[t_idx].taps[0]
            rz = (len(tz) - 1) // 2
            for dz in range(-rz, rz + 1):
                w = float(tz[rz + dz])
                if w != 0.0:
                    acc = acc + wmul(w, get_conv(b, j + r + dz))
        for t_idx in identity_idx:
            tz = spec.terms[t_idx].taps[0]
            rz = (len(tz) - 1) // 2
            for dz in range(-rz, rz + 1):
                w = float(tz[rz + dz])
                if w != 0.0:
                    acc = acc + wmul(w, src(j + r + dz)[
                        off_r: off_r + R, off_c: off_c + C
                    ].astype(acc_dt))
        for (dz, dr, dc), w in spec.residue:
            acc = acc + wmul(w, src(j + r + dz)[
                off_r + dr: off_r + dr + R, off_c + dc: off_c + dc + C
            ].astype(acc_dt))
        return acc

    slab_dma(0, 0).start()

    def sub_iter(si, sslot):
        @pl.when(si + 1 < nslabs)
        def _():
            slab_dma(si + 1, 1 - sslot).start()

        slab_dma(si, sslot).wait()
        W = win[sslot]  # static view: (slab + 2K, TM+2HR, TN+2HC)

        @pl.when(si >= 2)
        def _():
            out_dma(si - 2, sslot).wait()

        # K fused timesteps, level by level: level L produces
        # slab + 2*(K-L)*r planes at in-plane extent (K-L)*r, each plane
        # masked to the global interior (z, rows, cols) so reference
        # halo-decay semantics hold at every intermediate step.
        src_is_window = True
        for lvl in range(1, K + 1):
            n_out_p = slab + 2 * (K - lvl) * r
            e_in = (HR, HC) if lvl == 1 else \
                ((K - lvl + 1) * r, (K - lvl + 1) * r)
            e_out = ((K - lvl) * r, (K - lvl) * r)
            rme, cme = (rm, cm) if e_out == (0, 0) else \
                interior_mask(*e_out)
            R, C = TM + 2 * e_out[0], TN + 2 * e_out[1]

            if src_is_window:
                def src(jj):
                    return W[jj]
            else:
                prev = lvlbuf[(lvl - 1) % 2]
                Rp = TM + 2 * e_in[0]
                Cp = TN + 2 * e_in[1]

                def src(jj, prev=prev, Rp=Rp, Cp=Cp):
                    return prev[jj, :Rp, :Cp]

            # each input plane's conv computed once per level; with
            # conv_carry, the first 2*(K-lvl+1)*r convs are the previous
            # slab's last ones (consecutive slab windows share exactly
            # that many src planes, and both conv_plane and the masked
            # level outputs are functions of ABSOLUTE plane position, so
            # the values coincide across slabs).  ZERO-COPY routing: the
            # head planes (jj < c) read the opposite parity's carry
            # slots, the tail planes (jj >= slab) WRITE this parity's --
            # the next slab's head reads land there directly, so no
            # VMEM plane copies are ever issued (the copy-based variant
            # measured a net LOSS: box3d1r fp32 64.2 -> 61.9, bf16 72.0
            # -> 60.1 GCells/s -- the copies cost more than the convs).
            count = n_out_p + 2 * r
            c = 2 * (K - lvl + 1) * r
            # carry region offset for this level inside carrybuf
            coff = sum(2 * (K - l + 1) * r for l in range(1, lvl))
            use_carry = conv_carry and nslabs >= 2 and slab >= 2 * K * r

            def conv_slot(b, jj, c=c, coff=coff, use_carry=use_carry):
                """(ref, leading indices) of plane jj's conv this slab
                (static jj; direct multi-dim indexing -- .at ref views
                lower to alignment-constrained memref slices)."""
                if use_carry and jj < c:
                    return carrybuf, (1 - sslot, b, coff + jj)
                if use_carry and jj >= slab:
                    return carrybuf, (sslot, b, coff + jj - slab)
                return convbuf, (b, jj)

            def conv_store(b, jj, val, R=R, C=C):
                ref, idx = conv_slot(b, jj)
                ref[idx + (slice(None, R), slice(None, C))] = val

            for b, t_idx in enumerate(buffered_idx):
                if use_carry:
                    # head planes: already written by the previous
                    # slab's tail except on the first slab
                    @pl.when(si == 0)
                    def _(b=b, t_idx=t_idx, c=c, src=src,
                          e_in=e_in, e_out=e_out, R=R, C=C):
                        for i in range(c):
                            conv_store(b, i, conv_plane(
                                t_idx, src(i), e_in, e_out), R, C)
                for jj in range(c if use_carry else 0, count):
                    conv_store(b, jj, conv_plane(
                        t_idx, src(jj), e_in, e_out), R, C)

            def get_conv(b, jj, R=R, C=C, conv_slot=conv_slot):
                ref, idx = conv_slot(b, jj)
                return ref[idx + (slice(None, R), slice(None, C))]

            for j in range(n_out_p):
                acc = combine_plane(src, j, e_in, e_out, get_conv)
                # z-validity: interior plane index of this output
                zz = si * slab - (K - lvl) * r + j
                zok = ((zz >= b_zlo) & (zz < b_zhi)).astype(acc_dt)
                acc = acc * rme * cme * zok
                if lvl == K:
                    out_sl[sslot, j] = acc.astype(out_sl.dtype)
                else:
                    lvlbuf[lvl % 2, j, :R, :C] = acc
            src_is_window = False

        out_dma(si, sslot).start()

        @pl.when(si == nslabs - 1)
        def _():
            out_dma(si, sslot).wait()

        @pl.when((si == nslabs - 1) & (nslabs >= 2))
        def _():
            out_dma(si - 1, 1 - sslot).wait()

    def pair(bi, _):
        si0 = bi * 2
        sub_iter(si0, 0)

        @pl.when(si0 + 1 < nslabs)
        def _():
            sub_iter(si0 + 1, 1)

        return 0

    # (fully unrolling this sweep measured neutral -- 58.5 vs 59.2
    # GCells/s on star3d1r 256^3, round 4 -- so the loop stays compact)
    jax.lax.fori_loop(0, pl.cdiv(nslabs, 2), pair, 0)


def stencil3d_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout3D,
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    algorithm: str = "vpu",
    fused_steps: int = 1,
    bounds: "jax.Array | None" = None,
    region=None,
    conv_carry: "bool | None" = None,
) -> jax.Array:
    """``bounds`` (optional, (4,) or (6,) int32): dynamic global-interior
    (row_lo, row_hi, col_lo, col_hi) -- or, with a z range,
    (z_lo, z_hi, row_lo, ...) -- in local coordinates for
    domain-decomposed runs (z-sharded meshes pass 6).  ``region`` (optional,
    ((ti0, ti1), (tj0, tj1))): restrict this call to a tile-index
    sub-rectangle (the overlapped sharded engine's interior/boundary
    split).  ``conv_carry`` (None = LORASTENCIL_3D_CARRY env, default
    on): reuse the previous slab's overlapping buffered-term plane
    convs instead of recomputing them (bit-identical output).  Resolved
    OUTSIDE the jit cache so an env flip between calls takes effect."""
    if conv_carry is None:
        # default ON: device A/B (round 5, fp32-control 59.3) measured
        # box3d1r 65.1 -> 68.4 fp32 / 72.9 -> 77.7 bf16, custom3d_sep3
        # 64.7 -> 67.6 GCells/s, bit-identical output
        conv_carry = os.environ.get("LORASTENCIL_3D_CARRY", "1") != "0"
    return _stencil3d_step_jit(
        cur, donor, spec, layout, compute_dtype, precision, interpret,
        algorithm, fused_steps, bounds, region, bool(conv_carry))


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "compute_dtype", "precision",
                     "interpret", "algorithm", "fused_steps", "region",
                     "conv_carry"),
)
def _stencil3d_step_jit(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout3D,
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    algorithm: str = "vpu",
    fused_steps: int = 1,
    bounds: "jax.Array | None" = None,
    region=None,
    conv_carry: bool = False,
) -> jax.Array:
    layout.validate()
    TM, TN = layout.tile
    H = layout.interior[0]
    for t in spec.terms:
        if t.taps[0] is not None and len(t.taps[0]) > 2 * spec.radius + 1:
            raise ValueError("z taps longer than the spec radius allows")
    if algorithm not in ("vpu", "vpu_roll", "mxu", "mxu_hybrid1"):
        raise NotImplementedError(
            f"algorithm {algorithm!r} is not a 3-D path; 3-D kernels "
            f"support 'vpu' (exact slices; auto maps here), 'vpu_roll' "
            f"(exact rolls -- extent-dependent, measure per tile), "
            f"'mxu_hybrid1' (per-plane column convs on the MXU at full "
            f"split depth, exact-grade) or 'mxu'")
    if fused_steps > 1:
        assert algorithm != "mxu", "3-D temporal fusion needs vpu*/hybrid"
    assert fused_steps * spec.radius <= SUBLANE, "fused lookback > guard"
    assert layout.zguard >= fused_steps * spec.radius
    acc_itemsize = 8 if np.dtype(cur.dtype) == np.float64 else 4
    buffered_pre, _, _ = _classify_terms(spec)
    conv_carry = bool(conv_carry) and bool(buffered_pre)
    slab = pick_slab(H, TM, TN, np.dtype(cur.dtype).itemsize,
                     fused_steps=fused_steps, radius=spec.radius,
                     acc_bytes=acc_itemsize,
                     carry_nbuf=len(buffered_pre) if conv_carry else 0)
    conv_carry = conv_carry and (H // slab) >= 2

    np_dtype = np.dtype(cur.dtype)
    mats_meta = []
    mat_args = []
    for term in spec.terms:
        rr = (len(term.taps[1]) - 1) // 2 if term.taps[1] is not None else 0
        rc = (len(term.taps[2]) - 1) // 2 if term.taps[2] is not None else 0
        if algorithm == "mxu":
            A, B = term_band_mats(term, np_dtype)
            mats_meta.append((int(A is not None), rr,
                              int(B is not None), rc))
            if A is not None:
                mat_args.append(jnp.asarray(A))
            if B is not None:
                mat_args.append(jnp.asarray(B))
        elif algorithm == "mxu_hybrid1" and term.taps[2] is not None:
            # bf16 parts of the column banded matrix (integer taps: one
            # part; arbitrary reals up to 3 -- exact-fp32-grade against
            # the 3-part state split)
            from ..models.factorize import banded_matrix
            from .band_gemm import bf16_matrix_parts

            B = banded_matrix(term.taps[2], LANE, dtype=np.float64)
            bparts = bf16_matrix_parts(B)
            mats_meta.append((0, rr, len(bparts), rc))
            mat_args.extend(bparts)
        else:
            mats_meta.append((0, rr, 0, rc))
    mats_meta = tuple(mats_meta)

    buffered_idx, _, _ = _classify_terms(spec)
    n_buf = max(1, len(buffered_idx))

    kernel = functools.partial(
        _stencil3d_kernel,
        spec=spec, layout=layout, mats_meta=mats_meta,
        compute_dtype=compute_dtype, precision=precision,
        algorithm=algorithm, slab=slab, fused_steps=fused_steps,
        acc_dt=jnp.float64 if np_dtype == np.float64 else jnp.float32,
        has_bounds=bounds is not None,
        region=region, conv_carry=conv_carry,
    )
    K = fused_steps
    pe = (K - 1) * spec.radius  # max intermediate in-plane extent
    nplanes = slab + 2 * K * spec.radius
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    grid = layout.grid
    if region is not None:
        (ti0, ti1), (tj0, tj1) = region
        assert 0 <= ti0 < ti1 <= grid[0] and 0 <= tj0 < tj1 <= grid[1]
        grid = (ti1 - ti0, tj1 - tj0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + bounds_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, nplanes, TM + 2 * SUBLANE, TN + 2 * LANE),
                       cur.dtype),
            # conv/level buffers hold fp32 intermediates for bf16 state
            # (only the HBM round trip rounds -- the tier's contract)
            pltpu.VMEM((n_buf, nplanes, TM + 2 * pe, TN + 2 * pe),
                       jnp.float64 if np_dtype == np.float64
                       else jnp.float32),
            pltpu.VMEM((2, slab, TM, TN), cur.dtype),
            pltpu.VMEM((2, nplanes, TM + 2 * pe, TN + 2 * pe)
                       if K > 1 else (1, 1, SUBLANE, LANE),
                       jnp.float64 if np_dtype == np.float64
                       else jnp.float32),
            # cross-slab conv-carry planes (slab-parity-major so every
            # index stays a compile-time constant; per buffered term)
            pltpu.VMEM((2, n_buf, carry_plane_count(K, spec.radius),
                        TM + 2 * pe, TN + 2 * pe)
                       if conv_carry else (1, 1, 1, SUBLANE, LANE),
                       jnp.float64 if np_dtype == np.float64
                       else jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
    )(cur, donor, *bounds_args, *mat_args)


def _vmem_limit() -> int:
    from .pallas_2d import vmem_limit_bytes

    return vmem_limit_bytes()
