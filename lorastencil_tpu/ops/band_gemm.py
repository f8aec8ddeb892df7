"""Shared banded-GEMM plane convolution for the Pallas kernels.

A separable term's in-plane convolution is evaluated as chunked banded
matmuls on the MXU: per 128-lane chunk, ``Y = X_chunk @ B`` (column axis,
K = 128 + 2r), then per up-to-128-row chunk, ``Z = A_chunk @ Y_chunk``
(row axis).  This is the TPU-width generalization of the reference's 16x8
banded DMMA parameter matrices (``/root/reference/src/2d/gpu.cu:353-387``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ..models.factorize import banded_matrix
from .layout import LANE

__all__ = ["term_band_mats", "plane_conv", "apply_spec_vpu",
           "apply_spec_vpu_rolled", "apply_spec_hybrid1",
           "apply_terms_mxu_split", "mm"]


def term_band_mats(term, dtype):
    """(A, B) 128-chunk banded matrices for one separable term's last two
    axes.  A: (128, 128+2rr) row conv; B: (128+2rc, 128) col conv; either
    is None when that axis is the identity."""
    row_taps, col_taps = term.taps[-2], term.taps[-1]
    A = B = None
    if col_taps is not None:
        B = banded_matrix(col_taps, LANE, dtype=dtype)
    if row_taps is not None:
        A = banded_matrix(row_taps, LANE, dtype=dtype).T.copy()
    return A, B


def mm(a, b, compute_dtype, precision):
    return jnp.dot(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def plane_conv(X, A, B, rr, rc, HR, HC, TM, TN, compute_dtype, precision):
    """Convolve a halo'd window X (TM + 2*HR, TN + 2*HC) down to the
    (TM, TN) interior tile using banded matmuls (A: rows, B: cols; None
    means identity along that axis).  Returns float32 (TM, TN)."""
    if B is not None:
        y_parts = []
        for j in range(TN // LANE):
            xj = X[:, HC + j * LANE - rc: HC + j * LANE + rc + LANE]
            y_parts.append(mm(xj, B, compute_dtype, precision))
        Y = (jnp.concatenate(y_parts, axis=1) if len(y_parts) > 1
             else y_parts[0])
    else:
        Y = X[:, HC: HC + TN]

    if A is not None:
        z_parts = []
        for i0 in range(0, TM, LANE):
            s = min(LANE, TM - i0)
            yi = Y[HR + i0 - rr: HR + i0 + rr + s, :]
            Ai = A if s == LANE else A[:s, : s + 2 * rr]
            z_parts.append(mm(Ai, yi, compute_dtype, precision))
        Z = (jnp.concatenate(z_parts, axis=0) if len(z_parts) > 1
             else z_parts[0])
    else:
        Z = Y[HR: HR + TM, :]
    return Z.astype(jnp.float32)


def _col_chunks(C):
    """Chunk an output-column extent into <=128-wide pieces."""
    out = []
    c = 0
    while c < C:
        s = min(LANE, C - c)
        out.append((c, s))
        c += s
    return out


def bf16_matrix_parts(M, max_parts: int = 3):
    """Exact bf16 decomposition of a HOST (numpy) matrix: as many parts
    as needed to represent its fp32 values, capped at ``max_parts``
    (integer reference taps: 1 part; arbitrary reals: up to 3 for the
    exact-grade tiers).  Returns a list of jnp bf16 arrays."""
    import numpy as _np

    parts = []
    rem = _np.asarray(M, _np.float32)
    for _ in range(max_parts):
        ph = _np.asarray(rem, jnp.bfloat16)
        parts.append(jnp.asarray(ph))
        rem = rem - _np.asarray(ph, _np.float32)
        if not _np.any(rem != 0.0):
            break
    return parts


def split_bf16(x, parts: int = 2):
    """Exact bf16 decomposition of an fp32 array: x == sum(parts) in
    fp32.  Two parts capture 16 mantissa bits (~6e-6 residual); three
    parts cover all 24 fp32 mantissa bits (exact-fp32-grade)."""
    out = []
    rem = x
    for i in range(parts):
        p = rem.astype(jnp.bfloat16)
        out.append(p)
        if i + 1 < parts:
            rem = rem - p.astype(jnp.float32)
    return tuple(out)


def _dot_splitn(xs, bs, left=False):
    """fp32-grade product of an N-part bf16 operand with an M-part bf16
    matrix.  Every bf16 x bf16 product is exact in the fp32 accumulator;
    cross terms of total order > len(xs) - 1 (below ~2^-32 relative for
    3-part operands) are dropped."""
    def d(a, b):
        return (jnp.dot(b, a, preferred_element_type=jnp.float32) if left
                else jnp.dot(a, b, preferred_element_type=jnp.float32))

    # keep products of total order up to the deeper split (a 1-part
    # bf16 STATE against a 2-part matrix still needs both matrix parts
    # to apply the exact operator)
    order = max(len(xs), len(bs)) - 1
    out = None
    for j, b in enumerate(bs):
        for i, x in enumerate(xs):
            if i + j > order:
                break
            t = d(x, b)
            out = t if out is None else out + t
    return out


def apply_terms_mxu_split(xs, mats, e_in, e_out, TM, TN):
    """Separable terms as split-fp32 banded MXU matmuls.

    ``xs``: tuple of bf16 parts of the fp32 window (``split_bf16``; 2
    parts ~6e-6/step, 3 parts exact-fp32-grade).
    ``mats``: per separable term (Aparts, Bparts, rr, rc); the parts
    are tuples of bf16 banded matrices summing to the fp32 matrix (one
    part when the taps are bf16-exact -- e.g. the reference's integer
    coefficients -- up to len(xs) parts for arbitrary reals; identity
    axes have empty tuples).  Extents as in apply_spec_vpu.  Returns
    float32 (TM + 2*er_out, TN + 2*ec_out).
    """
    nparts = len(xs)
    er_i, ec_i = e_in
    er_o, ec_o = e_out
    R = TM + 2 * er_o
    C = TN + 2 * ec_o
    off_r = er_i - er_o
    off_c = ec_i - ec_o
    acc = None

    for (Aparts, Bparts, rr, rc) in mats:
        if not Aparts and not Bparts:
            # identity term (e.g. a unit center-delta residue): X itself,
            # recomposed exactly from the split
            Z = None
            for xi in xs:
                zi = xi[off_r: off_r + R, off_c: off_c + C].astype(
                    jnp.float32)
                Z = zi if Z is None else Z + zi
        elif Bparts:
            # column conv over rows [off_r - rr, off_r - rr + R + 2rr)
            rlo = off_r - rr
            rhi = rlo + R + 2 * rr
            parts = []
            for (c0, sc) in _col_chunks(C):
                bs = tuple(b if sc == LANE else b[: sc + 2 * rc, :sc]
                           for b in Bparts)
                xis = tuple(
                    xi[rlo:rhi, off_c + c0 - rc: off_c + c0 + rc + sc]
                    for xi in xs)
                parts.append(_dot_splitn(xis, bs))
            Y = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            if Aparts:
                ys = split_bf16(Y, nparts)
                zparts = []
                for (r0c, sc) in _col_chunks(R):
                    as_ = tuple(a if sc == LANE else a[:sc, : sc + 2 * rr]
                                for a in Aparts)
                    yis = tuple(yi[r0c: r0c + sc + 2 * rr, :] for yi in ys)
                    zparts.append(_dot_splitn(yis, as_, left=True))
                Z = (jnp.concatenate(zparts, axis=0)
                     if len(zparts) > 1 else zparts[0])
            else:
                Z = Y[rr: rr + R, :] if rr else Y
        else:
            # row-only conv straight off the window split
            parts = []
            for (r0c, sc) in _col_chunks(R):
                as_ = tuple(a if sc == LANE else a[:sc, : sc + 2 * rr]
                            for a in Aparts)
                xis = tuple(
                    xi[off_r + r0c - rr: off_r + r0c + rr + sc,
                       off_c: off_c + C] for xi in xs)
                parts.append(_dot_splitn(xis, as_, left=True))
            Z = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        acc = Z if acc is None else acc + Z
    if acc is None:
        acc = jnp.zeros((R, C), jnp.float32)
    return acc


def residue_mxu_groups(residue):
    """Partition sparse residue points into MXU-offloadable column-conv
    groups and a VPU remainder (the bf16 throughput tier's residue
    offload; see PERF.md round-6).

    Points are grouped by row offset; row offsets with IDENTICAL column
    tap vectors share ONE banded col matmul whose result is row-shifted
    and added once per offset (star2d1r's (+-2, +-2) corners: one MXU
    stream + two shifted adds replaces four rolled multiply-adds).  A
    group is offloaded only when it has >= 2 column taps with at least
    one off-center -- identity-column groups are pure row shifts and a
    single off-center point costs ~2 VPU ops, both below the MXU path's
    own shift-add cost.  Returns ``(groups, rest)``: ``groups`` =
    ``((drs, taps, rc), ...)`` with ``taps`` a dense (2rc+1,) tuple,
    ``rest`` = the residue points left on the VPU rolls.
    """
    import collections

    by_dr = collections.defaultdict(dict)
    for (dr, dc), w in residue:
        by_dr[dr][dc] = by_dr[dr].get(dc, 0.0) + float(w)
    by_taps = collections.defaultdict(list)
    for dr, taps in sorted(by_dr.items()):
        by_taps[tuple(sorted(taps.items()))].append(dr)
    groups, rest = [], []
    for key, drs in sorted(by_taps.items()):
        taps = dict(key)
        if len(taps) >= 2 and any(dc != 0 for dc in taps):
            rc = max(abs(dc) for dc in taps)
            dense = tuple(taps.get(dc, 0.0) for dc in range(-rc, rc + 1))
            groups.append((tuple(sorted(drs)), dense, rc))
        else:
            rest += [((dr, dc), w) for dr in sorted(drs)
                     for dc, w in sorted(taps.items())]
    return tuple(groups), tuple(rest)


def apply_residue_mxu_extent(xs, groups, e_in, e_out, TM, TN):
    """Residue groups (``residue_mxu_groups``) as banded col MXU matmuls
    plus row-shifted adds, at ``apply_terms_mxu_split`` extents.  Each
    group's conv is computed over ``max|dr|`` extra rows per side so the
    per-offset contributions are static value slices of one shared
    product.  Returns float32 (TM + 2*er_out, TN + 2*ec_out) or None.
    """
    er_i, ec_i = e_in
    er_o, ec_o = e_out
    R = TM + 2 * er_o
    C = TN + 2 * ec_o
    off_r = er_i - er_o
    off_c = ec_i - ec_o
    acc = None
    for (Bparts, rc, drs) in groups:
        g = max(abs(d) for d in drs)
        rlo = off_r - g
        rhi = rlo + R + 2 * g
        parts = []
        for (c0, sc) in _col_chunks(C):
            bs = tuple(b if sc == LANE else b[: sc + 2 * rc, :sc]
                       for b in Bparts)
            xis = tuple(
                xi[rlo:rhi, off_c + c0 - rc: off_c + c0 + rc + sc]
                for xi in xs)
            parts.append(_dot_splitn(xis, bs))
        Y = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        for dr in drs:
            Z = Y[g + dr: g + dr + R, :]
            acc = Z if acc is None else acc + Z
    return acc


def _residue_rolled(X, residue, acc, sh, xrolls, add):
    """Apply sparse residue points as shared cyclic rolls (grouped by
    |row offset|; a (+dr, dc, w)/(-dr, dc, w) pair shares one
    row-symmetric sum D = sh(X,+dr) + sh(X,-dr) -- star2d1r's (+-2, +-2)
    corners: 7 ops instead of 10)."""
    import collections

    by_row = collections.defaultdict(list)
    for off, w in residue:
        by_row[off[-2]].append((off[-1], float(w)))
    for adr in sorted({abs(dr) for dr in by_row}):
        up = sorted(by_row.get(adr, []))
        dn = sorted(by_row.get(-adr, [])) if adr else []
        if adr == 0:
            D, rest = X, [(0, dc, w) for dc, w in up]
        elif up == dn and up:
            D = sh(X, adr, 0, xrolls) + sh(X, -adr, 0, xrolls)
            rest = [(0, dc, w) for dc, w in up]
        else:
            D = None
            rest = ([(adr, dc, w) for dc, w in up]
                    + [(-adr, dc, w) for dc, w in dn])
        for dr, dc, w in rest:
            src = D if D is not None else sh(X, dr, 0, xrolls)
            v = sh(src, dc, 1, xrolls if src is X else None)
            if w == 1.0:
                acc = add(acc, v)
            elif w == -1.0 and acc is not None:
                acc = acc - v
            else:
                acc = add(acc, w * v)
    return acc


def apply_spec_hybrid1(X, xs, spec2d, band_mats, mxu_axis="col",
                       res_mxu=()):
    """One full 2-D stencil application with ONE conv axis on the MXU and
    everything else (the other axis's convs, one-sided terms on the VPU
    axis, the sparse residue) on the VPU as aligned cyclic rolls, at X's
    FIXED full extent -- the two streams co-issue on TPU (Mosaic
    interleaves MXU matmuls with VPU rolls; PERF.md round-3 measurement).

    ``xs``: bf16 parts of X (3 for exact-fp32-grade fp32 state via
    ``split_bf16``; 1 for bf16 state).  ``band_mats``: per term, a tuple
    of bf16 banded matrix parts for the MXU axis's taps (col axis:
    (128+2rc, 128) B matrices; row axis: (128, 128+2rr) A matrices), or
    None when the term has no taps along that axis.  Every bf16 x bf16
    product is exact in the fp32 accumulator, so the MXU conv matches
    the fp32 VPU result to fp32-rounding grade.

    ``mxu_axis='col'`` runs per-128-lane-chunk matmuls (many, N=128);
    ``'row'`` runs per-128-row-chunk matmuls (few, N=window width) --
    same FLOPs, different MXU scheduling; measure per device.  Because
    the two axis convs commute, the MXU conv always runs FIRST (off the
    shared state split); the VPU axis rolls its fp32 result.

    Edge-of-window chunks use trimmed band slices (zero extension) --
    the resulting margin error stays within ``radius`` of the window
    edge, the same creep contract as ``apply_spec_vpu_rolled``.
    """
    R0, C0 = X.shape
    xrolls = {}

    def sh(A, d, axis, memo=None):
        if d == 0:
            return A
        if memo is not None and (d, axis) in memo:
            return memo[(d, axis)]
        n = R0 if axis == 0 else C0
        r = pltpu.roll(A, (-d) % n, axis)
        if memo is not None:
            memo[(d, axis)] = r
        return r

    def add(a, b):
        return b if a is None else a + b

    def col_conv_mxu(Bparts, rc):
        """Full-extent column conv: per-128-lane-chunk banded matmuls
        summed over the state split."""
        parts = []
        for c0 in range(0, C0, LANE):
            in_lo = max(0, c0 - rc)
            in_hi = min(C0, c0 + LANE + rc)
            top = in_lo - (c0 - rc)
            bs = tuple(b[top: top + (in_hi - in_lo), :] for b in Bparts)
            xis = tuple(xi[:, in_lo:in_hi] for xi in xs)
            parts.append(_dot_splitn(xis, bs))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    def row_conv_mxu(Aparts, rr):
        """Full-extent row conv: per-128-row-chunk banded matmuls (N =
        the full window width -- few large matmuls)."""
        parts = []
        for r0c in range(0, R0, LANE):
            s = min(LANE, R0 - r0c)
            in_lo = max(0, r0c - rr)
            in_hi = min(R0, r0c + s + rr)
            left = in_lo - (r0c - rr)
            as_ = tuple(a[:s, left: left + (in_hi - in_lo)]
                        for a in Aparts)
            xis = tuple(xi[in_lo:in_hi, :] for xi in xs)
            parts.append(_dot_splitn(xis, as_, left=True))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    acc = None
    vpu_axis = 0 if mxu_axis == "col" else 1
    m_axis = 1 - vpu_axis
    for term, Mparts in zip(spec2d.terms, band_mats):
        rt, ct = term.taps[-2], term.taps[-1]
        mxu_taps, vpu_taps = ((ct, rt) if mxu_axis == "col"
                              else (rt, ct))
        if mxu_taps is not None and Mparts:
            rm = (len(mxu_taps) - 1) // 2
            Y = (col_conv_mxu(Mparts, rm) if mxu_axis == "col"
                 else row_conv_mxu(Mparts, rm))
        elif mxu_taps is not None:
            # no matrices shipped for this term: both axes on the VPU
            # (mixed stream assignment for many-term specs)
            Y = _conv_rolled_1axis(X, mxu_taps, m_axis, sh, xrolls, add)
        else:
            Y = X
        if vpu_taps is not None:
            memo = xrolls if Y is X else None
            Z = _conv_rolled_1axis(Y, vpu_taps, vpu_axis, sh, memo, add)
        else:
            Z = Y
        acc = add(acc, Z)

    # MXU-offloaded residue groups (bf16 tier): one full-extent banded
    # col matmul per group, then one aligned cyclic row-roll add per
    # row offset -- the wrap creep stays <= |dr| <= radius, the same
    # guard-margin contract as every other roll here.
    for (Bparts, rc, drs) in res_mxu:
        Y = col_conv_mxu(Bparts, rc)
        for dr in drs:
            acc = add(acc, sh(Y, dr, 0))

    acc = _residue_rolled(X, spec2d.residue, acc, sh, xrolls, add)
    if acc is None:
        acc = jnp.zeros((R0, C0), X.dtype)
    return acc


def _conv_rolled_1axis(Y, taps, axis, sh, memo, add):
    """One-axis rolled conv with symmetric-pair sharing: equal-weight
    (+d, -d) tap pairs compute w * (roll(+d) + roll(-d)) -- one multiply
    instead of two (the reference coefficients are symmetric per axis,
    so every off-center pair qualifies)."""
    r = (len(taps) - 1) // 2

    def mul(w, v):
        return v if w == 1.0 else w * v

    Z = None
    if taps[r] != 0.0:
        Z = add(Z, mul(taps[r], Y))
    for d in range(1, r + 1):
        wp, wm = taps[r + d], taps[r - d]
        if wp != 0.0 and wp == wm:
            Z = add(Z, mul(wp, sh(Y, d, axis, memo)
                           + sh(Y, -d, axis, memo)))
            continue
        if wp != 0.0:
            Z = add(Z, mul(wp, sh(Y, d, axis, memo)))
        if wm != 0.0:
            Z = add(Z, mul(wm, sh(Y, -d, axis, memo)))
    return Z


def apply_spec_vpu_rolled(X, spec2d):
    """One full 2-D stencil application on the VPU via cyclic rolls at a
    FIXED (sublane, lane)-aligned extent (exact fp32).

    Every shifted operand is a ``pltpu.roll`` of the full array -- no
    misaligned sub-extent slices, which Mosaic lowers to much costlier
    rotate+select+copy sequences when both the offset and the extent are
    off the (8, 128) grid.  The price: cells within ``radius`` of the
    array edge receive wrapped garbage.  Callers keep every intermediate
    at the full window extent, so the garbage creeps <= radius per fused
    substep into the window guard margin (>= fused_steps * radius by
    layout construction) and is cut off by the final interior slice --
    the same creep argument as the 1-D flat-roll kernel.

    Residue points are grouped by row offset so each distinct row roll
    is computed once (star2d1r's 8-point residue: 3 row groups).
    """
    R0, C0 = X.shape
    xrolls = {}  # rolls of X shared across terms and the residue

    def sh(A, d, axis, memo=None):
        if d == 0:
            return A
        if memo is not None and (d, axis) in memo:
            return memo[(d, axis)]
        n = R0 if axis == 0 else C0
        r = pltpu.roll(A, (-d) % n, axis)
        if memo is not None:
            memo[(d, axis)] = r
        return r

    def add(a, b):
        return b if a is None else a + b

    acc = None
    for term in spec2d.terms:
        rt, ct = term.taps[-2], term.taps[-1]
        if ct is not None:
            Y = _conv_rolled_1axis(X, ct, 1, sh, xrolls, add)
        else:
            Y = X
        if rt is not None:
            memo = xrolls if Y is X else None
            Z = _conv_rolled_1axis(Y, rt, 0, sh, memo, add)
        else:
            Z = Y
        acc = add(acc, Z)

    acc = _residue_rolled(X, spec2d.residue, acc, sh, xrolls, add)
    if acc is None:
        acc = jnp.zeros((R0, C0), X.dtype)
    return acc


def apply_spec_vpu_rolled_extent(X, spec2d, e_in, e_out, TM, TN):
    """Rolled convolution at X's full extent followed by ONE slice down
    to the output extent -- the shrinking-extent contract of
    ``apply_spec_vpu`` with the per-tap shifted slices replaced by
    cyclic rolls (one slice per application instead of one per tap).
    Wrap garbage reaches ``radius`` cells from the X edge; the slice
    removes ``e_in - e_out >= radius`` per side, so it never escapes
    (used by the 3-D kernel's per-plane convolutions)."""
    acc = apply_spec_vpu_rolled(X, spec2d)
    off_r = e_in[0] - e_out[0]
    off_c = e_in[1] - e_out[1]
    R = TM + 2 * e_out[0]
    C = TN + 2 * e_out[1]
    return acc[off_r: off_r + R, off_c: off_c + C]


def apply_spec_vpu(X, spec2d, e_in, e_out, TM, TN):
    """One full 2-D stencil application on the VPU via statically shifted
    slice multiply-adds (exact fp32 -- no MXU precision passes).

    X has extent (TM + 2*er_in, TN + 2*ec_in) around the tile; the result
    has extent (TM + 2*er_out, TN + 2*ec_out), where
    ``e_in - e_out >= spec radius`` per axis.  ``spec2d`` supplies 2-axis
    terms and residue.  Measured on v5e, this beats HIGHEST-precision
    banded MXU matmuls ~6x for the reference shapes (few nonzero taps),
    while staying bit-accurate fp32; the MXU path remains available as
    ``algorithm='mxu'``.
    """
    er_i, ec_i = e_in
    er_o, ec_o = e_out
    R = TM + 2 * er_o
    C = TN + 2 * ec_o
    off_r = er_i - er_o
    off_c = ec_i - ec_o
    acc = None

    def add(a, b):
        return b if a is None else a + b

    def mul(w, v):
        return v if w == 1.0 else w * v

    def conv_taps(taps, sl_of):
        """Shifted-slice conv with symmetric-pair sharing (one multiply
        per equal-weight (+d, -d) pair) and unit-weight elision."""
        r = (len(taps) - 1) // 2
        Z = None
        if taps[r] != 0.0:
            Z = add(Z, mul(taps[r], sl_of(r)))
        for d in range(1, r + 1):
            wp, wm = taps[r + d], taps[r - d]
            if wp != 0.0 and wp == wm:
                Z = add(Z, mul(wp, sl_of(r + d) + sl_of(r - d)))
                continue
            if wp != 0.0:
                Z = add(Z, mul(wp, sl_of(r + d)))
            if wm != 0.0:
                Z = add(Z, mul(wm, sl_of(r - d)))
        return Z

    for term in spec2d.terms:
        rt, ct = term.taps[-2], term.taps[-1]
        if ct is not None:
            rc = (len(ct) - 1) // 2
            rr = (len(rt) - 1) // 2 if rt is not None else 0
            Y = conv_taps(
                ct,
                lambda k, rr=rr, rc=rc: X[
                    off_r - rr: off_r - rr + R + 2 * rr,
                    off_c + k - rc: off_c + k - rc + C])
        else:
            rr = (len(rt) - 1) // 2
            Y = X[off_r - rr: off_r - rr + R + 2 * rr,
                  off_c: off_c + C]
        if rt is not None:
            Z = conv_taps(rt, lambda k, Y=Y: Y[k: k + R, :])
        else:
            Z = Y
        acc = add(acc, Z)

    for off, w in spec2d.residue:
        dr, dc = off[-2], off[-1]
        acc = add(acc, mul(w, X[off_r + dr: off_r + dr + R,
                                off_c + dc: off_c + dc + C]))
    if acc is None:
        acc = jnp.zeros((R, C), X.dtype)
    return acc
