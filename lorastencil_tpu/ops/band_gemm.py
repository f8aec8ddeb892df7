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
            acc = add(acc, w * sh(src, dc, 1, xrolls if src is X else None))
    return acc


def apply_spec_hybrid1(X, xs, spec2d, col_mats):
    """One full 2-D stencil application with the LANE-axis (column) convs
    on the MXU and everything else (row convs, one-sided row terms, the
    sparse residue) on the VPU as aligned cyclic rolls, at X's FIXED full
    extent -- the two streams co-issue on TPU (Mosaic interleaves MXU
    matmuls with VPU rolls; PERF.md round-3 measurement).

    ``xs``: bf16 parts of X (3 for exact-fp32-grade fp32 state via
    ``split_bf16``; 1 for bf16 state).  ``col_mats``: per term, a tuple
    of bf16 banded (128+2rc, 128) matrix parts for the column taps (or
    None when the term has no column axis).  Every bf16 x bf16 product
    is exact in the fp32 accumulator, so the MXU column conv matches the
    fp32 VPU result to fp32-rounding grade.

    Edge-of-window columns use row-trimmed band slices (zero extension)
    -- the resulting margin error stays within ``radius`` of the window
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

    acc = None
    for term, Bparts in zip(spec2d.terms, col_mats):
        rt, ct = term.taps[-2], term.taps[-1]
        if ct is not None:
            rc = (len(ct) - 1) // 2
            Y = col_conv_mxu(Bparts, rc)
        else:
            Y = X
        if rt is not None:
            rr = (len(rt) - 1) // 2
            Z = None
            for k, w in enumerate(rt):
                if w != 0.0:
                    memo = xrolls if Y is X else None
                    Z = add(Z, w * sh(Y, k - rr, 0, memo))
        else:
            Z = Y
        acc = add(acc, Z)

    acc = _residue_rolled(X, spec2d.residue, acc, sh, xrolls, add)
    if acc is None:
        acc = jnp.zeros((R0, C0), X.dtype)
    return acc


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
        Y = None
        if ct is not None:
            rc = (len(ct) - 1) // 2
            for k, w in enumerate(ct):
                if w != 0.0:
                    Y = add(Y, w * sh(X, k - rc, 1, xrolls))
        else:
            Y = X
        Z = None
        if rt is not None:
            rr = (len(rt) - 1) // 2
            for k, w in enumerate(rt):
                if w != 0.0:
                    memo = xrolls if Y is X else None
                    Z = add(Z, w * sh(Y, k - rr, 0, memo))
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

    for term in spec2d.terms:
        rt, ct = term.taps[-2], term.taps[-1]
        if ct is not None:
            rc = (len(ct) - 1) // 2
            rr = (len(rt) - 1) // 2 if rt is not None else 0
            Y = None
            for k, w in enumerate(ct):
                if w == 0.0:
                    continue
                sl = X[off_r - rr: off_r - rr + R + 2 * rr,
                       off_c + k - rc: off_c + k - rc + C]
                Y = add(Y, w * sl)
        else:
            rr = (len(rt) - 1) // 2
            Y = X[off_r - rr: off_r - rr + R + 2 * rr,
                  off_c: off_c + C]
        if rt is not None:
            Z = None
            for k, w in enumerate(rt):
                if w == 0.0:
                    continue
                Z = add(Z, w * Y[k: k + R, :])
        else:
            Z = Y
        acc = add(acc, Z)

    for off, w in spec2d.residue:
        dr, dc = off[-2], off[-1]
        acc = add(acc, w * X[off_r + dr: off_r + dr + R,
                             off_c + dc: off_c + dc + C])
    if acc is None:
        acc = jnp.zeros((R, C), X.dtype)
    return acc
