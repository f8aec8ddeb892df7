"""Shared banded-GEMM plane convolution for the Pallas kernels.

A separable term's in-plane convolution is evaluated as chunked banded
matmuls on the MXU: per 128-lane chunk, ``Y = X_chunk @ B`` (column axis,
K = 128 + 2r), then per up-to-128-row chunk, ``Z = A_chunk @ Y_chunk``
(row axis).  This is the TPU-width generalization of the reference's 16x8
banded DMMA parameter matrices (``/root/reference/src/2d/gpu.cu:353-387``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.factorize import banded_matrix
from .layout import LANE

__all__ = ["term_band_mats", "plane_conv", "apply_spec_vpu", "mm"]


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
        Y = jnp.concatenate(y_parts, axis=1) if len(y_parts) > 1 else y_parts[0]
    else:
        Y = X[:, HC: HC + TN]

    if A is not None:
        z_parts = []
        for i0 in range(0, TM, LANE):
            s = min(LANE, TM - i0)
            yi = Y[HR + i0 - rr: HR + i0 + rr + s, :]
            Ai = A if s == LANE else A[:s, : s + 2 * rr]
            z_parts.append(mm(Ai, yi, compute_dtype, precision))
        Z = jnp.concatenate(z_parts, axis=0) if len(z_parts) > 1 else z_parts[0]
    else:
        Z = Y[HR: HR + TM, :]
    return Z.astype(jnp.float32)


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
