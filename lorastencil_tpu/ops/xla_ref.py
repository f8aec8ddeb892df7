"""Pure-XLA stencil steps (no Pallas).

Two implementations over the reference-compatible padded layout:

* `dense_step`    -- one shifted slice-add per nonzero coefficient (the
                     "naive" stencil; serves as the measured baseline that
                     bench.py compares the Pallas engine against).
* `separable_step`-- axis-separated: per rank-1 term, a 1-D tap
                     convolution per axis (shift-adds on the VPU), plus the
                     sparse residue.  Same math as the Pallas engine, so it
                     doubles as an XLA-only cross-check of the
                     decomposition.

Both write the stencil into the interior and zero the halo, matching the
reference's multi-step semantics (see utils/reference.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.shapes import StencilSpec


def _interior_slices(spec: StencilSpec, shape):
    if len(shape) != spec.ndim:
        raise ValueError(
            f"grid is {len(shape)}-D but stencil {spec.name!r} is "
            f"{spec.ndim}-D"
        )
    return tuple(slice(h, s - h) for h, s in zip(spec.halo, shape))


def _shifted(grid, it, offsets):
    src = tuple(
        slice(sl.start + o, sl.stop + o) for sl, o in zip(it, offsets)
    )
    return grid[src]


def dense_step(grid: jax.Array, spec: StencilSpec) -> jax.Array:
    """Naive stencil: one shifted slice per nonzero tap."""
    S = spec.dense_coeffs()
    r = spec.radius
    it = _interior_slices(spec, grid.shape)
    acc = None
    for idx in np.argwhere(np.abs(S) > 0):
        w = float(S[tuple(idx)])
        off = [int(i) - r for i in idx]
        contrib = w * _shifted(grid, it, off)
        acc = contrib if acc is None else acc + contrib
    out = jnp.zeros_like(grid)
    return out.at[it].set(acc.astype(grid.dtype))


def conv_full(grid: jax.Array, spec: StencilSpec) -> jax.Array:
    """Unmasked correlation over the FULL padded extent (zero boundary):
    out[p] = sum_o S[o] * grid[p+o] for every p, reads beyond the array
    treated as zero.  This is the final factor of the adjoint chain
    (engine.run_diff): unlike dense_step it writes halo positions too
    (the gradient with respect to the input halo is nonzero -- step one
    of the forward pass reads it)."""
    S = spec.dense_coeffs()
    r = spec.radius
    gp = jnp.pad(grid, r)
    acc = None
    for idx in np.argwhere(np.abs(S) > 0):
        w = float(S[tuple(idx)])
        src = tuple(slice(int(i), int(i) + s)
                    for i, s in zip(idx, grid.shape))
        contrib = w * gp[src]
        acc = contrib if acc is None else acc + contrib
    if acc is None:
        acc = jnp.zeros_like(grid)
    return acc.astype(grid.dtype)


def _axis_conv(x, taps, axis, out_extent_slices):
    """Valid 1-D correlation along `axis`: out has the extent of
    `out_extent_slices` (a per-axis slice tuple into x)."""
    r = (len(taps) - 1) // 2
    acc = None
    for k, w in enumerate(taps):
        if w == 0.0:
            continue
        src = list(out_extent_slices)
        sl = src[axis]
        src[axis] = slice(sl.start + k - r, sl.stop + k - r)
        contrib = w * x[tuple(src)]
        acc = contrib if acc is None else acc + contrib
    if acc is None:
        acc = jnp.zeros(
            tuple(sl.stop - sl.start for sl in out_extent_slices),
            dtype=x.dtype,
        )
    return acc


def separable_step(grid: jax.Array, spec: StencilSpec) -> jax.Array:
    """Axis-separated stencil: per-term chained 1-D convs + residue."""
    it = _interior_slices(spec, grid.shape)
    full = tuple(slice(0, s) for s in grid.shape)
    acc = None
    for term in spec.terms:
        # Convolve axis by axis, shrinking from the full padded array down
        # to the interior extent.  Axes processed in order; before an
        # axis is convolved, its extent stays "wide" (full array) so later
        # convs can read the needed halo; already-processed axes are at
        # interior extent.
        cur = grid
        cur_slices = list(full)
        for a in range(spec.ndim):
            tgt = list(cur_slices)
            tgt[a] = it[a]
            if term.taps[a] is None:
                cur = cur[tuple(
                    tgt[i] if i == a else slice(0, cur.shape[i])
                    for i in range(spec.ndim)
                )]
            else:
                cur = _axis_conv(
                    cur, term.taps[a], a,
                    tuple(
                        tgt[i] if i == a else slice(0, cur.shape[i])
                        for i in range(spec.ndim)
                    ),
                )
            cur_slices[a] = slice(0, cur.shape[a])
        acc = cur if acc is None else acc + cur
    for off, w in spec.residue:
        contrib = w * _shifted(grid, it, off)
        acc = contrib if acc is None else acc + contrib
    out = jnp.zeros_like(grid)
    return out.at[it].set(acc.astype(grid.dtype))
