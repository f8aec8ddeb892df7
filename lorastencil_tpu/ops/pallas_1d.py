"""1-D low-rank stencil Pallas kernel.

TPU-native re-design of the reference's 1-D tensor-core engine
(``/root/reference/src/1d/gpu_1r.cu:21-87``): the padded 1-D array is
viewed as rows of 128 lanes (the reference used 8-wide DMMA segments; the
TPU's native lane width is 128).  The flat convolution is evaluated as
exact-fp32 VPU lane rolls, where a flat shift by d is a roll of each row
with the wrapped lanes taken from the adjacent row's roll -- the 128-lane
wrap replaces the reference's dual-accumulator band-overlap fragment
reuse (``src/1d/gpu_1r.cu:66-78``); an MXU banded matmul (the direct
analog of the reference's 16x8 constant parameter matrix,
``gpu_1r.cu:94-99``) was measured at bf16 pass precision (1.6e-3 rel err
on device) and dropped.  ``fused_steps`` applies up to 8 timesteps per
HBM round trip (edge garbage creeps one row per substep, inside the
8-row window halo), double-buffered like the 2-D kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .layout import LANE, SUBLANE, Layout1D


def _stencil1d_kernel(
    in_hbm, donor_hbm, out_hbm, win, out_tile, sem_in, sem_out,
    *, layout: Layout1D, n: int, _taps, fused_steps: int,
):
    TR = layout.tile_rows
    (g,) = layout.grid
    ti = pl.program_id(0)
    slot = jax.lax.rem(ti, 2)
    nslot = jax.lax.rem(ti + 1, 2)

    def in_dma(t_i, s):
        return pltpu.make_async_copy(
            in_hbm.at[pl.ds(t_i * TR, TR + 2 * SUBLANE), :],
            win.at[s], sem_in.at[s],
        )

    def out_dma(t_i, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[pl.ds(SUBLANE + t_i * TR, TR), :],
            sem_out.at[s],
        )

    # double-buffered prefetch (same protocol as the 2-D kernel)
    @pl.when(ti == 0)
    def _():
        in_dma(ti, slot).start()

    @pl.when(ti + 1 < g)
    def _():
        in_dma(ti + 1, nslot).start()

    in_dma(ti, slot).wait()

    taps = _taps  # closed over, static
    r = (len(taps) - 1) // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR + 2 * SUBLANE, LANE), 1)

    def conv_full(W):
        """One exact-fp32 VPU step over the FULL (TR+16, 128) window:
        flat shift by d = lane roll of each row, wrapped lanes from the
        adjacent row's roll (the flat array wraps every 128 lanes).
        The outermost rows read garbage (no halo beyond the window);
        with k fused substeps the garbage creeps k rows inward,
        well inside the 8-row (1024-cell) window halo."""
        R = W.shape[0]
        up = pltpu.roll(W, R - 1, 0)   # up[i] = W[i+1] (last row wraps)
        dn = pltpu.roll(W, 1, 0)       # dn[i] = W[i-1] (first row wraps)
        acc = jnp.zeros(W.shape, jnp.float32)
        if taps[r] != 0.0:
            acc = acc + taps[r] * W
        for d in range(1, r + 1):
            wp = taps[r + d]
            if wp != 0.0:
                # left-roll by d == circular roll by LANE - d (roll
                # takes non-negative shifts only)
                sh = jnp.where(lane < LANE - d,
                               pltpu.roll(W, LANE - d, 1),
                               pltpu.roll(up, LANE - d, 1))
                acc = acc + wp * sh
            wm = taps[r - d]
            if wm != 0.0:
                sh = jnp.where(lane >= d,
                               pltpu.roll(W, d, 1), pltpu.roll(dn, d, 1))
                acc = acc + wm * sh
        return acc

    # interior mask over the full window extent (reference halo decay:
    # every substep zeroes cells outside flat [0, n))
    grw = (jax.lax.broadcasted_iota(jnp.int32, (TR + 2 * SUBLANE, LANE), 0)
           + ti * TR - SUBLANE)
    flatw = grw * LANE + lane
    wmask = ((flatw >= 0) & (flatw < n)).astype(jnp.float32)

    cur = win[pl.ds(slot, 1)][0]
    for _ in range(fused_steps):
        cur = conv_full(cur) * wmask
    acc = cur[SUBLANE: SUBLANE + TR, :]

    @pl.when(ti >= 2)
    def _():
        out_dma(ti - 2, slot).wait()

    out_tile[pl.ds(slot, 1)] = acc.astype(out_tile.dtype)[None]
    out_dma(ti, slot).start()

    @pl.when(ti == g - 1)
    def _():
        out_dma(ti, slot).wait()

    @pl.when((ti == g - 1) & (g >= 2))
    def _():
        out_dma(ti - 1, nslot).wait()


@functools.partial(
    jax.jit, static_argnames=("spec", "layout", "precision", "interpret",
                              "fused_steps")
)
def stencil1d_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout1D,
    precision=jax.lax.Precision.HIGHEST,  # noqa: ARG001 (VPU path is exact)
    interpret: bool = False,
    fused_steps: int = 1,
) -> jax.Array:
    layout.validate()
    TR = layout.tile_rows
    assert len(spec.terms) == 1 and spec.residue == ()
    # garbage from the windowless edge creeps one row per fused substep;
    # the window halo is SUBLANE rows on each side.
    assert 1 <= fused_steps <= SUBLANE
    (taps,) = spec.terms[0].taps

    kernel = functools.partial(
        _stencil1d_kernel, layout=layout, n=layout.interior,
        _taps=tuple(float(t) for t in taps), fused_steps=fused_steps,
    )
    return pl.pallas_call(
        kernel,
        grid=layout.grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TR + 2 * SUBLANE, LANE), cur.dtype),
            pltpu.VMEM((2, TR, LANE), cur.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cur, donor)
