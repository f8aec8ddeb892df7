"""1-D stencil Pallas kernels.

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
on device) and dropped.

Any 1-D spec (multi-term, residue, custom coefficients) is supported:
a 1-D stencil is always dense, so the kernel works off
``spec.dense_coeffs()`` directly (radius up to 127).

Two kernels:

* ``stencil1d_step`` -- tiled, double-buffered window DMA; ``fused_steps``
  applies up to ``layout.guard_rows`` timesteps per HBM round trip (edge
  garbage creeps one 128-lane row per substep, inside the guard).
* ``stencil1d_resident`` -- whole-grid-resident: for grids that fit VMEM,
  ALL timesteps run inside ONE kernel launch (the grid stays in VMEM for
  the whole run; one dispatch total).  This is the small-grid fast path
  the reference covers with per-step kernel launches on a resident L2
  working set (``src/1d/gpu_1r.cu:121-123``); on TPU-over-tunnel, one
  dispatch per *run* beats one per step by orders of magnitude.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .layout import LANE, SUBLANE, Layout1D

# whole-grid-resident threshold: internal buffer bytes.  The per-step
# convolution holds ~5 full-grid temporaries live (acc + row rolls +
# shifted operands), so stay well inside the 16M scoped-vmem budget
# (measured: a 4.2M buffer demands ~72M scoped).
RESIDENT_BYTES = 512 * 2**10


def _cparams(interpret):
    # raised scoped-VMEM ceiling (see pallas_2d.vmem_limit_bytes)
    if interpret:
        return None
    from .pallas_2d import vmem_limit_bytes
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes())


def _dense_taps(spec: StencilSpec):
    """Flat dense taps of a 1-D spec (terms + residue collapsed)."""
    assert spec.ndim == 1
    taps = tuple(float(t) for t in spec.dense_coeffs())
    assert len(taps) <= 2 * (LANE - 1) + 1, "1-D radius must be < 128"
    return taps


def _conv_flat(W, taps, lane):
    """One exact-fp32 VPU step over a full (R, 128) flat view: flat shift
    by d = lane roll of each row, wrapped lanes from the adjacent row's
    roll (the flat array wraps every 128 lanes).  The outermost rows read
    garbage (no halo beyond the window); each substep creeps the garbage
    one row inward."""
    r = (len(taps) - 1) // 2
    R = W.shape[0]
    up = pltpu.roll(W, R - 1, 0)   # up[i] = W[i+1] (last row wraps)
    dn = pltpu.roll(W, 1, 0)       # dn[i] = W[i-1] (first row wraps)
    acc = jnp.zeros(W.shape, W.dtype)
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


def _stencil1d_kernel(
    in_hbm, donor_hbm, *rest,
    layout: Layout1D, n: int, _taps, fused_steps: int, has_bounds: bool,
    region=None,
):
    bounds_ref = None
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    out_hbm, win, out_tile, sem_in, sem_out = rest
    TR = layout.tile_rows
    G = layout.guard_rows
    # region = (t0, t1): the tile window this call owns (overlapped
    # sharded engine splits boundary and interior tiles)
    t0, t1 = region if region is not None else (0, layout.grid[0])
    g = t1 - t0
    pid = pl.program_id(0)
    ti = t0 + pid
    slot = jax.lax.rem(pid, jnp.int32(2))
    nslot = jax.lax.rem(pid + 1, jnp.int32(2))

    def in_dma(t_i, s):
        return pltpu.make_async_copy(
            in_hbm.at[pl.ds(t_i * TR, TR + 2 * G), :],
            win.at[s], sem_in.at[s],
        )

    def out_dma(t_i, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[pl.ds(G + t_i * TR, TR), :],
            sem_out.at[s],
        )

    # double-buffered prefetch (same protocol as the 2-D kernel)
    @pl.when(pid == 0)
    def _():
        in_dma(ti, slot).start()

    @pl.when(pid + 1 < g)
    def _():
        in_dma(ti + 1, nslot).start()

    in_dma(ti, slot).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TR + 2 * G, LANE), 1)

    # interior mask over the full window extent (reference halo decay:
    # every substep zeroes cells outside flat [lo, hi) -- the global
    # interior in local coordinates when domain-decomposed, [0, n)
    # otherwise)
    if has_bounds:
        lo, hi = bounds_ref[0], bounds_ref[1]
    else:
        lo, hi = 0, n
    grw = (jax.lax.broadcasted_iota(jnp.int32, (TR + 2 * G, LANE), 0)
           + ti * TR - G)
    flatw = grw * LANE + lane
    wmask = ((flatw >= lo) & (flatw < hi)).astype(jnp.float32)

    cur = win[pl.ds(slot, 1)][0]
    if cur.dtype == jnp.bfloat16:  # bf16 state: compute fp32 in VMEM
        cur = cur.astype(jnp.float32)
    for _ in range(fused_steps):
        cur = _conv_flat(cur, _taps, lane) * wmask.astype(cur.dtype)
    acc = cur[G: G + TR, :]

    @pl.when(pid >= 2)
    def _():
        out_dma(ti - 2, slot).wait()

    out_tile[pl.ds(slot, 1)] = acc.astype(out_tile.dtype)[None]
    out_dma(ti, slot).start()

    @pl.when(pid == g - 1)
    def _():
        out_dma(ti, slot).wait()

    @pl.when((pid == g - 1) & (g >= 2))
    def _():
        out_dma(ti - 1, nslot).wait()


@functools.partial(
    jax.jit, static_argnames=("spec", "layout", "precision", "interpret",
                              "fused_steps", "region")
)
def stencil1d_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout: Layout1D,
    precision=jax.lax.Precision.HIGHEST,  # noqa: ARG001 (VPU path is exact)
    interpret: bool = False,
    fused_steps: int = 1,
    bounds: "jax.Array | None" = None,
    region=None,
) -> jax.Array:
    """``fused_steps`` timesteps on the internal layout in one kernel.

    ``region`` (optional, (t0, t1)): restrict the call to a tile-index
    window (the overlapped sharded engine's boundary/interior split).

    ``bounds`` (optional, shape (2,) int32): dynamic [lo, hi) interior
    mask range in local flat coordinates -- the global interior seen from
    this shard when domain-decomposed (interior devices must not zero
    ring cells holding exchanged neighbor data)."""
    layout.validate()
    TR = layout.tile_rows
    taps = _dense_taps(spec)
    # garbage from the windowless edge creeps one row per fused substep
    # (radius < 128 cells = one 128-lane row); the window guard is
    # layout.guard_rows rows on each side.
    if not (1 <= fused_steps <= layout.guard_rows):
        raise ValueError(
            f"1-D fused_steps must be in [1, guard_rows="
            f"{layout.guard_rows}]")

    kernel = functools.partial(
        _stencil1d_kernel, layout=layout, n=layout.interior,
        _taps=taps, fused_steps=fused_steps, has_bounds=bounds is not None,
        region=region,
    )
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    grid = layout.grid
    if region is not None:
        t0, t1 = region
        assert 0 <= t0 < t1 <= grid[0]
        grid = (t1 - t0,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + bounds_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TR + 2 * layout.guard_rows, LANE), cur.dtype),
            pltpu.VMEM((2, TR, LANE), cur.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(cur, donor, *bounds_args)


def effective_radius(spec: StencilSpec) -> int:
    """Largest |offset| with a nonzero tap (1d1r's 9 taps have zero ends,
    so its creep/halo radius is 3, not 4)."""
    taps = _dense_taps(spec)
    r = (len(taps) - 1) // 2
    nz = [abs(d - r) for d, w in enumerate(taps) if w != 0.0]
    return max(nz) if nz else 0


def _conv_lanes(W, taps):
    """One exact-fp32 step on the overlapped-lane layout: every flat
    shift by d is ONE aligned cyclic lane roll (halo lanes absorb the
    wrap garbage; validity creeps ``effective_radius`` lanes inward per
    substep).  A roll over the full stored width shifts every 128-lane
    group by d at once: interior lanes never read across their group
    boundary for |d| <= lane_halo, and group-crossing lanes land in
    halo lanes."""
    r = (len(taps) - 1) // 2
    width = W.shape[1]

    def sh(d):
        return W if d == 0 else pltpu.roll(W, (-d) % width, 1)

    def add(a, b):
        return b if a is None else a + b

    def mul(w, v):
        return v if w == 1.0 else w * v

    acc = None
    if taps[r] != 0.0:
        acc = add(acc, mul(taps[r], W))
    for d in range(1, r + 1):
        wp, wm = taps[r + d], taps[r - d]
        if wp != 0.0 and wp == wm:
            # symmetric-pair sharing: one multiply per (+d, -d) pair
            # (the reference taps are symmetric -- every pair qualifies)
            acc = add(acc, mul(wp, sh(d) + sh(-d)))
            continue
        if wp != 0.0:
            acc = add(acc, mul(wp, sh(d)))
        if wm != 0.0:
            acc = add(acc, mul(wm, sh(-d)))
    return acc if acc is not None else jnp.zeros(W.shape, W.dtype)


def _lanes_band_parts(spec: StencilSpec):
    """bf16 parts of the square within-group band matrix
    (Bsq[i, j] = taps[r + i - j]; integer taps: one part, arbitrary
    reals up to 3 -- exact-fp32-grade against the 3-part state split).
    Shared by the tiled and resident lanes kernels."""
    import numpy as _np

    from ..models.factorize import banded_matrix
    from .band_gemm import bf16_matrix_parts

    taps = _dense_taps(spec)
    r = (len(taps) - 1) // 2
    Bsq = banded_matrix(taps, LANE, dtype=_np.float64)[r: r + LANE, :]
    return bf16_matrix_parts(Bsq)


def _lanes_fixup(W, lane, jl, h, Wd, ngrp):
    """Rebuild the stale halo lanes from the neighbor 128-group's
    payload lanes (left halo of group k = group k-1 lanes [S, S+h);
    right halo = group k+1 lanes [h, 2h)); the outermost groups take
    them from the adjacent stored row (sublane roll).  Shared by the
    tiled and resident lanes kernels."""
    R = W.shape[0]
    up = pltpu.roll(W, R - 1, 0)   # up[i] = W[i+1]
    dn = pltpu.roll(W, 1, 0)       # dn[i] = W[i-1]
    if ngrp > 1:
        lfix = jnp.where(lane < h, pltpu.roll(dn, (2 * h) % Wd, 1),
                         pltpu.roll(W, (2 * h) % Wd, 1))
        rfix = jnp.where(lane >= Wd - h,
                         pltpu.roll(up, (Wd - 2 * h) % Wd, 1),
                         pltpu.roll(W, (Wd - 2 * h) % Wd, 1))
    else:
        lfix = pltpu.roll(dn, (2 * h) % Wd, 1)
        rfix = pltpu.roll(up, (Wd - 2 * h) % Wd, 1)
    return jnp.where(jl < h, lfix, jnp.where(jl >= LANE - h, rfix, W))


def _conv_lanes_mxu(cur, bparts, nparts=3):
    """One step on the overlapped-lane layout as per-128-group banded
    MXU matmuls: within a group, out[:, j] = sum_d taps[d] W[:, j+d]
    with zero extension at the group edge -- the missing halo-lane
    contributions land exactly in the stale-by-contract halo lanes (the
    same validity-creep contract as the roll path).  ``cur`` is fp32;
    the state splits to full bf16 exactness depth and every bf16 x bf16
    product is exact in the fp32 accumulator (exact-fp32-grade, like
    the 2-D mxu_hybrid1)."""
    from .band_gemm import _dot_splitn, split_bf16

    xs = split_bf16(cur, nparts)
    parts = []
    for g in range(0, cur.shape[1], LANE):
        xis = tuple(x[:, g: g + LANE] for x in xs)
        parts.append(_dot_splitn(xis, bparts))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _stencil1d_lanes_kernel(
    in_hbm, donor_hbm, *rest,
    layout, n: int, _taps, fused_steps: int, has_bounds: bool,
    region=None, n_mats: int = 0,
):
    bounds_ref = None
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    mat_refs = rest[:n_mats]
    rest = rest[n_mats:]
    out_hbm, win, out_tile, work, sem_in, sem_out = rest
    TR = layout.tile_rows
    G = layout.guard_rows
    h = layout.lane_halo
    S = layout.stride
    Wd = layout.width
    ngrp = layout.groups
    # region = (t0, t1): the tile window this call owns (overlapped
    # sharded engine splits boundary and interior tiles)
    t0, t1 = region if region is not None else (0, layout.grid[0])
    g = t1 - t0
    pid = pl.program_id(0)
    ti = t0 + pid
    slot = jax.lax.rem(pid, jnp.int32(2))
    nslot = jax.lax.rem(pid + 1, jnp.int32(2))

    def in_dma(t_i, s):
        return pltpu.make_async_copy(
            in_hbm.at[pl.ds(t_i * TR, TR + 2 * G), :],
            win.at[s], sem_in.at[s],
        )

    def out_dma(t_i, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[pl.ds(G + t_i * TR, TR), :],
            sem_out.at[s],
        )

    @pl.when(pid == 0)
    def _():
        in_dma(ti, slot).start()

    @pl.when(pid + 1 < g)
    def _():
        in_dma(ti + 1, nslot).start()

    in_dma(ti, slot).wait()

    R = TR + 2 * G
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, Wd), 1)
    # interior mask on the linear flat map
    # f = ((row - G)*groups + lane//128)*S + lane%128 - h
    # (valid for halo lanes too: they duplicate the neighbor's cells);
    # dynamic [lo, hi) bounds when domain-decomposed
    row = jax.lax.broadcasted_iota(jnp.int32, (R, Wd), 0) + ti * TR - G
    jl = jax.lax.rem(lane, jnp.int32(LANE))
    if ngrp > 1:
        grp = jax.lax.div(lane, jnp.int32(LANE))
        flat = (row * ngrp + grp) * S + jl - h
    else:
        flat = row * S + jl - h
    if has_bounds:
        lo, hi = bounds_ref[0], bounds_ref[1]
    else:
        lo, hi = 0, n

    W = win[pl.ds(slot, 1)][0]
    # bf16 STATE (throughput tier): half the HBM bytes; compute fp32 in
    # VMEM, the out-tile store rounds back (~4e-3/step, PERF.md); the
    # MXU conv needs only ONE split part (no low bits to split off)
    bf16_state = W.dtype == jnp.bfloat16
    if bf16_state:
        W = W.astype(jnp.float32)
    wmask = ((flat >= lo) & (flat < hi)).astype(W.dtype)
    # halo-lane fixup: HBM halo lanes are stale by contract; rebuild
    # them from the neighbor groups (_lanes_fixup).  The window's
    # outermost rows get wrapped garbage -- they are guard rows, never
    # stored.
    cur = _lanes_fixup(W, lane, jl, h, Wd, ngrp)
    # materialize substeps into ping-pong scratch so Mosaic does not
    # keep every unrolled substep's temporaries live at once (same
    # scoped-vmem discipline as the 2-D kernel) -- but k=2's single
    # intermediate fits the transient budget, and skipping the scratch
    # round trip saves ~3 us/tile (measured round 3)
    for s in range(fused_steps):
        if n_mats:
            bparts = tuple(mat_refs[i][:] for i in range(n_mats))
            val = _conv_lanes_mxu(cur, bparts,
                                  nparts=1 if bf16_state else 3) * wmask
        else:
            val = _conv_lanes(cur, _taps) * wmask
        if s < fused_steps - 1 and fused_steps > 4:
            # k <= 4 keeps intermediates in value form: the raised
            # scoped-VMEM ceiling absorbs the transients, and skipping
            # the work-scratch round trip saves ~3 us/tile/substep
            work[s % 2] = val
            cur = work[s % 2]
        else:
            cur = val
    acc = cur[G: G + TR, :]

    @pl.when(pid >= 2)
    def _():
        out_dma(ti - 2, slot).wait()

    out_tile[pl.ds(slot, 1)] = acc.astype(out_tile.dtype)[None]
    out_dma(ti, slot).start()

    @pl.when(pid == g - 1)
    def _():
        out_dma(ti, slot).wait()

    @pl.when((pid == g - 1) & (g >= 2))
    def _():
        out_dma(ti - 1, nslot).wait()


@functools.partial(
    jax.jit, static_argnames=("spec", "layout", "interpret", "fused_steps",
                              "region", "algorithm")
)
def stencil1d_lanes_step(
    cur: jax.Array,
    donor: jax.Array,
    spec: StencilSpec,
    layout,
    interpret: bool = False,
    fused_steps: int = 1,
    bounds: "jax.Array | None" = None,
    region=None,
    algorithm: str = "vpu",
) -> jax.Array:
    """``fused_steps`` timesteps on the overlapped-lane layout
    (Layout1DLanes) in one kernel.  Exact fp32: each tap is one aligned
    cyclic roll; wrap garbage creeps ``effective_radius`` lanes per
    substep into the ``lane_halo`` margin, which the start-of-call
    fixup rebuilt from the neighbor rows.

    ``bounds`` (optional, (2,) int32): dynamic [lo, hi) interior mask in
    local flat coordinates (domain-decomposed runs).  ``region``
    (optional, (t0, t1)): restrict the call to a tile-index window (the
    overlapped sharded engine's boundary/interior split)."""
    layout.validate()
    r_eff = effective_radius(spec)
    if fused_steps * r_eff > layout.lane_halo:
        raise ValueError(
            f"fused_steps={fused_steps} needs lane_halo >= "
            f"{fused_steps * r_eff}; layout has {layout.lane_halo}")
    taps = _dense_taps(spec)
    mat_args = _lanes_band_parts(spec) if algorithm == "mxu" else []
    kernel = functools.partial(
        _stencil1d_lanes_kernel, layout=layout, n=layout.interior,
        _taps=taps, fused_steps=fused_steps,
        has_bounds=bounds is not None, region=region,
        n_mats=len(mat_args),
    )
    TR = layout.tile_rows
    grid = layout.grid
    if region is not None:
        t0, t1 = region
        assert 0 <= t0 < t1 <= grid[0]
        grid = (t1 - t0,)
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + bounds_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TR + 2 * layout.guard_rows, layout.width),
                       cur.dtype),
            pltpu.VMEM((2, TR, layout.width), cur.dtype),
            pltpu.VMEM(
                (2, TR + 2 * layout.guard_rows, layout.width)
                if fused_steps > 2 else (1, SUBLANE, LANE),
                # fused substeps stay fp32 (fp64 under x64 interpret);
                # only the HBM round trip rounds for bf16 state
                cur.dtype if jnp.dtype(cur.dtype) == jnp.float64
                else jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(cur, donor, *bounds_args, *mat_args)


def _stencil1d_resident_kernel(in_ref, out_ref, *, n: int, _taps,
                               steps: int, guard_rows: int):
    R = in_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    flat = (row - guard_rows) * LANE + lane
    mask = ((flat >= 0) & (flat < n)).astype(jnp.float32)

    # loop through the (input-aliased) output ref rather than a
    # loop-carried VALUE: a carried value makes Mosaic keep every
    # per-step temporary live at once and blows the scoped-vmem budget
    # (unrolling the body measured neutral: the remaining per-run cost
    # is kernel-entry overhead, not the loop)
    def body(_, carry):
        cur = out_ref[:]
        if cur.dtype == jnp.bfloat16:  # bf16 state: compute fp32
            cur = cur.astype(jnp.float32)
        out_ref[:] = (_conv_flat(cur, _taps, lane)
                      * mask.astype(cur.dtype)).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, steps, body, 0)


@functools.partial(
    jax.jit, static_argnames=("spec", "layout", "interpret", "steps")
)
def stencil1d_resident(
    cur: jax.Array,
    spec: StencilSpec,
    layout: Layout1D,
    steps: int,
    interpret: bool = False,
) -> jax.Array:
    """ALL ``steps`` timesteps in one kernel on a VMEM-resident grid.

    The whole internal buffer (guard + interior) lives in VMEM for the
    run; each step is one exact-fp32 flat convolution + interior mask
    (the mask zeroes the halo after the first step -- the reference's
    decaying Dirichlet-0 semantics, SURVEY.md section 4).  One dispatch
    for the whole run: this is what makes the small-grid BASELINE config
    (``1d1r 4096 x64``) fast on a dispatch-latency-bound backend."""
    layout.validate()
    assert fits_resident(layout), "grid too large for the resident kernel"
    kernel = functools.partial(
        _stencil1d_resident_kernel, n=layout.interior,
        _taps=_dense_taps(spec), steps=steps,
        guard_rows=layout.guard_rows,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(cur)


def _stencil1d_resident_lanes_kernel(in_ref, *rest, layout, n: int,
                                     _taps, steps: int, refresh: int,
                                     n_mats: int):
    """ALL ``steps`` timesteps on a VMEM-resident overlapped-lane grid.

    The lane halo is ``refresh * r_eff`` deep, so the halo-lane fixup
    (the per-call cost of the tiled lanes kernel) runs only every
    ``refresh`` steps -- between fixups each step is just the conv
    (MXU matmuls or rolls) + the interior mask, and the roll/matmul
    edge garbage creeps r_eff lanes per step inside the halo margin.
    This is what lifts the dispatch-bound tiny-grid BASELINE config
    (the reference's resident-L2 regime, ``src/1d/gpu_1r.cu:121-123``)."""
    mat_refs = rest[:n_mats]
    out_ref = rest[n_mats]
    R, Wd = layout.shape
    G = layout.guard_rows
    h = layout.lane_halo
    S = layout.stride
    ngrp = layout.groups

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, Wd), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, Wd), 0) - G
    jl = jax.lax.rem(lane, jnp.int32(LANE))
    if ngrp > 1:
        grp = jax.lax.div(lane, jnp.int32(LANE))
        flat = (row * ngrp + grp) * S + jl - h
    else:
        flat = row * S + jl - h
    mask = ((flat >= 0) & (flat < n)).astype(jnp.float32)

    def fixup(W):
        return _lanes_fixup(W, lane, jl, h, Wd, ngrp)

    def block(inner):
        """One fixup + ``inner`` unrolled steps, through the (aliased)
        output ref -- the same ref-carried structure as the flat
        resident kernel (value chains across the whole run made Mosaic
        compile pathologically)."""
        cur = out_ref[:]
        if cur.dtype == jnp.bfloat16:
            cur = cur.astype(jnp.float32)
        cur = fixup(cur)
        for _ in range(inner):
            if n_mats:
                bparts = tuple(mat_refs[i][:] for i in range(n_mats))
                cur = _conv_lanes_mxu(
                    cur, bparts,
                    nparts=1 if out_ref.dtype == jnp.bfloat16 else 3)
            else:
                cur = _conv_lanes(cur, _taps)
            cur = cur * mask
        out_ref[:] = cur.astype(out_ref.dtype)

    nfull, tail = divmod(steps, refresh)

    def body(_, carry):
        block(refresh)
        return carry

    if nfull:
        jax.lax.fori_loop(0, nfull, body, 0)
    if tail:
        block(tail)


@functools.partial(
    jax.jit, static_argnames=("spec", "layout", "interpret", "steps",
                              "algorithm")
)
def stencil1d_resident_lanes(
    cur: jax.Array,
    spec: StencilSpec,
    layout,
    steps: int,
    interpret: bool = False,
    algorithm: str = "mxu",
) -> jax.Array:
    """ALL ``steps`` timesteps in one kernel on a VMEM-resident
    overlapped-lane grid (see the kernel docstring)."""
    layout.validate()
    r_eff = effective_radius(spec)
    refresh = max(1, layout.lane_halo // max(1, r_eff))
    taps = _dense_taps(spec)
    mat_args = _lanes_band_parts(spec) if algorithm == "mxu" else []
    kernel = functools.partial(
        _stencil1d_resident_lanes_kernel, layout=layout,
        n=layout.interior, _taps=taps, steps=steps, refresh=refresh,
        n_mats=len(mat_args),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cur.shape, cur.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mat_args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(cur, *mat_args)


RESIDENT_LANES_BYTES = 2 * 2**20


def fits_resident_lanes(layout, itemsize: int = 4) -> bool:
    """Resident-lanes eligibility: a lanes layout BUILT for the
    resident kernel (engine._build_layout sets layout.resident; tiled
    layouts must never stray into the resident path) whose whole
    buffer (plus the ~5x conv transients) fits comfortably under the
    scoped-VMEM ceiling."""
    from .layout import Layout1DLanes

    if not (isinstance(layout, Layout1DLanes)
            and getattr(layout, "resident", False)):
        return False
    rows, cols = layout.shape
    return rows * cols * itemsize <= RESIDENT_LANES_BYTES


def fits_resident(layout, itemsize: int = 4) -> bool:
    """Whole-grid-resident eligibility: flat Layout1D only (the resident
    kernel is the small-grid fast path; overlapped-lane layouts exist
    only for grids far beyond it)."""
    if not isinstance(layout, Layout1D):
        return False
    rows, cols = layout.shape
    return rows * cols * itemsize <= RESIDENT_BYTES
