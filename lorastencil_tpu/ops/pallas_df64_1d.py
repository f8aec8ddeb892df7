"""df64 1-D stencil Pallas kernels: fp64-grade pair state.

Closes the "df64 Pallas" 1-D tier boundary: 1-D df64 previously ran the
HBM-bound XLA dense pair path (ops/df64.py).  Two layouts share the
error-free tap chain (``_pair_conv``):

* **lanes** (Layout1DLanes, effective radius <= 32): each flat shift is
  ONE aligned cyclic lane roll (halo lanes absorb the wrap garbage; the
  start-of-call fixup rebuilt them from the neighbor rows).
* **flat** (Layout1D, effective radius <= 127 -- round 5): a flat shift
  is a lane roll with the wrapped lanes taken from the adjacent row's
  roll (ops/pallas_1d._conv_flat's dataflow, per pair word).  This is
  the wide-radius tier (the overlapped-lane stride cannot absorb halos
  past 32) and the tailed-ghost-block tier for the sharded engine (its
  edge strips move with one dynamic flat slice).

Symmetric taps +-d fold into one product via an exact pair add, and
taps with w == +-1 skip the product entirely.

This is the TPU pair-arithmetic answer to the reference's native-fp64
1-D tensor-core engine (``/root/reference/src/1d/1d_utils.h:44``
``DATA_TYPE double``; DMMA segments ``src/1d/gpu_1r.cu:21-87``,
radius-uniform band build ``src/1d/gpu_1r.cu:94-99``): fp32 lane rolls
+ error-free transformations instead of m8n8k4 fp64 MMA.

Numerics: identical EFT formulation to ops/df64.py (products exact via
12-bit Veltkamp halves, rounded corrections only enter plain adds --
FMA contraction cannot change any value); accuracy ~1e-14/step.  Single
step per call (the pair state's validity creeps r_eff lanes per step;
lane_halo >= r_eff on the lanes layout, one guard row on the flat one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.shapes import StencilSpec
from .df64 import df_add, veltkamp_split
from .layout import LANE, SUBLANE, Layout1D, Layout1DLanes
from .pallas_1d import _dense_taps, _lanes_fixup, effective_radius
from .pallas_df64 import _fold_taps, _pair_scale


def _pair_conv(hi, lo, his, hil, entries, rolled):
    """Evaluate the folded pair tap chain over shifted views.

    ``rolled(tag, d)`` returns the view for ``tag`` in {'h','l','hs',
    'hl'} shifted so cell f reads flat cell f+d; it must be an exact
    permutation of the view (rolls/selects only) so the split identity
    ``rolled('hs', d) + rolled('hl', d) == rolled('h', d)`` holds
    exactly.  Shared by the lanes, flat, and resident kernels."""
    acc_h = acc_l = None
    for kind, d, w4 in entries:
        if kind == "pair":
            zh, zl = df_add(rolled("h", d), rolled("l", d),
                            rolled("h", -d), rolled("l", -d))
            ph, pl_ = _pair_scale(zh, zl, w4)
        elif d == 0:
            ph, pl_ = _pair_scale(hi, lo, w4, split=(his, hil))
        elif (abs(w4[0]), w4[1]) == (1.0, 0.0):
            # w == +-1: the shifted pair itself (no product)
            ph, pl_ = _pair_scale(rolled("h", d), rolled("l", d), w4)
        else:
            xs, xl2 = rolled("hs", d), rolled("hl", d)
            # xs + xl2 == the rolled hi, exactly (split identity)
            ph, pl_ = _pair_scale(xs + xl2, rolled("l", d), w4,
                                  split=(xs, xl2))
        acc_h, acc_l = ((ph, pl_) if acc_h is None
                        else df_add(acc_h, acc_l, ph, pl_))
    if acc_h is None:
        acc_h = acc_l = jnp.zeros_like(hi)
    return acc_h, acc_l


def _lane_roller(views, Wd):
    """Shift factory on the overlapped-lane layout: one aligned cyclic
    roll per (view, offset), cached (group-crossing lanes land in the
    stale-by-contract halo lanes)."""
    cache = {}

    def rolled(tag, d):
        key = (tag, d)
        if key not in cache:
            v = views[tag]
            cache[key] = v if d % Wd == 0 else pltpu.roll(v, (-d) % Wd, 1)
        return cache[key]

    return rolled


def _flat_roller(views, lane):
    """Shift factory on the flat (rows, 128) row-major view: flat shift
    by d = lane roll with the wrapped lanes taken from the adjacent
    row's roll (pallas_1d._conv_flat), cached per (view, offset).  The
    outermost window rows read wrapped garbage -- they are guard rows,
    never stored (single step per call)."""
    cache = {}
    rowroll = {}

    def _neighbor(tag, up):
        key = (tag, up)
        if key not in rowroll:
            v = views[tag]
            R = v.shape[0]
            rowroll[key] = pltpu.roll(v, R - 1 if up else 1, 0)
        return rowroll[key]

    def rolled(tag, d):
        key = (tag, d)
        if key not in cache:
            v = views[tag]
            if d == 0:
                cache[key] = v
            elif d > 0:
                nb = _neighbor(tag, True)   # nb[i] = v[i+1]
                cache[key] = jnp.where(lane < LANE - d,
                                       pltpu.roll(v, LANE - d, 1),
                                       pltpu.roll(nb, LANE - d, 1))
            else:
                dd = -d
                nb = _neighbor(tag, False)  # nb[i] = v[i-1]
                cache[key] = jnp.where(lane >= dd,
                                       pltpu.roll(v, dd, 1),
                                       pltpu.roll(nb, dd, 1))
        return cache[key]

    return rolled


def _df64_1d_lanes_kernel(
    in_hbm,
    donor_hbm,  # aliased to out; never read
    *rest,
    layout: Layout1DLanes,
    n: int,
    entries,
    has_bounds: bool,
    region=None,
):
    bounds_ref = None
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    out_hbm, win, out_tile, sem_in, sem_out = rest

    TR = layout.tile_rows
    G = layout.guard_rows
    h = layout.lane_halo
    S = layout.stride
    Wd = layout.width
    ngrp = layout.groups
    t0, t1 = region if region is not None else (0, layout.grid[0])
    g = t1 - t0
    pid = pl.program_id(0)
    ti = t0 + pid
    slot = jax.lax.rem(pid, jnp.int32(2))
    nslot = jax.lax.rem(pid + 1, jnp.int32(2))

    def in_dma(t_i, s):
        return pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(t_i * TR, TR + 2 * G), :],
            win.at[s], sem_in.at[s],
        )

    def out_dma(t_i, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[:, pl.ds(G + t_i * TR, TR), :],
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
    row = jax.lax.broadcasted_iota(jnp.int32, (R, Wd), 0) + ti * TR - G
    jl = jax.lax.rem(lane, jnp.int32(LANE))
    if ngrp > 1:
        grp = jax.lax.div(lane, jnp.int32(LANE))
        flat = (row * ngrp + grp) * S + jl - h
    else:
        flat = row * S + jl - h
    if has_bounds:
        lo_b, hi_b = bounds_ref[0], bounds_ref[1]
    else:
        lo_b, hi_b = 0, n
    wmask = ((flat >= lo_b) & (flat < hi_b)).astype(jnp.float32)

    W = win[pl.ds(slot, 1)][0]  # (2, R, Wd)
    # halo-lane fixup per pair plane: HBM halo lanes are stale by
    # contract; the rebuild is pure copies/selects, exact on (hi, lo)
    hi = _lanes_fixup(W[0], lane, jl, h, Wd, ngrp)
    lo = _lanes_fixup(W[1], lane, jl, h, Wd, ngrp)
    # hoisted exact halves of hi (shared by every tap's partials)
    his, hil = veltkamp_split(hi)

    views = {"h": hi, "l": lo, "hs": his, "hl": hil}
    acc_h, acc_l = _pair_conv(hi, lo, his, hil, entries,
                              _lane_roller(views, Wd))
    acc_h = acc_h * wmask
    acc_l = acc_l * wmask

    @pl.when(pid >= 2)
    def _():
        out_dma(ti - 2, slot).wait()

    out_tile[slot, 0] = acc_h[G: G + TR, :]
    out_tile[slot, 1] = acc_l[G: G + TR, :]
    out_dma(ti, slot).start()

    @pl.when(pid == g - 1)
    def _():
        out_dma(ti, slot).wait()

    @pl.when((pid == g - 1) & (g >= 2))
    def _():
        out_dma(ti - 1, nslot).wait()


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "interpret", "region"),
)
def df64_1d_step(
    cur2: jax.Array,
    donor2: jax.Array,
    spec: StencilSpec,
    layout: Layout1DLanes,
    interpret: bool = False,
    bounds: "jax.Array | None" = None,
    region=None,
) -> jax.Array:
    """One df64 1-D stencil step on stacked (2, rows, width) fp32 pairs
    on the overlapped-lane layout.

    ``donor2`` is the zero-ringed spare buffer (aliased to the output:
    halo cells decay to zero after the step, reference semantics).
    ``bounds`` (optional, (2,) int32): dynamic [lo, hi) interior mask in
    local flat coordinates (domain-decomposed runs).  ``region``
    (optional, (t0, t1)): restrict the call to a tile-index window."""
    layout.validate()
    assert cur2.ndim == 3 and cur2.shape[0] == 2, cur2.shape
    assert cur2.dtype == jnp.float32
    r_eff = effective_radius(spec)
    if r_eff > layout.lane_halo:
        raise ValueError(
            f"the pair kernel needs lane_halo >= effective radius "
            f"{r_eff}; layout has {layout.lane_halo}")
    grid_now = layout.grid if region is None else (region[1] - region[0],)
    if interpret and grid_now == (1,) and layout.tile_rows >= 2 * SUBLANE:
        # trip-1 interpret grids get the emulation loop inlined and
        # XLA:CPU's elemental fusion can re-expand the df64 tap chain
        # per use (>5 min compiles on the 2-D pair kernel) -- loud
        # guard like df64_step / df64_3d_step when a tile split could
        # have produced >= 2 tiles (the engine/sharded layout builders
        # do that split).  Minimum-size tiles (tile_rows == SUBLANE,
        # <= 8 lane rows) are allowed through: the window and chain
        # are small enough that the inline compiles in seconds
        # (measured round 4's green ghost-boundary goldens at n=300).
        raise ValueError(
            "df64_1d_step cannot run a splittable single-tile grid in "
            "interpret mode (XLA:CPU df64-chain compile blowup); "
            "shrink tile_rows so the grid has >= 2 tiles")
    entries = _fold_taps(_dense_taps(spec))
    kernel = functools.partial(
        _df64_1d_lanes_kernel,
        layout=layout, n=layout.interior, entries=entries,
        has_bounds=bounds is not None, region=region,
    )
    grid = layout.grid
    if region is not None:
        t0, t1 = region
        assert 0 <= t0 < t1 <= grid[0]
        grid = (t1 - t0,)
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    TR = layout.tile_rows
    G = layout.guard_rows
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(cur2.shape, cur2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + bounds_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, TR + 2 * G, layout.width), jnp.float32),
            pltpu.VMEM((2, 2, TR, layout.width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
    )(cur2, donor2, *bounds_args)


def _df64_1d_flat_kernel(
    in_hbm,
    donor_hbm,  # aliased to out; never read
    *rest,
    layout: Layout1D,
    n: int,
    entries,
    has_bounds: bool,
    region=None,
):
    bounds_ref = None
    if has_bounds:
        bounds_ref = rest[0]
        rest = rest[1:]
    out_hbm, win, out_tile, sem_in, sem_out = rest

    TR = layout.tile_rows
    G = layout.guard_rows
    t0, t1 = region if region is not None else (0, layout.grid[0])
    g = t1 - t0
    pid = pl.program_id(0)
    ti = t0 + pid
    slot = jax.lax.rem(pid, jnp.int32(2))
    nslot = jax.lax.rem(pid + 1, jnp.int32(2))

    def in_dma(t_i, s):
        return pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(t_i * TR, TR + 2 * G), :],
            win.at[s], sem_in.at[s],
        )

    def out_dma(t_i, s):
        return pltpu.make_async_copy(
            out_tile.at[s],
            out_hbm.at[:, pl.ds(G + t_i * TR, TR), :],
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0) + ti * TR - G
    flat = row * LANE + lane
    if has_bounds:
        lo_b, hi_b = bounds_ref[0], bounds_ref[1]
    else:
        lo_b, hi_b = 0, n
    wmask = ((flat >= lo_b) & (flat < hi_b)).astype(jnp.float32)

    W = win[pl.ds(slot, 1)][0]  # (2, R, LANE)
    hi = W[0]
    lo = W[1]
    # hoisted exact halves of hi (shared by every tap's partials)
    his, hil = veltkamp_split(hi)
    views = {"h": hi, "l": lo, "hs": his, "hl": hil}
    acc_h, acc_l = _pair_conv(hi, lo, his, hil, entries,
                              _flat_roller(views, lane))
    acc_h = acc_h * wmask
    acc_l = acc_l * wmask

    @pl.when(pid >= 2)
    def _():
        out_dma(ti - 2, slot).wait()

    out_tile[slot, 0] = acc_h[G: G + TR, :]
    out_tile[slot, 1] = acc_l[G: G + TR, :]
    out_dma(ti, slot).start()

    @pl.when(pid == g - 1)
    def _():
        out_dma(ti, slot).wait()

    @pl.when((pid == g - 1) & (g >= 2))
    def _():
        out_dma(ti - 1, nslot).wait()


@functools.partial(
    jax.jit,
    static_argnames=("spec", "layout", "interpret", "region"),
)
def df64_1d_flat_step(
    cur2: jax.Array,
    donor2: jax.Array,
    spec: StencilSpec,
    layout: Layout1D,
    interpret: bool = False,
    bounds: "jax.Array | None" = None,
    region=None,
) -> jax.Array:
    """One df64 1-D stencil step on stacked (2, rows, 128) fp32 pairs on
    the flat Layout1D (row-major flat index = row*128 + lane).

    The wide-radius (32 < r_eff <= 127) and tailed-ghost-block tier: a
    flat shift costs two lane rolls + a select per pair word instead of
    the lanes layout's single roll, but stays an exact permutation, so
    the EFT chain's accuracy contract is unchanged (~1e-14/step).  The
    reference's fp64 band build is radius-uniform
    (``/root/reference/src/1d/gpu_1r.cu:94-99``); this keeps the df64
    tier radius-uniform to 127 instead of cliffing to the 12x-slower
    XLA pair path at r_eff = 33.

    ``donor2``/``bounds``/``region``: as in ``df64_1d_step``."""
    layout.validate()
    assert cur2.ndim == 3 and cur2.shape[0] == 2, cur2.shape
    assert cur2.dtype == jnp.float32
    r_eff = effective_radius(spec)
    if not 1 <= r_eff <= LANE - 1:
        raise ValueError(
            f"the flat pair kernel needs an effective radius in "
            f"[1, {LANE - 1}] (flat shifts wrap one row); got {r_eff}")
    grid_now = layout.grid if region is None else (region[1] - region[0],)
    if interpret and grid_now == (1,) and layout.tile_rows >= 2 * SUBLANE:
        # see df64_1d_step: loud only when a tile split could have
        # produced >= 2 tiles; minimum-size tiles run (small chain)
        raise ValueError(
            "df64_1d_flat_step cannot run a splittable single-tile "
            "grid in interpret mode (XLA:CPU df64-chain compile "
            "blowup); shrink tile_rows so the grid has >= 2 tiles")
    entries = _fold_taps(_dense_taps(spec))
    kernel = functools.partial(
        _df64_1d_flat_kernel,
        layout=layout, n=layout.interior, entries=entries,
        has_bounds=bounds is not None, region=region,
    )
    grid = layout.grid
    if region is not None:
        t0, t1 = region
        assert 0 <= t0 < t1 <= grid[0]
        grid = (t1 - t0,)
    bounds_args = [] if bounds is None else [jnp.asarray(bounds, jnp.int32)]
    bounds_specs = [] if bounds is None else [
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    TR = layout.tile_rows
    G = layout.guard_rows
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(cur2.shape, cur2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + bounds_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, TR + 2 * G, LANE), jnp.float32),
            pltpu.VMEM((2, 2, TR, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
    )(cur2, donor2, *bounds_args)


def _resident_pair_kernel(in_ref, out_ref, *, layout, n: int, entries,
                          steps: int, refresh: int):
    """ALL ``steps`` df64 timesteps on a VMEM-resident overlapped-lane
    pair grid (the df64 twin of pallas_1d._stencil1d_resident_lanes_kernel).

    The lane halo is ``refresh * r_eff`` deep, so the halo-lane fixup
    runs only every ``refresh`` steps; between fixups each step is the
    pair tap chain + the interior mask, with the roll garbage creeping
    r_eff lanes per step inside the halo margin.  Each step stores
    through the output ref -- value chains across the whole run make
    Mosaic keep every step's EFT temporaries live at once (the fp32
    resident kernels' round-1 lesson).  The 3-D output VMEM buffer
    starts UNINITIALIZED on the real backend despite the HBM alias
    (measured zeros; interpret mode happens to carry the input, and
    the 2-D fp32 resident kernels do get theirs carried), so the
    kernel seeds it from in_ref first."""
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

    def one_step(do_fixup):
        hi = out_ref[0]
        lo = out_ref[1]
        if do_fixup:
            hi = _lanes_fixup(hi, lane, jl, h, Wd, ngrp)
            lo = _lanes_fixup(lo, lane, jl, h, Wd, ngrp)
        his, hil = veltkamp_split(hi)
        views = {"h": hi, "l": lo, "hs": his, "hl": hil}
        acc_h, acc_l = _pair_conv(hi, lo, his, hil, entries,
                                  _lane_roller(views, Wd))
        out_ref[0] = acc_h * mask
        out_ref[1] = acc_l * mask

    out_ref[0] = in_ref[0]
    out_ref[1] = in_ref[1]

    def block(inner):
        one_step(True)
        for _ in range(inner - 1):
            one_step(False)

    nfull, tail = divmod(steps, refresh)

    def body(_, carry):
        block(refresh)
        return carry

    if nfull:
        jax.lax.fori_loop(0, nfull, body, 0)
    if tail:
        block(tail)


@functools.partial(
    jax.jit, static_argnames=("spec", "layout", "interpret", "steps"),
)
def stencil1d_resident_pair(
    cur2: jax.Array,
    spec: StencilSpec,
    layout: Layout1DLanes,
    steps: int,
    interpret: bool = False,
) -> jax.Array:
    """ALL ``steps`` df64 timesteps in ONE kernel on a VMEM-resident
    overlapped-lane pair grid.

    This is what lifts the dispatch-bound tiny-grid df64 configs (the
    reference's ACTUAL regime for its 1-D driver -- native fp64 at
    n=4096, ``/root/reference/src/1d/1d_utils.h:44`` + the resident-L2
    launch loop ``src/1d/gpu_1r.cu:121-123``): one dispatch per run
    instead of one ~0.9 ms tunnel dispatch per step."""
    layout.validate()
    assert cur2.ndim == 3 and cur2.shape[0] == 2, cur2.shape
    assert cur2.dtype == jnp.float32
    from .pallas_1d import fits_resident_lanes

    assert fits_resident_lanes(layout, itemsize=8), \
        "pair grid too large for the resident kernel"
    r_eff = effective_radius(spec)
    refresh = max(1, layout.lane_halo // max(1, r_eff))
    kernel = functools.partial(
        _resident_pair_kernel, layout=layout, n=layout.interior,
        entries=_fold_taps(_dense_taps(spec)), steps=steps,
        refresh=refresh,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cur2.shape, cur2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
    )(cur2)


def _vmem_limit() -> int:
    from .pallas_2d import vmem_limit_bytes

    return vmem_limit_bytes()
