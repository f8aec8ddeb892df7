"""Internal TPU grid layout.

The user-facing state is the reference-compatible padded array
(interior + halo, e.g. ``(m+8, n+8)`` for 2-D -- ``src/2d/main.cu:217-218``).
Internally we re-embed it into an MXU/VPU-aligned buffer so that every
*output tile write* is aligned to (8 sublanes x 128 lanes):

    rows:  [ guard 8 | interior rows (padded to tile multiple) | guard 8 ]
    cols:  [ guard 128 | interior cols (padded to tile multiple) | guard 128 ]

The user halo lives in the innermost cells of the guard bands (width =
spec.halo); everything else in the guard is zero and *stays* zero: kernels
write only interior-aligned tiles, and the step function reuses a
zero-ringed donor buffer for the output, so halo cells decay to zero after
the first step exactly like the reference's zero-initialized ping-pong
device buffers (``src/2d/gpu.cu:396-400``; SURVEY.md section 4).

Interior cells beyond the true interior (tile round-up) are masked to zero
by the kernels so they never leak into real cells on later steps.

1-D uses a flattened 2-D view: the padded 1-D array is stored row-major in
a ``(rows, 128)`` buffer where flat index = row*128 + lane, with an
8-row guard top and bottom (so per-tile DMA offsets stay sublane-aligned);
the user halo (4 cells) occupies the last lanes of the guard.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

LANE = 128
SUBLANE = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class Layout2D:
    interior: Tuple[int, int]  # (m, n)
    halo: Tuple[int, int]
    tile: Tuple[int, int]  # (TM, TN): TM % 8 == 0, TN % 128 == 0
    # guard band = kernel DMA window halo; rows may exceed SUBLANE when
    # multiple timesteps are fused per HBM round trip (halo k*radius).
    guard: Tuple[int, int] = (SUBLANE, LANE)
    # extra zero row-tiles of storage below the round-up padding: the
    # time-skewed kernel's output stripes lag its input bands by
    # k*skew rows, so its last band can spill one tile past ceil(m/TM)
    # (pallas_2d.stencil2d_skew_step).  Not part of ``grid``.
    extra_row_tiles: int = 0

    @property
    def grid(self) -> Tuple[int, int]:
        m, n = self.interior
        return (_cdiv(m, self.tile[0]), _cdiv(n, self.tile[1]))

    @property
    def origin(self) -> Tuple[int, int]:
        """Internal coordinates of interior cell (0, 0)."""
        return self.guard

    @property
    def shape(self) -> Tuple[int, int]:
        gi, gj = self.grid
        gr, gc = self.guard
        return (gr + (gi + self.extra_row_tiles) * self.tile[0] + gr,
                gc + gj * self.tile[1] + gc)

    def validate(self):
        hm, hn = self.halo
        gr, gc = self.guard
        assert self.tile[0] % SUBLANE == 0 and self.tile[1] % LANE == 0
        assert gr % SUBLANE == 0 and gc % LANE == 0
        assert hm <= gr and hn <= gc, "halo must fit in the guard"

    def to_internal(self, padded, dtype=jnp.float32):
        """Embed a user padded array (m+2*hm, n+2*hn) into the internal
        buffer (user halo goes into the guard ring)."""
        m, n = self.interior
        hm, hn = self.halo
        buf = jnp.zeros(self.shape, dtype=dtype)
        r0, c0 = self.origin
        return buf.at[r0 - hm: r0 + m + hm, c0 - hn: c0 + n + hn].set(
            jnp.asarray(padded, dtype=dtype)
        )

    def from_internal(self, buf):
        """Extract the user padded array from the internal buffer."""
        m, n = self.interior
        hm, hn = self.halo
        r0, c0 = self.origin
        return buf[r0 - hm: r0 + m + hm, c0 - hn: c0 + n + hn]


@dataclasses.dataclass(frozen=True)
class Layout1D:
    interior: int  # n
    halo: int
    tile_rows: int  # rows of 128 lanes per block
    # window guard rows on each side of a tile (>= SUBLANE, multiple of
    # SUBLANE): edge garbage creeps one row per fused substep, so
    # fused_steps up to guard_rows are legal
    guard_rows: int = SUBLANE

    @property
    def grid(self) -> Tuple[int]:
        return (_cdiv(self.interior, self.tile_rows * LANE),)

    @property
    def origin(self) -> int:
        """Flat internal index of interior element 0 (row guard_rows,
        lane 0, so per-tile DMA offsets stay (8, 128)-aligned)."""
        return self.guard_rows * LANE

    @property
    def shape(self) -> Tuple[int, int]:
        (g,) = self.grid
        return (self.guard_rows + g * self.tile_rows + self.guard_rows,
                LANE)

    def validate(self):
        assert self.halo <= LANE
        assert self.tile_rows % SUBLANE == 0
        assert self.guard_rows % SUBLANE == 0 and self.guard_rows >= SUBLANE

    def to_internal(self, padded, dtype=jnp.float32):
        n, h = self.interior, self.halo
        buf = jnp.zeros(self.shape[0] * LANE, dtype=dtype)
        buf = buf.at[self.origin - h: self.origin + n + h].set(
            jnp.asarray(padded, dtype=dtype)
        )
        return buf.reshape(self.shape)

    def from_internal(self, buf):
        n, h = self.interior, self.halo
        flat = buf.reshape(-1)
        return flat[self.origin - h: self.origin + n + h]


@dataclasses.dataclass(frozen=True)
class Layout1DLanes:
    """Overlapped-lane 1-D layout: each 128-lane row carries ``lane_halo``
    duplicated edge cells per side, so a flat shift by ``|d| <= lane_halo``
    is ONE aligned cyclic lane roll with no cross-row wrap select (the
    flat ``Layout1D`` pays 2 rolls + a select per tap for the 128-lane
    wrap).  The payload stride per row is ``128 - 2*lane_halo``; the
    ~2h/128 storage and DMA overhead buys a ~2x lower per-tap op count
    (PERF.md, round 3).

    Halo lanes in HBM are STALE BY CONTRACT: kernels reconstruct them
    from the neighbor rows' payload lanes at the start of every call
    (rows are otherwise fully independent), and stores write whatever
    garbage the roll wrap left there.  ``to_internal`` writes them
    valid; ``from_internal`` reads payload lanes only.

    128-lane group g of row r, lane-in-group j always represents flat
    cell f = ((r - guard_rows)*groups + g)*S + (j - lane_halo) with S the
    payload stride -- the linear map holds for halo lanes too (they
    duplicate the neighbor group's cells).

    ``width`` packs several 128-lane groups side by side in one stored
    row (consecutive flat chunks left to right), so the kernel's rolls
    run at a wide extent: narrow (rows, 128) arrays process VPU ops ~3x
    slower on v5e (measured round 3; width 2048 took 1d2r 16M from 28.7
    to beyond the flat kernel's wall).  A cyclic roll over the full
    width still shifts every group by d: interior lanes never read
    across their group boundary for |d| <= lane_halo, and the
    group-crossing lanes land in halo lanes (stale by contract).
    """

    interior: int  # n
    halo: int      # user halo cells (reference: 4)
    lane_halo: int  # duplicated cells per 128-group side (>= k*radius)
    tile_rows: int
    guard_rows: int = SUBLANE
    width: int = LANE  # stored lanes per row (multiple of 128)
    # built FOR the VMEM-resident kernel (deep halo sized for periodic
    # in-kernel refresh); the runtime dispatch gates on this flag, not
    # on a byte threshold, so tiled layouts never stray into the
    # resident path (and vice versa)
    resident: bool = False

    @classmethod
    def build(cls, n: int, halo: int, fused_steps: int, r_eff: int,
              overlap_min_tiles: "int | None" = None):
        """Measured-default sizing, shared by the single-chip engine and
        the sharded 1-D engine: clamp the fusion depth so the lane halo
        fits (k*r_eff <= 32), pick the widest stored row (2048 max)
        that still leaves a few tile rows of work, and cap tile_rows so
        each double-buffered window slot stays ~<= 1M under the 16M
        scoped-vmem budget (substeps add ~4 transient extents).

        ``overlap_min_tiles``: keep at least this many tiles so a
        boundary/interior region split has an interior (the sharded
        overlapped exchange).  Returns ``(layout, clamped_fused_steps)``.
        """
        r_eff = max(1, r_eff)
        k = max(1, min(fused_steps, 32 // r_eff))
        h = k * r_eff
        S = LANE - 2 * h
        width = 2048
        while width > LANE and n < (S * width // LANE) * 4 * SUBLANE:
            width //= 2
        groups = width // LANE
        narrow_rows = _cdiv(n, S)
        rows_w = _cdiv(narrow_rows, groups)
        # per-slot window cap 4M (the MXU conv gains from deeper tiles:
        # 1d1r 16M 99 -> 103 GCells/s, round 4), but small grids keep
        # the measured round-3 1M-cap geometry (the 1M-cell config's
        # best, 76.5, was at that depth; starving the double-buffer
        # pipeline below ~5 tiles collapsed it to 17.6)
        cap4m = max(SUBLANE, (2**22 // (width * 4) - 2 * SUBLANE)
                    // SUBLANE * SUBLANE)
        cap1m = max(SUBLANE, (2**20 // (width * 4) - 2 * SUBLANE)
                    // SUBLANE * SUBLANE)
        deep = max(cap1m, SUBLANE * (rows_w // (6 * SUBLANE)))
        rows_l = max(SUBLANE, min(cap4m, deep,
                                  SUBLANE * _cdiv(rows_w, SUBLANE)))
        if (overlap_min_tiles is not None
                and rows_w >= overlap_min_tiles * SUBLANE):
            rows_l = min(rows_l,
                         max(SUBLANE, SUBLANE * (rows_w
                                                 // (overlap_min_tiles
                                                     * SUBLANE))))
        return cls(interior=n, halo=halo, lane_halo=h, tile_rows=rows_l,
                   width=width), k

    @property
    def stride(self) -> int:
        return LANE - 2 * self.lane_halo

    @property
    def groups(self) -> int:
        return self.width // LANE

    @property
    def grid(self) -> Tuple[int]:
        per_row = self.stride * self.groups
        return (_cdiv(_cdiv(self.interior, per_row), self.tile_rows),)

    @property
    def shape(self) -> Tuple[int, int]:
        (g,) = self.grid
        return (self.guard_rows + g * self.tile_rows + self.guard_rows,
                self.width)

    def validate(self):
        assert 1 <= self.lane_halo and self.stride >= 32
        assert self.width % LANE == 0
        assert self.tile_rows % SUBLANE == 0
        assert self.guard_rows % SUBLANE == 0 and self.guard_rows >= SUBLANE
        assert self.halo <= self.guard_rows * self.stride * self.groups

    def to_internal(self, padded, dtype=jnp.float32):
        n, uh, h = self.interior, self.halo, self.lane_halo
        S = self.stride
        rows = self.shape[0] * self.groups  # narrow (128-lane) rows
        core = jnp.zeros(rows * S, dtype=dtype)
        base = self.guard_rows * self.groups * S
        core = core.at[base - uh: base + n + uh].set(
            jnp.asarray(padded, dtype=dtype))
        core = core.reshape(rows, S)
        buf = jnp.zeros((rows, LANE), dtype=dtype)
        buf = buf.at[:, h: h + S].set(core)
        prev = jnp.concatenate(
            [jnp.zeros((1, S), dtype=dtype), core[:-1]], axis=0)
        nxt = jnp.concatenate(
            [core[1:], jnp.zeros((1, S), dtype=dtype)], axis=0)
        buf = buf.at[:, :h].set(prev[:, S - h:])
        buf = buf.at[:, LANE - h:].set(nxt[:, :h])
        return buf.reshape(self.shape)

    def from_internal(self, buf):
        n, uh, h = self.interior, self.halo, self.lane_halo
        S = self.stride
        rows = self.shape[0] * self.groups
        core = buf.reshape(rows, LANE)[:, h: h + S].reshape(-1)
        base = self.guard_rows * self.groups * S
        return core[base - uh: base + n + uh]

    def flat_pos(self, f: int) -> Tuple[int, int]:
        """(stored_row, lane_start) of flat cell f (valid for negative
        f: the guard rows hold the pre-interior cells)."""
        q, off = divmod(f, self.stride)
        wr, g = divmod(self.guard_rows * self.groups + q, self.groups)
        return wr, g * LANE + self.lane_halo + off

    def read_flat(self, buf, f0: int, d: int):
        """Gather flat cells [f0, f0+d) via static payload-lane slices
        (at most ceil(d/stride)+1 pieces)."""
        parts = []
        f, left = f0, d
        while left > 0:
            wr, ls = self.flat_pos(f)
            take = min(left, self.stride - (f % self.stride))
            parts.append(buf[wr, ls: ls + take])
            f += take
            left -= take
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def write_flat(self, buf, f0: int, vals):
        """Scatter flat cells [f0, f0+len) (payload lanes only; the
        duplicated halo lanes are stale-by-contract and rebuilt by the
        kernel's start-of-call fixup)."""
        f, pos, left = f0, 0, int(vals.shape[0])
        while left > 0:
            wr, ls = self.flat_pos(f)
            take = min(left, self.stride - (f % self.stride))
            buf = buf.at[wr, ls: ls + take].set(vals[pos: pos + take])
            f += take
            pos += take
            left -= take
        return buf


@dataclasses.dataclass(frozen=True)
class Layout3D:
    interior: Tuple[int, int, int]  # (h, m, n)
    halo: Tuple[int, int, int]      # (1, 2, 4) for the reference shapes
    tile: Tuple[int, int]           # (TM, TN) in-plane tile
    # z guard planes (>= halo[0]; widened to fused_steps*radius when
    # timesteps are fused so slab windows can read k planes back)
    zguard: int = 1

    @property
    def grid(self) -> Tuple[int, int]:
        _, m, n = self.interior
        return (_cdiv(m, self.tile[0]), _cdiv(n, self.tile[1]))

    @property
    def origin(self) -> Tuple[int, int, int]:
        return (self.zguard, SUBLANE, LANE)

    @property
    def shape(self) -> Tuple[int, int, int]:
        h = self.interior[0]
        gi, gj = self.grid
        return (h + 2 * self.zguard,
                SUBLANE + gi * self.tile[0] + SUBLANE,
                LANE + gj * self.tile[1] + LANE)

    def validate(self):
        assert self.tile[0] % SUBLANE == 0 and self.tile[1] % LANE == 0
        assert self.halo[1] <= SUBLANE and self.halo[2] <= LANE
        assert self.zguard >= self.halo[0]

    def to_internal(self, padded, dtype=jnp.float32):
        h, m, n = self.interior
        hz, hm, hn = self.halo
        buf = jnp.zeros(self.shape, dtype=dtype)
        z0, r0, c0 = self.origin
        return buf.at[z0 - hz: z0 + h + hz,
                      r0 - hm: r0 + m + hm,
                      c0 - hn: c0 + n + hn].set(
            jnp.asarray(padded, dtype=dtype)
        )

    def from_internal(self, buf):
        h, m, n = self.interior
        hz, hm, hn = self.halo
        z0, r0, c0 = self.origin
        return buf[z0 - hz: z0 + h + hz,
                   r0 - hm: r0 + m + hm,
                   c0 - hn: c0 + n + hn]


def default_tile_2d(m: int, n: int,
                    mxu_residue: bool = False) -> Tuple[int, int]:
    """Pick a VMEM-friendly tile: big enough to amortize halo overhead.
    Measured on v5e (round 4, with the raised scoped-VMEM ceiling --
    pallas_2d.vmem_limit_bytes): (256, 2048) is the across-algorithm
    large-grid optimum (mxu_hybrid1 55.1, vpu_roll 47.4, star2d3r
    hybrid1 65.7 GCells/s at 8192^2; taller tiles regress: 51.5 at
    (384, 2048)).  ``mxu_residue`` is retained for API compatibility;
    the 16M-era (128, 2048) special case is gone."""
    del mxu_residue
    if n >= 2048 and m >= 256:
        return (256, 2048)
    tn = 1024 if n >= 1024 else (512 if n >= 512
                                 else LANE * max(1, _cdiv(n, LANE)))
    tm = 256 if m >= 256 else SUBLANE * max(1, _cdiv(m, SUBLANE))
    return (tm, tn)


def divisor_tile_2d(m: int, n: int) -> Tuple[int, int]:
    """Largest (8-multiple, 128-multiple) tile <= (256, 1024) that
    DIVIDES (m, n) -- fused sharded runs forbid tile round-up (fake
    interior cells would alias the exchanged guard ring), and the
    measured-best (192, 2048) default does not divide power-of-two
    local blocks."""
    tm = SUBLANE
    for c in range(256, SUBLANE - 1, -SUBLANE):
        if m % c == 0:
            tm = c
            break
    tn = LANE
    for c in range(1024, LANE - 1, -LANE):
        if n % c == 0:
            tn = c
            break
    return (tm, tn)


def default_tile_3d(m: int, n: int, spec=None) -> Tuple[int, int]:
    """Measured v5e (round 3, sync-calibrated): (64, 512) wins for both
    3-D shapes at 512^3 (box 48.2, star 43.7 GCells/s; star was 35.2 at
    (64, 256)).  At 256^3 the split is by term structure (round-5
    suite-methodology A/B, pipeline=24): specs with NO buffered plane
    convs (star3d1r: identity-z planes + center cross) win at
    (256, 256) -- fp32 68.2 vs 66.3, bf16 78.3 vs 70.7 GCells/s --
    while specs WITH a buffered z-spanning plane conv (box3d1r) keep
    (128, 256) (64.7 vs 60.9 / 71.5 vs 65.5): the buffered conv slab
    scales with TM*TN, so the bigger tile costs slab depth exactly
    when the conv buffer exists.  ``spec`` (optional StencilSpec)
    enables the structure check; --autotune still resolves per shape."""
    if n >= 512 and m >= 64:
        return (64, 512)
    buffered = spec is not None and any(
        t.taps[0] is not None
        and (t.taps[1] is not None or t.taps[2] is not None)
        for t in spec.terms)
    big_m = 256 if (spec is not None and not buffered) else 128
    tn = 256 if n >= 256 else LANE * max(1, _cdiv(n, LANE))
    tm = (big_m if m >= big_m
          else 128 if m >= 128
          else SUBLANE * max(1, _cdiv(m, SUBLANE)))
    return (tm, tn)
