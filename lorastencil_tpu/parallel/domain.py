"""Multi-chip domain decomposition: shard_map + ppermute halo exchange.

The reference is strictly single-GPU (SURVEY.md section 2, parallelism
checklist); large-grid scaling is new, TPU-native capability.  The grid's
interior is decomposed over a 1-D or 2-D device mesh; each device owns a
local internal-layout buffer (ops/layout.py) whose guard ring doubles as
the halo-receive buffer.  Per step:

  1. neighbor exchange over ICI with ``jax.lax.ppermute`` -- a two-phase
     (rows, then halo-extended columns) exchange so corner halos ride
     along, exactly the nearest-neighbor ring pattern of the hardware;
     devices on the global boundary receive ppermute's fill value (zero),
     which IS the reference's decaying Dirichlet-0 halo semantics;
  2. the single-device Pallas stencil step runs on the local buffer.

The whole multi-step loop is one jitted shard_map program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.shapes import StencilSpec, get_shape
from ..ops.layout import Layout2D, default_tile_2d


def _shift(x, axis_name: str, fwd: bool, npairs: int):
    """Neighbor ppermute along a mesh axis (non-wrapping; devices with no
    source receive zeros)."""
    if npairs == 1:
        return jnp.zeros_like(x)
    perm = [(i, i + 1) for i in range(npairs - 1)] if fwd else            [(i + 1, i) for i in range(npairs - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def make_mesh(shape: Tuple[int, ...], axis_names=("x", "y"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[: len(shape)])


@dataclasses.dataclass(frozen=True)
class ShardedConfig:
    mesh_shape: Tuple[int, int]  # (devices along rows, along cols)
    tile: Optional[Tuple[int, int]] = None
    precision: str = "highest"
    interpret: Optional[bool] = None
    algorithm: str = "vpu"
    # timesteps fused per halo exchange (2-D): one ppermute round per k
    # steps with k*radius-deep halos -- k fewer collectives per step.
    fused_steps: int = 1


class ShardedStencil2D:
    """Domain-decomposed 2-D stencil over a device mesh."""

    def __init__(self, spec: StencilSpec, interior: Tuple[int, int],
                 config: ShardedConfig, mesh: Optional[Mesh] = None):
        assert spec.ndim == 2
        self.spec = spec
        self.config = config
        gm, gn = interior
        dx, dy = config.mesh_shape
        assert gm % dx == 0 and gn % dy == 0, (
            "interior must divide the mesh for now")
        self.interior = (gm, gn)
        self.local_interior = (gm // dx, gn // dy)
        self.mesh = mesh if mesh is not None else make_mesh((dx, dy))
        tile = config.tile or default_tile_2d(*self.local_interior)
        from ..ops.layout import LANE, SUBLANE

        k = max(1, config.fused_steps)
        self.fused_steps = k
        # exchange depth per pass: k*radius cells feed the fused substeps
        self.depth = max(max(spec.halo), k * spec.radius)
        guard_r = SUBLANE * (-(-self.depth // SUBLANE))
        assert self.depth <= LANE
        if k > 1:
            # fused sharded runs forbid tile round-up (fake-interior cells
            # would alias the exchanged guard ring)
            lm, ln = self.local_interior
            assert lm % tile[0] == 0 and ln % tile[1] == 0, (
                "fused sharded runs need tile-aligned local blocks")
        self.layout = Layout2D(interior=self.local_interior, halo=spec.halo,
                               tile=tile, guard=(guard_r, LANE))
        self.precision = (jax.lax.Precision.HIGHEST
                          if config.precision == "highest"
                          else jax.lax.Precision.DEFAULT)
        self.interpret = (config.interpret if config.interpret is not None
                          else jax.default_backend() != "tpu")
        self._run_jit = jax.jit(self._run, static_argnames=("steps",))

    # -- halo exchange ----------------------------------------------------
    def _exchange(self, buf):
        """Fill the local guard ring from neighbors (zero at the global
        boundary) to ``self.depth`` cells -- deep enough for a whole
        fused pass.  buf: local internal buffer."""
        spec, lay = self.spec, self.layout
        hm = hn = self.depth
        m, n = lay.interior
        r0, c0 = lay.origin
        dx, dy = self.config.mesh_shape

        shift = _shift

        # Devices on the global boundary keep their existing ring (the
        # user-provided halo on step 1; zero afterwards), matching the
        # single-device reference semantics exactly.
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")

        # phase 1: rows (axis 'x').  Send my top interior strip to the
        # north neighbor (it becomes their bottom ring) and vice versa.
        top = buf[r0: r0 + hm, :]
        bot = buf[r0 + m - hm: r0 + m, :]
        from_north = shift(bot, "x", True, dx)    # north's bottom strip
        from_south = shift(top, "x", False, dx)   # south's top strip
        buf = buf.at[r0 - hm: r0, :].set(
            jnp.where(ix > 0, from_north, buf[r0 - hm: r0, :]))
        buf = buf.at[r0 + m: r0 + m + hm, :].set(
            jnp.where(ix < dx - 1, from_south, buf[r0 + m: r0 + m + hm, :]))

        # phase 2: cols (axis 'y'), strips include the just-filled ring
        # rows so corners propagate.
        left = buf[:, c0: c0 + hn]
        right = buf[:, c0 + n - hn: c0 + n]
        from_west = shift(right, "y", True, dy)
        from_east = shift(left, "y", False, dy)
        buf = buf.at[:, c0 - hn: c0].set(
            jnp.where(iy > 0, from_west, buf[:, c0 - hn: c0]))
        buf = buf.at[:, c0 + n: c0 + n + hn].set(
            jnp.where(iy < dy - 1, from_east, buf[:, c0 + n: c0 + n + hn]))
        return buf

    # -- per-device step ----------------------------------------------------
    def _local_step(self, cur, donor, fused_k):
        from ..ops import pallas_2d

        cur = self._exchange(cur)
        lm, ln = self.local_interior
        gm, gn = self.interior
        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")
        # global-interior bounds in local coordinates: interior devices
        # must not mask ring intermediates holding exchanged data
        bounds = jnp.stack([
            -ix * lm, gm - ix * lm, -iy * ln, gn - iy * ln,
        ]).astype(jnp.int32)
        return pallas_2d.stencil2d_step(
            cur, donor, self.spec, self.layout,
            precision=self.precision, interpret=self.interpret,
            algorithm=self.config.algorithm, fused_steps=fused_k,
            bounds=bounds,
        )

    def _run(self, state, steps: int):
        """state: sharded stack of local buffers, shape
        (dx * Mp_loc, dy * Np_loc), sharded P('x', 'y')."""
        from jax.experimental.shard_map import shard_map

        from ..engine import ping_pong_loop

        k = self.fused_steps

        def body_fn(local):
            return ping_pong_loop(self._local_step, local, steps, k)

        fn = shard_map(
            body_fn, mesh=self.mesh,
            in_specs=P("x", "y"), out_specs=P("x", "y"),
            check_rep=False,
        )
        return fn(state)

    # -- user API -----------------------------------------------------------
    def to_sharded(self, padded):
        """User global padded array -> sharded stack of local internal
        buffers (traceable; call inside jit for real runs)."""
        spec, lay = self.spec, self.layout
        hm, hn = spec.halo
        gm, gn = self.interior
        lm, ln = self.local_interior
        dx, dy = self.config.mesh_shape
        Mp, Np = lay.shape
        r0, c0 = lay.origin
        padded = jnp.asarray(padded, jnp.float32)
        out = jnp.zeros((dx * Mp, dy * Np), jnp.float32)
        # each local buffer gets its interior + (for edge devices) the
        # adjacent user halo; interior-device rings are filled by the
        # first exchange anyway, and the *user*-provided inter-device halo
        # values are exactly the neighbor interiors, so embedding
        # interior+halo per device reproduces step-1 semantics.
        for i in range(dx):
            for j in range(dy):
                src = padded[i * lm: i * lm + lm + 2 * hm,
                             j * ln: j * ln + ln + 2 * hn]
                out = out.at[
                    i * Mp + r0 - hm: i * Mp + r0 + lm + hm,
                    j * Np + c0 - hn: j * Np + c0 + ln + hn,
                ].set(src)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(self.mesh, P("x", "y")))

    def from_sharded(self, state):
        """Sharded local buffers -> user global padded array."""
        spec, lay = self.spec, self.layout
        hm, hn = spec.halo
        lm, ln = self.local_interior
        dx, dy = self.config.mesh_shape
        Mp, Np = lay.shape
        r0, c0 = lay.origin
        gm, gn = self.interior
        out = jnp.zeros((gm + 2 * hm, gn + 2 * hn), state.dtype)
        for i in range(dx):
            for j in range(dy):
                block = state[i * Mp + r0: i * Mp + r0 + lm,
                              j * Np + c0: j * Np + c0 + ln]
                out = out.at[hm + i * lm: hm + (i + 1) * lm,
                             hn + j * ln: hn + (j + 1) * ln].set(block)
        return out

    def run(self, padded, steps: int):
        """One jitted program end-to-end (embed -> exchange+steps ->
        extract); eager device ops are pathological over tunneled TPUs
        (CLAUDE.md rule 1)."""
        if not hasattr(self, "_full_jit"):
            self._full_jit = jax.jit(
                lambda g, steps: self.from_sharded(
                    self._run(self.to_sharded(g), steps)),
                static_argnames=("steps",),
            )
        return self._full_jit(padded, steps=steps)


class ShardedStencil3D:
    """Domain-decomposed 3-D stencil: the (row, col) plane axes shard over
    a 2-D mesh (the in-kernel z sweep stays local per device -- the same
    2.5-D blocking as the single-chip kernel), with the two-phase ppermute
    halo exchange applied plane-wise."""

    def __init__(self, spec: StencilSpec, interior, config: ShardedConfig,
                 mesh: Optional[Mesh] = None):
        assert spec.ndim == 3
        assert config.fused_steps == 1, (
            "sharded 3-D fusion not implemented yet; set fused_steps=1")
        from ..ops.layout import Layout3D, default_tile_3d

        self.spec = spec
        self.config = config
        h, gm, gn = interior
        dx, dy = config.mesh_shape
        assert gm % dx == 0 and gn % dy == 0
        self.interior = tuple(interior)
        self.local_interior = (h, gm // dx, gn // dy)
        self.mesh = mesh if mesh is not None else make_mesh((dx, dy))
        tile = config.tile or default_tile_3d(gm // dx, gn // dy)
        self.layout = Layout3D(interior=self.local_interior, halo=spec.halo,
                               tile=tile)
        self.precision = (jax.lax.Precision.HIGHEST
                          if config.precision == "highest"
                          else jax.lax.Precision.DEFAULT)
        self.interpret = (config.interpret if config.interpret is not None
                          else jax.default_backend() != "tpu")
        self._run_jit = jax.jit(self._run, static_argnames=("steps",))

    def _exchange(self, buf):
        spec, lay = self.spec, self.layout
        _, hm, hn = spec.halo
        _, m, n = lay.interior
        _, r0, c0 = lay.origin
        dx, dy = self.config.mesh_shape

        shift = _shift

        ix = jax.lax.axis_index("x")
        iy = jax.lax.axis_index("y")

        top = buf[:, r0: r0 + hm, :]
        bot = buf[:, r0 + m - hm: r0 + m, :]
        from_north = shift(bot, "x", True, dx)
        from_south = shift(top, "x", False, dx)
        buf = buf.at[:, r0 - hm: r0, :].set(
            jnp.where(ix > 0, from_north, buf[:, r0 - hm: r0, :]))
        buf = buf.at[:, r0 + m: r0 + m + hm, :].set(
            jnp.where(ix < dx - 1, from_south,
                      buf[:, r0 + m: r0 + m + hm, :]))

        left = buf[:, :, c0: c0 + hn]
        right = buf[:, :, c0 + n - hn: c0 + n]
        from_west = shift(right, "y", True, dy)
        from_east = shift(left, "y", False, dy)
        buf = buf.at[:, :, c0 - hn: c0].set(
            jnp.where(iy > 0, from_west, buf[:, :, c0 - hn: c0]))
        buf = buf.at[:, :, c0 + n: c0 + n + hn].set(
            jnp.where(iy < dy - 1, from_east,
                      buf[:, :, c0 + n: c0 + n + hn]))
        return buf

    def _local_step(self, cur, donor):
        from ..ops import pallas_3d

        cur = self._exchange(cur)
        return pallas_3d.stencil3d_step(
            cur, donor, self.spec, self.layout,
            precision=self.precision, interpret=self.interpret,
            algorithm=self.config.algorithm)

    def _run(self, state, steps: int):
        from jax.experimental.shard_map import shard_map

        from ..engine import ping_pong_loop

        def body_fn(local):
            return ping_pong_loop(
                lambda cur, donor, _k: self._local_step(cur, donor),
                local, steps, 1)

        fn = shard_map(body_fn, mesh=self.mesh,
                       in_specs=P(None, "x", "y"),
                       out_specs=P(None, "x", "y"), check_rep=False)
        return fn(state)

    def to_sharded(self, padded):
        spec, lay = self.spec, self.layout
        hz, hm, hn = spec.halo
        h, lm, ln = self.local_interior
        dx, dy = self.config.mesh_shape
        Hp, Mp, Np = lay.shape
        z0, r0, c0 = lay.origin
        padded = jnp.asarray(padded, jnp.float32)
        out = jnp.zeros((Hp, dx * Mp, dy * Np), jnp.float32)
        for i in range(dx):
            for j in range(dy):
                src = padded[:, i * lm: i * lm + lm + 2 * hm,
                             j * ln: j * ln + ln + 2 * hn]
                out = out.at[
                    :,
                    i * Mp + r0 - hm: i * Mp + r0 + lm + hm,
                    j * Np + c0 - hn: j * Np + c0 + ln + hn,
                ].set(src)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(self.mesh, P(None, "x", "y")))

    def from_sharded(self, state):
        spec, lay = self.spec, self.layout
        hz, hm, hn = spec.halo
        h, lm, ln = self.local_interior
        dx, dy = self.config.mesh_shape
        Hp, Mp, Np = lay.shape
        z0, r0, c0 = lay.origin
        gm, gn = dx * lm, dy * ln
        out = jnp.zeros((h + 2 * hz, gm + 2 * hm, gn + 2 * hn), state.dtype)
        for i in range(dx):
            for j in range(dy):
                block = state[:, i * Mp + r0: i * Mp + r0 + lm,
                              j * Np + c0: j * Np + c0 + ln]
                out = out.at[:, hm + i * lm: hm + (i + 1) * lm,
                             hn + j * ln: hn + (j + 1) * ln].set(block)
        return out

    def run(self, padded, steps: int):
        """One jitted program end-to-end (embed -> exchange+steps ->
        extract); eager device ops are pathological over tunneled TPUs
        (CLAUDE.md rule 1)."""
        if not hasattr(self, "_full_jit"):
            self._full_jit = jax.jit(
                lambda g, steps: self.from_sharded(
                    self._run(self.to_sharded(g), steps)),
                static_argnames=("steps",),
            )
        return self._full_jit(padded, steps=steps)


class ShardedStencil1D:
    """Domain-decomposed 1-D stencil over a 1-D mesh: each device owns a
    contiguous flat block; per step the 4-cell edge strips ppermute to the
    neighbors' guard cells (the user halo positions), then the single-chip
    kernel runs locally."""

    def __init__(self, spec: StencilSpec, interior: int,
                 config: ShardedConfig, mesh: Optional[Mesh] = None):
        assert spec.ndim == 1
        assert config.fused_steps == 1, (
            "sharded 1-D fusion not implemented yet; set fused_steps=1")
        from ..ops.layout import LANE, Layout1D

        self.spec = spec
        self.config = config
        (dx,) = config.mesh_shape[:1]
        assert interior % dx == 0 and (interior // dx) % LANE == 0, (
            "local block must be lane-aligned")
        self.interior = interior
        self.local_interior = interior // dx
        self.dx = dx
        self.mesh = mesh if mesh is not None else make_mesh((dx,), ("x",))
        rows = max(8, min(512, 8 * (-(-self.local_interior // (8 * 128)))))
        self.layout = Layout1D(interior=self.local_interior,
                               halo=spec.halo[0], tile_rows=rows)
        self.interpret = (config.interpret if config.interpret is not None
                          else jax.default_backend() != "tpu")
        self._run_jit = jax.jit(self._run, static_argnames=("steps",))

    def _exchange(self, buf):
        h = self.spec.halo[0]
        n = self.local_interior
        o = self.layout.origin
        dx = self.dx
        flat = buf.reshape(-1)
        ix = jax.lax.axis_index("x")

        def shift(x, fwd):
            return _shift(x, "x", fwd, dx)

        head = flat[o: o + h]
        tail = flat[o + n - h: o + n]
        from_left = shift(tail, True)
        from_right = shift(head, False)
        flat = flat.at[o - h: o].set(
            jnp.where(ix > 0, from_left, flat[o - h: o]))
        flat = flat.at[o + n: o + n + h].set(
            jnp.where(ix < dx - 1, from_right, flat[o + n: o + n + h]))
        return flat.reshape(buf.shape)

    def _local_step(self, cur, donor):
        from ..ops import pallas_1d

        cur = self._exchange(cur)
        return pallas_1d.stencil1d_step(
            cur, donor, self.spec, self.layout, interpret=self.interpret)

    def _run(self, state, steps: int):
        from jax.experimental.shard_map import shard_map

        from ..engine import ping_pong_loop

        def body_fn(local):
            return ping_pong_loop(
                lambda cur, donor, _k: self._local_step(cur, donor),
                local, steps, 1)

        fn = shard_map(body_fn, mesh=self.mesh,
                       in_specs=P("x", None), out_specs=P("x", None),
                       check_rep=False)
        return fn(state)

    def to_sharded(self, padded):
        h = self.spec.halo[0]
        n = self.local_interior
        o = self.layout.origin
        R, L = self.layout.shape
        padded = jnp.asarray(padded, jnp.float32)
        out = jnp.zeros((self.dx * R * L,), jnp.float32)
        for i in range(self.dx):
            src = padded[i * n: i * n + n + 2 * h]
            out = out.at[i * R * L + o - h: i * R * L + o + n + h].set(src)
        return jax.lax.with_sharding_constraint(
            out.reshape(self.dx * R, L),
            NamedSharding(self.mesh, P("x", None)))

    def from_sharded(self, state):
        h = self.spec.halo[0]
        n = self.local_interior
        o = self.layout.origin
        R, L = self.layout.shape
        flat = state.reshape(-1)
        out = jnp.zeros((self.interior + 2 * h,), state.dtype)
        for i in range(self.dx):
            out = out.at[h + i * n: h + (i + 1) * n].set(
                flat[i * R * L + o: i * R * L + o + n])
        return out

    def run(self, padded, steps: int):
        """One jitted program end-to-end (embed -> exchange+steps ->
        extract); eager device ops are pathological over tunneled TPUs
        (CLAUDE.md rule 1)."""
        if not hasattr(self, "_full_jit"):
            self._full_jit = jax.jit(
                lambda g, steps: self.from_sharded(
                    self._run(self.to_sharded(g), steps)),
                static_argnames=("steps",),
            )
        return self._full_jit(padded, steps=steps)


def sharded_engine(name: str, interior, mesh_shape, **kw):
    spec = get_shape(name)
    cfg = ShardedConfig(mesh_shape=tuple(mesh_shape), **kw)
    if spec.ndim == 3:
        return ShardedStencil3D(spec, tuple(interior), cfg)
    if spec.ndim == 1:
        return ShardedStencil1D(spec, int(np.atleast_1d(interior)[0]), cfg)
    return ShardedStencil2D(spec, tuple(interior), cfg)
