"""High-level stencil engine: the user-facing API of the framework.

Mirrors the reference's host API layer (one ``gpu_<shape>()`` wrapper per
shape, ``/root/reference/src/*/*.cu`` -- coefficient factorization, device
upload, ping-pong timestep loop) as a single declarative engine:

    eng = StencilEngine.for_shape("star2d1r", interior=(4096, 4096))
    out_padded = eng.run(in_padded, steps=64)   # one jit, donated buffers

Design notes (TPU-first):
  * The whole multi-step loop is one jitted program (``lax.fori_loop``
    with donated ping-pong buffers) -- a single device program per call,
    never one dispatch per step like the reference's per-step kernel
    launches (``src/2d/gpu.cu:410-412``).
  * State lives in the aligned internal layout (ops/layout.py); the
    reference-compatible padded array only appears at the boundary.
  * ``backend='pallas'`` (default) uses the Pallas kernels; ``'xla'``
    uses the pure-XLA separable step (always available, and the measured
    baseline for bench).  On non-TPU backends Pallas runs in interpret
    mode automatically.
  * ``algorithm`` picks the compute path inside the kernels (see
    EngineConfig.algorithm); the default 'auto' resolves per shape/dtype
    to the measured-fastest path of matching accuracy (resolve_algorithm:
    2-D 'mxu_hybrid1' / bf16 no-residue 'mxu_hybrid', 1-D 'mxu',
    3-D 'vpu', fp64 'vpu_roll').
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.shapes import StencilSpec, get_shape
from .ops import xla_ref
from .ops.layout import (LANE, SUBLANE, Layout1D, Layout2D, Layout3D,
                         default_tile_2d, default_tile_3d)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _ring_refresh_nd(state, mode: str, origin, dims, d: int):
    """Axis-by-axis ghost-ring fill (depth ``d``) around the box at
    ``origin``/``dims``: 'periodic' copies the opposite interior edge,
    'reflect' mirrors the same edge, 'zero' clears the ring.  Later axes
    copy the already-written rings, so corners (and 3-D edges) compose
    exactly like np.pad / the sharded two-phase exchange."""
    ext = [slice(o, o + sdim) for o, sdim in zip(origin, dims)]
    s = state
    for a in range(len(ext)):
        o, nd = origin[a], dims[a]

        def at(sl_a, ext=tuple(ext), a=a):
            t = list(ext)
            t[a] = sl_a
            return tuple(t)

        head = s[at(slice(o, o + d))]
        tail = s[at(slice(o + nd - d, o + nd))]
        if mode == "reflect":
            lsrc = jnp.flip(head, axis=a)
            rsrc = jnp.flip(tail, axis=a)
        elif mode == "periodic":
            lsrc, rsrc = tail, head
        else:
            lsrc = rsrc = jnp.zeros_like(head)
        s = s.at[at(slice(o - d, o))].set(lsrc)
        s = s.at[at(slice(o + nd, o + nd + d))].set(rsrc)
        ext[a] = slice(o - d, o + nd + d)
    return s


def resolve_algorithm(spec: StencilSpec, name: str,
                      dtype=jnp.float32) -> str:
    """Resolve algorithm='auto' per shape to the measured-fastest EXACT
    path (PERF.md accuracy/speed table):

      * 'mxu_hybrid1' (column convs on the MXU, row convs + residue on
        the VPU, co-issued) for every 2-D fp32/bf16 spec.  Few-term
        specs put all column convs on the MXU (round-4: star2d1r 8192^2
        52.5 vs 45.5 vpu_roll, star2d3r 63.8 vs 54.9 mxu_hybrid3);
        many-term (box) specs use the per-dtype MXU-term cap in
        pallas_2d (round-5: exact 51.0 at cap 1 vs 49.8 all-VPU
        vpu_roll and 35.1 at cap 3; bf16 uncapped 88.3 vs 59.8);
      * 'vpu_roll' for fp64 (bf16 splits are fp32-grade; fp64 needs the
        exact VPU path); 'vpu' / 'mxu' for 3-D / 1-D as below.
    """
    if name != "auto":
        return name
    if jnp.dtype(dtype) == jnp.float64:
        return "vpu_roll"  # fp64 CPU tier: exact VPU path only
    if spec.ndim == 3:
        return "vpu"  # 3-D plane convs: slices beat rolls at the
        # measured extents; 'vpu_roll' stays an explicit option
    if spec.ndim == 1:
        # per-128-group banded MXU matmuls on the lanes layout (exact
        # split): 1d2r 16M 90.2 vs 38.4 roll-VPU, 1d1r 96.2 (round 4);
        # non-lanes fallbacks (resident / wide-radius) ignore this
        return "mxu"
    if len(spec.terms) <= 2:
        # bf16 state, NO residue: both axes on the MXU at one part each
        # beats the hybrid1 split assignment (62.5 vs 54.9 at 8192^2,
        # round 4) and its 2-part matrices are exact given the storage
        # rounding.  WITH residue, hybrid1 + the MXU residue offload is
        # the round-6 winner (star2d1r 8192^2 bf16: 99.1 vs 87.8 at
        # mxu_hybrid; the offload on mxu_hybrid itself LOSES, 82.3)
        if jnp.dtype(dtype) == jnp.bfloat16 and not spec.residue:
            return "mxu_hybrid"
        return "mxu_hybrid1"
    # many-term (box) specs: mixed assignment with a per-dtype MXU-term
    # cap (pallas_2d default: 1 for exact fp32, uncapped for bf16)
    # beats the all-VPU path -- round-5 8192^2: 51.0 vs 49.8 exact;
    # 88.3 (uncapped) vs 59.8 bf16
    return "mxu_hybrid1"


def residue_mxu_policy(mode: str, dtype, algorithm: str = "mxu_hybrid1",
                       ) -> bool:
    """Resolve an EngineConfig/ShardedConfig ``residue_mxu`` setting.

    "auto" (optionally overridden by LORASTENCIL_RESIDUE_MXU) enables
    the 2-D MXU residue offload for the bf16 state tier on the
    'mxu_hybrid1' assignment only: one state part makes the shared
    group matmuls nearly free there and the relieved VPU residue
    stream is that tier's binder (round-6: star2d1r 8192^2 99.1 vs
    78.2 off).  On 'mxu_hybrid' the extra streams contend with the
    both-axes matmuls (82.3 vs 87.8, a loss), and the exact-fp32
    tiers pay 3 split parts per stream (round-6 fp32 entry); "on"
    still forces it anywhere for measurement.
    """
    if mode == "auto":
        mode = os.environ.get("LORASTENCIL_RESIDUE_MXU", "auto")
    if mode not in ("auto", "on", "off"):
        raise ValueError(
            f"residue_mxu must be 'auto', 'on' or 'off', got {mode!r}")
    return mode == "on" or (mode == "auto"
                            and jnp.dtype(dtype) == jnp.bfloat16
                            and algorithm == "mxu_hybrid1")


def ping_pong_loop(step_fn, state, steps: int, k: int = 1):
    """Run ``steps`` timesteps via ``step_fn(cur, donor, fused_k)`` passes.

    Ping-pong with STABLE carry positions: the loop body runs two passes
    (a->b, b->a) so loop-carried buffers never swap slots -- XLA
    otherwise inserts a full-buffer copy per iteration to reconcile the
    swapped aliasing (measured 17% of wall time on v5e).  The first two
    passes run outside the loop with fresh zero donors: the initial
    state's guard ring holds the user halo and must never be reused as
    an output buffer.  A final remainder pass covers ``steps % k``.
    """
    if steps == 0:
        return state
    passes, rem = divmod(steps, k)

    latest, other = state, None
    done = 0
    if passes >= 1:
        latest, other = step_fn(state, jnp.zeros_like(state), k), \
            jnp.zeros_like(state)
        done = 1
    if passes >= 2:
        latest, other = step_fn(latest, other, k), latest
        done = 2
    pairs, odd = divmod(passes - done, 2)
    if pairs:
        def body(_, carry):
            x, y = carry
            y = step_fn(x, y, k)
            x = step_fn(y, x, k)
            return (x, y)

        latest, other = jax.lax.fori_loop(0, pairs, body, (latest, other))
    if odd:
        latest, other = step_fn(latest, other, k), latest
    if rem:
        latest = step_fn(latest, other if other is not None
                         else jnp.zeros_like(latest), rem)
    return latest


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # state dtype in HBM: "float32" (default; all compute exact fp32),
    # "bfloat16" (throughput tier, every dimensionality: half the HBM
    # traffic, compute still fp32 in VMEM, ~4e-3/step storage
    # rounding), "float64" (CPU tier reproducing the reference's fp64
    # regime), or "df64" (fp64-GRADE ~1e-14/step ON the TPU: double-
    # float fp32 pairs with error-free transformations, ops/df64.py --
    # a correctness tier, ~2 GCells/s class)
    dtype: str = "float32"
    # Mosaic matmul precision for algorithm='mxu':
    #   "highest" (bf16 multi-pass, ~1.5e-5/step) or "default" (~1e-3)
    precision: str = "highest"
    backend: str = "auto"  # 'pallas' | 'xla' | 'auto'
    tile: Optional[Tuple[int, int]] = None
    interpret: Optional[bool] = None  # force Pallas interpret mode
    # 'auto' (default): pick per shape/dtype the measured-fastest path
    # of matching accuracy (see resolve_algorithm's docstring for the
    # numbers) -- 2-D: 'mxu_hybrid1' (column convs on the MXU at full
    # split depth, rows + residue on the VPU, exact-fp32-grade), except
    # bf16 few-term no-residue specs -> 'mxu_hybrid' (both axes on the
    # MXU at one part each); 1-D: 'mxu' (per-128-group banded matmuls
    # on the lanes layout, exact split); 3-D: 'vpu' (shifted-slice
    # plane convs); df64 2-D: 'vpu_sep' (separable low-rank pair
    # kernel) when its static op count beats the dense rolls, else
    # 'vpu_roll'; df64 3-D: 'vpu_sep' (the pair slab kernel's only
    # path); df64 1-D: 'vpu_roll' (pair lane rolls); float64:
    # dense-path semantics.  Explicit options: 'vpu_roll'
    # (exact-fp32 aligned cyclic-roll convs), 'vpu' (shifted slices),
    # 'mxu_hybrid1', 'mxu_hybrid3' (exact 3-pass split banded GEMMs,
    # superseded by hybrid1), 'mxu_hybrid' (2-pass, ~6e-6/step),
    # 'mxu_split' (all terms incl. residue on the MXU, ~6e-6), 'mxu'
    # (Mosaic-precision banded GEMMs, ~1e-3/step at precision=default).
    # 3-D kernels map vpu*/auto to 'vpu' and also accept 'mxu_hybrid1'.
    algorithm: str = "auto"
    # timesteps fused per HBM round trip (1-D and 2-D).  None = auto
    # (see _fused_k for the measured numbers): 1-D k=4 on the MXU lanes
    # path (k=2 on the roll-VPU fallback); 2-D k=2 for no-residue
    # few-term specs (star2d3r 8192^2: 81.9 vs 68.8 fp32) and k=1
    # elsewhere (residue/box fused substeps measured neutral-to-worse;
    # with double-buffered DMA the window traffic already hides under
    # compute).
    fused_steps: Optional[int] = None
    # 3-D fusion (k steps per slab sweep with z lookback); k=2 measured
    # best at 256^3 (23.3 vs 21.5 GCells/s unfused); deeper fusion loses
    # to VMEM pressure.
    fused_steps_3d: int = 2
    # HOW the 2-D path fuses timesteps: "extent" (in-VMEM recompute at
    # shrinking/full extents -- the default machinery, any algorithm),
    # "skew" (time-skewed row-band streaming, ZERO recompute; needs
    # 'vpu_roll'/'mxu_hybrid1', dirichlet0, unsharded -- see
    # pallas_2d.stencil2d_skew_step), or "auto" (= "extent" until the
    # skew path earns per-shape defaults on device).  With "skew",
    # ``fused_steps`` defaults to 2.
    fusion: str = "auto"
    # 1-D overlapped-lane layout overrides (None = measured defaults
    # from Layout1DLanes.build); exposed so --autotune can measure lane
    # geometry per device (round-2 VERDICT item 5)
    lanes_width: Optional[int] = None      # stored lanes/row (x128)
    lanes_tile_rows: Optional[int] = None  # rows per DMA tile (x8)
    # MXU residue offload (2-D 'mxu_hybrid'/'mxu_hybrid1'): tap-sharing
    # residue row-offset groups become extra banded col-matmul streams
    # with row-shifted adds.  "auto" (default) = on for the bf16 state
    # tier only (one state part makes the extra streams nearly free and
    # the VPU residue stream is that tier's binder); "on"/"off" force.
    # fp32 is a measured loss (3 split parts per stream; CLAUDE.md
    # round-4: 54 -> 34).  LORASTENCIL_RESIDUE_MXU overrides "auto".
    residue_mxu: str = "auto"
    # boundary condition: "dirichlet0" (reference semantics: the halo
    # decays to zero -- SURVEY.md section 4), "periodic" (the grid
    # wraps) or "reflect" (symmetric / zero-flux mirror padding).  For
    # the ghost modes the guard ring is refreshed before every pass and
    # the kernels' validity bounds extend over the ring -- the same
    # machinery that keeps exchanged neighbor data alive on interior
    # devices of a sharded run.  Ghost modes ignore the supplied halo
    # cells and need the Pallas backend; reflect with fused_steps > 1
    # additionally needs per-axis symmetric coefficients (mirror
    # symmetry must commute with the stencil).
    boundary: str = "dirichlet0"


class StencilEngine:
    def __init__(self, spec: StencilSpec, interior,
                 config: EngineConfig = EngineConfig()):
        self.spec = spec
        self.interior = tuple(int(s) for s in np.atleast_1d(interior))
        assert len(self.interior) == spec.ndim
        self.config = config
        # dtype "df64": fp64-GRADE double-float pairs ON the TPU (the
        # reference's native-fp64 regime, src/1d/1d_utils.h:44, emulated
        # with error-free fp32 transformations -- ops/df64.py).  Device
        # state is stacked (2, *padded) fp32; split/merge on the host.
        self.df64 = config.dtype == "df64"
        self.dtype = jnp.dtype("float32" if self.df64 else config.dtype)
        if self.df64:
            if config.backend not in ("auto", "xla", "pallas"):
                raise ValueError(
                    f"unknown backend {config.backend!r} for dtype df64")
            # ghost boundaries (periodic/reflect) ride the same ring
            # refresh as the fp32 tier, applied per pair plane: the
            # refresh is pure copies/flips, so the (hi, lo) invariant is
            # preserved exactly (round-4; previously a loud tier error)
            # 2-D df64 runs the Pallas pair kernel (window read once,
            # error-free tap chain in VMEM -- ops/pallas_df64.py); 3-D
            # the pair slab kernel (ops/pallas_df64_3d.py); 1-D the
            # pair lanes kernel (ops/pallas_df64_1d.py) for effective
            # radii <= 32 (the overlapped-lane layout) and the flat
            # pair kernel (df64_1d_flat_step) for 33..127 -- the tier
            # is radius-uniform like the reference's fp64 band build
            # (/root/reference/src/1d/gpu_1r.cu:94-99); only
            # r_eff == 0 (pure center tap) keeps the XLA pair path
            # (ops/df64.py)
            if spec.ndim == 1:
                from .ops import pallas_1d as _p1d

                r1 = _p1d.effective_radius(spec)
                dim_ok = 1 <= r1 <= LANE - 1
            else:
                dim_ok = True
            want_pallas = dim_ok and config.backend != "xla"
            if config.backend == "pallas" and not want_pallas:
                raise ValueError(
                    "no df64 Pallas kernel applies: 1-D needs an "
                    "effective radius in [1, 127] (flat shifts wrap "
                    "one 128-lane row); this spec runs the XLA pair "
                    "path (backend 'auto'/'xla')")
            if config.algorithm == "auto":
                # 2-D: separable low-rank pair kernel when its static
                # op count beats the dense roll path (ops/pallas_df64.
                # pick_algorithm); 3-D: the pair slab kernel's only
                # path is separable slices; 1-D: lane rolls
                from .ops import pallas_df64 as _pdf64

                self.df64_algorithm = (
                    "vpu_sep" if (want_pallas and spec.ndim == 3)
                    else "vpu_roll" if (want_pallas and spec.ndim == 1)
                    else _pdf64.pick_algorithm(spec) if want_pallas
                    else "vpu_roll")
            else:
                self.df64_algorithm = config.algorithm
            allowed = (("vpu_sep",) if spec.ndim == 3
                       else ("vpu_roll",) if spec.ndim == 1
                       else ("vpu", "vpu_roll", "vpu_sep"))
            if want_pallas and self.df64_algorithm not in allowed:
                raise ValueError(
                    f"df64 kernel algorithm must be 'auto' or one of "
                    f"{allowed} for {spec.ndim}-D, got "
                    f"{config.algorithm!r} (no error-free product path "
                    f"exists on the MXU)")
            config = dataclasses.replace(
                config, backend="pallas" if want_pallas else "xla",
                algorithm="auto")
            self.config = config
        self.df64_pallas = self.df64 and config.backend == "pallas"
        if self.dtype == jnp.float64 and not jax.config.read("jax_enable_x64"):
            raise ValueError(
                "dtype float64 needs jax_enable_x64 (JAX truncates to "
                "float32 silently otherwise)")
        if self.dtype == jnp.float64 and _on_tpu():
            raise ValueError(
                "float64 is a CPU-tier dtype (the TPU has no fp64 unit): "
                "run off-TPU (the kernels execute in interpret mode and "
                "reproduce the reference's fp64/1e-7 regime), or use the "
                "fp32-exact 'vpu' tier on device")
        if self.dtype == jnp.bfloat16 and config.backend == "xla":
            raise ValueError(
                "bfloat16 state is a Pallas-kernel throughput tier; the "
                "XLA reference backend runs float32")
        if config.boundary not in ("dirichlet0", "periodic", "reflect"):
            raise ValueError(
                f"boundary must be 'dirichlet0', 'periodic' or "
                f"'reflect', got {config.boundary!r}")
        if (config.boundary != "dirichlet0" and config.backend == "xla"
                and not self.df64):
            # (df64 is exempt: its XLA-pair fallback (r_eff = 0 1-D)
            # runs a per-step padded-ring refresh, _ring_refresh_padded)
            raise ValueError(
                f"{config.boundary} boundaries need the Pallas backend "
                f"(the XLA reference path implements the reference's "
                f"halo-decay semantics only)")
        if config.precision not in ("highest", "default"):
            raise ValueError(
                f"precision must be 'highest' or 'default', got "
                f"{config.precision!r} (a typo would silently degrade "
                f"algorithm='mxu' to ~1e-3/step)")
        self.precision = (
            jax.lax.Precision.HIGHEST
            if config.precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        backend = config.backend
        if backend == "auto":
            backend = "pallas"
        self.backend = backend
        self.algorithm = self._resolve_algorithm()
        if (spec.ndim == 3 and backend != "xla"
                and self.algorithm not in ("vpu", "vpu_roll", "mxu",
                                           "mxu_hybrid1")):
            raise ValueError(
                f"algorithm {self.algorithm!r} has no 3-D path; 3-D "
                f"kernels support 'vpu' (auto), 'vpu_roll', "
                f"'mxu_hybrid1' or 'mxu'")
        self.interpret = (
            config.interpret if config.interpret is not None else not _on_tpu()
        )
        if config.fusion not in ("auto", "extent", "skew"):
            raise ValueError(
                f"fusion must be 'auto', 'extent' or 'skew', got "
                f"{config.fusion!r}")
        if config.fusion == "skew":
            if spec.ndim != 2:
                raise ValueError(
                    "fusion='skew' is the 2-D time-skewed path; use "
                    "fused_steps/fused_steps_3d elsewhere")
            if self.backend == "xla":
                raise ValueError("fusion='skew' needs the Pallas backend")
            if config.boundary != "dirichlet0":
                raise ValueError(
                    "fusion='skew' supports dirichlet0 boundaries only "
                    "(ghost rings would need per-level ring evolution)")
            if self.algorithm not in ("vpu_roll", "mxu_hybrid1"):
                raise ValueError(
                    f"fusion='skew' supports algorithm 'vpu_roll' or "
                    f"'mxu_hybrid1'; resolved algorithm is "
                    f"{self.algorithm!r}")
            if config.fused_steps is not None and config.fused_steps < 2:
                raise ValueError(
                    "fusion='skew' needs fused_steps >= 2 (k=1 has no "
                    "lag to skew; use fusion='extent')")
            if LANE // max(1, spec.radius) < 2:
                raise ValueError(
                    f"fusion='skew' creeps k*radius columns into the "
                    f"{LANE}-col guard; radius {spec.radius} leaves no "
                    f"room for k >= 2")
        self.layout = self._build_layout()
        self.ghost = config.boundary != "dirichlet0"
        if self.ghost and min(self.interior) < self._ring_depth():
            raise ValueError(
                f"{config.boundary} boundaries need every interior dim "
                f">= the ring depth {self._ring_depth()} "
                f"(= fused_steps * radius); got {self.interior}")
        if (config.boundary == "reflect" and self._fused_k() > 1
                and not self.spec.axis_symmetric()):
            raise ValueError(
                "reflect boundaries with fused_steps > 1 need per-axis "
                "symmetric coefficients (mirror symmetry must commute "
                "with the stencil for the once-per-pass ring refresh to "
                "be exact); use fused_steps=1 for this spec")
        if self.df64:
            # per-plane sums for the checksum sync (merged in fp64 on
            # the host -- no fp64 dtype may reach the device)
            self._run_df64_sums_jit = jax.jit(
                lambda s2, steps: jnp.sum(
                    self._run_internal(s2, steps).reshape(2, -1), axis=1),
                static_argnames=("steps",))
        self._run_jit = jax.jit(
            self._run_internal, static_argnames=("steps",), donate_argnums=(0,)
        )
        # The whole user-facing pipeline (embed -> steps -> extract) as ONE
        # compiled program: eager ops over a tunneled TPU cost seconds to
        # minutes each (see .claude/skills/verify/SKILL.md), so nothing
        # device-side may run outside jit.
        self._run_user_jit = jax.jit(
            lambda padded, steps: self.from_internal(
                self._run_internal(self.to_internal(padded), steps)
            ),
            static_argnames=("steps",),
        )
        # Scalar-output variant for honest benchmarking (the timing
        # harness syncs via a device->host transfer of the result).
        self._run_checksum_jit = jax.jit(
            lambda padded, steps: jnp.sum(
                self._run_internal(self.to_internal(padded), steps)
            ),
            static_argnames=("steps",),
        )

    @classmethod
    def for_shape(cls, name: str, interior, **kw) -> "StencilEngine":
        cfg_kw = {k: v for k, v in kw.items()
                  if k in EngineConfig.__dataclass_fields__}
        return cls(get_shape(name), interior, EngineConfig(**cfg_kw))

    @classmethod
    def for_coeffs(cls, coeffs, interior, name: str = "custom",
                   halo=None, fuse_factor: int = 1, max_rank: int = 4,
                   **kw) -> "StencilEngine":
        """Engine for an arbitrary dense coefficient array.

        2-D: the low-rank decomposition (pivot peel -> SVD fallback +
        sparse residue, models/factorize.py) runs automatically -- the
        generalization of the reference's hand-picked factorizations to
        user stencils.  3-D: a fully-separable z profile when the
        z-unfolding is rank 1 (the box3d1r structure), per-z-plane 2-D
        decompositions otherwise (factorize.decompose_3d).  1-D: a
        vector of taps (always dense; a 1-D stencil needs no
        factorization)."""
        from .models import factorize
        from .models.shapes import SeparableTerm, StencilSpec

        S = np.asarray(coeffs, dtype=np.float64)
        if S.ndim == 1:
            assert S.size % 2 == 1, "1-D taps must have odd length"
            radius = (S.size - 1) // 2
            spec = StencilSpec(
                name=name, ndim=1, radius=radius,
                halo=tuple(halo) if halo is not None else (radius,),
                terms=(SeparableTerm(taps=(tuple(S),)),),
                residue=(), fuse_factor=fuse_factor,
            )
        elif S.ndim == 3:
            assert all(s % 2 for s in S.shape), \
                "3-D coefficient extents must be odd"
            radius = max((s - 1) // 2 for s in S.shape)
            terms, residue = factorize.decompose_3d(S, max_rank=max_rank)
            spec = StencilSpec(
                name=name, ndim=3, radius=radius,
                halo=(tuple(halo) if halo is not None
                      else (radius, radius, radius)),
                terms=tuple(
                    SeparableTerm(taps=(tuple(tz), tuple(u), tuple(v)))
                    for tz, u, v in terms),
                residue=residue, fuse_factor=fuse_factor,
            )
        else:
            assert (S.ndim == 2 and S.shape[0] == S.shape[1]
                    and S.shape[0] % 2)
            radius = (S.shape[0] - 1) // 2
            terms, residue = factorize.decompose_2d(S, max_rank=max_rank)
            spec = StencilSpec(
                name=name, ndim=2, radius=radius,
                halo=tuple(halo) if halo is not None else (radius, radius),
                terms=tuple(SeparableTerm(taps=(tuple(u), tuple(v)))
                            for u, v in terms),
                residue=residue, fuse_factor=fuse_factor,
            )
        cfg_kw = {k: v for k, v in kw.items()
                  if k in EngineConfig.__dataclass_fields__}
        return cls(spec, interior, EngineConfig(**cfg_kw))

    def _resolve_algorithm(self) -> str:
        return resolve_algorithm(self.spec, self.config.algorithm,
                                 self.dtype)

    def _fusion_mode(self) -> str:
        """'extent' or 'skew' (2-D only).  'auto' consults the
        per-device autotune cache (autotune.cached_fusion): when the
        measured params-stage winner for this exact operating point
        chose the skew traversal with this engine's algorithm and
        depth, auto adopts it; otherwise 'extent'.  Cache reads only
        -- 'auto' never measures."""
        if not hasattr(self, "_fusion_resolved"):
            self._fusion_resolved = self._resolve_fusion()
        return self._fusion_resolved

    def _resolve_fusion(self) -> str:
        f = self.config.fusion
        if self.spec.ndim != 2:
            return "extent"
        if f != "auto":
            return f
        # skew's own operating constraints (mirrors the explicit
        # fusion='skew' validation in __init__)
        if (self.backend == "xla" or self.df64
                or self.config.boundary != "dirichlet0"
                or self.algorithm not in ("vpu_roll", "mxu_hybrid1")
                or LANE // max(1, self.spec.radius) < 2):
            return "extent"
        from .utils.autotune import cached_fusion

        return cached_fusion(self.spec, self.interior, self.algorithm,
                             self.config.fused_steps, str(self.dtype))

    def _skew_stride(self) -> int:
        from .ops.pallas_2d import skew_stride

        return skew_stride(self.spec.radius)

    # -- layout ----------------------------------------------------------
    def _build_layout(self):

        spec, interior = self.spec, self.interior
        if spec.ndim == 1:
            from .ops import pallas_1d
            from .ops.layout import Layout1DLanes

            n1 = interior[0]
            if self.df64_pallas:
                r_eff1 = pallas_1d.effective_radius(spec)
                if r_eff1 > 32:
                    # wide radius: the overlapped-lane stride cannot
                    # absorb the halo; flat pair kernel
                    # (pallas_df64_1d.df64_1d_flat_step).  Tile depth
                    # capped like the lanes pair windows (the EFT chain
                    # holds several window extents of transients).
                    rows = max(SUBLANE,
                               min(128,
                                   SUBLANE * (-(-n1 // (SUBLANE * LANE)))))
                    flat = Layout1D(interior=n1, halo=spec.halo[0],
                                    tile_rows=rows, guard_rows=SUBLANE)
                    if (self.interpret and flat.grid == (1,)
                            and rows >= 2 * SUBLANE):
                        # keep the interpret-mode grid loop alive
                        # (trip-1 grids hit the XLA:CPU df64-chain
                        # compile blowup)
                        flat = dataclasses.replace(
                            flat, tile_rows=SUBLANE * (
                                -(-(rows // SUBLANE) // 2)))
                    return flat
                if (self.config.boundary == "dirichlet0"
                        and not (self.config.lanes_width
                                 or self.config.lanes_tile_rows)):
                    # small grids: VMEM-RESIDENT pair layout with a
                    # deep lane halo (fixup every h/r_eff steps; one
                    # dispatch per RUN -- the dispatch-bound tiny-grid
                    # fast path, like the fp32 tier)
                    res, _ = Layout1DLanes.build(n1, spec.halo[0], 8,
                                                 r_eff1)
                    res = dataclasses.replace(res, resident=True)
                    if pallas_1d.fits_resident_lanes(res, itemsize=8):
                        return res
                # larger grids: single-step (k=1) tiled lanes layout
                lanes, _ = Layout1DLanes.build(
                    n1, spec.halo[0], 1, r_eff1)
                if self.config.lanes_width or self.config.lanes_tile_rows:
                    lanes = dataclasses.replace(
                        lanes,
                        width=self.config.lanes_width or lanes.width,
                        tile_rows=(self.config.lanes_tile_rows
                                   or lanes.tile_rows))
                    lanes.validate()
                elif not self.interpret:
                    # build()'s depth caps are sized for single-plane
                    # fp32 windows; the pair window doubles the bytes
                    # and the EFT chain holds several window extents of
                    # transients -- cap the tile depth (device sweep
                    # r9 at 16M cells: 64/128/256 flat within ~4%, 64
                    # best at both 1d1r and 1d2r: 21.4/17.1 GCells/s)
                    lanes = dataclasses.replace(
                        lanes, tile_rows=min(lanes.tile_rows, 64))
                if (self.interpret and lanes.grid == (1,)
                        and lanes.tile_rows >= 2 * SUBLANE):
                    # keep the interpret-mode grid loop alive (trip-1
                    # grids hit the XLA:CPU df64-chain compile blowup,
                    # same split as the 2-D/3-D pair kernels)
                    lanes = dataclasses.replace(
                        lanes, tile_rows=SUBLANE * (
                            -(-(lanes.tile_rows // SUBLANE) // 2)))
                return lanes
            rows = max(SUBLANE,
                       min(512, SUBLANE * (-(-n1 // (SUBLANE * LANE)))))
            k = self._fused_k()
            flat = Layout1D(interior=n1, halo=spec.halo[0], tile_rows=rows,
                            guard_rows=SUBLANE * (-(-k // SUBLANE)))
            r_eff = pallas_1d.effective_radius(spec)
            lanes_ok = (self.backend != "xla" and 1 <= r_eff <= 32
                        and self.algorithm in ("vpu_roll", "auto", "mxu"))
            if lanes_ok and self.config.boundary == "dirichlet0":
                # small grids: VMEM-RESIDENT lanes layout with a DEEP
                # lane halo (fixup every h/r_eff steps, conv on the MXU;
                # the dispatch-bound tiny-grid fast path, round 4)
                res, _ = Layout1DLanes.build(n1, spec.halo[0], 8, r_eff)
                res = dataclasses.replace(res, resident=True)
                if pallas_1d.fits_resident_lanes(res,
                                                 self.dtype.itemsize):
                    return res
            if (self.backend == "xla"
                    or pallas_1d.fits_resident(flat, self.dtype.itemsize)
                    or not lanes_ok):
                return flat
            # large grids: overlapped-lane layout -- one aligned roll per
            # tap instead of 2 rolls + select for the 128-lane wrap
            # (measured ~1.6x on 16M-cell 1d2r, PERF.md round 3)
            lanes, _ = Layout1DLanes.build(n1, spec.halo[0], k, r_eff)
            if self.config.lanes_width or self.config.lanes_tile_rows:
                lanes = dataclasses.replace(
                    lanes,
                    width=self.config.lanes_width or lanes.width,
                    tile_rows=(self.config.lanes_tile_rows
                               or lanes.tile_rows))
                lanes.validate()
            return lanes
        if spec.ndim == 2:
            tile = self.config.tile
            if tile is None:
                tile = default_tile_2d(
                    *interior,
                    mxu_residue=(self.algorithm.startswith("mxu")
                                 and bool(spec.residue)))
                if self.df64_pallas and not self.interpret:
                    # the pair kernel's Mosaic stack scales with the
                    # WINDOW area (deep per-tap chains over four window
                    # views): a (256, 2048) tile measured 68.9M scoped
                    # vmem vs the 64M limit (r4 device OOM).  Measured
                    # tile sweep (vpu_roll, clean r9 session -- the r8
                    # sweep was a contaminated-session artifact, see
                    # PERF.md): star2d1r 4096^2 (64,1024) 5.27 >
                    # (32,1024) 5.19 > (64,2048) 5.09 > (128,1024) 4.88;
                    # 8192^2 (64,1024) 5.31 best of 8; box2d3r 4096^2
                    # (64,1024) 2.29 > (128,1024) 1.92 GCells/s -- df64
                    # is VPU-compute bound, so smaller windows (less
                    # roll garbage margin per cell) win.
                    tile = (min(tile[0], 64), min(tile[1], 1024))
                if self.df64_pallas and self.interpret:
                    # interpret mode inlines a single-tile grid's trip-1
                    # emulation loop and XLA:CPU's elemental fusion then
                    # re-expands the deep df64 tap chain per use --
                    # compile explodes (>5 min vs ~2 s at >= 2 tiles).
                    # Split the tile so the grid loop survives.
                    tm, tn = tile
                    if -(-interior[0] // tm) * -(-interior[1] // tn) == 1:
                        if tm >= 2 * SUBLANE:
                            tm = SUBLANE * (-(-(tm // SUBLANE) // 2))
                        elif tn >= 2 * LANE:
                            tn = LANE * (-(-(tn // LANE) // 2))
                    tile = (tm, tn)
            k = self._fused_k() if self.backend != "xla" else 1
            if self._fusion_mode() == "skew":
                # the output stripe lags the input band by k*s rows,
                # and the lagging schedule needs ceil((m + k*s)/B)
                # bands of storage (pallas_2d.stencil2d_skew_step);
                # a user halo deeper than the lag widens the guard
                # (the kernel only needs guard rows >= k*s)
                s = self._skew_stride()
                B = tile[0]
                m = interior[0]
                extra = -(-(m + k * s) // B) - (-(-m // B))
                guard_r = max(k * s,
                              SUBLANE * (-(-spec.halo[0] // SUBLANE)))
                return Layout2D(interior=interior, halo=spec.halo,
                                tile=tile, guard=(guard_r, LANE),
                                extra_row_tiles=extra)
            need = max(spec.halo[0], k * spec.radius)
            guard_r = SUBLANE * (-(-need // SUBLANE))
            return Layout2D(interior=interior, halo=spec.halo, tile=tile,
                            guard=(guard_r, LANE))
        # the spec-aware (256, 256) default is fp32/bf16-measured; the
        # df64 pair slab doubles the VMEM state and keeps (128, 256)
        tile = self.config.tile or default_tile_3d(
            *interior[1:], spec=None if self.df64 else spec)
        if self.df64_pallas and self.config.tile is None and self.interpret:
            # interpret mode + a single-tile plane grid hits the same
            # XLA:CPU compile blowup as the 2-D pair kernel (trip-1
            # grid loop inlined, elemental fusion re-expands the df64
            # chain); split the tile so the grid loop survives
            tm, tn = tile
            if (-(-interior[1] // tm)) * (-(-interior[2] // tn)) == 1:
                if tm >= 2 * SUBLANE:
                    tm = SUBLANE * (-(-(tm // SUBLANE) // 2))
                elif tn >= 2 * LANE:
                    tn = LANE * (-(-(tn // LANE) // 2))
            tile = (tm, tn)
        k3 = min(max(1, self.config.fused_steps_3d),
                 SUBLANE // max(1, spec.radius))
        zg = max(spec.halo[0], k3 * spec.radius)
        return Layout3D(interior=interior, halo=spec.halo, tile=tile,
                        zguard=zg)

    # -- single pass (fused_k timesteps) on the internal layout -----------
    def _ring_depth(self) -> int:
        return max(1, self._fused_k() * self.spec.radius)

    def _ring_refresh(self, state, mode: str):
        """Fill the guard ring (depth = fused_steps * radius) so one
        kernel pass sees the boundary condition's ghost cells -- the
        single-chip analog of the sharded ring exchange:

          * ``periodic``: the opposite interior edge (wrap);
          * ``reflect``: the SAME interior edge mirrored (symmetric /
            zero-flux padding);
          * ``zero``: clears the ring (final-output halo contract).

        2-D/3-D phases run axis by axis with later axes copying the
        already-written rings, so corners (and 3-D edges) compose
        exactly like the sharded two-phase exchange / np.pad."""
        from .ops.layout import Layout1DLanes

        d = self._ring_depth()
        lay = self.layout
        if self.spec.ndim == 1:
            n = lay.interior
            if isinstance(lay, Layout1DLanes):
                head = lay.read_flat(state, 0, d)
                tail = lay.read_flat(state, n - d, d)
                if mode == "reflect":
                    lsrc, rsrc = head[::-1], tail[::-1]
                elif mode == "periodic":
                    lsrc, rsrc = tail, head
                else:
                    lsrc = rsrc = jnp.zeros_like(head)
                state = lay.write_flat(state, -d, lsrc)
                return lay.write_flat(state, n, rsrc)
            o = lay.origin
            flat = state.reshape(-1)
            head = flat[o: o + d]
            tail = flat[o + n - d: o + n]
            if mode == "reflect":
                lsrc, rsrc = head[::-1], tail[::-1]
            elif mode == "periodic":
                lsrc, rsrc = tail, head
            else:
                lsrc = rsrc = jnp.zeros_like(head)
            flat = flat.at[o - d: o].set(lsrc)
            flat = flat.at[o + n: o + n + d].set(rsrc)
            return flat.reshape(state.shape)

        return _ring_refresh_nd(state, mode, lay.origin, lay.interior, d)

    def _ring_refresh_pair(self, state2, mode: str):
        """Ring refresh on stacked (2, *layout) df64 pair planes: pure
        copies/flips per plane, so the (hi, lo) invariant is exact."""
        return jnp.stack([self._ring_refresh(state2[0], mode),
                          self._ring_refresh(state2[1], mode)])

    def _ring_refresh_padded(self, state2, mode: str):
        """Ghost refresh for the XLA pair path's REFERENCE-padded pair
        state (no internal layout): origin = the spec halo, depth = the
        radius (dense_step reads at most radius-deep halo cells)."""
        return jnp.stack([
            _ring_refresh_nd(state2[i], mode, self.spec.halo,
                             self.interior, self.spec.radius)
            for i in range(2)])

    def _ghost_bounds(self):
        """Validity bounds that keep the ghost ring alive through every
        fused substep's mask (and still zero tile round-up garbage)."""
        d = self._ring_depth()
        dims = self.layout.interior if self.spec.ndim > 1 \
            else (self.layout.interior,)
        lo_hi = []
        for s in dims:
            lo_hi += [-d, s + d]
        return jnp.asarray(lo_hi, jnp.int32)

    def _step_internal(self, cur, donor, fused_k: int = 1):
        if self.backend == "xla":
            del donor
            out = cur
            for _ in range(fused_k):
                out = xla_ref.separable_step(out, self.spec)
            return out
        bounds = None
        if self.ghost:
            cur = self._ring_refresh(cur, self.config.boundary)
            bounds = self._ghost_bounds()
        if self.spec.ndim == 1:
            from .ops import pallas_1d
            from .ops.layout import Layout1DLanes
            if isinstance(self.layout, Layout1DLanes):
                return pallas_1d.stencil1d_lanes_step(
                    cur, donor, self.spec, self.layout,
                    interpret=self.interpret, fused_steps=fused_k,
                    bounds=bounds,
                    algorithm=("mxu" if self.algorithm == "mxu"
                               else "vpu"))
            return pallas_1d.stencil1d_step(
                cur, donor, self.spec, self.layout,
                precision=self.precision, interpret=self.interpret,
                fused_steps=fused_k, bounds=bounds)
        if self.spec.ndim == 2:
            from .ops import pallas_2d
            # remainder passes (steps % k) fall back to the extent
            # kernel at k=1 on the same (wider-guard) layout
            if self._fusion_mode() == "skew" and fused_k >= 2:
                return pallas_2d.stencil2d_skew_step(
                    cur, donor, self.spec, self.layout,
                    interpret=self.interpret, algorithm=self.algorithm,
                    skew_steps=fused_k,
                    residue_mxu=residue_mxu_policy(
                        self.config.residue_mxu, self.dtype,
                        self.algorithm))
            return pallas_2d.stencil2d_step(
                cur, donor, self.spec, self.layout,
                precision=self.precision, interpret=self.interpret,
                algorithm=self.algorithm, fused_steps=fused_k,
                bounds=bounds,
                residue_mxu=residue_mxu_policy(
                    self.config.residue_mxu, self.dtype, self.algorithm))
        from .ops import pallas_3d
        alg3 = "vpu" if self.algorithm == "vpu" else self.algorithm
        return pallas_3d.stencil3d_step(
            cur, donor, self.spec, self.layout,
            precision=self.precision, interpret=self.interpret,
            algorithm=alg3, fused_steps=fused_k, bounds=bounds)

    def _fused_k(self) -> int:
        if self.backend == "xla" or self.df64:
            return 1  # the df64 pair kernel is single-step (for now)
        if self.spec.ndim == 2 and self._fusion_mode() == "skew":
            k = self.config.fused_steps or 2
            # col-guard creep bounds k (k*radius <= 128; __init__
            # guarantees at least k=2 fits); the row lag costs only
            # storage (guard rows >= k*s)
            return min(k, LANE // max(1, self.spec.radius))
        k = self.config.fused_steps
        if k is None:
            if self.spec.ndim == 1:
                # MXU lanes conv: the fused depth trades HBM bytes/cell
                # against the 128/(128 - 2*k*r_eff) lane-halo compute
                # amplification.  Round-5 16M device sweep: r_eff=3
                # (1d1r) k=4 best (127.7 vs 127.1 at k=3, 112 at
                # k=2/k=8); r_eff=4 (1d2r) k=3 best (124.7 vs 119.8 at
                # k=4) -- i.e. the optimum sits near lane_halo ~= 12,
                # where the MXU-stream bound (governing since the
                # round-5 bandwidth-ceiling correction) peaks.  The
                # roll-VPU path keeps its round-3 optima.
                if self.algorithm == "mxu":
                    from .ops.pallas_1d import effective_radius

                    k = max(1, 12 // max(1, effective_radius(self.spec)))
                else:
                    k = 2 if self.dtype != jnp.bfloat16 else 1
            elif (self.spec.ndim == 2 and not self.spec.residue
                  and len(self.spec.terms) <= 2
                  and self.dtype != jnp.float64
                  and self.algorithm in ("mxu_hybrid1", "mxu_hybrid",
                                         "vpu_roll")):
                # no-residue few-term 2-D specs: the VPU stream is light
                # enough that fused-substep recompute costs less than
                # the bytes it saves -- star2d3r 8192^2 measured 81.9
                # vs 68.8 (fp32) and 141.4 vs 120.2 (bf16), 4096^2
                # 69.2 vs 58.7, k=3/4 slightly worse (round 5).
                # Residue/many-term specs measured neutral-to-worse
                # (star2d1r fp32 57.2 = 57.2, bf16 69.2 vs 88.4;
                # box k>=2 loses) and keep k=1.
                k = 2
            else:
                k = 1
        k = max(1, k)
        if self.spec.ndim == 1:
            from .ops.layout import Layout1DLanes
            lay = getattr(self, "layout", None)
            if isinstance(lay, Layout1DLanes):
                from .ops import pallas_1d
                r_eff = max(1, pallas_1d.effective_radius(self.spec))
                return max(1, min(k, lay.lane_halo // r_eff))
            # edge garbage creeps one 128-lane row per substep; the
            # window guard grows with k (layout.guard_rows).  64 rows
            # (8K-cell lookback) is a practical VMEM ceiling.
            return min(k, 64)
        if self.spec.ndim == 3:
            if self.algorithm == "mxu":
                return 1
            return min(max(1, self.config.fused_steps_3d),
                       SUBLANE // max(1, self.spec.radius))
        # plain 'mxu' (Mosaic-precision banded GEMMs) does not support
        # in-kernel fusion; fall back to one step per pass.  Otherwise
        # clamp k so the fused window halo fits the fixed 128-lane column
        # guard (the row guard adapts to k in _build_layout).
        if self.algorithm == "mxu":
            return 1
        return min(k, LANE // max(1, self.spec.radius))

    def _df64_step(self, cur, donor, fused_k: int = 1):
        del fused_k  # single-step kernels
        bounds = None
        if self.ghost:
            cur = self._ring_refresh_pair(cur, self.config.boundary)
            bounds = self._ghost_bounds()
        if self.spec.ndim == 3:
            from .ops import pallas_df64_3d

            return pallas_df64_3d.df64_3d_step(
                cur, donor, self.spec, self.layout,
                interpret=self.interpret, bounds=bounds)
        if self.spec.ndim == 1:
            from .ops import pallas_df64_1d
            from .ops.layout import Layout1DLanes

            if isinstance(self.layout, Layout1DLanes):
                return pallas_df64_1d.df64_1d_step(
                    cur, donor, self.spec, self.layout,
                    interpret=self.interpret, bounds=bounds)
            # wide radius (32 < r_eff <= 127): flat pair kernel
            return pallas_df64_1d.df64_1d_flat_step(
                cur, donor, self.spec, self.layout,
                interpret=self.interpret, bounds=bounds)
        from .ops import pallas_df64

        return pallas_df64.df64_step(
            cur, donor, self.spec, self.layout,
            interpret=self.interpret, algorithm=self.df64_algorithm,
            bounds=bounds)

    def _run_internal(self, state, steps: int):
        if self.df64_pallas:
            if (self.spec.ndim == 1 and steps > 0 and not self.ghost
                    and getattr(self.layout, "resident", False)):
                # resident pair fast path: ALL steps in ONE kernel
                # (dispatch-bound tiny grids; dirichlet0 only)
                from .ops import pallas_df64_1d

                return pallas_df64_1d.stencil1d_resident_pair(
                    state, self.spec, self.layout, steps,
                    interpret=self.interpret)
            if self.spec.ndim == 2 and steps > 0 and not self.ghost:
                from .ops import pallas_df64

                if pallas_df64.fits_resident_pair_2d(self.layout):
                    # resident pair fast path: ALL steps in ONE kernel
                    # (small grids are dispatch-bound through per-step
                    # pair kernels; round-5 VERDICT item 6)
                    return pallas_df64.stencil2d_resident_pair(
                        state, self.spec, self.layout, steps,
                        interpret=self.interpret,
                        algorithm=self.df64_algorithm)
            out = ping_pong_loop(self._df64_step, state, steps, 1)
            if self.ghost and steps > 0:
                # masked-kernel writes inside the tile round-up region;
                # the output halo contract is zeros (per pair plane)
                out = self._ring_refresh_pair(out, "zero")
            return out
        if self.df64:
            from .ops import df64 as _df64

            refresh = None
            if self.ghost:
                mode = self.config.boundary
                refresh = lambda s2: self._ring_refresh_padded(s2, mode)
            return _df64.run(state, self.spec, steps, refresh=refresh)
        if (self.backend != "xla" and self.spec.ndim == 1 and steps > 0
                and not self.ghost):
            from .ops import pallas_1d
            if pallas_1d.fits_resident_lanes(self.layout,
                                             self.dtype.itemsize):
                # resident overlapped-lane fast path: ALL steps in ONE
                # kernel, MXU conv, halo fixup every h/r_eff steps
                return pallas_1d.stencil1d_resident_lanes(
                    state, self.spec, self.layout, steps,
                    interpret=self.interpret,
                    algorithm=("mxu" if self.algorithm == "mxu"
                               else "vpu"))
            if pallas_1d.fits_resident(self.layout, self.dtype.itemsize):
                # whole-grid-resident fast path: ALL steps in ONE kernel
                # (small grids are dispatch-bound otherwise; VERDICT r1)
                return pallas_1d.stencil1d_resident(
                    state, self.spec, self.layout, steps,
                    interpret=self.interpret)
        if (self.backend != "xla" and self.spec.ndim == 2 and steps > 0
                and not self.ghost and self._fusion_mode() != "skew"
                and self.algorithm in ("mxu_hybrid1", "vpu_roll", "vpu")):
            # 2-D whole-grid-resident fast path (round-5 VERDICT item
            # 6): ALL steps in one kernel via full-buffer rolled convs
            # -- exact fp32, the same numerics class as the gated
            # algorithms (lossy mxu tiers keep their tiled path)
            from .ops import pallas_2d

            if pallas_2d.fits_resident_2d(self.layout,
                                          self.dtype.itemsize):
                return pallas_2d.stencil2d_resident(
                    state, self.spec, self.layout, steps,
                    interpret=self.interpret)
        out = ping_pong_loop(self._step_internal, state, steps,
                             self._fused_k())
        if self.ghost and steps > 0:
            # ring cells inside the tile round-up region were written by
            # the masked kernels; the output halo contract is zeros
            out = self._ring_refresh(out, "zero")
        return out

    # -- public API -------------------------------------------------------
    def to_internal(self, padded):
        if self.df64:
            from .ops import df64 as _df64
            # host split: fp64 never reaches the device
            s2 = _df64.split_host(np.asarray(padded))
            if self.df64_pallas:
                # pair planes on the internal 2-D layout (guard ring
                # holds the user halo for step 1, zeros beyond); one
                # jitted embed -- eager ops over a tunneled TPU are
                # pathological (CLAUDE.md rule 1)
                if not hasattr(self, "_df64_embed_jit"):
                    self._df64_embed_jit = jax.jit(lambda s: jnp.stack(
                        [self.layout.to_internal(s[0]),
                         self.layout.to_internal(s[1])]))
                return self._df64_embed_jit(s2)
            return jnp.asarray(s2)
        if self.backend == "xla":
            return jnp.asarray(padded, dtype=self.dtype)
        return self.layout.to_internal(padded, dtype=self.dtype)

    def from_internal(self, state):
        if self.df64:
            from .ops import df64 as _df64
            state = np.asarray(state)
            if self.df64_pallas:
                state = np.stack([
                    np.asarray(self.layout.from_internal(state[0])),
                    np.asarray(self.layout.from_internal(state[1]))])
            return _df64.merge_host(state)
        if self.backend == "xla":
            return state
        return self.layout.from_internal(state)

    def run_internal(self, state, steps: int):
        """Jitted multi-step run on internal state (state is donated)."""
        return self._run_jit(state, steps=steps)

    def run(self, padded, steps: int):
        """Reference-semantics multi-step run on a user padded array.

        One compiled program end to end; ``padded`` may be a NumPy array
        (transferred once).  The df64 tier returns a float64 NumPy array
        (pairs split/merged on the host)."""
        if self.df64:
            return self.from_internal(
                self._run_jit(self.to_internal(padded), steps=steps))
        return self._run_user_jit(padded, steps=steps)

    def run_checksum(self, padded, steps: int):
        """Like run() but returns only a scalar checksum (for timing)."""
        if self.df64:
            s = np.asarray(
                self._run_df64_sums_jit(self.to_internal(padded),
                                        steps=steps), np.float64)
            return s[0] + s[1]
        return self._run_checksum_jit(padded, steps=steps)

    # -- differentiation ---------------------------------------------------
    def adjoint(self) -> "StencilEngine":
        """Engine of the point-reflected (transposed) stencil.

        A stencil step is linear: out = M C x with C the correlation by
        the coefficients and M the interior mask (reference halo-decay
        semantics).  Its transpose is (M C)^T = C' M with C' the FLIPPED
        stencil's correlation (models/shapes.StencilSpec.flipped) -- so
        the adjoint of k steps is C'^T-chained through the SAME engine
        machinery.  Cached per engine."""
        if not hasattr(self, "_adjoint"):
            self._adjoint = StencilEngine(
                self.spec.flipped(), self.interior, self.config)
        return self._adjoint

    def run_diff(self, padded, steps: int):
        """Differentiable run(): identical forward values, with an EXACT
        custom VJP through the adjoint stencil ((MC)^T)^k = C'(MC')^{k-1}M
        -- k-1 passes of the flipped-spec engine on the interior-masked
        cotangent, then one unmasked correlation (which recovers the
        gradient with respect to the input halo cells that step one
        reads).  Enables gradient-based PDE-constrained optimization
        through the production Pallas kernels without differentiating
        kernel internals (the operator is linear; no residuals stored)."""
        if self.df64:
            raise ValueError(
                "run_diff is not wired for the df64 pair state (JAX "
                "autodiff would silently downcast the fp64 cotangent); "
                "use engine.run_vjp for an fp64-grade adjoint product, "
                "or differentiate via dtype float32 (exact VJP)")
        return _run_linear(self, padded, steps)

    def run_vjp(self, cotangent, steps: int):
        """Host-level exact adjoint product: the gradient of
        ``sum(run(x, steps) * cotangent)`` with respect to ``x`` (the
        operator is linear, so no primal point is needed).

        For the df64 tier the chain stays fp64-grade end to end -- the
        round-3 gap ("adjoint would downcast the fp64 cotangent"): the
        interior-masked cotangent runs ``steps-1`` passes of the FLIPPED
        df64 engine on device (~1e-14/step, the forward tier's own
        accuracy), and the final unmasked correlation -- plus the whole
        reflect fold-back chain, whose per-step fold is not an engine
        step -- runs in exact host float64 (utils/reference.py; the
        backward of inversion workloads runs once per solve, not in the
        hot loop).  fp64 in, fp64 out.

        For every other tier this returns exactly what
        ``jax.grad`` through :meth:`run_diff` computes (same code path:
        the custom-VJP backward), as a convenience for host-driven
        adjoint loops.  Reference has no autodiff at all; this extends
        the artifact's linear-operator semantics
        (``/root/reference/src/2d/main.cu:38-93``) to its transpose."""
        if not self.df64:
            return _run_linear_bwd(self, steps, None,
                                   jnp.asarray(cotangent, self.dtype))[0]
        g = np.asarray(cotangent, np.float64)
        if steps <= 0:
            return g
        it = tuple(slice(h, s - h) for h, s in zip(self.spec.halo,
                                                   g.shape))
        if self.config.boundary == "reflect":
            # per-step fold-back on the interior extent in exact fp64;
            # the input halo is ignored under reflect -> zero gradient
            from .utils import reference as _ref

            flipped = self.spec.flipped()
            y = g[it]
            for _ in range(steps):
                y = _ref.fold_adjoint_step(y, flipped)
            out = np.zeros_like(g)
            out[it] = y
            return out
        mg = np.zeros_like(g)
        mg[it] = g[it]
        adj = self.adjoint()
        if self.config.boundary == "periodic":
            # circulant transpose = flipped-spec periodic operator, all
            # k steps through the df64 adjoint engine; the input halo is
            # ignored under periodic -> zero gradient (the ghost-ring
            # output contract already zeroes the halo)
            return adj.run(mg, steps)
        lam = adj.run(mg, steps - 1) if steps > 1 else mg
        from .utils import reference as _ref

        return _ref.conv_full(lam, adj.spec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def _run_linear(eng: StencilEngine, padded, steps: int):
    return eng.run(padded, steps)


def _run_linear_fwd(eng, padded, steps):
    return _run_linear(eng, padded, steps), None


def _fold_adjoint_step(y, spec_flipped):
    """One adjoint step of the reflect operator R = crop-conv o pad_sym:
    R^T = pad_sym^T o conv^T.  conv^T = flipped correlation scattered
    onto the padded extent; pad_sym^T FOLDS each ghost strip back onto
    the interior cells it mirrored.  ``y`` is an interior-extent array.
    XLA shift-adds (this backward runs once per step -- inversion
    workloads, not the hot loop)."""
    r = spec_flipped.radius
    ndim = y.ndim
    z = xla_ref.conv_full(jnp.pad(y, r), spec_flipped)
    for a in range(ndim):

        def at(sl):
            t = [slice(None)] * z.ndim
            t[a] = sl
            return tuple(t)

        core = z[at(slice(r, z.shape[a] - r))]
        left = jnp.flip(z[at(slice(0, r))], axis=a)
        right = jnp.flip(z[at(slice(z.shape[a] - r, None))], axis=a)
        na = core.shape[a]
        core = core.at[at(slice(0, r))].add(left)
        z = core.at[at(slice(na - r, None))].add(right)
    return z


def _run_linear_bwd(eng, steps, _res, g):
    if steps == 0:
        return (g,)
    it = tuple(slice(h, s - h) for h, s in zip(eng.spec.halo, g.shape))
    if eng.config.boundary == "reflect":
        # per-step fold-back adjoint on the interior extent; the input
        # halo is ignored under reflect, so its gradient is zero
        flipped = eng.spec.flipped()
        y = g[it]
        for _ in range(steps):
            y = _fold_adjoint_step(y, flipped)
        return (jnp.zeros_like(g).at[it].set(y),)
    mg = jnp.zeros_like(g).at[it].set(g[it])
    adj = eng.adjoint()
    if eng.config.boundary == "periodic":
        # the periodic operator is circulant: its transpose is the
        # flipped-spec PERIODIC operator, applied all k steps; the input
        # halo is ignored under periodic, so its gradient is zero
        # (adj.run's output halo is zero by the ghost-ring contract)
        return (adj.run(mg, steps),)
    lam = adj.run(mg, steps - 1) if steps > 1 else mg
    return (xla_ref.conv_full(lam, adj.spec),)


_run_linear.defvjp(_run_linear_fwd, _run_linear_bwd)


def run(padded, spec: StencilSpec, steps: int, **kw):
    """One-shot convenience API (see .claude/skills/verify/SKILL.md).

    Uses the passed spec directly (works for custom specs, not just
    registry names)."""
    interior = tuple(
        s - 2 * h for s, h in zip(np.shape(padded), spec.halo)
    )
    cfg_kw = {k: v for k, v in kw.items()
              if k in EngineConfig.__dataclass_fields__}
    eng = StencilEngine(spec, interior, EngineConfig(**cfg_kw))
    return eng.run(padded, steps)
