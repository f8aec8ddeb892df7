"""Profiling / tracing helpers.

The reference's observability is wall-clock chrono + ptxas occupancy
flags (``/root/reference/src/2d/gpu.cu:408-418``, CMakeLists.txt:23).
TPU-native equivalents: ``jax.profiler`` traces viewable in
TensorBoard/xprof, plus a roofline report calibrated against the
MEASURED device ceilings (PERF.md "Roofline / MFU accounting") so
kernel efficiency is quantified against what the hardware actually
sustains for each access pattern, not against datasheet aggregates.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

from ..models.shapes import StencilSpec


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: view with tensorboard --logdir=<dir>."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Measured effective resource rates (v5e over axon; PERF.md "Roofline /
# MFU accounting", round 4).  The HBM numbers are PATTERN bandwidths:
# what zero-compute probe specs sustain through the real kernels' DMA
# pipelines -- NOT the ~800 GB/s contiguous-copy aggregate, which no
# windowed/slabbed stencil traversal reaches (full-width contiguous
# tiles measured SLOWER end-to-end, so the pattern cannot be traded
# away).  Derived as probe GCells/s x modeled B/cell at the probe
# config; tests/test_aux.py asserts the model stays in sync with the
# probes.
MEASURED = dict(
    # 65.9 GCells/s zero-compute probe at (256, 2048) fp32 x ~8.76 B/cell
    # (0.94 s region; the round-5 long-region audit re-read 73.1 = 642
    # GB/s -- within session spread, kept)
    hbm_windowed_2d_gbps=577.0,
    # 86.4 GCells/s z-shift probe at 256-col slab-32 x 7.625 B/cell
    # (round-5 LONG-REGION re-probe, steps=512 / 0.8 s region; the
    # round-4 steps=64 calibration ran a 0.13 s region and read 455)
    hbm_slab_3d_gbps=659.0,
    # 283.1 GCells/s center-only (TRUE zero-compute: d=0 roll and w==1
    # multiply both elided) probe at 16M k=4 x 2.133 B/cell, 0.97 s
    # region.  The round-4 "~97" was a short-region artifact; the
    # round-5 shift-tap re-probe (578) still paid one roll/substep.
    hbm_lanes_1d_gbps=604.0,
    vpu_teraops=2.1,       # effective roll/fma elem-op rate
    # 8192^2 bf16 matmul chain inside one jit, 0.64 s region (round-5
    # long-region re-probe; the round-3 "134.3 peak" was measured on a
    # shorter region and is exceeded by honest 1-D kernel rows)
    mxu_bf16_tflops=166.1,
    # bf16 STATE tier pattern bandwidths (tools/pipeline_probe.py,
    # round-5 device probes): the same zero-compute specs through the
    # same kernels with bf16 HBM state.  NOT derived from the fp32
    # rates: bf16 halves every DMA row's byte length at the same cell
    # tile, and HBM efficiency is row-length dependent, so the bf16
    # pattern GB/s is 64-96% of the same-session fp32 reading (2-D 96%,
    # 3-D 76%, 1-D 64% -- the shorter the rows, the bigger the loss).
    # Values = probe GCells/s x the probe engine's modeled B/cell/step
    # at dtype_bytes=2.
    # 140.3 GCells/s zero-compute probe at (256, 2048) bf16 x 4.391 B
    hbm_windowed_2d_bf16_gbps=616.0,
    # 164.3 GCells/s z-shift probe, bf16 slabs x 3.531 B (long-region
    # steps=512 re-probe; 88% of the same-session fp32 pattern GB/s at
    # half the bytes -- NOT the same GB/s)
    hbm_slab_3d_bf16_gbps=580.0,
    # 711.9 GCells/s center-only probe at 16M k=4 bf16 x 1.067 B
    # (0.77 s region).  The shift-tap variants (385-447 GB/s) were
    # compute-limited at bf16 rates -- honest mxu kernel rows exceeded
    # their implied GB/s, which is how the understatement was caught;
    # with this ceiling the bf16 1-D rows are VPU-SUPPORT bound
    # (casts + mask + fixup) and the model reproduces them to ~0.5%.
    hbm_lanes_1d_bf16_gbps=759.0,
    # df64 ARITHMETIC-unit rate (PRODUCT=20, FOLD=13, SPLIT=3 of
    # ops/pallas_df64._entry_cost; rolls excluded), PROBE-DERIVED
    # (round 5, tools/df64_eft_probe.py on v5e): the no-roll variant
    # measured 5.27 T priced-units/s on a 48-priced/36-arith mix
    # -> 5.27 * 36/48 = 3.95 T arith-units/s.  Roll variants for
    # context: lane-roll mix 3.72, row-roll mix 1.71 T priced-units/s
    # at (256, 2048) -- yet honest kernel rows imply rates ABOVE the
    # roll-mix rates, i.e. rolls overlap with the EFT arithmetic in
    # real kernels, so the governing ceiling is the pure-arithmetic
    # rate (the df64 analog of DMA hiding under compute).  Replaces
    # the round-4 constant 5.5 that was circularly calibrated on the
    # best honest device row; tests/test_aux.py pins the probe link.
    vpu_df64_arith_units_teraops=3.95,
    # double-buffered copy-kernel aggregate (PERF.md): the df64 pair
    # kernels are compute-dense enough that the pattern-effective
    # ceilings above never bind; their byte ceiling is the raw stream
    hbm_copy_aggregate_gbps=800.0,
)

_SUBLANE, _LANE = 8, 128


def _ceil_to(x: int, m: int) -> int:
    return m * (-(-x // m))


def _conv_vpu_ops(taps) -> float:
    """Elem-ops/cell for a 1-D conv on the VPU with +-offset pair
    sharing (the residue-CSE trick, PERF.md): a symmetric +-o tap pair
    costs 3 ops (pair add, mul, accumulate); an unpaired nonzero tap
    costs 2 (mul, accumulate)."""
    r = len(taps) // 2
    ops = 0.0
    for o in range(1, r + 1):
        lo, hi = taps[r - o], taps[r + o]
        if lo and lo == hi:
            ops += 3
        else:
            ops += (2 if lo else 0) + (2 if hi else 0)
    if taps[r]:
        ops += 2
    return ops


def _n_col_terms(spec: StencilSpec) -> int:
    return sum(1 for t in spec.terms
               if sum(tp is not None for tp in t.taps) > 1) or 1


def _vpu_ops_per_cell(spec: StencilSpec, algorithm: str,
                      mxu_terms: Optional[int] = None) -> float:
    """First-order VPU elem-ops/cell/substep for the 2-D paths.

    mxu_hybrid1 (the exact default) runs up to ``mxu_terms`` column
    convs on the MXU (pallas_2d's per-dtype cap); the VPU stream
    carries the 3-part state split (~5 ops), the remaining convs
    (pair-shared) and the grouped residue (~2 ops/point).  Pure VPU
    paths (vpu_roll/vpu) pay every conv."""
    ops = 0.0
    mxu_cols = algorithm.startswith("mxu")
    offloaded = 0
    cap = (mxu_terms if mxu_terms is not None
           else _n_col_terms(spec)) if mxu_cols else 0
    for t in spec.terms:
        axis_taps = [tp for tp in t.taps if tp is not None]
        for i, tp in enumerate(axis_taps):
            col_axis = (i == 0 and len(axis_taps) > 1)
            if col_axis and offloaded < cap:
                offloaded += 1
                continue
            ops += _conv_vpu_ops(tp)
    ops += 2.0 * len(spec.residue)
    if mxu_cols and algorithm == "mxu_hybrid1":
        ops += 5.0  # exact 3-part fp32 state split (PERF.md)
    return ops


def _bf16_stream_costs(spec: StencilSpec, algorithm: str,
                       mxu_terms: Optional[int] = None,
                       res_mxu: bool = False,
                       chunk: int = _LANE) -> "tuple[float, float]":
    """(VPU elem-ops, MXU FLOPs) per cell per substep for the bf16
    STATE tier, priced as the kernels are actually built -- NOT the
    fp32 pricing at the same taps (round-5 TODO item 4: honest bf16
    rows read 1.3-1.6x the fp32-calibrated model because the bf16
    build differs structurally):

      * ONE state part everywhere (the bf16 state has no low bits to
        split off; ``pallas_2d._build_mxu_mats``) -- a third of the
        fp32 hybrid1 matmul passes and no 3-part split (~5 VPU ops);
      * 'mxu_hybrid1' offloads EVERY column conv (per-dtype cap 99,
        including single-axis col-only terms) and, with ``res_mxu``,
        the tap-sharing residue groups as shared banded matmuls --
        the VPU keeps only the row convs, the per-group row-shifted
        adds, the ungrouped residue points, and the state casts;
      * 'mxu_hybrid'/'mxu_split'/'mxu_hybrid3' put both axes on the
        MXU (one banded stream per non-identity axis);
      * 'vpu'/'vpu_roll' (incl. every 3-D path) pay the fp32 op count
        plus one bf16->fp32 cast per plane/state access (3-D kernels
        cast per ``conv_plane`` call / identity z-tap access);
      * 1-D 'mxu' is a single per-128-group banded matmul (the fp32
        pricing wrongly charged the conv to the VPU; harmless there
        because bandwidth governs, misleading at bf16).
    """
    base = 2.0  # state cast (MXU operand / fp32 compute) + store round
    if spec.ndim == 3 or not algorithm.startswith("mxu"):
        # VPU paths: fp32 ops + one cast per plane/state access
        vpu = _vpu_ops_per_cell(spec, "vpu")
        casts = 1.0  # out-store rounding
        for t in spec.terms:
            if spec.ndim == 3:
                tz = t.taps[0]
                if t.taps[1] is None and t.taps[2] is None:
                    # identity term: one cast per nonzero z-tap access
                    casts += sum(1 for w in (tz or (1,)) if w)
                else:
                    casts += 1  # conv_plane casts its input plane
            else:
                casts += 1
        return vpu + casts, 0.0
    # 2-D MXU paths, one bf16 state part per stream
    from ..ops.band_gemm import residue_mxu_groups

    vpu = base
    mxu = 0.0
    if algorithm == "mxu_hybrid1":
        cap = 99 if mxu_terms is None else mxu_terms
        built = 0
        for t in spec.terms:
            rt, ct = t.taps
            if ct is not None and built < cap:
                built += 1
                rc = (len(ct) - 1) // 2
                mxu += 2.0 * (chunk + 2 * rc)
                if rt is not None:
                    vpu += _conv_vpu_ops(rt)
            else:
                for tp in (rt, ct):
                    if tp is not None:
                        vpu += _conv_vpu_ops(tp)
    else:
        # both axes on the MXU ('mxu_hybrid' / 'mxu_split' / 'mxu'
        # variants): one banded stream per non-identity axis
        for t in spec.terms:
            for tp in t.taps:
                if tp is not None:
                    rc = (len(tp) - 1) // 2
                    mxu += 2.0 * (chunk + 2 * rc)
    if spec.residue:
        if res_mxu:
            groups, rest = residue_mxu_groups(spec.residue)
            for drs, _taps, rc in groups:
                mxu += 2.0 * (chunk + 2 * rc)
                vpu += 2.0 * len(drs)  # one row-shift + add per offset
            vpu += 2.0 * len(rest)
        else:
            vpu += 2.0 * len(spec.residue)
    return vpu, mxu


def _lanes_1d_stream_costs(spec: StencilSpec, algorithm: str, k: int,
                           lane_amp: float,
                           bf16: bool) -> "tuple[float, float]":
    """(VPU elem-ops, MXU FLOPs) per INTERIOR cell per substep on the
    overlapped-lane 1-D layout: every computed lane amortizes over the
    S = 128 - 2*k*r_eff payload cells per 128-group (``lane_amp`` =
    128/S), and the start-of-pass halo fixup (~8 rolls/selects,
    ``pallas_1d._lanes_fixup``) amortizes over the k fused substeps.

    The 'mxu' path runs one square per-128-group banded matmul per
    bf16 state part -- 3 parts fp32-exact, 1 at bf16 state
    (``pallas_1d._conv_lanes_mxu``) -- at 2*128 MACs/lane each, with
    the VPU carrying the split/mask support; the roll path pays the
    pair-shared conv on the VPU.  Round-5 correction: the old fp32
    pricing charged the conv to the VPU *and* one single-part MXU
    stream, which only looked harmless while the understated round-4
    bandwidth ceiling governed."""
    from ..ops.pallas_1d import _dense_taps

    fixup = 8.0 / k
    if algorithm == "mxu":
        nparts = 1 if bf16 else 3
        mxu = 2.0 * _LANE * nparts * lane_amp
        # state split (2 subs + 3 casts fp32; 1 up-cast bf16) + wmask
        support = (2.0 if bf16 else 6.0) + 1.0
        return (support + fixup) * lane_amp, mxu
    vpu = _conv_vpu_ops(_dense_taps(spec)) + 1.0 + fixup
    if bf16:
        vpu += 1.0  # state up-cast
    return vpu * lane_amp, 0.0


def _mxu_flops_per_cell(spec: StencilSpec, algorithm: str,
                        mxu_terms: Optional[int] = None,
                        chunk: int = _LANE) -> float:
    """MXU-stream FLOPs/cell/substep.  A banded-conv matmul costs
    ~(chunk + 2r) MACs/cell per stream REGARDLESS of tap sparsity
    (CLAUDE.md measured fact); the exact mxu_hybrid1 path runs one
    column-conv stream per state part (3-part bf16 split) per
    offloaded term (up to ``mxu_terms``)."""
    if not algorithm.startswith("mxu"):
        return 0.0
    parts = 3 if algorithm == "mxu_hybrid1" else 1
    streams = _n_col_terms(spec)
    if mxu_terms is not None:
        streams = min(streams, mxu_terms)
    return 2.0 * parts * streams * (chunk + 2 * spec.radius)


@dataclasses.dataclass
class Roofline:
    bytes_per_cell_step: float
    vpu_ops_per_cell_step: float
    mxu_flops_per_cell_step: float
    bw_bound_gcells: float
    vpu_bound_gcells: float
    mxu_bound_gcells: float
    bound: str

    @property
    def compute_bound_gcells(self) -> float:
        """Co-issued streams run concurrently: the binding compute
        stream is the slower of the VPU and MXU streams."""
        return min(self.vpu_bound_gcells, self.mxu_bound_gcells)

    @property
    def governing_gcells(self) -> float:
        """The governing ceiling: min(bandwidth, compute) bound."""
        return min(self.bw_bound_gcells, self.compute_bound_gcells)

    def human(self) -> str:
        return (
            f"roofline: {self.bytes_per_cell_step:.2f} B/cell/step, "
            f"{self.vpu_ops_per_cell_step:.0f} VPU-op + "
            f"{self.mxu_flops_per_cell_step:.0f} MXU-FLOP /cell/step -> "
            f"bw-bound {self.bw_bound_gcells:.0f} GCells/s, "
            f"compute-bound {self.compute_bound_gcells:.0f} GCells/s "
            f"({self.bound}-bound)"
        )


def engine_roofline(eng) -> Optional["Roofline"]:
    """Roofline for a BUILT StencilEngine: derives tile / fusion /
    algorithm / dtype from the engine's resolved configuration so suite
    rows carry a machine-checkable ``pct_of_governing_bound`` (the
    BASELINE north-star accounting) instead of PERF.md prose.

    Returns None for tiers without a measured ceiling model (the fp64
    CPU tier, the pure-XLA backends -- including the wide-radius df64
    XLA pair fallback)."""
    import jax.numpy as jnp

    if getattr(eng, "df64", False):
        if not getattr(eng, "df64_pallas", False):
            return None
        return _df64_roofline(eng)
    if eng.backend == "xla":
        return None
    if eng.dtype == jnp.dtype(jnp.float64):
        return None
    spec = eng.spec
    dtype_bytes = eng.dtype.itemsize
    if spec.ndim == 3:
        from ..ops.pallas_3d import pick_slab

        k3 = min(max(1, eng.config.fused_steps_3d),
                 _SUBLANE // max(1, spec.radius))
        TM, TN = eng.layout.tile
        slab = pick_slab(eng.layout.interior[0], TM, TN, dtype_bytes,
                         fused_steps=k3, radius=spec.radius)
        alg = eng.algorithm if eng.algorithm.startswith("mxu") else "vpu"
        return stencil_roofline(spec, (TM, TN), k3, dtype_bytes,
                                algorithm=alg, slab=slab)
    k = eng._fused_k()
    if spec.ndim == 2:
        # pallas_2d's per-dtype MXU column-term cap (mirrors the
        # default_cap logic there; the env override too)
        mxu_terms = None
        if eng.algorithm == "mxu_hybrid1":
            import os as _os

            exact_split = dtype_bytes == 4
            cap = 1 if (exact_split and _n_col_terms(spec) > 2) else 99
            mxu_terms = int(_os.environ.get("LORASTENCIL_H1_MXU_TERMS",
                                            str(cap)))
        from ..engine import residue_mxu_policy

        res_mxu = residue_mxu_policy(eng.config.residue_mxu, eng.dtype,
                                     eng.algorithm)
        return stencil_roofline(spec, eng.layout.tile, k, dtype_bytes,
                                algorithm=eng.algorithm,
                                mxu_terms=mxu_terms, res_mxu=res_mxu)
    # 1-D: the lanes-layout bandwidth model governs; tile is unused
    return stencil_roofline(spec, (_SUBLANE, _LANE), k, dtype_bytes,
                            algorithm=eng.algorithm)


def _df64_roofline(eng) -> "Roofline":
    """Roofline for the Pallas df64 pair kernels: the compute bound
    comes from the kernels' static cost model
    (ops/pallas_df64.df64_cost_per_cell; rate calibrated on the honest
    device rows, PERF.md round 9) and the byte bound from the raw copy
    aggregate over the (hi, lo) pair state -- the EFT chains are dense
    enough that the pattern-effective bandwidth ceilings never bind."""
    from ..ops.pallas_df64 import df64_cost_per_cell

    spec = eng.spec
    # ARITHMETIC-ONLY units: rolls overlap with the EFT arithmetic in
    # real kernels (tools/df64_eft_probe.py axis triple, round 5), so
    # the governing compute ceiling is the pure-arithmetic probe rate
    cost = df64_cost_per_cell(spec, eng.df64_algorithm, arith_only=True)
    r = spec.radius
    if spec.ndim == 2:
        TM, TN = eng.layout.tile
        g_r = _ceil_to(max(_SUBLANE, r), _SUBLANE)
        amp = ((TM + 2 * g_r) * (TN + 2 * _LANE)) / float(TM * TN)
        w_amp = 1.0
    elif spec.ndim == 3:
        from ..ops.pallas_3d import pick_slab
        from ..ops.pallas_df64_3d import _classify_terms

        TM, TN = eng.layout.tile
        buffered_idx, _, _ = _classify_terms(spec)
        slab = pick_slab(eng.layout.interior[0], TM, TN, dtype_bytes=8,
                         radius=r,
                         acc_bytes=8 * max(1, len(buffered_idx)))
        amp = ((slab + 2 * r) / float(slab)
               * (TM + 2 * _SUBLANE) / float(TM)
               * (TN + 2 * _LANE) / float(TN))
        w_amp = 1.0
    else:
        h = getattr(eng.layout, "lane_halo", _SUBLANE)
        amp = (_LANE + 2 * h) / float(_LANE)
        w_amp = amp  # 1-D lanes storage writes the duplicated halo too
    bpc = (amp + w_amp) * 8.0  # (hi, lo) fp32 pair, one read + write
    bw_bound = MEASURED["hbm_copy_aggregate_gbps"] / bpc
    vpu_bound = (MEASURED["vpu_df64_arith_units_teraops"] * 1000.0 / cost
                 if cost else float("inf"))
    return Roofline(
        bytes_per_cell_step=bpc,
        vpu_ops_per_cell_step=cost,
        mxu_flops_per_cell_step=0.0,
        bw_bound_gcells=bw_bound,
        vpu_bound_gcells=vpu_bound,
        mxu_bound_gcells=float("inf"),
        bound="bw" if bw_bound <= vpu_bound else "vpu",
    )


def stencil_roofline(
    spec: StencilSpec,
    tile,
    fused_steps: int = 1,
    dtype_bytes: int = 4,
    algorithm: str = "mxu_hybrid1",
    mxu_terms: Optional[int] = None,
    slab: int = 32,
    measured: dict = MEASURED,
    res_mxu: bool = False,
) -> Roofline:
    """Roofline against the MEASURED pattern ceilings (PERF.md).

    ``dtype_bytes == 2`` selects the bf16 STATE tier: probe-measured
    bf16 pattern bandwidths (``hbm_*_bf16_gbps``; fp32 rate as a
    fallback until probed) and the as-built bf16 stream pricing
    (``_bf16_stream_costs``; ``res_mxu`` mirrors the engine's MXU
    residue-offload policy).

    Bytes model the real layouts: 2-D windowed tiles read a
    (TM+2*guard_r) x (TN+2*LANE) halo window and write TM x TN; 3-D
    slabs amplify by z-lookback x row-guard x the 128-lane column
    guard; 1-D lanes layouts store a duplicated lane halo.  Each is
    divided by the measured EFFECTIVE bandwidth for that pattern, not
    the contiguous-copy aggregate.  Compute streams (VPU elem-ops with
    pair sharing; banded-GEMM MACs for the MXU column stream) are
    co-issued, so the compute bound is their min; the overall bound is
    min(bw, compute)."""
    k = max(1, fused_steps)
    r = spec.radius
    bf16 = dtype_bytes == 2
    if spec.ndim == 2:
        TM, TN = tile
        g_r = _ceil_to(max(_SUBLANE, k * r), _SUBLANE)
        amp = ((TM + 2 * g_r) * (TN + 2 * _LANE)) / float(TM * TN)
        bw = measured["hbm_windowed_2d_gbps"]
        if bf16 and measured.get("hbm_windowed_2d_bf16_gbps"):
            bw = measured["hbm_windowed_2d_bf16_gbps"]
    elif spec.ndim == 3:
        TM, TN = tile
        z_amp = (slab + 2 * k * r) / float(slab)
        row_amp = (TM + 2 * _SUBLANE) / float(TM)
        col_amp = (TN + 2 * _LANE) / float(TN)
        amp = z_amp * row_amp * col_amp
        bw = measured["hbm_slab_3d_gbps"]
        if bf16 and measured.get("hbm_slab_3d_bf16_gbps"):
            bw = measured["hbm_slab_3d_bf16_gbps"]
    else:
        # overlapped-lane storage: a 128-lane group carries
        # S = 128 - 2*k*r_eff payload cells (ops/layout.Layout1DLanes),
        # so every stored byte AND every computed lane amortizes over S
        # interior cells; reads and writes both touch the full width
        from ..ops.pallas_1d import effective_radius

        # max(1, .): Layout1DLanes.build clamps r_eff the same way, so
        # a zero-effective-radius spec (the center-only probe) still
        # stores a k-lane halo
        h = k * max(1, effective_radius(spec))
        amp = _LANE / float(_LANE - 2 * h)
        bw = measured["hbm_lanes_1d_gbps"]
        if bf16 and measured.get("hbm_lanes_1d_bf16_gbps"):
            bw = measured["hbm_lanes_1d_bf16_gbps"]
    # one amplified read + one (amplified, for 1-D lanes storage) write
    # per k-substep fused pass
    w_amp = amp if spec.ndim == 1 else 1.0
    bpc = (amp + w_amp) * dtype_bytes / k

    if spec.ndim == 1:
        vpu, mxu = _lanes_1d_stream_costs(spec, algorithm, k, amp, bf16)
    elif bf16:
        vpu, mxu = _bf16_stream_costs(spec, algorithm, mxu_terms, res_mxu)
    else:
        vpu = _vpu_ops_per_cell(spec, algorithm, mxu_terms)
        mxu = _mxu_flops_per_cell(spec, algorithm, mxu_terms)
    bw_bound = bw / bpc
    vpu_bound = (measured["vpu_teraops"] * 1000.0 / vpu if vpu
                 else float("inf"))
    mxu_bound = (measured["mxu_bf16_tflops"] * 1000.0 / mxu if mxu
                 else float("inf"))
    bound = ("bw" if bw_bound <= min(vpu_bound, mxu_bound)
             else ("vpu" if vpu_bound <= mxu_bound else "mxu"))
    return Roofline(
        bytes_per_cell_step=bpc,
        vpu_ops_per_cell_step=vpu,
        mxu_flops_per_cell_step=mxu,
        bw_bound_gcells=bw_bound,
        vpu_bound_gcells=vpu_bound,
        mxu_bound_gcells=mxu_bound,
        bound=bound,
    )
