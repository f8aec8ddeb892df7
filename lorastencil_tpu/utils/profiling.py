"""Profiling / tracing helpers.

The reference's observability is wall-clock chrono + ptxas occupancy
flags (``/root/reference/src/2d/gpu.cu:408-418``, CMakeLists.txt:23).
TPU-native equivalents: ``jax.profiler`` traces viewable in
TensorBoard/xprof, plus a lightweight roofline report for a stencil
config (bytes moved vs the measured device copy bandwidth, FLOPs vs MXU
peak) so kernel efficiency is quantified, not guessed.
"""

from __future__ import annotations

import contextlib
import dataclasses

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


@dataclasses.dataclass
class Roofline:
    bytes_per_cell_step: float
    flops_per_cell_step: float
    bw_bound_gcells: float
    compute_bound_gcells: float
    bound: str

    def human(self) -> str:
        return (
            f"roofline: {self.bytes_per_cell_step:.2f} B/cell/step, "
            f"{self.flops_per_cell_step:.0f} FLOP/cell/step -> "
            f"bw-bound {self.bw_bound_gcells:.0f} GCells/s, "
            f"compute-bound {self.compute_bound_gcells:.0f} GCells/s "
            f"({self.bound}-bound)"
        )


def stencil_roofline(
    spec: StencilSpec,
    tile,
    fused_steps: int = 1,
    dtype_bytes: int = 4,
    hbm_gbps: float = 800.0,   # double-buffered HBM aggregate (v5e, r3
                               # device trace; the single-stream Pallas-DMA
                               # microbench was 446)
    vpu_gflops: float = 4200.0,  # ~2.1 T elem-ops/s effective (PERF.md)
) -> Roofline:
    """First-order roofline for the VPU shift-add kernel."""
    TM, TN = tile
    r = spec.radius
    win = (TM + 2 * max(8, fused_steps * r)) * (TN + 2 * 128)
    bytes_per_pass = (win + TM * TN) * dtype_bytes
    cells_per_pass = TM * TN * fused_steps
    bpc = bytes_per_pass / cells_per_pass

    ops = 0
    for t in spec.terms:
        for taps in t.taps[-2:]:
            if taps is not None:
                ops += 2 * sum(1 for w in taps if w != 0.0)
    ops += 2 * len(spec.residue)
    fpc = float(ops)

    bw_bound = hbm_gbps / bpc
    comp_bound = vpu_gflops / fpc if fpc else float("inf")
    return Roofline(
        bytes_per_cell_step=bpc,
        flops_per_cell_step=fpc,
        bw_bound_gcells=bw_bound,
        compute_bound_gcells=comp_bound,
        bound="bw" if bw_bound < comp_bound else "compute",
    )
