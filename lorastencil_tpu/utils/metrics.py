"""Benchmark timing and the GStencil/s metric contract.

Matches the reference's emitted metrics (SURVEY.md section 6): wall-clock
``Time = N [ms]`` over the whole timestep loop plus ``GStencil/s`` where
cell-updates are multiplied by the shape's temporal-fusion equivalence
factor (x3 for 1d1r, x2 for 1d2r, x3 for star2d1r/box2d*, x1 otherwise --
e.g. ``/root/reference/src/1d/gpu_1r.cu:131-132``, ``src/2d/gpu.cu:553``).
Also emits a machine-readable JSON record.
"""

from __future__ import annotations

import dataclasses
import json
import time
import numpy as np

from ..models.shapes import StencilSpec


@dataclasses.dataclass
class BenchResult:
    shape: str
    interior: tuple
    steps: int
    time_ms: float
    gstencil_per_s: float   # fused-equivalent cell updates / s / 1e9
    gcells_per_s: float     # raw cell updates / s / 1e9
    fuse_factor: int
    backend: str
    precision: str
    repeats: int

    def human(self) -> str:
        return (
            f"LoRAStencil-TPU({self.shape}):\n"
            f"Time = {self.time_ms:.3f} [ms]\n"
            f"GStencil/s = {self.gstencil_per_s:f}"
        )

    def json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


_SYNC_OVERHEAD = None


def sync_overhead_s(refresh: bool = False) -> float:
    """Measured cost of one dispatch + device->host scalar sync.

    Over the tunneled backend this is ~25-60 ms of pure host/transport
    latency (round 3: a device trace showed a 16-step kernel run at
    2.1 ms device time inside a 17 ms wall measurement -- the rest was
    the trailing ``np.asarray`` sync).  The reference's methodology has
    the same structure (launch loop + one ``cudaDeviceSynchronize``,
    ``/root/reference/src/2d/gpu.cu:408-417``) but its sync costs
    microseconds; subtracting ours restores comparability.  Cached per
    process (first call dispatches a trivial jitted scalar)."""
    global _SYNC_OVERHEAD
    if _SYNC_OVERHEAD is None or refresh:
        import jax
        import jax.numpy as jnp

        triv = jax.jit(lambda x: jnp.sum(x * 0.0))
        x = jnp.ones((8, 128), jnp.float32)
        for _ in range(2):
            np.asarray(triv(x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(triv(x))
            best = min(best, time.perf_counter() - t0)
        _SYNC_OVERHEAD = best
    return _SYNC_OVERHEAD


def time_run(run_fn, *args, repeats: int = 3, warmup: int = 1,
             pipeline: int = 1, subtract_sync: bool = False):
    """Time a jitted device function: warmup (compile) runs, then best-of
    ``repeats`` wall times.

    ``pipeline``: calls per timed region (one sync at the end, per-call
    time reported).  Back-to-back dispatches queue on the device, so
    per-call dispatch latency amortizes ``pipeline``-fold -- exactly the
    reference's methodology (N kernel launches, one trailing
    cudaDeviceSynchronize, ``src/2d/gpu.cu:408-417``).  Use > 1 for
    configs whose single-call device time is comparable to the dispatch
    latency (~50 ms over the tunneled backend).

    ``subtract_sync``: remove the measured per-region sync+dispatch
    latency (``sync_overhead_s``) from the reported per-call time.  The
    reference's trailing sync costs ~0; ours is tens of ms of tunnel
    round trip, which would otherwise be booked against the device.

    Synchronization is a real device->host transfer of the result, not
    just ``block_until_ready`` -- on tunneled/async backends the latter
    can return before the computation ran (observed on axon).  For honest
    timing, ``run_fn`` should return a SCALAR (e.g. a checksum); large
    outputs make the transfer part of the measured time."""
    if subtract_sync:
        sync_overhead_s()  # calibrate before the timed regions
    out = None
    for _ in range(max(1, warmup)):
        out = run_fn(*args)
        _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(max(1, pipeline)):
            out = run_fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / max(1, pipeline))
    if subtract_sync:
        # keep at least 10% of the raw time so a mis-calibrated S can
        # never zero out a genuinely tiny measurement
        best = max(best - sync_overhead_s() / max(1, pipeline), best * 0.1)
    return best, out


def _sync(x):
    for leaf in (x if isinstance(x, (tuple, list)) else (x,)):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
        np.asarray(leaf)  # hard sync: forces the transfer


def bench_result(
    spec: StencilSpec, interior, steps: int, seconds: float,
    backend: str, precision: str, repeats: int,
) -> BenchResult:
    cells = int(np.prod(interior))
    raw = cells * steps / seconds / 1e9
    return BenchResult(
        shape=spec.name,
        interior=tuple(interior),
        steps=steps,
        time_ms=seconds * 1e3,
        gstencil_per_s=raw * spec.fuse_factor,
        gcells_per_s=raw,
        fuse_factor=spec.fuse_factor,
        backend=backend,
        precision=precision,
        repeats=repeats,
    )
