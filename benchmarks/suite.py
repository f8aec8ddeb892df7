"""Full benchmark suite over the BASELINE.md configs.

Run directly (owns the device) or exec'd by tools/tpu_worker.py.  Emits a
human table plus one JSON line per config to benchmarks/results.jsonl,
and diffs every config against the recorded TPU numbers for the same
(tier, shape, sizes, steps): a reading below BOTH the robust band
around the recent median (3*MAD, at least 10%) AND the recent minimum
is flagged as a REGRESSION (the all-time best is printed for context
but ratchets on tunnel-noise tails — dispatch-bound 1-D configs spread
~±20% between sessions, PERF.md).

    python benchmarks/suite.py [--quick] [--gate] [--no-control]
                               [--bf16 | --df64 | --all-tiers | --custom]

``--gate``: exit nonzero when any config regresses (CI/worker-job mode).

Measurement integrity is ENFORCED IN CODE (round-4 VERDICT item 1; two
historical contaminated sessions produced physically impossible rows,
PERF.md r9 items 1/8a):

* **fp32 flagship control first**: on a real TPU backend the suite runs
  the fp32 flagship control config before recording ANYTHING and
  hard-aborts (exit 2, zero rows appended) when the reading falls
  outside the honest band ``CONTROL_BAND`` -- the stale-worker-module /
  tunnel-anomaly signature.  ``--no-control`` skips it (CPU runs never
  control: interpret-mode throughput is not the device tier).
* **physical-bound quarantine**: any row reading above
  ``PHYS_CAP`` x its governing roofline bound is appended to
  ``quarantine.jsonl`` instead of ``results.jsonl`` (impossible rows
  would poison the median/MAD gate floor for the next 7 sessions) and
  counts as a gate failure.  ``recorded_stats`` also drops any
  historical row above the cap when computing the floor/best.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lorastencil_tpu import engine
from lorastencil_tpu.utils import metrics, profiling

# (shape, interior, steps, pipeline) per BASELINE.md; star2d1r also at
# the 8192^2 north-star size.  ``pipeline`` = calls per timed region
# (reference methodology: N launches, one sync -- amortizes the ~50 ms
# tunnel dispatch latency out of configs whose device time is small).
# ``chain`` (4th tuple slot as dict): consecutive whole runs inside ONE
# device program for configs whose single run is far below the dispatch
# latency -- the TPU analog of the reference's async launch queue (its
# 64 sub-ms kernel launches enqueue without host round trips,
# src/1d/gpu_1r.cu:121-123; over the tunneled backend each dispatch
# costs ~0.9 ms, which would otherwise BE the measurement).
CONFIGS = [
    ("1d1r", (4096,), 64, {"pipeline": 8, "chain": 2048}),
    # chain=32: a single 1M x256 run is ~2-3 ms device time, so the
    # old pipeline-16 region was ~55 ms -- under the >= 0.3 s
    # reliability bound (round-5 1M A/Bs swung 26-101 GCells/s at
    # identical configs, and a first chain=8 re-record read 140% of
    # the bf16 bound -> quarantined); chained whole runs keep the
    # region >= ~0.5 s at the honest rates
    ("1d2r", (1_000_000,), 256, {"pipeline": 16, "chain": 32}),
    # large-grid 1-D regime (the df64 tier's 16M configs, on the
    # throughput tiers): full lanes/MXU pipeline, the configurations
    # the round-5 fused-depth sweep tuned (1d1r 127.7 at k=4; 1d2r
    # 124.7 at k=3 -- the optimum sits near lane_halo ~= 12, where the
    # MXU-stream bound peaks; engine._fused_k)
    ("1d1r", (16 * 1024 * 1024,), 256, 24),
    ("1d2r", (16 * 1024 * 1024,), 256, 24),
    ("star2d1r", (4096, 4096), 256, 8),
    ("box2d1r", (4096, 4096), 256, 8),
    ("star2d3r", (8192, 8192), 64, 12),
    ("box2d3r", (8192, 8192), 64, 8),
    ("star2d1r", (8192, 8192), 256, 4),
    # small-2-D regime row (round-5 VERDICT item 6): chained whole runs
    # through the tiled pipeline -- the device sweep measured the
    # whole-grid-resident kernel SLOWER at every small size (the tiled
    # run is already ONE jitted program; see
    # ops/pallas_2d.RESIDENT_2D_BYTES), so tiled is the recorded path.
    # Algorithm A/B at 512^2 (r5 device): mxu_hybrid1 35.4 > vpu_roll
    # 28.2 > vpu 27.0 GCells/s; k=1 beats k=2/4/8.
    ("star2d1r", (512, 512), 64, {"pipeline": 4, "chain": 256}),
    ("star3d1r", (256, 256, 256), 64, 24),
    ("box3d1r", (256, 256, 256), 64, 24),
]

# bf16-state throughput tier (half the HBM bytes; ~4e-3/step storage
# rounding): same nine configs, gated separately per tier (round-3
# VERDICT item 1).  Stability record: flagship bf16 88.5/88.4 GCells/s
# across two passes (r5 session) and 86.5 (r3) at the same config; the
# one-off 57.8 (r4) is outside every later remeasurement.
BF16 = [(name, interior, steps,
         dict(opts if isinstance(opts, dict) else {"pipeline": opts},
              dtype="bfloat16"))
        for name, interior, steps, opts in CONFIGS]

# df64 correctness-tier throughput rows (fp64-grade pair state; Pallas
# pair kernels for every dim: 1-D lanes, 2-D window, 3-D slab).
# VPU-compute bound; the separable (vpu_sep) form is the 2-D/3-D auto
# default, lane rolls the 1-D path.  Gated as its own tier
# (_tier -> "df64").
# region sizing: >= ~0.3 s raw per pipeline region (short regions are
# unreliable in BOTH directions through the tunnel sync subtraction --
# r9 post-mortems); 3-D at ~20 GCells/s needs steps=64, pipeline=4;
# 1-D at ~20 GCells/s and 16M cells needs steps=256
DF64 = [
    # the reference's ACTUAL 1-D regime (native fp64 at n=4096): the
    # resident pair kernel runs all 64 steps in one dispatch; chained
    # runs amortize the ~1 ms tunnel dispatch like the fp32 row
    ("1d1r", (4096,), 64, {"pipeline": 8, "chain": 2048, "dtype": "df64"}),
    ("1d1r", (16 * 1024 * 1024,), 256, {"pipeline": 2, "dtype": "df64"}),
    ("1d2r", (16 * 1024 * 1024,), 256, {"pipeline": 2, "dtype": "df64"}),
    ("star2d1r", (4096, 4096), 64, {"pipeline": 4, "dtype": "df64"}),
    # small-2-D df64 regime row (round-5 VERDICT item 6; tiled pair
    # pipeline -- the resident pair kernel measured slower, see
    # ops/pallas_df64.RESIDENT_PAIR_2D_BYTES)
    ("star2d1r", (512, 512), 64,
     {"pipeline": 2, "chain": 64, "dtype": "df64"}),
    ("box2d3r", (4096, 4096), 32, {"pipeline": 6, "dtype": "df64"}),
    ("star2d1r", (8192, 8192), 32, {"pipeline": 2, "dtype": "df64"}),
    ("star3d1r", (256, 256, 256), 64, {"pipeline": 6, "dtype": "df64"}),
    ("box3d1r", (256, 256, 256), 64, {"pipeline": 6, "dtype": "df64"}),
]

QUICK = [
    ("star2d1r", (1024, 1024), 64, 2),
    ("box3d1r", (32, 64, 256), 8, 2),
    ("1d1r", (4096,), 8, {"pipeline": 1, "chain": 4}),
]

# for_coeffs custom-stencil rows (round-4 VERDICT item 5/8): the headline
# "arbitrary user stencils" capability gets recorded TPU numbers and its
# own regression gate.  One non-symmetric 2-D spec (rank peel + sparse
# residue) and the 3-D rank-1-z-unfolding case (factorize.decompose_3d's
# fully-separable branch).  Coefficients are deterministic so the gate
# keys stay comparable across sessions.
def custom_coeffs(kind: str):
    import numpy as np

    if kind == "custom2d_asym5":
        # non-symmetric rank-1 outer product + 3 off-pattern spikes ->
        # pivot peel + sparse residue (the decompose_2d general path)
        u = np.array([1.0, 2.0, 3.0, 1.0, 0.5])
        v = np.array([0.25, 1.0, 2.0, 0.5, 0.125])
        S = np.outer(u, v)
        S[0, 4] += 0.25
        S[4, 0] -= 0.125
        S[2, 2] += 1.0
        return S
    if kind == "custom3d_sep3":
        # exactly-separable 3x3x3 -> decompose_3d's rank-1 z-unfolding
        z = np.array([1.0, 2.0, 1.0])
        u = np.array([1.0, 2.0, 1.0])
        v = np.array([0.5, 1.0, 0.5])
        return np.einsum("i,j,k->ijk", z, u, v)
    raise KeyError(kind)


CUSTOM = [
    ("custom2d_asym5", (4096, 4096), 256, 8),
    ("custom3d_sep3", (256, 256, 256), 64, 24),
]


# -- measurement integrity (round-4 VERDICT item 1) -----------------------
# The fp32 flagship is the control: its honest clean-session device range
# is 52-64 GCells/s (BENCH_r02/r04 60.0-60.2; PERF.md session spread).
# Both historical contamination events read far outside it (the r9
# all-tier event at 300-400% of physical bounds; the r8 df64 event's fp32
# companion rows were equally inflated), so a single pre-record control
# catches the stale-worker-module / tunnel-anomaly signature before any
# row lands in results.jsonl.
CONTROL = ("star2d1r", (8192, 8192), 256, {"pipeline": 2})
CONTROL_BAND = (52.0, 64.0)
# No honest kernel reads above its governing roofline ceiling; tunnel
# noise is downward.  Allow 10% model slack, quarantine beyond it.
# The bf16 tier's cap is slightly looser: its ceiling model is now
# bf16-specific (probe-measured hbm_*_bf16_gbps pattern bandwidths +
# as-built single-part stream pricing, profiling._bf16_stream_costs;
# round-5 close of the 2.0-cap era, tools/remodel_rooflines.py) and
# every honest historical bf16 row reads 0.05-1.00 of it -- but the
# tightest config (box2d1r vpu-bound) sits at 1.00 exactly, so the
# documented ~+-10% session spread needs the extra margin.  Both
# contamination events read >= 3x, far above either cap.
PHYS_CAP = 1.10
PHYS_CAP_BF16 = 1.25


def phys_cap(backend: str) -> float:
    return PHYS_CAP_BF16 if _tier(backend) == "bf16" else PHYS_CAP


def control_ok(gcells: float) -> bool:
    return CONTROL_BAND[0] <= gcells <= CONTROL_BAND[1]


def row_disposition(rec: dict) -> str:
    """'record' or 'quarantine' for a result row: rows above their
    tier's physical cap x the governing roofline bound are physically
    impossible (a known recurring contamination signature) and must
    never enter results.jsonl, where they would ratchet the median/MAD
    floor."""
    pct = rec.get("pct_of_governing_bound")
    cap = phys_cap(rec.get("backend", ""))
    return "quarantine" if (pct is not None and pct > cap) else "record"


def run_config(name, interior, steps, pipeline=1, chain=1, **kw):
    if name.startswith("custom"):
        eng = engine.StencilEngine.for_coeffs(custom_coeffs(name),
                                              interior, name=name, **kw)
    else:
        eng = engine.StencilEngine.for_shape(name, interior, **kw)

    # df64 state is stacked fp32 pairs: (2, *internal) for the 2-D
    # Pallas pair kernel, (2, *padded) for the XLA pair path
    state_shape = (((2,) + eng.layout.shape) if eng.df64_pallas
                   else ((2,) + eng.spec.padded_shape(interior)
                         if eng.df64 else eng.layout.shape))

    @jax.jit
    def f(key):
        # eng.dtype, not fp32: the kernels key their numerics tier off
        # the STATE dtype (a fp32 state through a bf16-configured engine
        # silently measures the fp32 tier)
        state = jax.random.uniform(key, state_shape, eng.dtype,
                                   0.0, 0.01)
        if chain > 1:
            # CHAINed runs: each run's output is the next run's input --
            # still `chain` genuine full runs, one dispatch total
            state = jax.lax.fori_loop(
                0, chain, lambda i, st: eng._run_internal(st, steps),
                state)
            return jnp.sum(state * 0.0)
        return jnp.sum(eng._run_internal(state, steps) * 0.0)

    # subtract_sync: remove the measured ~25-60 ms tunnel sync+dispatch
    # latency from the timed region (the reference's trailing
    # cudaDeviceSynchronize costs ~0; round 3 traced a 17 ms wall
    # measurement whose device time was 2.1 ms -- the rest was the sync)
    secs, _ = metrics.time_run(f, jax.random.PRNGKey(0), repeats=2,
                               warmup=1, pipeline=pipeline,
                               subtract_sync=True)
    # report per-run time/steps (chain only amortizes dispatch latency);
    # non-fp32 tiers carry the dtype in the backend tag so the
    # regression gate never compares across numerics tiers
    # resolved, not the 'auto' alias; df64 tags its pair path (the 2-D
    # Pallas pair kernel vs the XLA dense fallback)
    tag = (f"pallas-df64-{eng.df64_algorithm}" if eng.df64_pallas
           else "xla-df64" if eng.df64 else f"pallas-{eng.algorithm}")
    if not eng.df64 and eng.config.dtype != "float32":
        tag += f"-{eng.config.dtype}"
    if chain > 1:
        tag += f"-chain{chain}"
    res = metrics.bench_result(eng.spec, interior, steps, secs / chain,
                               tag, eng.config.precision, 2)
    # per-row roofline vs the measured pattern ceilings (round-3 VERDICT
    # item 5: the north-star accounting is machine-checkable per row,
    # not PERF.md prose); None for tiers without a ceiling model
    roof = profiling.engine_roofline(eng)
    res.roofline_bound = roof.bound if roof else None
    res.governing_bound_gcells = roof.governing_gcells if roof else None
    res.pct_of_governing_bound = (
        res.gcells_per_s / roof.governing_gcells if roof else None)
    return res


def chain_of(kw) -> int:
    return kw.get("chain", 1) if isinstance(kw, dict) else 1


def _tier(backend: str) -> str:
    """Numerics tier of a results.jsonl row's backend tag."""
    if "df64" in backend:
        return "df64"
    return "bf16" if "bfloat16" in backend else "fp32"


def recorded_stats(outpath, platform):
    """(best, gate_floor) GCells/s per (tier, shape, sizes, steps)
    already in results.jsonl for this backend platform.  Tiers gate
    independently -- a bf16 row never baselines an fp32 run or vice
    versa.  The gate floor is robust, NOT the all-time max: gating on
    the max ratchets on tunnel-noise tails (dispatch-bound 1-D configs
    have a documented ~±20% session spread and day-scale bimodality,
    PERF.md; the round-9 all-tiers gate tripped on four such rows while
    every flagship row sat within 3% of record).  `best` stays for
    display."""
    vals = {}
    try:
        with open(outpath) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("backend_platform") != platform:
                    continue
                # suite rows only: skip sharded-overhead records and the
                # fp64 CPU tier (xla-df64 gates as its own tier)
                be = rec.get("backend", "")
                if ((not be.startswith("pallas-") and be != "xla-df64")
                        or "float64" in be):
                    continue
                if row_disposition(rec) != "record":
                    # historical physically-impossible rows (recorded
                    # before the quarantine existed) must not poison
                    # the floor/best
                    continue
                key = (_tier(be), rec.get("shape"),
                       tuple(rec.get("interior", ())), rec.get("steps"))
                vals.setdefault(key, []).append(
                    rec.get("gcells_per_s", 0.0))
    except FileNotFoundError:
        pass
    def _median(s):
        s = sorted(s)
        n = len(s)
        return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])

    best = {k: max(v) for k, v in vals.items()}
    floor = {}
    for k, v in vals.items():
        recent = v[-7:]
        med = _median(recent)
        mad = _median([abs(x - med) for x in recent])
        # a regression must be BOTH below the robust band around the
        # recent median (3*MAD, at least 10%) AND below everything seen
        # recently -- a reading inside the recent observed range is
        # session noise by definition, not a new regression
        floor[k] = min(med - max(3.0 * mad, 0.1 * med), min(recent))
    return best, floor


def run_suite(configs, outpath, platform, runner=run_config,
              control=None) -> "tuple[int, list, list]":
    """Record ``configs`` through the integrity gate.  Returns
    ``(status, rows, regressions)``: status 2 = control failed (NOTHING
    recorded).  ``control``: callable returning the fp32 flagship
    control GCells/s, or None to skip (CPU / --no-control)."""
    if control is not None:
        g = control()
        if not control_ok(g):
            print(f"CONTROL FAILED: fp32 flagship control read "
                  f"{g:.2f} GCells/s, outside the honest band "
                  f"{CONTROL_BAND[0]}-{CONTROL_BAND[1]} -- contaminated "
                  f"session (stale worker modules / tunnel anomaly, "
                  f"PERF.md r9); recording NOTHING.", flush=True)
            return 2, [], [f"control {g:.2f} outside {CONTROL_BAND}"]
        print(f"control: fp32 flagship {g:.2f} GCells/s (band "
              f"{CONTROL_BAND[0]}-{CONTROL_BAND[1]}) -- OK", flush=True)
    best, floor = recorded_stats(outpath, platform)
    qpath = os.path.join(os.path.dirname(outpath), "quarantine.jsonl")
    rows, regressions = [], []
    with open(outpath, "a") as out:
        for name, interior, steps, opts in configs:
            try:
                kw = opts if isinstance(opts, dict) else {"pipeline": opts}
                res = runner(name, interior, steps, **kw)
                rows.append(res)
                rec = json.loads(res.json())
                rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
                rec["backend_platform"] = platform
                rec["roofline_bound"] = res.roofline_bound
                rec["governing_bound_gcells"] = res.governing_bound_gcells
                rec["pct_of_governing_bound"] = res.pct_of_governing_bound
                pct = res.pct_of_governing_bound
                if row_disposition(rec) == "quarantine":
                    with open(qpath, "a") as q:
                        q.write(json.dumps(rec) + "\n")
                    regressions.append(
                        f"{name} {interior} x{steps}: QUARANTINED -- "
                        f"{res.gcells_per_s:.2f} GCells/s is {pct:.0%} "
                        f"of its governing bound "
                        f"(> {phys_cap(rec.get('backend', '')):.0%} is "
                        f"physically impossible); row -> {qpath}")
                    print(f"{name:10s} {str(interior):18s} x{steps:<4d} "
                          f"{res.gcells_per_s:7.2f} GCells/s  "
                          f"QUARANTINED ({pct:.0%} of bound)", flush=True)
                    continue
                out.write(json.dumps(rec) + "\n")
                out.flush()
                key = (_tier(rec.get("backend", "")), name,
                       tuple(interior), steps)
                ref = best.get(key)
                flo = floor.get(key)
                vs = (f"  {res.gcells_per_s / ref - 1.0:+6.1%} vs best "
                      f"{ref:.2f}" if ref else "")
                roofs = (f"  [{pct:4.0%} of {res.roofline_bound}-bound "
                         f"{res.governing_bound_gcells:.0f}]"
                         if pct is not None else "")
                if flo is not None and res.gcells_per_s < flo:
                    regressions.append(
                        f"{name} {interior} x{steps}: "
                        f"{res.gcells_per_s:.2f} < robust floor "
                        f"{flo:.2f} GCells/s of the recent recordings")
                # advisory floor (never gates): a TPU row far below its
                # governing ceiling is worth a look -- EXCEPT chained
                # tiny grids, which are dispatch-bound by construction
                if (pct is not None and pct < 0.4 and chain_of(kw) == 1
                        and platform == "tpu"):
                    print(f"WARNING: {name} {interior} at {pct:.0%} of "
                          f"its governing {res.roofline_bound} bound "
                          f"({res.governing_bound_gcells:.1f} GCells/s)",
                          flush=True)
                print(f"{name:10s} {str(interior):18s} x{steps:<4d} "
                      f"{res.gcells_per_s:7.2f} GCells/s  "
                      f"{res.gstencil_per_s:7.2f} GStencil/s{vs}{roofs}",
                      flush=True)
            except Exception as e:
                print(f"{name:10s} {str(interior):18s} FAILED: "
                      f"{type(e).__name__}", flush=True)
                regressions.append(f"{name} {interior} x{steps}: FAILED "
                                   f"({type(e).__name__})")
    print(f"\n{len(rows)}/{len(configs)} configs; results -> {outpath}")
    for r in regressions:
        print(f"REGRESSION: {r}", flush=True)
    return 0, rows, regressions


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    configs = QUICK if "--quick" in argv else CONFIGS
    if "--bf16" in argv:
        configs = BF16
    elif "--df64" in argv:
        configs = DF64
    elif "--custom" in argv:
        configs = CUSTOM
    elif "--all-tiers" in argv:
        configs = CONFIGS + BF16 + DF64 + CUSTOM
    outpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results.jsonl")
    platform = jax.default_backend()
    control = None
    if platform == "tpu" and "--no-control" not in argv:
        def control():
            name, interior, steps, kw = CONTROL
            return run_config(name, interior, steps, **kw).gcells_per_s
    status, _rows, regressions = run_suite(configs, outpath, platform,
                                           control=control)
    if status:
        return status
    return 1 if (regressions and "--gate" in argv) else 0


if __name__ == "__main__":
    sys.exit(main())
