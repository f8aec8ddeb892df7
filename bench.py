"""Headline benchmark: star2d1r (the north-star shape, BASELINE.md) at the
largest BASELINE config (8192^2), GStencil/s with the reference's x3
temporal-fusion factor (src/2d/gpu.cu:553), fp32-exact VPU engine with
in-VMEM temporal fusion.

vs_baseline = this engine / naive XLA dense stencil (one shifted
slice-add per tap), both measured in this run on the same device.

Prints exactly ONE JSON line.  Everything device-side runs inside jit
(eager ops over a tunneled TPU are pathologically slow; see CLAUDE.md).
"""

import json
import sys

import jax
import jax.numpy as jnp


def main() -> int:
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError as exc:
        # tunneled backend unavailable (relay lease recovering, see
        # CLAUDE.md): degrade to the CPU smoke config with an honest
        # tag rather than crashing the driver's bench
        print(f"WARN: accelerator backend unavailable ({exc}); "
              f"falling back to CPU", file=sys.stderr, flush=True)
        on_tpu = False
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    from lorastencil_tpu import engine
    from lorastencil_tpu.models.shapes import get_shape
    from lorastencil_tpu.ops import xla_ref
    from lorastencil_tpu.utils import metrics

    spec = get_shape("star2d1r")
    if on_tpu:
        # identical step counts so jit/dispatch overhead amortizes equally
        # in both measurements (the round-1 16-step baseline under-counted
        # the naive path's throughput by ~10-20%)
        m = n = 8192
        steps, base_steps = 256, 256
        # measured round-4 optimum: exact mxu_hybrid1 (column convs on
        # the MXU at full split depth, row convs + residue on the VPU,
        # co-issued) at (256, 2048) under the raised VMEM ceiling;
        # 60.0 GCells/s = 180.1 GStencil/s in the suite record (PERF.md)
        cfg = dict(algorithm="mxu_hybrid1", fused_steps=1,
                   tile=(256, 2048))
    else:  # local smoke config
        m, n = 256, 512
        steps, base_steps = 8, 8
        cfg = dict(algorithm="vpu_roll", fused_steps=2, tile=(64, 256))

    eng = engine.StencilEngine.for_shape("star2d1r", (m, n), **cfg)

    @jax.jit
    def run_engine(key):
        state = jax.random.uniform(key, eng.layout.shape, jnp.float32,
                                   0.0, 0.01)
        out = eng._run_internal(state, steps)
        return jnp.sum(out * 0.0)

    pad_shape = spec.padded_shape((m, n))

    @jax.jit
    def run_naive(key):
        g = jax.random.uniform(key, pad_shape, jnp.float32, 0.0, 0.01)

        def body(_, x):
            return xla_ref.dense_step(x, spec)

        return jnp.sum(jax.lax.fori_loop(0, base_steps, body, g) * 0.0)

    key = jax.random.PRNGKey(0)
    # pipeline=4 dispatches per timed region, one sync (the reference's
    # launch-loop methodology); subtract_sync removes the measured
    # ~25-60 ms tunnel sync+dispatch latency that the reference's local
    # cudaDeviceSynchronize does not pay (see utils.metrics.time_run)
    secs, _ = metrics.time_run(run_engine, key, repeats=2, warmup=1,
                               pipeline=4, subtract_sync=True)
    res = metrics.bench_result(spec, (m, n), steps, secs,
                               f"pallas-{cfg['algorithm']}",
                               "fp32-exact", 2)
    bsecs, _ = metrics.time_run(run_naive, key, repeats=2, warmup=1,
                                pipeline=4, subtract_sync=True)
    base = metrics.bench_result(spec, (m, n), base_steps, bsecs,
                                "xla-naive", "fp32", 2)

    print(json.dumps({
        "metric": f"star2d1r {m}x{n} GStencil/s (x3 fused, fp32-exact) "
                  f"on {jax.default_backend()}",
        "value": round(res.gstencil_per_s, 3),
        "unit": "GStencil/s",
        "vs_baseline": round(res.gstencil_per_s / base.gstencil_per_s, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
