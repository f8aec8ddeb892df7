"""Headline benchmark: star2d1r (the north-star shape, BASELINE.md) on the
largest BASELINE config (8192^2), GStencil/s with the reference's x3
temporal-fusion factor (src/2d/gpu.cu:553).

vs_baseline = Pallas banded-GEMM engine / naive XLA dense stencil (one
shifted slice-add per tap), both measured in this run on the same device.

Prints exactly ONE JSON line.  Everything device-side runs inside jit
(eager ops over a tunneled TPU are pathologically slow).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")

    from lorastencil_tpu.models.shapes import get_shape
    from lorastencil_tpu.ops import xla_ref
    from lorastencil_tpu.ops.layout import Layout2D
    from lorastencil_tpu.utils import metrics

    spec = get_shape("star2d1r")
    if on_tpu:
        m = n = 8192
        steps, base_steps, tile = 256, 16, (256, 1024)
    else:  # local smoke config
        m, n = 256, 512
        steps, base_steps, tile = 8, 4, (64, 256)

    layout = Layout2D(interior=(m, n), halo=spec.halo, tile=tile)

    from lorastencil_tpu.ops import pallas_2d

    @jax.jit
    def make_state(key):
        g = jax.random.uniform(key, layout.shape, jnp.float32, 0.0, 100.0)
        # zero guard ring (realistic steady-state input)
        r0, c0 = layout.origin
        mask_r = (jnp.arange(layout.shape[0]) >= r0) & (
            jnp.arange(layout.shape[0]) < r0 + m)
        mask_c = (jnp.arange(layout.shape[1]) >= c0) & (
            jnp.arange(layout.shape[1]) < c0 + n)
        return g * (mask_r[:, None] & mask_c[None, :])

    def step(cur, donor):
        return pallas_2d.stencil2d_step(
            cur, donor, spec, layout, interpret=not on_tpu)

    @jax.jit
    def run_pallas(state):
        def body(_, carry):
            cur, spare = carry
            return (step(cur, spare), cur)
        final, _ = jax.lax.fori_loop(
            0, steps, body, (state, jnp.zeros_like(state)))
        return jnp.sum(final)

    pad_shape = spec.padded_shape((m, n))

    @jax.jit
    def make_padded(key):
        return jax.random.uniform(key, pad_shape, jnp.float32, 0.0, 100.0)

    @jax.jit
    def run_naive(g):
        def body(_, x):
            return xla_ref.dense_step(x, spec)
        return jnp.sum(jax.lax.fori_loop(0, base_steps, body, g))

    key = jax.random.PRNGKey(0)
    state = make_state(key)
    state.block_until_ready()

    secs, _ = metrics.time_run(run_pallas, state, repeats=2, warmup=1)
    res = metrics.bench_result(spec, (m, n), steps, secs, "pallas",
                               "highest", 2)

    g = make_padded(key)
    g.block_until_ready()
    bsecs, _ = metrics.time_run(run_naive, g, repeats=2, warmup=1)
    base = metrics.bench_result(spec, (m, n), base_steps, bsecs, "xla-naive",
                                "fp32", 2)

    print(json.dumps({
        "metric": f"star2d1r {m}x{n} GStencil/s (x3 fused, fp32-accurate) "
                  f"on {jax.default_backend()}",
        "value": round(res.gstencil_per_s, 3),
        "unit": "GStencil/s",
        "vs_baseline": round(res.gstencil_per_s / base.gstencil_per_s, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
