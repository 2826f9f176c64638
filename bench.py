"""Headline benchmark: 512^2 exemplar-guided edits/sec/chip at 50-step PLMS.

Runs the full edit program (VAE encode + CLIP encode + 50-step CFG PLMS scan
+ VAE decode) on one chip in bf16 with the production v1 geometry (randomly
initialized weights — identical FLOPs/memory to trained ones).

Prints ONE JSON line:
  {"metric": ..., "value": edits/sec/chip, "unit": "edits/s",
   "vs_baseline": baseline_latency(1.5s) / measured_latency}
vs_baseline > 1 beats the BASELINE.md target of <1.5 s / 50-step edit.
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_LATENCY_S = 1.5  # BASELINE.md: 50-step 512^2 edit p50 target on v5e
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
SAMPLER = os.environ.get("BENCH_SAMPLER", "plms")
ATTN = os.environ.get("BENCH_ATTN", "pallas")  # 'pallas' | 'xla'
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))  # v5e bf16


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExampleConfig
    from pbe_tpu.pipelines.inference import EditPipeline
    from pbe_tpu.pipelines.loading import init_variables

    model = PaintByExampleConfig().build(dtype=jnp.bfloat16, attn_impl=ATTN)
    with contextlib.redirect_stdout(io.StringIO()):
        variables = init_variables(model, seed=0)
        pipeline = EditPipeline(model, variables)

        # inputs created on device: measures chip latency, not the dev
        # tunnel's host<->device image transfer (production hosts have
        # local PCIe); completion forced via a 4-byte scalar readback
        k = jax.random.PRNGKey(0)
        dt = jnp.bfloat16
        image = jax.random.uniform(k, (BATCH, 512, 512, 3), dt, -1, 1)
        mask = jnp.ones((BATCH, 512, 512, 1), dt)
        mask = mask.at[:, 128:384, 128:384, :].set(0.0)
        ref = jax.random.normal(k, (BATCH, 224, 224, 3), dt)
        x_T = jax.random.normal(k, (BATCH, 64, 64, 4), dt)
        rng = jax.random.PRNGKey(321)
        scale = jnp.asarray(5.0, jnp.float32)
        fn = pipeline._fn(STEPS, SAMPLER, 0.0, True)
        args = (pipeline.variables, image, mask, ref, x_T, scale, rng)
        # explicit lower/compile: one compilation reused for timing AND
        # XLA cost analysis (MFU accounting)
        compiled = fn.lower(*args).compile()
        try:
            analysis = compiled.cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            total_flops = float(analysis.get("flops", float("nan")))
        except Exception:
            total_flops = float("nan")
        fn = compiled
        out = fn(*args)  # warm
        _ = float(jnp.mean(out))
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.mean(out))
            times.append(time.perf_counter() - t0)
        assert np.isfinite(np.asarray(out)).all()

    p50 = float(np.median(times))
    latency_per_edit = p50 / BATCH
    baseline = BASELINE_LATENCY_S * (STEPS / 50)  # target scales with steps
    mfu = (
        round(total_flops / (p50 * PEAK_TFLOPS * 1e12), 4)
        if np.isfinite(total_flops) else None
    )
    print(json.dumps({
        "metric": f"512^2 edits/sec/chip ({STEPS}-step {SAMPLER.upper()}, "
                  f"bf16, batch {BATCH})",
        "value": round(BATCH / p50, 4),
        "unit": "edits/s",
        "vs_baseline": round(baseline / latency_per_edit, 4),
        "p50_latency_s": round(latency_per_edit, 4),
        "mfu": mfu,
        "program_tflops": (
            round(total_flops / 1e12, 2) if np.isfinite(total_flops) else None
        ),
    }))


if __name__ == "__main__":
    main()
