"""Training-step benchmark: full v1 geometry on one chip.

Measures the jitted 512^2 train step (frozen VAE/CLIP encodes + 9-ch
assembly + UNet fwd/bwd with remat + AdamW update) at a given batch size,
with the fused Pallas flash-attention backward on the self-attention blocks.

    BENCH_TRAIN_BATCH=4 python scripts/bench_train.py

Prints one JSON line: steps/s, images/s/chip, achieved TFLOP/s and MFU from
XLA cost analysis of the compiled step (no lax.scan in the train step, so
the compiled-program count is trip-accurate — it INCLUDES remat recompute,
i.e. this is hardware-achieved FLOP/s, not model-useful MFU).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "4"))
REPEATS = int(os.environ.get("BENCH_TRAIN_REPEATS", "5"))
ATTN = os.environ.get("BENCH_ATTN", "pallas")
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExampleConfig
    from pbe_tpu.pipelines.loading import init_variables
    from pbe_tpu.training.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = PaintByExampleConfig().build(
        dtype=jnp.bfloat16, attn_impl=ATTN, remat=True
    )
    variables = init_variables(model, seed=0)
    tx = make_optimizer(mu_dtype=jnp.bfloat16)
    state = create_train_state(model, variables, tx, copy=False)
    del variables
    step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    k = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    batch = {
        "image": jax.random.uniform(k, (BATCH, 512, 512, 3), dt, -1, 1),
        "inpaint_image": jax.random.uniform(k, (BATCH, 512, 512, 3), dt, -1, 1),
        "mask": jnp.ones((BATCH, 512, 512, 1), dt),
        "ref": jax.random.normal(k, (BATCH, 224, 224, 3), dt),
    }
    rng = jax.random.PRNGKey(7)

    lowered = step_fn.lower(state, batch, rng)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")

    state, metrics = compiled(state, batch, rng)  # warm
    _ = float(np.asarray(metrics["loss"]))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, metrics = compiled(state, batch, rng)
        _ = float(np.asarray(metrics["loss"]))  # force readback (tunnel-safe)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    record = {
        "metric": f"512^2 train step (batch {BATCH}, remat, bf16, "
                  f"{ATTN} attn, fused flash bwd)",
        "value": round(1.0 / p50, 4),
        "unit": "steps/s",
        "p50_step_s": round(p50, 4),
        "images_per_s": round(BATCH / p50, 3),
    }
    if np.isfinite(flops):
        record["achieved_tflops_per_s"] = round(flops / p50 / 1e12, 2)
        record["hw_mfu_incl_remat"] = round(flops / (p50 * PEAK_TFLOPS * 1e12), 4)
        record["step_tflops"] = round(flops / 1e12, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
