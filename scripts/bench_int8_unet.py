"""Attribute the end-to-end int8 pipeline slowdown to its components.

The r3 isolated-op probe (bench_int8.py) measured w8a8 conv3x3 2.08x at
ds2 / 1.92x at ds4 / 1.30x at ds1 — but the FULL 50-step pipeline with
--quantize int8 regressed (sweep_int8_b1_r4: 2.52 s vs 1.08 s fp). In a
real graph each quantize/dequantize boundary also breaks XLA's
elementwise fusion (GN+SiLU can no longer fuse into the conv, the
rescale can't fuse into what follows), so isolated-op wins don't
compose. This bench times ONE UNet eps call (the pipeline's inner loop
body) per quantization variant to locate the regression:

    bf16            no quantization (baseline)
    int8            convs+dense, per-row scales (the serving mode)
    int8-pertensor  convs+dense, per-tensor scales (the r3 probe scheme)
    int8-convs      convs only, per-row
    int8-dense      dense only, per-row
    int8-static     convs+dense, CALIBRATED constant scales (no runtime
                    amax: quantize/rescale are constant-scale elementwise
                    ops XLA can fuse — the PTQ deployment shape PERF §8
                    names as the candidate fix for the in-graph regression)
    int8-static-convs  convs only, calibrated constant scales

Usage: python scripts/bench_int8_unet.py [--batch 2] [--latent 64]
Prints one JSON line per variant (marginal per-call microseconds).
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2,
                   help="UNet batch (2 = CFG-doubled batch-1 serving)")
    p.add_argument("--latent", type=int, default=64)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--lo", type=int, default=10)
    p.add_argument("--hi", type=int, default=30)
    p.add_argument("--attn", default="pallas")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExample, PaintByExampleConfig
    from pbe_tpu.ops import quant
    from pbe_tpu.pipelines.loading import init_variables

    model = PaintByExampleConfig().build(dtype=jnp.bfloat16,
                                         attn_impl=opt.attn)
    variables = init_variables(model, seed=0)

    b, s = opt.batch, opt.latent
    rng = jax.random.PRNGKey(0)
    x9 = jax.random.normal(rng, (b, s, s, 9), jnp.bfloat16)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jax.random.normal(rng, (b, 1, 768), jnp.bfloat16)

    def chain(n):
        @jax.jit
        def run(variables, x9, t, ctx):
            def body(i, x):
                eps = model.apply(variables, x, t, ctx,
                                  method=PaintByExample.apply_model)
                # feed eps back so the loop can't be collapsed
                return x.at[..., :4].add(0.001 * eps.astype(x.dtype))
            return jax.lax.fori_loop(0, n, body, x9)
        return run

    def timed(n, spec_kw, mode):
        fn = chain(n)
        with quant.quantized(mode, **spec_kw):
            out = fn(variables, x9, t, ctx)  # compile + warm
        _ = float(jnp.mean(out.astype(jnp.float32)))
        ts = []
        for _i in range(opt.repeats):
            t0 = time.perf_counter()
            with quant.quantized(mode, **spec_kw):
                out = fn(variables, x9, t, ctx)
            _ = float(jnp.mean(out.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def calibrate(convs=True, dense=True):
        # one-batch calibration on the bench input itself (scale VALUES
        # don't affect timing; only their constancy does)
        @jax.jit
        def calib(variables, x9, t, ctx_in):
            with quant.calibration(convs=convs, dense=dense) as col:
                eps = model.apply(variables, x9, t, ctx_in,
                                  method=PaintByExample.apply_model)
            return eps, col.records
        _, recs = calib(variables, x9, t, ctx)
        recs = jax.tree_util.tree_map(np.asarray, recs)
        return quant.scales_from_records([recs])

    scales = calibrate()
    scales_convs = calibrate(dense=False)
    variants = [
        ("bf16", None, {}),
        ("int8", "int8", {}),
        ("int8-pertensor", "int8", {"per_row": False}),
        ("int8-convs", "int8", {"dense": False}),
        ("int8-dense", "int8", {"convs": False}),
        ("int8-static", "int8", {"static": scales}),
        ("int8-static-convs", "int8",
         {"dense": False, "static": scales_convs}),
    ]
    base_us = None
    for name, mode, kw in variants:
        t_lo = timed(opt.lo, kw, mode)
        t_hi = timed(opt.hi, kw, mode)
        us = (t_hi - t_lo) / (opt.hi - opt.lo) * 1e6
        row = {"variant": name, "batch": b, "latent": s,
               "unet_call_us": round(us, 1)}
        if name == "bf16":
            base_us = us
        elif base_us:
            row["vs_bf16"] = round(us / base_us, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
