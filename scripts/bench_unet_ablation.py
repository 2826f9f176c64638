"""In-program UNet cost attribution (marginal-cost microbench + ablation).

Two complementary measurements on the real chip:

1. MARGINAL op cost: the chained-iteration floor (~0.6 ms/iter, PERF.md §3)
   swamps small ops, so each op is timed as the difference between a chain
   whose body applies it k times and a chain applying it once:
   marginal = (t_k - t_1) / (k - 1). The floor cancels exactly.

2. UNet ABLATION: the full production CFG UNet call (batch 2, 64^2
   latents, bf16, v1 geometry) vs variants with GroupNorm affine-only and
   with attention on XLA — in-program attribution that microbenches can't
   see (fusion context preserved).

Usage: python scripts/bench_unet_ablation.py [--repeats 8] [--k 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=8)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--peak-tflops", type=float, default=197.0)
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn

    from pbe_tpu.models.unet import ResBlock, SpatialTransformer, UNetConfig, _conv
    from pbe_tpu.ops.norms import GroupNorm32

    dtype = jnp.bfloat16
    ITERS = opt.iters

    def timeit(fn, *args):
        @jax.jit
        def chained(x, *rest):
            def body(_, carry):
                return fn(carry, *rest).astype(carry.dtype)
            return jax.lax.fori_loop(0, ITERS, body, x)

        out = chained(*args)
        float(jnp.mean(out.astype(jnp.float32)))
        ts = []
        for _ in range(opt.repeats):
            t0 = time.perf_counter()
            out = chained(*args)
            float(jnp.mean(out.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / ITERS

    def marginal(apply_once, x, *extra):
        """(t_k - t_1)/(k-1): per-op cost with the chain floor cancelled."""
        def once(y, *e):
            return apply_once(y, *e)

        def ktimes(y, *e):
            for _ in range(opt.k):
                y = apply_once(y, *e).astype(y.dtype)
            return y

        t1 = timeit(once, x, *extra)
        tk = timeit(ktimes, x, *extra)
        return (tk - t1) / (opt.k - 1)

    rng = jax.random.PRNGKey(0)
    geoms = [("ds1", 2, 64, 64, 320), ("ds2", 2, 32, 32, 640),
             ("ds4", 2, 16, 16, 1280), ("ds8", 2, 8, 8, 1280)]

    for name, b, h, w, c in geoms:
        x = jax.random.normal(rng, (b, h, w, c), dtype)
        emb = jax.random.normal(rng, (b, 1280), dtype)
        ctx = jax.random.normal(rng, (b, 1, 768), dtype)
        conv_ideal = 2 * b * h * w * 9 * c * c / (opt.peak_tflops * 1e12) * 1e6

        blk = ResBlock(c, dtype)
        bp = blk.init(rng, x, emb)
        t_res = marginal(lambda y, p, e: blk.apply(p, y, e), x, bp, emb)

        gn = GroupNorm32()
        gp = gn.init(rng, x)
        t_gn = marginal(lambda y, p: nn.silu(gn.apply(p, y)), x, gp)

        class C3(nn.Module):
            @nn.compact
            def __call__(self, y):
                return _conv(c, 3, dtype, "conv")(y)
        c3 = C3()
        cp = c3.init(rng, x)
        t_conv = marginal(lambda y, p: c3.apply(p, y), x, cp)

        tf = SpatialTransformer(8, c // 8, 1, dtype, attn_impl="pallas")
        tp = tf.init(rng, x, ctx)
        t_tf = marginal(lambda y, p, cc: tf.apply(p, y, cc), x, tp, ctx)

        print(json.dumps({
            "geom": name, "marginal_us": {
                "resblock": round(t_res * 1e6, 1),
                "gn_silu": round(t_gn * 1e6, 1),
                "conv3x3": round(t_conv * 1e6, 1),
                "spatial_tf": round(t_tf * 1e6, 1),
            },
            "conv_ideal_us": round(conv_ideal, 1),
            "conv_mxu_util": round(conv_ideal / max(t_conv * 1e6, 1e-9), 3),
        }), flush=True)

    # ---- full UNet call ablation ----------------------------------------
    x9 = jax.random.normal(rng, (2, 64, 64, 9), dtype)
    t = jnp.zeros((2,), jnp.float32)
    ctx = jax.random.normal(rng, (2, 1, 768), dtype)

    def unet_time(attn_impl, gn_affine_only=False):
        import pbe_tpu.ops.norms as norms_mod
        orig = norms_mod.group_norm_lane_friendly
        if gn_affine_only:
            def affine_only(xx, groups, eps, scale, bias):
                return (xx.astype(jnp.float32) * scale + bias).astype(xx.dtype)
            norms_mod.group_norm_lane_friendly = affine_only
        try:
            unet = UNetConfig().build(dtype=dtype, attn_impl=attn_impl,
                                      remat=False)
            params = jax.jit(unet.init)(rng, x9, t, ctx)

            def call(xx, pp):
                out = unet.apply(pp, xx, t, ctx)
                return jnp.concatenate([out, out, jnp.zeros_like(
                    xx[..., :1])], axis=-1)  # keep 9ch for chaining

            return timeit(call, x9, params)
        finally:
            norms_mod.group_norm_lane_friendly = orig

    rows = {}
    for label, kw in [
        ("prod_pallas", dict(attn_impl="pallas")),
        ("attn_xla", dict(attn_impl="xla")),
        ("gn_affine_only", dict(attn_impl="pallas", gn_affine_only=True)),
    ]:
        rows[label] = unet_time(**kw)
        print(json.dumps({"unet_call": label,
                          "ms": round(rows[label] * 1e3, 3)}), flush=True)
    print(json.dumps({
        "attn_delta_ms": round((rows["attn_xla"] - rows["prod_pallas"]) * 1e3, 3),
        "gn_stats_delta_ms": round(
            (rows["prod_pallas"] - rows["gn_affine_only"]) * 1e3, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
