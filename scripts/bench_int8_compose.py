"""Why do int8 convs win isolated but lose in-graph? (PERF.md §8)

bench_int8.py measured w8a8 conv3x3 2.08x at ds2 in an ISOLATED chain;
bench_int8_unet.py measured the convs-only int8 UNet 2.49x SLOWER than
bf16. This probe bisects the composition: the same conv at the same
geometry, timed in three bodies with both executions:

    conv          x -> conv(x)                      (the r3 probe body)
    gn_conv       x -> conv(silu(groupnorm(x)))     (a ResBlock half)
    gn_conv_gn    x -> groupnorm(conv(silu(groupnorm(x))))

If int8 wins `conv` but loses `gn_conv*`, the regression is the fusion
boundary / layout repack between the bf16 elementwise neighborhood and
the int8 MXU tile format, not the conv itself.

Usage: python scripts/bench_int8_compose.py [--geom ds1 ds2]
One JSON line per (geometry, body, mode).
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
    p.add_argument("--geom", nargs="*", default=["ds1", "ds2"])
    p.add_argument("--batch", type=int, default=2)
    # chain lengths sized so (t_hi - t_lo) >> tunnel jitter: at ~50-300 µs
    # per body, 448 extra applications = 22-134 ms of signal against the
    # few-ms run-to-run noise. The round-4 defaults (8 vs 40 -> 32 bodies
    # ~ 3 ms) were below the noise floor and produced negative marginals
    # (benchmarks/int8_compose_r4.jsonl; VERDICT r4 weak #8).
    p.add_argument("--repeats", type=int, default=7)
    p.add_argument("--lo", type=int, default=64)
    p.add_argument("--hi", type=int, default=512)
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.ops import quant

    GEOMS = {  # latent side, channels (v1 UNet levels)
        "ds1": (64, 320),
        "ds2": (32, 640),
        "ds4": (16, 1280),
    }

    def groupnorm(x, scale, bias, groups=32):
        b, h, w, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
        mu = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (xf.reshape(b, h, w, c) * scale + bias).astype(x.dtype)

    def conv(x, w):
        if quant.is_active():
            return quant.conv_general_dilated_int8(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def make_body(kind):
        def body(x, w, g1, b1, g2, b2):
            if kind == "conv":
                return conv(x, w)
            h = conv(jax.nn.silu(groupnorm(x, g1, b1)), w)
            if kind == "gn_conv":
                return h
            return groupnorm(h, g2, b2)
        return body

    def timed(body, args, mode):
        def chain(n):
            @jax.jit
            def run(x, *rest):
                def f(_, c):
                    return (body(c, *rest) * 0.1 + c * 0.9).astype(c.dtype)
                return jax.lax.fori_loop(0, n, f, x)
            return run

        def t_of(n):
            fn = chain(n)
            with quant.quantized(mode):
                out = fn(*args)
            _ = float(jnp.mean(out.astype(jnp.float32)))
            ts = []
            for _i in range(opt.repeats):
                t0 = time.perf_counter()
                with quant.quantized(mode):
                    out = fn(*args)
                _ = float(jnp.mean(out.astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        delta = t_of(opt.hi) - t_of(opt.lo)
        if delta < 5e-3:
            print(json.dumps({"warning": "marginal delta below 5 ms — "
                              "unreliable; raise --hi",
                              "delta_ms": round(delta * 1e3, 2)}),
                  file=sys.stderr, flush=True)
        return delta / (opt.hi - opt.lo)

    rng = jax.random.PRNGKey(0)
    for geom in opt.geom:
        s, c = GEOMS[geom]
        x = jax.random.normal(rng, (opt.batch, s, s, c), jnp.bfloat16)
        w = (jax.random.normal(rng, (3, 3, c, c), jnp.float32)
             * (c * 9) ** -0.5)
        g1 = jnp.ones((c,), jnp.float32)
        b1 = jnp.zeros((c,), jnp.float32)
        g2 = jnp.ones((c,), jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)
        args = (x, w, g1, b1, g2, b2)
        for kind in ("conv", "gn_conv", "gn_conv_gn"):
            body = make_body(kind)
            base = timed(body, args, None)
            q8 = timed(body, args, "int8")
            print(json.dumps({
                "geom": geom, "body": kind, "batch": opt.batch,
                "bf16_us": round(base * 1e6, 1),
                "int8_us": round(q8 * 1e6, 1),
                "int8_vs_bf16": round(q8 / base, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
