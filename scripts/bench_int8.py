"""int8 quantization probe: is there real MXU speed on this chip?

v5e advertises 394 TOPS int8 vs 197 TFLOP/s bf16 — a potential 2x on the
MXU-bound share of the UNet call (PERF.md §5: convs are 61-76% of their
bf16 roofline and dominate the call). Before building a quantized serving
path, this bench answers three questions in increasing realism:

  1. ceiling: does XLA emit fast int8 MXU code at all?  A bare
     4096^3 matmul, int8xint8->int32 (`preferred_element_type`) vs bf16.
  2. conv3x3 at the UNet's four geometries, w8a8: activation quantize
     (per-tensor scale/round/clip/cast, done in-program as serving would)
     -> int8 conv -> int32 -> rescale to bf16, vs the bf16 conv.
  3. weight-only int8: bf16 activations x (int8 weights dequantized
     in-program) — the bandwidth-saving variant (the bf16-params
     experiment in PERF.md §1 was a relayout-bound dead end; int8 halves
     the traffic again and the dequant may fuse differently).

Chained-iteration timing (single readback per measurement), same idiom as
bench_resblock.py. Prints one JSON line per (geometry, variant).

Usage: python scripts/bench_int8.py [--repeats 10]
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
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--peak-tflops", type=float, default=197.0)  # v5e bf16
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes / few iters (CPU wiring check)")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    LO, HI = (2, 6) if opt.smoke else (50, 150)
    rng = jax.random.PRNGKey(0)

    def timeit(fn, x, *extra):
        """Marginal per-op time: (t_HI - t_LO) / (HI - LO). The chained
        standalone number carries ~30-35 ms of fixed per-call overhead on
        this host (axon tunnel RTT + launch — see resblock_r3's standalone
        780 us vs 126 us marginal for the same conv); differencing two trip
        counts cancels it."""
        def run_iters(iters):
            @jax.jit
            def chained(x, *extra):
                def body(_, carry):
                    return fn(carry, *extra).astype(carry.dtype)
                return jax.lax.fori_loop(0, iters, body, x)

            out = chained(x, *extra)
            float(jnp.mean(out.astype(jnp.float32)))
            ts = []
            for _ in range(opt.repeats):
                t0 = time.perf_counter()
                out = chained(x, *extra)
                float(jnp.mean(out.astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (run_iters(HI) - run_iters(LO)) / (HI - LO)

    def emit(row):
        print(json.dumps(row), flush=True)

    def quant_i8(x):
        """Per-tensor symmetric int8 quantization, in-program."""
        s = jnp.max(jnp.abs(x)) / 127.0 + 1e-8
        q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        return q, s

    # ---- 1. ceiling: bare 4096^3 matmul ------------------------------
    M = 256 if opt.smoke else 4096
    a = jax.random.normal(rng, (M, M), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.bfloat16)
    flops = 2 * M * M * M

    t = timeit(lambda x, w: jnp.dot(x, w).astype(jnp.bfloat16), a, b)
    emit({"probe": "matmul4096", "variant": "bf16", "us": round(t * 1e6, 1),
          "tflops": round(flops / t / 1e12, 1)})

    a8 = jnp.clip(jnp.round(a.astype(jnp.float32) * 8), -127, 127).astype(jnp.int8)
    b8 = jnp.clip(jnp.round(b.astype(jnp.float32) * 8), -127, 127).astype(jnp.int8)

    def mm_i8(x8, w8):
        y = jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # rescale back so the chained carry stays int8-able
        y = (y.astype(jnp.float32) * (1.0 / 64.0)).astype(jnp.bfloat16)
        return jnp.clip(jnp.round(y * 8), -127, 127).astype(jnp.int8)

    t = timeit(mm_i8, a8, b8)
    emit({"probe": "matmul4096", "variant": "int8xint8->int32",
          "us": round(t * 1e6, 1), "tops": round(flops / t / 1e12, 1)})

    # weight-only: bf16 x dequantized-int8
    def mm_wo(x, w8):
        w = w8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 8.0)
        return jnp.dot(x, w).astype(jnp.bfloat16)

    t = timeit(mm_wo, a, b8)
    emit({"probe": "matmul4096", "variant": "bf16 x deq(int8)",
          "us": round(t * 1e6, 1), "tflops": round(flops / t / 1e12, 1)})

    # ---- 2/3. conv3x3 at the UNet geometries -------------------------
    geoms = [
        ("ds1", 2, 64, 64, 320),
        ("ds2", 2, 32, 32, 640),
        ("ds4", 2, 16, 16, 1280),
        ("ds8", 2, 8, 8, 1280),
    ]
    if opt.smoke:
        geoms = [("smoke", 1, 8, 8, 32)]
    dn = jax.lax.conv_dimension_numbers(
        (2, 64, 64, 320), (3, 3, 320, 320), ("NHWC", "HWIO", "NHWC"))

    for name, bsz, h, w, c in geoms:
        x = jax.random.normal(rng, (bsz, h, w, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, c, c),
                              jnp.bfloat16) * 0.05
        conv_flops = 2 * bsz * h * w * 9 * c * c
        ideal_us = conv_flops / (opt.peak_tflops * 1e12) * 1e6

        def conv_bf16(y, kk):
            return jax.lax.conv_general_dilated(
                y, kk, (1, 1), "SAME", dimension_numbers=dn)

        t = timeit(conv_bf16, x, k)
        emit({"geom": name, "op": "conv3x3", "variant": "bf16",
              "us": round(t * 1e6, 1), "ideal_bf16_us": round(ideal_us, 1),
              "pct_roofline": round(ideal_us / (t * 1e6) * 100, 1)})

        # w8a8: weights pre-quantized (as a serving path would hold them),
        # activation quantized in-program every call.
        k8, ks = quant_i8(k.astype(jnp.float32))
        ks = float(ks)

        def conv_w8a8(y, kk8):
            q, s = quant_i8(y.astype(jnp.float32))
            acc = jax.lax.conv_general_dilated(
                q, kk8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (s * ks)).astype(jnp.bfloat16)

        t = timeit(conv_w8a8, x, k8)
        emit({"geom": name, "op": "conv3x3", "variant": "w8a8",
              "us": round(t * 1e6, 1),
              "ideal_int8_us": round(ideal_us / 2, 1),
              "pct_int8_roofline": round(ideal_us / 2 / (t * 1e6) * 100, 1)})

        # weight-only int8
        def conv_wo(y, kk8):
            kk = kk8.astype(jnp.bfloat16) * jnp.bfloat16(ks)
            return jax.lax.conv_general_dilated(
                y, kk, (1, 1), "SAME", dimension_numbers=dn)

        t = timeit(conv_wo, x, k8)
        emit({"geom": name, "op": "conv3x3", "variant": "bf16 x deq(int8)",
              "us": round(t * 1e6, 1)})


if __name__ == "__main__":
    main()
