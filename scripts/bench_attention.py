"""Flash-attention microbenchmark: UNet self-attention geometries on one chip.

Measures the production shapes (512^2 edit, CFG batch 2):
    ds=1: (16, 4096, 40)   8 heads x d=40  <- the documented 3.2x padding case
    ds=2: (16, 1024, 80)
    ds=4: (16, 256, 160)
    VAE : (2, 4096, 512)
for (a) the Pallas flash kernel across block-size configs, (b) the XLA
einsum path, and (c) the matmul roofline at both the padded (d->128) and
unpadded head dim — quantifying how much of the d=40 penalty is MXU
K-dim occupancy (fundamental: the 128x128 systolic array contracts 128
lanes per pass regardless of d) vs kernel overhead (fixable).

Usage: python scripts/bench_attention.py [--repeats 20]
Prints one JSON line per (shape, impl, config).
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
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--peak-tflops", type=float, default=197.0)  # v5e bf16
    p.add_argument("--impls", default="",
                   help="comma list to restrict impls (e.g. pipelined,rowblock)")
    p.add_argument("--shapes", default="",
                   help="comma list to restrict shapes (e.g. unet_ds1)")
    opt = p.parse_args()
    impl_filter = set(filter(None, opt.impls.split(",")))
    shape_filter = set(filter(None, opt.shapes.split(",")))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.ops import flash_attention as fa

    shapes = [  # (BH, N, D) post head-fold, bf16
        ("unet_ds1", 16, 4096, 40),
        ("unet_ds2", 16, 1024, 80),
        ("unet_ds4", 16, 256, 160),
        ("vae_mid", 2, 4096, 512),
    ]
    block_configs = [(256, 512), (512, 512), (256, 1024), (512, 1024),
                     (1024, 1024)]

    ITERS = 50

    def timeit(fn, *args):
        """Per-call time with the tunnel round-trip amortized away: ITERS
        dependency-chained calls (each iteration's output becomes the next
        query) inside ONE jitted program, a single 4-byte readback at the
        end. A bare per-call loop here measures the axon tunnel latency
        (~100 ms), not the ~1 ms kernel."""

        @jax.jit
        def chained(q, k, v):
            def body(_, carry):
                return fn(carry, k, v).astype(carry.dtype)
            return jax.lax.fori_loop(0, ITERS, body, q)

        out = chained(*args)
        float(jnp.mean(out))  # warm + force completion through the tunnel
        ts = []
        for _ in range(opt.repeats):
            t0 = time.perf_counter()
            out = chained(*args)
            float(jnp.mean(out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / ITERS

    for name, bh, n, d in shapes:
        if shape_filter and name not in shape_filter:
            continue
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (bh, n, d), jnp.bfloat16)
        kk = jax.random.normal(k, (bh, n, d), jnp.bfloat16)
        v = jax.random.normal(k, (bh, n, d), jnp.bfloat16)
        dp = (d + 127) // 128 * 128
        flops_unpadded = 4 * bh * n * n * d      # QK^T + PV
        flops_padded = 4 * bh * n * n * dp
        ideal_us = flops_unpadded / (opt.peak_tflops * 1e12) * 1e6
        padded_us = flops_padded / (opt.peak_tflops * 1e12) * 1e6

        rows = []
        if not impl_filter or "xla" in impl_filter:
            t = timeit(jax.jit(fa._attention_xla), q, kk, v)
            rows.append(("xla", None, t))
        for bc in (256, 512, 1024, 2048):
            if impl_filter and "pipelined" not in impl_filter:
                continue
            if bc > n or n % bc:
                continue
            f = jax.jit(functools.partial(
                fa._flash_fwd_bhnd, variant="pipelined", block_c=bc))
            try:
                t = timeit(f, q, kk, v)
                rows.append(("pipelined", (None, bc), t))
            except Exception:
                rows.append(("pipelined", (None, bc), float("nan")))
        for variant in ("rowblock", "resident", "streamed"):
            if impl_filter and variant not in impl_filter:
                continue
            for bq, bk in block_configs:
                if n % min(bq, n) or n % min(bk, n):
                    continue
                if variant == "rowblock" and (bq, bk) != (256, 512):
                    continue  # rowblock picks its own bq internally
                f = jax.jit(functools.partial(
                    fa._flash_fwd_bhnd, block_q=bq, block_k=bk,
                    variant=variant))
                try:
                    t = timeit(f, q, kk, v)
                    rows.append((variant, (bq, bk), t))
                except Exception:  # VMEM OOM etc.
                    rows.append((variant, (bq, bk), float("nan")))
        for impl, cfg, t in rows:
            print(json.dumps({
                "shape": name, "bh": bh, "n": n, "d": d, "impl": impl,
                "blocks": cfg, "us": round(t * 1e6, 1),
                "ideal_unpadded_us": round(ideal_us, 1),
                "ideal_padded_us": round(padded_us, 1),
                "mxu_util_vs_unpadded": round(ideal_us / (t * 1e6), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
