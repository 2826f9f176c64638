"""UNet in-call cost decomposition: where do the 22.3 ms go?

The CFG UNet call is 96% of the 512^2 edit (PERF.md §1) at ~35% in-call
MFU. Before fusing anything (VERDICT round-2 item 2: conv+GroupNorm/SiLU
Pallas fusion) this bench attributes the call's time to its constituents,
per geometry level, with matmul rooflines for each conv:

    ds=1: (2,  64, 64,  320)   5 ResBlocks + 2 SpatialTransformers
    ds=2: (2,  32, 32,  640)   5 ResBlocks + 2 SpatialTransformers
    ds=4: (2,  16, 16, 1280)   5 ResBlocks + 2 SpatialTransformers
    ds=8: (2,   8,  8, 1280)   7 ResBlocks (incl. middle) + 1 Transformer

measuring per geometry: the full ResBlock, GroupNorm32+SiLU alone, a bare
conv3x3, and the SpatialTransformer — each as 50 dependency-chained
iterations inside one jit (single readback; a naive loop measures the
~100 ms axon tunnel round-trip instead of the op).

Usage: python scripts/bench_resblock.py [--repeats 10]
Prints one JSON line per (geometry, op).
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
    p.add_argument("--hbm-gbs", type=float, default=819.0)      # v5e HBM BW
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.unet import ResBlock, SpatialTransformer, _conv
    from pbe_tpu.ops.norms import GroupNorm32
    import flax.linen as nn

    ITERS = 50
    dtype = jnp.bfloat16

    def timeit(fn, x, *extra):
        @jax.jit
        def chained(x, *extra):
            def body(_, carry):
                return fn(carry, *extra).astype(carry.dtype)
            return jax.lax.fori_loop(0, ITERS, body, x)

        out = chained(x, *extra)
        float(jnp.mean(out.astype(jnp.float32)))  # warm + force readback
        ts = []
        for _ in range(opt.repeats):
            t0 = time.perf_counter()
            out = chained(x, *extra)
            float(jnp.mean(out.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / ITERS

    # (name, B, H, W, C, n_resblocks_in_unet, n_transformers_in_unet)
    geoms = [
        ("ds1", 2, 64, 64, 320, 5, 2),
        ("ds2", 2, 32, 32, 640, 5, 2),
        ("ds4", 2, 16, 16, 1280, 5, 2),
        ("ds8", 2, 8, 8, 1280, 7, 1),
    ]
    rng = jax.random.PRNGKey(0)

    rows = []
    for name, b, h, w, c, n_res, n_tf in geoms:
        x = jax.random.normal(rng, (b, h, w, c), dtype)
        emb = jax.random.normal(rng, (b, 1280), dtype)
        ctx = jax.random.normal(rng, (b, 1, 768), dtype)

        # conv3x3 roofline for this geometry
        conv_flops = 2 * b * h * w * 9 * c * c
        conv_ideal_us = conv_flops / (opt.peak_tflops * 1e12) * 1e6
        # GN+SiLU bandwidth bound: read x + write y (bf16)
        gn_bytes = 2 * b * h * w * c * 2
        gn_ideal_us = gn_bytes / (opt.hbm_gbs * 1e9) * 1e6

        # --- full ResBlock
        blk = ResBlock(c, dtype)
        params = blk.init(rng, x, emb)
        t = timeit(lambda y, p, e: blk.apply(p, y, e), x, params, emb)
        rows.append((name, "resblock", t, 2 * conv_ideal_us))

        # --- GroupNorm + SiLU alone
        gn = GroupNorm32()
        gparams = gn.init(rng, x)
        t = timeit(lambda y, p: nn.silu(gn.apply(p, y)), x, gparams)
        rows.append((name, "gn_silu", t, gn_ideal_us))

        # --- bare conv3x3 (c -> c)
        class C3(nn.Module):
            @nn.compact
            def __call__(self, y):
                return _conv(c, 3, dtype, "conv")(y)
        c3 = C3()
        cparams = c3.init(rng, x)
        t = timeit(lambda y, p: c3.apply(p, y), x, cparams)
        rows.append((name, "conv3x3", t, conv_ideal_us))

        # --- SpatialTransformer (self-attn + 1-token cross-attn + GEGLU)
        tf = SpatialTransformer(8, c // 8, 1, dtype, attn_impl="pallas")
        tparams = tf.init(rng, x, ctx)
        t = timeit(lambda y, p, cc: tf.apply(p, y, cc), x, tparams, ctx)
        rows.append((name, "spatial_tf", t, None))

        for gname, op, tsec, ideal in rows[-4:]:
            per_call = {"resblock": n_res, "gn_silu": 2 * n_res,
                        "conv3x3": 2 * n_res, "spatial_tf": n_tf}[op]
            print(json.dumps({
                "geom": gname, "op": op, "us": round(tsec * 1e6, 1),
                "ideal_us": None if ideal is None else round(ideal, 1),
                "count_in_unet_call": per_call,
                "total_ms_in_call": round(tsec * 1e3 * per_call, 3),
            }), flush=True)

    total = 0.0
    for gname, op, tsec, _ in rows:
        mult = {"resblock": 1, "spatial_tf": 1}.get(op)
        if mult is None:
            continue
        counts = {("ds1", "resblock"): 5, ("ds1", "spatial_tf"): 2,
                  ("ds2", "resblock"): 5, ("ds2", "spatial_tf"): 2,
                  ("ds4", "resblock"): 5, ("ds4", "spatial_tf"): 2,
                  ("ds8", "resblock"): 7, ("ds8", "spatial_tf"): 1}
        total += tsec * counts[(gname, op)]
    # not in the sum: 3 down/3 up-samplers, in/out convs, time MLP, skip-cats
    print(json.dumps({"sum_res_tf_ms": round(total * 1e3, 2),
                      "note": "vs 22.3 ms measured CFG UNet call"}),
          flush=True)


if __name__ == "__main__":
    main()
