"""ds=1 SpatialTransformer decomposition: what would fusing the 1x1
proj_in/proj_out (+/- GEGLU) into the flash kernel actually buy?

VERDICT r3/r4 item: the ds=1 SpatialTransformer costs ~1441 us of the
20.28 ms CFG UNet call (PERF.md section 5) and the suggestion was to
absorb the HBM round trips flanking the flash kernel by fusing the 1x1
projections (and possibly the GEGLU FF) into it. Before writing that
kernel, this probe measures the bound on what such a fusion can save:

  arms (marginal chained cost, jitter-proof chain lengths):
    full         GN -> proj_in -> [LN qkv flash to_out] -> [LN 1-token
                 cross] -> [LN GEGLU FF] -> proj_out + residual
                 (the production composition, weights as runtime args)
    flash        the Pallas attention alone on precomputed q,k,v
    noattn       full with the attention replaced by identity (out = q
                 view) — everything a fusion could possibly absorb, plus
                 the FF matmuls that stay on the MXU regardless

  derived:
    nonattn_us   = full - flash      (cross-check vs noattn)
    roofline_us  = pure matmul FLOPs of proj_in/out + qkv/to_out + FF
                   at peak (these FLOPs survive any fusion)
    hbm_bound_us = the intermediate tensors' read+write traffic at peak
                   HBM bandwidth — the THEORETICAL maximum a perfect
                   fusion could recover (XLA already fuses elementwise
                   chains; a Pallas mega-kernel can only save boundary
                   traffic, not matmul FLOPs)

Usage:  python scripts/bench_spatial_transformer.py  [--batch 2]
One JSON line per arm + one verdict line.
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
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--side", type=int, default=64)
    p.add_argument("--channels", type=int, default=320)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--repeats", type=int, default=7)
    p.add_argument("--lo", type=int, default=32)
    p.add_argument("--hi", type=int, default=256)
    p.add_argument("--peak_tflops", type=float, default=197.0)
    p.add_argument("--hbm_gbps", type=float, default=820.0)
    p.add_argument("--attn", default="pallas")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.ops.attention import multi_head_attention

    B, S, C = opt.batch, opt.side, opt.channels
    N = S * S
    H = opt.heads
    dt = jnp.bfloat16
    k0 = jax.random.PRNGKey(0)

    def mk(*shape, scale=0.02):
        nonlocal k0
        k0, k1 = jax.random.split(k0)
        return (jax.random.normal(k1, shape, jnp.float32) * scale)

    W = {
        "gn_g": jnp.ones((C,), jnp.float32), "gn_b": jnp.zeros((C,), jnp.float32),
        "proj_in": mk(C, C), "proj_in_b": jnp.zeros((C,), jnp.float32),
        "ln1_g": jnp.ones((C,), jnp.float32), "ln1_b": jnp.zeros((C,), jnp.float32),
        "wq": mk(C, C), "wk": mk(C, C), "wv": mk(C, C),
        "wo": mk(C, C), "wo_b": jnp.zeros((C,), jnp.float32),
        "ln2_g": jnp.ones((C,), jnp.float32), "ln2_b": jnp.zeros((C,), jnp.float32),
        "cv": mk(768, C), "co": mk(C, C), "co_b": jnp.zeros((C,), jnp.float32),
        "ln3_g": jnp.ones((C,), jnp.float32), "ln3_b": jnp.zeros((C,), jnp.float32),
        "ff1": mk(C, 8 * C), "ff1_b": jnp.zeros((8 * C,), jnp.float32),
        "ff2": mk(4 * C, C), "ff2_b": jnp.zeros((C,), jnp.float32),
        "proj_out": mk(C, C), "proj_out_b": jnp.zeros((C,), jnp.float32),
    }

    def gn32(x, g, b, groups=32, eps=1e-6):
        xf = x.astype(jnp.float32)
        sh = xf.shape
        xg = xf.reshape(*sh[:-1], groups, sh[-1] // groups)
        mu = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = ((xg - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        xn = ((xg - mu) / jnp.sqrt(var + eps)).reshape(sh)
        return (xn * g + b).astype(x.dtype)

    def ln32(x, g, b, eps=1e-5):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return (((xf - mu) / jnp.sqrt(var + eps)) * g + b).astype(x.dtype)

    def dense(x, w, b=None):
        y = x @ w.astype(x.dtype)
        return y if b is None else y + b.astype(x.dtype)

    def make_body(kind):
        def attn1(x, w, use_attn):
            h = ln32(x, w["ln1_g"], w["ln1_b"])
            q = dense(h, w["wq"])
            if use_attn:
                k = dense(h, w["wk"])
                v = dense(h, w["wv"])
                o = multi_head_attention(q, k, v, H, impl=opt.attn)
            else:
                # identity attention: keeps qkv/to_out matmuls + all
                # boundary traffic, deletes only the flash kernel
                # (1e-12, not 0.0 — a literal zero lets XLA DCE k/v)
                k = dense(h, w["wk"])
                v = dense(h, w["wv"])
                o = q + 1e-12 * (k + v)
            return dense(o, w["wo"], w["wo_b"]) + x

        def attn2(x, ctx, w):
            h = ln32(x, w["ln2_g"], w["ln2_b"])
            del h  # independent of x for a 1-token context (q/k unused)
            v = dense(ctx, w["cv"])
            o = dense(v, w["co"], w["co_b"])
            return jnp.broadcast_to(o, x.shape) + x

        def ff(x, w):
            h = ln32(x, w["ln3_g"], w["ln3_b"])
            pr = dense(h, w["ff1"], w["ff1_b"])
            a, gate = jnp.split(pr, 2, axis=-1)
            g = a * jax.nn.gelu(gate.astype(jnp.float32),
                                approximate=False).astype(a.dtype)
            return dense(g, w["ff2"], w["ff2_b"]) + x

        def full(x4, ctx, w, use_attn=True):
            xi = x4
            h = gn32(x4, w["gn_g"], w["gn_b"])
            h = dense(h, w["proj_in"], w["proj_in_b"])
            h = h.reshape(B, N, C)
            h = attn1(h, w, use_attn)
            h = attn2(h, ctx, w)
            h = ff(h, w)
            h = h.reshape(B, S, S, C)
            return dense(h, w["proj_out"], w["proj_out_b"]) + xi

        if kind == "full":
            return lambda x4, ctx, w: full(x4, ctx, w, True)
        if kind == "noattn":
            return lambda x4, ctx, w: full(x4, ctx, w, False)
        if kind == "flash":
            def body(x4, ctx, w):
                h = x4.reshape(B, N, C)
                o = multi_head_attention(h, h, h, H, impl=opt.attn)
                return o.reshape(B, S, S, C)
            return body
        raise ValueError(kind)

    x = jax.random.normal(jax.random.PRNGKey(7), (B, S, S, C), dt)
    ctx = jax.random.normal(jax.random.PRNGKey(8), (B, 1, 768), dt)

    def marginal(body):
        def chain(n):
            @jax.jit
            def run(x, ctx, w):
                def f(i, c):
                    return (body(c, ctx, w) * 0.05 + c * 0.95).astype(c.dtype)
                return jax.lax.fori_loop(0, n, f, x)
            return run

        def t_of(n):
            fn = chain(n)
            float(jnp.mean(fn(x, ctx, W).astype(jnp.float32)))
            ts = []
            for _ in range(opt.repeats):
                t0 = time.perf_counter()
                float(jnp.mean(fn(x, ctx, W).astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        delta = t_of(opt.hi) - t_of(opt.lo)
        return delta / (opt.hi - opt.lo), delta

    rows = {}
    for kind in ("full", "flash", "noattn"):
        per, delta = marginal(make_body(kind))
        rows[kind] = per
        print(json.dumps({"arm": kind, "marginal_us": round(per * 1e6, 1),
                          "delta_ms": round(delta * 1e3, 2)}), flush=True)

    # FLOPs that survive any fusion (pure matmuls, fwd only, batch B):
    mat = 2 * B * N * C * C           # one NxCxC matmul
    flops = (mat                      # proj_in
             + 3 * mat + mat          # qkv + to_out
             + 2 * B * 768 * C + 2 * B * C * C   # 1-token cross (tiny)
             + 2 * B * N * C * 8 * C + 2 * B * N * 4 * C * C  # GEGLU FF
             + mat)                   # proj_out
    roofline_us = flops / (opt.peak_tflops * 1e12) * 1e6
    # boundary traffic a perfect mega-fusion could save: every
    # intermediate (B,N,C)-bf16 tensor that XLA materializes between the
    # fused matmul regions. Count the majors: GN out, proj_in out, LN1
    # out, q, k, v, attn out, to_out out(+res), LN2/attn2 out(+res), LN3
    # out, GEGLU h (4C wide), FF out(+res), proj_out in/out. ~16 passes
    # of (B,N,C) x 2 bytes, read+write each -> 32 traversals is the
    # generous upper bound.
    tensor_mb = B * N * C * 2 / 1e6
    hbm_bound_us = 32 * tensor_mb / (opt.hbm_gbps * 1e3) * 1e6

    verdict = {
        "nonattn_us_measured": round((rows["full"] - rows["flash"]) * 1e6, 1),
        "noattn_arm_us": round(rows["noattn"] * 1e6, 1),
        "matmul_roofline_us": round(roofline_us, 1),
        "hbm_fusion_bound_us": round(hbm_bound_us, 1),
        "intermediate_mb_each": round(tensor_mb, 2),
        "note": "fusion can save at most min(nonattn - roofline, "
                "hbm_bound) per ds1 SpatialTransformer",
    }
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
