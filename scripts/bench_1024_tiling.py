"""1024² stretch: tiled vs un-tiled UNet, and 16k-token attention blocks.

VERDICT round-2 item 6: the fold/unfold tiling (ops/tiling.py) was built
and parity-tested at toy scale but never *measured* at 1024² against the
un-tiled path (11.64 s/edit, 21% MFU, PERF.md §1). This bench times the
dominant cost — the CFG UNet call at 128² latents (96% of the edit) —
three ways on the real chip:

  * untiled: one (2, 128, 128, 9) call, 16384-token ds=1 self-attention
    through the grid-streamed flash kernel (reference equivalent:
    un-split apply_model, latent_diffusion.py:736).
  * tiled ks=64 stride=32: 9 half-overlapping 64² crops folded into the
    batch (18 per CFG call) — the reference's split_input_params path
    (latent_diffusion.py:656-736) with its border weighting.
  * tiled ks=64 stride=64: 4 non-overlapping crops (lower quality at the
    seams; the FLOP floor of any tiling).

plus a block-size sweep of the streamed flash kernel at the 16k-token
ds=1 shape (16, 16384, 40) to tune the untiled path.

Projected edit p50 = 51 × UNet call + the measured fixed stages
(VAE decode 1024²: measured here too). One JSON line per row.

Usage: python scripts/bench_1024_tiling.py [--repeats 6]
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
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--iters", type=int, default=10)
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.unet import UNetConfig
    from pbe_tpu.ops import flash_attention as fa
    from pbe_tpu.ops.tiling import TilingSpec, tiled_apply

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

    # ---- 16k-token streamed flash block sweep -----------------------------
    rng = jax.random.PRNGKey(0)
    bh, n, d = 16, 16384, 40
    q = jax.random.normal(rng, (bh, n, d), jnp.bfloat16)
    k = jax.random.normal(rng, (bh, n, d), jnp.bfloat16)
    v = jax.random.normal(rng, (bh, n, d), jnp.bfloat16)
    for bq, bk in [(256, 512), (512, 512), (512, 1024), (1024, 1024),
                   (256, 2048), (512, 2048)]:
        f = jax.jit(functools.partial(fa._flash_fwd_bhnd, block_q=bq,
                                      block_k=bk, variant="streamed"))
        try:
            t = timeit(f, q, k, v)
        except Exception:
            t = float("nan")
        print(json.dumps({"bench": "attn16k", "blocks": [bq, bk],
                          "us": round(t * 1e6, 1)}), flush=True)

    # ---- CFG UNet call at 128^2 latents: untiled vs tiled -----------------
    dtype = jnp.bfloat16
    unet = UNetConfig().build(dtype=dtype, attn_impl="pallas", remat=False)
    x9 = jax.random.normal(rng, (2, 128, 128, 9), dtype)
    t_emb = jnp.zeros((2,), jnp.float32)
    ctx = jax.random.normal(rng, (2, 1, 768), dtype)
    params = jax.jit(unet.init)(rng, x9[:, :64, :64, :], t_emb, ctx)

    def keep9(out, like):
        return jnp.concatenate([out, out, jnp.zeros_like(like[..., :1])],
                               axis=-1)

    def untiled(xx, pp):
        return keep9(unet.apply(pp, xx, t_emb, ctx), xx)

    rows = {}
    rows["untiled"] = timeit(untiled, x9, params)
    print(json.dumps({"bench": "unet128", "mode": "untiled",
                      "ms": round(rows["untiled"] * 1e3, 2)}), flush=True)

    for stride in (32, 64):
        spec = TilingSpec(ks=(64, 64), stride=(stride, stride))
        L = ((128 - 64) // stride + 1) ** 2

        def tiled(xx, pp, _spec=spec, _L=L):
            def fn(patches):  # (L*2, 64, 64, 9) -> (L*2, 64, 64, 4)
                tt = jnp.zeros((patches.shape[0],), jnp.float32)
                cc = jnp.broadcast_to(ctx[:1], (patches.shape[0], 1, 768))
                return unet.apply(pp, patches, tt, cc)

            return keep9(tiled_apply(fn, xx, _spec), xx)

        key = f"tiled_s{stride}"
        rows[key] = timeit(tiled, x9, params)
        print(json.dumps({"bench": "unet128", "mode": key, "crops": L,
                          "ms": round(rows[key] * 1e3, 2)}), flush=True)

    # ---- projection to a full 50-step edit --------------------------------
    best = min(rows, key=lambda kk: rows[kk])
    for mode, tcall in rows.items():
        print(json.dumps({
            "bench": "projection", "mode": mode,
            "unet_call_ms": round(tcall * 1e3, 2),
            "projected_51calls_s": round(51 * tcall, 2),
        }), flush=True)
    print(json.dumps({"bench": "winner", "mode": best,
                      "ms": round(rows[best] * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
