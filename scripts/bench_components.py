"""Per-component timing of the edit pipeline on one chip.

Times each stage of the 512^2 edit in isolation with the tunnel-safe
chained-iteration pattern (N dependency-linked calls inside one jit, one
readback): the CFG UNet call, VAE encode, VAE decode, CLIP encode. Verifies
the measured stage budget sums to ~the end-to-end edit latency and shows
where the non-MXU time lives.

    python scripts/bench_components.py [--iters 20] [--repeats 5]

Prints one JSON line per stage.
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--attn", default="pallas")
    p.add_argument("--peak-tflops", type=float, default=197.0)
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExample, PaintByExampleConfig
    from pbe_tpu.pipelines.loading import init_variables

    model = PaintByExampleConfig().build(dtype=jnp.bfloat16, attn_impl=opt.attn)
    variables = init_variables(model, seed=0)
    b, s = opt.batch, opt.size
    lat = s // model.latent_downsample
    k = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    def timeit(label, fn, x, *extra, n_calls_per_edit=None):
        """fn must map x (+ extra) -> array of x's shape/dtype for chaining;
        wraps in fori_loop of opt.iters chained calls."""

        @jax.jit
        def chained(x, *extra):
            def body(_, carry):
                return fn(carry, *extra).astype(carry.dtype)
            return jax.lax.fori_loop(0, opt.iters, body, x)

        out = chained(x, *extra)
        float(jnp.mean(out))
        ts = []
        for _ in range(opt.repeats):
            t0 = time.perf_counter()
            out = chained(x, *extra)
            float(jnp.mean(out))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) / opt.iters * 1e3
        rec = {"stage": label, "ms_per_call": round(ms, 3)}
        if n_calls_per_edit:
            rec["calls_per_edit"] = n_calls_per_edit
            rec["ms_per_edit"] = round(ms * n_calls_per_edit, 1)
        print(json.dumps(rec), flush=True)
        return ms

    # CFG UNet call: batch 2B, 9-channel input; chain on the noisy 4 channels
    x9 = jax.random.normal(k, (2 * b, lat, lat, 9), bf)
    t_vec = jnp.full((2 * b,), 500.0, jnp.float32)
    ctx = jax.random.normal(k, (2 * b, 1, 768), bf)

    def unet_call(x4, variables, x9, t_vec, ctx):
        x = jnp.concatenate([x4, x9[..., 4:]], axis=-1)
        return model.apply(variables, x, t_vec, ctx,
                           method=PaintByExample.apply_model)

    unet_ms = timeit("unet_cfg_call(2B)", unet_call, x9[..., :4], variables,
                     x9, t_vec, ctx, n_calls_per_edit=51)

    # VAE encode: image -> latent; chain via decode-free projection (pad the
    # latent back up spatially is wrong — instead chain on a same-shape image
    # by broadcasting the latent mean into the image shape; timing unaffected)
    img = jax.random.uniform(k, (b, s, s, 3), bf, -1, 1)

    def vae_enc(img, variables):
        z = model.apply(variables, img, None,
                        method=PaintByExample.encode_first_stage)
        return img + 0.0 * jnp.mean(z).astype(img.dtype)

    enc_ms = timeit("vae_encode", vae_enc, img, variables, n_calls_per_edit=1)

    z = jax.random.normal(k, (b, lat, lat, 4), bf)

    def vae_dec(z, variables):
        img = model.apply(variables, z, method=PaintByExample.decode_first_stage)
        return z + 0.0 * jnp.mean(img).astype(z.dtype)

    dec_ms = timeit("vae_decode", vae_dec, z, variables, n_calls_per_edit=1)

    ref = jax.random.normal(k, (b, 224, 224, 3), bf)

    def clip_enc(ref, variables):
        c = model.apply(variables, ref, method=PaintByExample.get_conditioning)
        return ref + 0.0 * jnp.mean(c).astype(ref.dtype)

    clip_ms = timeit("clip_encode", clip_enc, ref, variables, n_calls_per_edit=1)

    total = unet_ms * 51 + enc_ms + dec_ms + clip_ms
    print(json.dumps({
        "stage": "SUM(51 unet + enc + dec + clip)",
        "ms_per_edit": round(total, 1),
        "note": "compare against bench.py p50 (sampler math + launch gaps "
                "are the difference)",
    }))


if __name__ == "__main__":
    main()
