"""Train-step cost breakdown at v1 geometry — the training-side analogue
of bench_unet_ablation.py (PERF.md §4/§5).

The train step (training/train_step.py) is one fused XLA program; this
bench attributes its cost by timing nested prefixes of the computation
with the same marginal-cost chained methodology that survives the axon
tunnel's ~100 ms round-trip (PERF.md §5):

    encode     frozen VAE(GT) + VAE(masked) + CLIP cond + 9-ch assembly
    loss_fwd   encode + UNet eps forward + loss
    grads      loss_fwd + backward (remat recompute included) over the
               trainable partition
    full       grads + AdamW update (+ LR schedule, grad-norm metric)

Derived rows:  unet_fwd = loss_fwd - encode,  bwd = grads - loss_fwd,
optimizer = full - grads.  An `--attn xla` run isolates the fused flash
backward's contribution (the only backward subsystem with a swappable
implementation).

Usage:  BENCH_TRAIN_BATCH=8 python scripts/bench_train_ablation.py
Prints one JSON line per row (seconds per step).
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
    p.add_argument("--batch", type=int,
                   default=int(os.environ.get("BENCH_TRAIN_BATCH", "8")))
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--lo", type=int, default=2)
    p.add_argument("--hi", type=int, default=6)
    p.add_argument("--attn", default="pallas")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--unet_channels", type=int, default=0,
                   help="override UNet model_channels (CPU smoke runs)")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExample, PaintByExampleConfig
    from pbe_tpu.pipelines.loading import init_variables
    from pbe_tpu.training.partition import merge_params
    from pbe_tpu.training.train_step import (
        create_train_state,
        make_loss_fn,
        make_optimizer,
        make_train_step,
    )

    cfg = PaintByExampleConfig()
    if opt.unet_channels:
        from pbe_tpu.models.unet import UNetConfig
        cfg.unet_config = UNetConfig(model_channels=opt.unet_channels)
    model = cfg.build(dtype=jnp.bfloat16, attn_impl=opt.attn, remat=True)
    variables = init_variables(model, seed=0)
    tx = make_optimizer(mu_dtype=jnp.bfloat16)
    state = create_train_state(model, variables, tx, copy=False)
    del variables
    loss_fn = make_loss_fn(model)
    train_step = make_train_step(model, tx)

    b, s = opt.batch, opt.size
    k = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    batch = {
        "image": jax.random.uniform(k, (b, s, s, 3), dt, -1, 1),
        "inpaint_image": jax.random.uniform(k, (b, s, s, 3), dt, -1, 1),
        "mask": jnp.ones((b, s, s, 1), dt),
        "ref": jax.random.normal(k, (b, 224, 224, 3), dt),
    }
    rng = jax.random.PRNGKey(7)

    # each chained body perturbs the inputs by the carried scalar so XLA
    # cannot hoist the loop-invariant computation out of the fori_loop;
    # (t_hi - t_lo)/(hi - lo) cancels dispatch + tunnel readback exactly
    def encode_body(trainable, frozen, bt, r, c):
        params = {"params": merge_params(trainable, frozen)}
        img = bt["image"] + (c * 1e-12).astype(dt)
        z, z_inp, m = model.apply(
            params, img, bt["inpaint_image"], bt["mask"], r,
            method=PaintByExample.prepare_latents)
        cond = model.apply(params, bt["ref"] + (c * 1e-12).astype(dt),
                           method=PaintByExample.get_conditioning)
        return (jnp.mean(z.astype(jnp.float32))
                + jnp.mean(z_inp.astype(jnp.float32))
                + jnp.mean(cond.astype(jnp.float32))
                + jnp.mean(m.astype(jnp.float32)))

    def loss_body(trainable, frozen, bt, r, c):
        bt = dict(bt, image=bt["image"] + (c * 1e-12).astype(dt))
        loss, _ = loss_fn(trainable, frozen, bt, r)
        return loss

    def grads_body(trainable, frozen, bt, r, c):
        bt = dict(bt, image=bt["image"] + (c * 1e-12).astype(dt))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, bt, r)
        # consume the grads or XLA dead-code-eliminates the backward
        return loss + 1e-12 * sum(
            jnp.sum(jnp.abs(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads))

    def timed_scalar_chain(body):
        def make(n):
            @jax.jit
            def run(st, bt, r):
                def f(i, c):
                    return body(st.params, st.frozen, bt,
                                jax.random.fold_in(r, i), c)
                return jax.lax.fori_loop(0, n, f, jnp.float32(0.0))
            return run

        def t_of(n):
            fn = make(n)
            _ = float(fn(state, batch, rng))  # compile + warm
            ts = []
            for _i in range(opt.repeats):
                t0 = time.perf_counter()
                _ = float(fn(state, batch, rng))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (t_of(opt.hi) - t_of(opt.lo)) / (opt.hi - opt.lo)

    def timed_full_chain():
        # the full step mutates state: carry it through the loop. DONATE the
        # state argument — without donation the program holds BOTH the input
        # state and the loop carry (each ~params+opt_state), which OOM'd the
        # round-4 run at batch 8 (16.70 G > 15.75 G HBM); with donation the
        # carry aliases the input in place and the footprint is one copy.
        def make(n):
            def run(st, bt, r):
                def f(i, stc):
                    new, _ = train_step(stc, bt, r)
                    return new
                return jax.lax.fori_loop(0, n, f, st)
            return jax.jit(run, donate_argnums=0)

        # chain the donation: each call consumes the previous state; the
        # step time does not depend on the state values
        st = {"v": state}

        def t_of(n):
            fn = make(n)
            st["v"] = fn(st["v"], batch, rng)
            _ = float(st["v"].step)  # warm + force
            ts = []
            for _i in range(opt.repeats):
                t0 = time.perf_counter()
                st["v"] = fn(st["v"], batch, rng)
                _ = float(st["v"].step)
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (t_of(opt.hi) - t_of(opt.lo)) / (opt.hi - opt.lo)

    rows = {}
    rows["encode"] = timed_scalar_chain(encode_body)
    rows["loss_fwd"] = timed_scalar_chain(loss_body)
    rows["grads"] = timed_scalar_chain(grads_body)
    rows["full"] = timed_full_chain()

    out = {
        "batch": b, "size": s, "attn": opt.attn,
        **{k_: round(v * 1e3, 2) for k_, v in rows.items()},
        "unet_fwd_ms": round((rows["loss_fwd"] - rows["encode"]) * 1e3, 2),
        "bwd_ms": round((rows["grads"] - rows["loss_fwd"]) * 1e3, 2),
        "optimizer_ms": round((rows["full"] - rows["grads"]) * 1e3, 2),
        "steps_per_s": round(1.0 / rows["full"], 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
