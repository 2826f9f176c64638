"""Test-split evaluation entry (reference: test.py:183-397) — loads a
checkpoint, runs the test loader through the loss (incl. EMA variants when
present) AND full sampling with the in-loop FID trio
(callback_fid.py:146-189 behavior).

    python scripts/test.py --base configs/v1.yaml --ckpt model.ckpt \
        [--logdir logs/test] [--limit N] [--inception_weights w.pt]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="*", default=["configs/v1.yaml"])
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--logdir", type=str, default="logs/test")
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--limit", type=int, default=0, help="cap test batches")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--precision", choices=["full", "autocast"], default="autocast")
    p.add_argument("--inception_weights", type=str, default="")
    p.add_argument("--skip_fid", action="store_true")
    opt, unknown = p.parse_known_args()

    import jax
    import jax.numpy as jnp

    from pbe_tpu import config as config_lib
    from pbe_tpu.evaltools.fid import make_inception_feature_fn
    from pbe_tpu.evaltools.fid_callback import FIDTrioTracker
    from pbe_tpu.pipelines.batch import infer_batch, visualize_batch
    from pbe_tpu.pipelines.inference import EditPipeline
    from pbe_tpu.pipelines.loading import init_variables, overlay_checkpoint
    from pbe_tpu.training.partition import split_params
    from pbe_tpu.training.train_step import make_eval_step

    raw: dict = {}
    for path in opt.base:
        raw = {**raw, **config_lib.load_config(path)}
    config_lib.merge_dotlist(raw, [u for u in unknown if "=" in u])

    from pbe_tpu.ops.attention import default_attn_impl

    model_cfg = config_lib.instantiate_from_config(raw["model"])
    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    model = model_cfg.build(dtype=dtype, attn_impl=default_attn_impl())
    variables = init_variables(model, seed=opt.seed)
    if opt.ckpt:
        variables = overlay_checkpoint(variables, opt.ckpt)

    data = config_lib.instantiate_from_config(raw["data"])
    loader = data.test_dataloader() or data.val_dataloader()
    if loader is None:
        raise SystemExit("config has no test/validation data section")

    eval_step = jax.jit(make_eval_step(model))
    trainable, frozen = split_params(variables["params"])
    pipeline = EditPipeline(model, variables)
    tracker = None
    if not opt.skip_fid:
        tracker = FIDTrioTracker(
            make_inception_feature_fn(opt.inception_weights or None)
        )

    os.makedirs(opt.logdir, exist_ok=True)
    agg: dict[str, list[float]] = {}
    rng = jax.random.PRNGKey(opt.seed)
    for i, batch in enumerate(loader):
        if opt.limit and i >= opt.limit:
            break
        rng = jax.random.fold_in(rng, i)
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        metrics = eval_step(trainable, frozen, arrays, rng)
        for k, v in metrics.items():
            agg.setdefault(f"test/{k}", []).append(float(v))
        preds = infer_batch(
            pipeline, arrays, steps=opt.ddim_steps, scale=opt.scale,
            sampler="plms" if opt.plms else "ddim", seed=opt.seed,
        )
        visualize_batch(batch, preds, os.path.join(opt.logdir, "images"),
                        ids=batch.get("id"))
        if tracker is not None:
            tracker.update(arrays, preds)
        print(f"batch {i}: " + " ".join(
            f"{k.split('/')[-1]}={float(v):.4f}" for k, v in metrics.items()))

    results = {k: float(np.mean(v)) for k, v in agg.items()}
    if tracker is not None and tracker.stats["global"][0].n > 1:
        results.update({f"test/{k}": v for k, v in tracker.compute().items()})
    with open(os.path.join(opt.logdir, "test_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
