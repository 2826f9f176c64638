"""Training entry point — CLI surface modeled on the reference main.py
(:35-60 flags; OmegaConf-style dotlist overrides after ``--``):

    python scripts/train.py --base configs/v1.yaml --train \
        [--seed N] [--scale_lr] [--resume] [--logdir DIR] \
        [--max_steps N] [model.params.timesteps=500 ...]

Improvements over the reference: --resume actually restores (main.py:197
asserted it away), and distribution is the pjit data mesh instead of
DeepSpeed.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="*", default=["configs/v1.yaml"],
                   help="base config yaml(s), merged left-to-right")
    p.add_argument("--train", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale base LR by n_devices * batch_size (main.py:366-368)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --logdir")
    p.add_argument("--logdir", type=str, default="logs/pbe")
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--max_epochs", type=int, default=40)
    p.add_argument("--ckpt", type=str, default="",
                   help="torch .ckpt to initialize from (SD-v1-4 9ch surgery "
                        "output or a trained PBE checkpoint)")
    p.add_argument("--train_from_scratch", action="store_true",
                   help="drop the diffusion-model ('model.*') keys from "
                        "--ckpt so the UNet trains from random init; only "
                        "the frozen VAE/CLIP load (main.py:244-248)")
    p.add_argument("--sample_images", action="store_true",
                   help="sample 6-panel image grids at every validation "
                        "(latent_diffusion.py:1020-1123 via main.py:287-295)")
    p.add_argument("--fid_every", type=int, default=0,
                   help="stream val/fid_{global,local,ref} every N steps "
                        "(rides the validation cadence; 0 = off; "
                        "callback_fid.py:146-189)")
    p.add_argument("--fid_batches", type=int, default=2)
    p.add_argument("--sample_steps", type=int, default=50,
                   help="sampler steps for validation-time image grids")
    p.add_argument("--inception_ckpt", type=str, default="",
                   help="torchvision InceptionV3 weights for the FID "
                        "feature fn (random features if empty — fine for "
                        "trend-tracking, not comparable to paper FID)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--bf16_moments", action="store_true",
                   help="keep Adam first moments in bf16 (fits single-chip "
                        "512^2 training of the ~1B-trainable-param model)")
    p.add_argument("--precision", choices=["full", "autocast"], default="autocast")
    p.add_argument("--val_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=50)
    return p


def main() -> None:
    # multi-host: must run before the backend initializes (env-gated —
    # PBE_COORDINATOR/PBE_NUM_PROCESSES/PBE_PROCESS_ID, or PBE_MULTIHOST=1
    # for Cloud TPU pod auto-discovery). Replaces the reference's per-rank
    # NCCL spawn (main.py:224,311-327).
    from pbe_tpu.parallel import maybe_initialize
    multiproc = maybe_initialize()

    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    opt, unknown = get_parser().parse_known_args()

    import jax
    import jax.numpy as jnp

    from pbe_tpu import config as config_lib
    from pbe_tpu.pipelines.loading import init_variables, overlay_checkpoint
    from pbe_tpu.training.trainer import Trainer

    raw: dict = {}
    for path in opt.base:
        cfg = config_lib.load_config(path)
        raw = {**raw, **cfg}
    overrides = [u for u in unknown if "=" in u and not u.startswith("-")]
    config_lib.merge_dotlist(raw, overrides)

    from pbe_tpu.ops.attention import default_attn_impl

    model_cfg = config_lib.instantiate_from_config(raw["model"])
    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    # 'pallas' on TPU (incl. the fused flash backward), 'xla' on CPU
    model = model_cfg.build(dtype=dtype, remat=True,
                            attn_impl=default_attn_impl())

    variables = init_variables(model, seed=opt.seed)
    if opt.ckpt:
        variables = overlay_checkpoint(
            variables, opt.ckpt,
            drop_torch_prefixes=("model.",) if opt.train_from_scratch else ())
        if opt.train_from_scratch:
            print("Train from scratch!")  # main.py:248's banner

    data = config_lib.instantiate_from_config(raw["data"])
    train_loader = data.train_dataloader()
    val_loader = data.val_dataloader()

    if multiproc:
        print(f"multi-process: rank {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices; loader batch is "
              "per-process (global batch = n_processes x batch_size)",
              flush=True)

    # base_learning_rate sits beside (not inside) model.params in v1.yaml
    base_lr = raw["model"].get("base_learning_rate",
                               model_cfg.base_learning_rate)
    if opt.scale_lr:
        base_lr = base_lr * len(jax.devices()) * data.batch_size
        print(f"scaled LR: {base_lr:.2e}")

    # LR-multiplier schedule from the YAML (v1: LambdaLinearScheduler with a
    # 10k-step warmup, configs/v1.yaml:21-28); dotlist-overridable
    scheduler = None
    if model_cfg.scheduler_config:
        scheduler = config_lib.instantiate_from_config(model_cfg.scheduler_config)

    trainer = Trainer(
        model, variables, base_lr=base_lr, logdir=opt.logdir,
        use_ema=opt.use_ema, seed=opt.seed,
        mu_dtype=jnp.bfloat16 if opt.bf16_moments else None,
        consume_variables=True,  # single-chip HBM headroom; variables die here
        scheduler=scheduler,
    )
    del variables
    if opt.resume and trainer.restore():
        print(f"resumed from step {int(trainer.state.step)}")

    fid_feature_fn = None
    if opt.fid_every:
        from pbe_tpu.evaltools.fid import make_inception_feature_fn
        fid_feature_fn = make_inception_feature_fn(opt.inception_ckpt or None)

    trainer.fit(
        train_loader, val_loader,
        max_steps=opt.max_steps, max_epochs=opt.max_epochs,
        log_every=opt.log_every, val_every=opt.val_every,
        sample_images=opt.sample_images,
        fid_feature_fn=fid_feature_fn,
        fid_batches=opt.fid_batches,
        fid_every=opt.fid_every or None,
        sample_steps=opt.sample_steps,
    )


if __name__ == "__main__":
    main()
