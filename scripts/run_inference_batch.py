"""Directory/batch inference CLI (reference: r4_run_inference_batch.py,
with its argparse/call-signature bugs fixed — SURVEY.md 0.1).

    python scripts/run_inference_batch.py \
        --fpath_config configs/v1.yaml --fpath_checkpoint model.ckpt \
        --image_dir DIR --mask_dir DIR --reference_dir DIR \
        --outdir out [--use_plms] [--scale 5] [--ddim_steps 50]

mask_dir entries may be mask PNGs or bbox txt files ('x1 y1 x2 y2').
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--fpath_config", default="configs/v1.yaml")
    p.add_argument("--fpath_checkpoint", default="")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--mask_dir", required=True)
    p.add_argument("--reference_dir", required=True)
    p.add_argument("--outdir", default="outputs/batch")
    p.add_argument("--use_plms", action="store_true")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=321)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--precision", choices=["full", "autocast"], default="autocast")
    p.add_argument("--paste_back", type=int, default=None, metavar="FEATHER",
                   help="detail-preserving composite outside the mask "
                        "(feather px; omit for reference parity)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over all local devices (multi-chip "
                        "serving; ragged final batches are padded+trimmed)")
    p.add_argument("--det_first_stage", action="store_true",
                   help="posterior-MODE masked-source latents "
                        "(batch-size-invariant; reference samples)")
    opt = p.parse_args()

    import jax.numpy as jnp

    from pbe_tpu.pipelines.batch import infer_all
    from pbe_tpu.pipelines.loading import load_pipeline

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    pipeline, _ = load_pipeline(opt.fpath_config, opt.fpath_checkpoint or None,
                                dtype=dtype)
    if opt.data_parallel:
        pipeline.shard()
    n = infer_all(
        pipeline, opt.image_dir, opt.mask_dir, opt.reference_dir, opt.outdir,
        size=(opt.H, opt.W), batch_size=opt.batch_size,
        steps=opt.ddim_steps, scale=opt.scale,
        sampler="plms" if opt.use_plms else "ddim", seed=opt.seed,
        paste_back=opt.paste_back, det_first_stage=opt.det_first_stage,
    )
    print(f"wrote {n} edits to {opt.outdir}")


if __name__ == "__main__":
    main()
