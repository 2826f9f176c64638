"""Single-edit CLI — flag-compatible with the reference scripts/inference.py
(:128-266): given --image_path, --mask_path, --reference_path, repaint the
masked region to depict the exemplar, saving results/, grid/, source/ PNGs in
the reference's output layout (:282-399).

Differences by design:
  * runs the whole edit as ONE compiled XLA program on TPU (bf16 by default);
    --precision full switches to fp32
  * the invisible 'Paint-by-Example' watermark is reimplemented in
    numpy (pbe_tpu/utils/watermark.py) and stamped on every result as the
    reference does (:25-27, 377-384); --no_watermark disables it
  * the safety checker (reference :28-30, :97-100) is reimplemented
    TPU-native (pbe_tpu/models/safety.py) and runs when the user supplies
    the CompVis safety-checker weights via --safety_ckpt (zero-egress:
    nothing auto-downloads). Matching the reference — which discards the
    checker's verdict at :351 — it is report-only unless --enforce_safety
  * --n_iter actually loops the sampler n_iter times with an advancing RNG
    (the reference snapshot defines the flag at :170 but never reads it),
    and each sample beyond the first gets an indexed filename instead of
    silently overwriting {stem}_{seed}.png. The first sample keeps the
    reference's exact naming (:384) so downstream eval scripts still match.
  * --n_imgs is accepted for flag parity but unused, exactly as in the
    reference snapshot (:188; it belonged to a dataset-loop variant)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", type=str, nargs="?", default="outputs/txt2img-samples",
                   help="dir to write results to")
    p.add_argument("--skip_grid", action="store_true",
                   help="do not save a grid, only individual samples")
    p.add_argument("--no_watermark", action="store_true",
                   help="skip the invisible 'Paint-by-Example' DWT-DCT "
                        "watermark the reference embeds in every result")
    p.add_argument("--skip_save", action="store_true",
                   help="do not save individual samples (speed measurements)")
    p.add_argument("--ddim_steps", type=int, default=50,
                   help="number of ddim sampling steps")
    p.add_argument("--plms", action="store_true", help="use plms sampling")
    p.add_argument("--fixed_code", action="store_true",
                   help="use the same starting code across samples")
    p.add_argument("--ddim_eta", type=float, default=0.0,
                   help="ddim eta (0.0 = deterministic sampling)")
    p.add_argument("--n_iter", type=int, default=2, help="sample this often")
    p.add_argument("--H", type=int, default=512, help="image height, pixels")
    p.add_argument("--W", type=int, default=512, help="image width, pixels")
    p.add_argument("--n_imgs", type=int, default=100)
    p.add_argument("--C", type=int, default=4, help="latent channels")
    p.add_argument("--f", type=int, default=8, help="downsampling factor")
    p.add_argument("--n_samples", type=int, default=1,
                   help="samples per reference image (batch size)")
    p.add_argument("--n_rows", type=int, default=0,
                   help="rows in the grid (default: n_samples)")
    p.add_argument("--scale", type=float, default=1,
                   help="CFG scale: eps = eps(uc) + scale * (eps(c) - eps(uc))")
    p.add_argument("--config", type=str, default="",
                   help="path to config which constructs model")
    p.add_argument("--ckpt", type=str, default="",
                   help="path to checkpoint of model (torch .ckpt, auto-converted)")
    p.add_argument("--seed", type=int, default=42,
                   help="the seed (for reproducible sampling)")
    p.add_argument("--precision", type=str, choices=["full", "autocast"],
                   default="autocast", help="fp32 or bf16 inference")
    p.add_argument("--image_path", type=str, default="")
    p.add_argument("--mask_path", type=str, default="")
    p.add_argument("--reference_path", type=str, default="")
    # TPU-rebuild extension (no reference counterpart): detail-preserving
    # composite — keep original pixels bit-exact outside the mask with an
    # N-pixel feathered seam (models/vae_asym.paste_back). Off by default
    # for output parity with the reference's full decode.
    p.add_argument("--paste_back", type=int, default=None, metavar="FEATHER",
                   help="composite original pixels outside the mask "
                        "(feather radius in px; omit for reference parity)")
    p.add_argument("--det_first_stage", action="store_true",
                   help="encode the masked source with the VAE posterior "
                        "MODE instead of sampling (batch-size-invariant, "
                        "reproducible edits; reference samples)")
    p.add_argument("--safety_ckpt", type=str,
                   default=os.environ.get("PBE_SAFETY_CKPT", ""),
                   help="path to the CompVis stable-diffusion-safety-checker "
                        "weights (torch .bin/.ckpt or .safetensors); when "
                        "set, every result is screened (reference "
                        "scripts/inference.py:28-30,97-100)")
    p.add_argument("--quantize", choices=["int8", "int8-static"],
                   default=None,
                   help="w8a8 int8 UNet execution (ops/quant.py) — opt-in; "
                        "output differs from fp by the PTQ rounding error "
                        "(bench_quant_drift.py bounds it). int8-static "
                        "calibrates constant scales on THIS edit's inputs "
                        "first (no runtime amax in the program)")
    p.add_argument("--tile_ks", type=int, default=0,
                   help="latent tile size: run the UNet over ks-side latent "
                        "crops stitched with border weighting (reference "
                        "split_input_params, latent_diffusion.py:656-736). "
                        "0 = exact un-tiled math (default — faster AND "
                        "exact at every size we measured, PERF.md §6)")
    p.add_argument("--tile_stride", type=int, default=0,
                   help="latent tile stride (default ks/2 when --tile_ks "
                        "is set; stride == ks is the non-overlapping FLOP "
                        "floor, with seams quantified in PERF.md §6)")
    p.add_argument("--enforce_safety", action="store_true",
                   help="black out flagged frames; default is report-only, "
                        "matching the reference (it discards the checker's "
                        "verdict at scripts/inference.py:351)")
    return p


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    opt = get_parser().parse_args()

    import jax
    import jax.numpy as jnp

    from pbe_tpu.data import transforms as T
    from pbe_tpu.pipelines.loading import load_pipeline

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    # the reference's --config also defaults to "" (and test.sh passes it
    # explicitly); fall back to the in-repo v1.yaml instead of crashing
    config = opt.config or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "v1.yaml",
    )
    tiling = None
    if opt.tile_ks:
        from pbe_tpu.ops.tiling import TilingSpec
        stride = opt.tile_stride or max(opt.tile_ks // 2, 1)
        tiling = TilingSpec(ks=(opt.tile_ks, opt.tile_ks),
                            stride=(stride, stride))
    elif opt.tile_stride:
        raise SystemExit(
            "--tile_stride has no effect without --tile_ks (tiling stays "
            "off and the stride would be silently ignored); pass --tile_ks "
            "to enable tiled inference")
    qmode = "int8" if opt.quantize else None
    pipeline, _ = load_pipeline(config, opt.ckpt or None, dtype=dtype,
                                quantize=qmode, tiling=tiling)

    safety = None
    if opt.safety_ckpt:
        from pbe_tpu.models.safety import load_safety_checker

        safety = load_safety_checker(opt.safety_ckpt)

    os.makedirs(opt.outdir, exist_ok=True)
    sample_path = os.path.join(opt.outdir, "source")
    result_path = os.path.join(opt.outdir, "results")
    grid_path = os.path.join(opt.outdir, "grid")
    for d in (sample_path, result_path, grid_path):
        os.makedirs(d, exist_ok=True)

    filename = os.path.basename(opt.image_path)
    stem = filename[:-4]
    size = (opt.H, opt.W)
    image = T.load_image(opt.image_path, size)
    mask = T.load_mask(opt.mask_path, size)
    ref = T.load_reference(opt.reference_path)

    b = opt.n_samples
    images = np.repeat(image[None], b, 0)
    masks = np.repeat(mask[None], b, 0)
    refs = np.repeat(ref[None], b, 0)

    x_T = None
    if opt.fixed_code:
        x_T = np.asarray(
            jax.random.normal(
                jax.random.PRNGKey(opt.seed), (b, opt.H // opt.f, opt.W // opt.f, opt.C)
            )
        )

    if opt.quantize == "int8-static":
        # calibrate constant PTQ scales on this edit's own inputs — the
        # serving programs then carry no runtime amax (PERF.md §8)
        pipeline.quant_scales = pipeline.calibrate_int8(
            images[:1], masks[:1], refs[:1], seed=opt.seed)
        print(f"calibrated {len(pipeline.quant_scales)} static int8 "
              "op scales on the edit inputs")

    inpaint = T.unnormalize(images * masks)
    src01 = T.unnormalize(images)
    ref01 = np.clip(T.unnormalize_clip(refs), 0, 1)

    times = []
    for it in range(max(opt.n_iter, 1)):
        t0 = time.time()
        out = pipeline.edit_batch(
            images, masks, refs,
            steps=opt.ddim_steps,
            scale=opt.scale,
            sampler="plms" if opt.plms else "ddim",
            eta=opt.ddim_eta,
            seed=opt.seed + it,  # RNG advances across iterations
            x_T=x_T,  # --fixed_code pins the start noise across iterations
            paste_back=opt.paste_back,
            det_first_stage=opt.det_first_stage,
        )
        times.append(time.time() - t0)

        if safety is not None:
            # reference: check_safety on the decoded batch (:350); verdict
            # applied only under --enforce_safety (the reference discards
            # it at :351)
            out, has_nsfw = safety.check(
                np.asarray(out), enforce=opt.enforce_safety)
            for i, flag in enumerate(has_nsfw):
                if flag:
                    action = "blacked out" if opt.enforce_safety else \
                        "report-only, kept (reference semantics)"
                    print(f"safety: sample {it * b + i} flagged NSFW — {action}")

        if opt.skip_save:
            continue
        for i in range(b):
            k = it * b + i  # global sample index
            base = f"{stem}_{opt.seed}" + (f"_{k}" if k else "")
            result = out[i]
            if not opt.no_watermark:
                # the reference stamps every result with the invisible
                # "Paint-by-Example" watermark (scripts/inference.py:25-27,
                # 377-384); numpy DWT-DCT reimplementation
                from pbe_tpu.utils.watermark import embed_watermark

                u8 = np.clip(np.rint(result * 255.0), 0, 255).astype(np.uint8)
                result = embed_watermark(u8).astype(np.float32) / 255.0
            T.save_image(result, os.path.join(result_path, f"{base}.png"))
            if not opt.skip_grid:
                grid = T.hstack_grid([src01[i], inpaint[i], ref01[i], out[i]])
                T.save_image(grid, os.path.join(grid_path, f"grid-{base}.png"))
            if k == 0:
                # the inputs don't vary across samples; write them once
                T.save_image(
                    np.repeat(1.0 - masks[i], 3, axis=-1),
                    os.path.join(sample_path, f"{base}_mask.png"),
                )
                T.save_image(src01[i], os.path.join(sample_path, f"{base}_GT.png"))
                T.save_image(
                    inpaint[i], os.path.join(sample_path, f"{base}_inpaint.png")
                )
                T.save_image(ref01[i], os.path.join(sample_path, f"{base}_ref.png"))

    steady = times[1:] or times
    print(
        f"first call (incl. compile): {times[0]:.2f}s; steady-state edit: "
        f"{np.mean(steady):.2f}s for batch {b} "
        f"({np.mean(steady) / b:.3f}s/edit, {len(times)} iterations)"
    )

    print(f"Your samples are ready and waiting for you here: \n{opt.outdir}")


if __name__ == "__main__":
    main()
