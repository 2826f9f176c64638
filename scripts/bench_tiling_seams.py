"""1024² tiling seam-quality verdict: is the 2.2× non-overlap speedup safe?

PERF.md §6 measured the SPEED of the three 1024² UNet modes (untiled
7.0 s / overlapped 8.4 s / non-overlapping 3.2 s projected) but not what
the tilings do to the IMAGE. This bench runs the full fixed-seed 50-step
edit at v1 geometry (128² latent) through EditPipeline in all three
modes (tiling= None / ks 64 stride 32 / ks 64 stride 64 — reference
split_input_params semantics, latent_diffusion.py:656-736) and reports:

  * deviation vs the exact un-tiled edit: rel-l2 in latent space (the
    sampled x0) and pixel space;
  * a seam metric: mean pixel-gradient magnitude ON the tile-border
    rows/columns vs the image-wide background gradient, for each arm AND
    for the exact edit at the same locations (the control). The excess
    of an arm's seam ratio over the exact arm's is the stitching
    artifact — visible banding shows up as ratios well above control.

Weights are random (none exist in this environment), so this bounds
structural seam artifacts, not perceptual quality — but a tiling that
bands on random weights will band on trained ones (the discontinuity is
a property of the stitch, not the checkpoint).

Usage:
    python scripts/bench_tiling_seams.py [--steps 50] [--size 1024]
    JAX_PLATFORMS=cpu python scripts/bench_tiling_seams.py \
        --size 256 --steps 2 --unet_channels 32      # mechanics smoke

One JSON line per arm.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seam_stats(img, borders_px, exclude=4):
    """Mean gradient magnitude on the seam lines vs everywhere else.

    img (H, W, 3) float; borders_px: pixel rows/cols where latent tile
    edges land. Gradients are central one-pixel differences; the
    background mean excludes a +-exclude px band around every seam so
    bleed doesn't contaminate the control."""
    import numpy as np

    gx = np.abs(np.diff(img, axis=1)).mean(axis=-1)  # (H, W-1) vertical seams
    gy = np.abs(np.diff(img, axis=0)).mean(axis=-1)  # (H-1, W) horizontal
    h, w = img.shape[:2]
    seam_vals = []
    bg_mask_x = np.ones(w - 1, bool)
    bg_mask_y = np.ones(h - 1, bool)
    for b in borders_px:
        # the seam between pixel b-1 and b is gradient column b-1
        seam_vals.append(gx[:, b - 1].mean())
        seam_vals.append(gy[b - 1, :].mean())
        bg_mask_x[max(0, b - 1 - exclude): b - 1 + exclude + 1] = False
        bg_mask_y[max(0, b - 1 - exclude): b - 1 + exclude + 1] = False
    seam = float(np.mean(seam_vals))
    bg = float((gx[:, bg_mask_x].mean() + gy[bg_mask_y, :].mean()) / 2.0)
    return seam, bg


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=17)
    p.add_argument("--unet_channels", type=int, default=0,
                   help="override UNet model_channels (CPU smoke runs)")
    p.add_argument("--ks", type=int, default=64, help="latent tile kernel")
    p.add_argument("--attn", default="pallas")
    p.add_argument("--save_dir", default="",
                   help="optionally dump the three edits as PNGs")
    opt = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExampleConfig
    from pbe_tpu.ops.tiling import TilingSpec
    from pbe_tpu.pipelines.inference import EditPipeline
    from pbe_tpu.pipelines.loading import (
        eps_rms_probe,
        init_variables,
        randomize_zero_params,
    )

    cfg = PaintByExampleConfig()
    if opt.unet_channels:
        from pbe_tpu.models.unet import UNetConfig
        cfg.unet_config = UNetConfig(model_channels=opt.unet_channels)
    model = cfg.build(dtype=jnp.bfloat16, attn_impl=opt.attn)
    # random-init alone leaves the zero-init eps head at eps==0, making all
    # three arms trivially identical (the round-4 vacuous result); perturb
    # the zero leaves and prove eps is nontrivial before measuring
    variables = randomize_zero_params(init_variables(model, seed=0), seed=1)
    eps_rms = eps_rms_probe(model, variables, opt.size, opt.size)
    assert eps_rms > 1e-3, (
        f"eps RMS {eps_rms:.2e}: the UNet is still computing ~0 — the "
        f"seam measurement would be vacuous")
    print(f"eps_rms_probe = {eps_rms:.4f}", file=sys.stderr)

    # synthetic scene with real spatial structure (smooth gradients +
    # disks) so a stitch discontinuity is measurable against a quiet
    # background, unlike iid-noise inputs
    H = W = opt.size
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([
        np.sin(xx / W * 3.1) * np.cos(yy / H * 2.2),
        np.sin((xx + yy) / (H + W) * 4.0),
        np.cos(xx / W * 1.7) * np.sin(yy / H * 3.4),
    ], axis=-1)
    for cy, cx, r, amp in ((0.3, 0.62, 0.11, 0.8), (0.7, 0.25, 0.16, -0.6)):
        d2 = ((yy / H - cy) ** 2 + (xx / W - cx) ** 2)
        img += amp * np.exp(-d2 / (2 * r * r))[..., None]
    image = np.clip(img, -1, 1)[None]
    mask = np.ones((1, H, W, 1), np.float32)
    mask[:, H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 0.0
    g = np.random.default_rng(opt.seed)
    try:
        r = model.cond_config.clip.image_size
    except AttributeError:
        r = 224
    ref = g.standard_normal((1, r, r, 3)).astype(np.float32)
    f = model.latent_downsample
    x_T = g.standard_normal((1, H // f, W // f, 4)).astype(np.float32)

    lat = H // f
    ks = opt.ks
    arms = [
        ("exact", None),
        ("overlap_s%d" % (ks // 2), TilingSpec(ks=(ks, ks),
                                               stride=(ks // 2, ks // 2))),
        ("nonoverlap_s%d" % ks, TilingSpec(ks=(ks, ks), stride=(ks, ks))),
    ]
    kw = dict(steps=opt.steps, scale=opt.scale, seed=opt.seed, x_T=x_T,
              det_first_stage=True)

    outs = {}
    for name, spec in arms:
        pipe = EditPipeline(model, variables, tiling=spec)
        outs[name] = {
            "latent": np.asarray(
                pipe.edit_batch(image, mask, ref, output="latent", **kw),
                np.float64),
            "pixel": np.asarray(
                pipe.edit_batch(image, mask, ref, output="float32", **kw),
                np.float64),
        }
        if opt.save_dir:
            os.makedirs(opt.save_dir, exist_ok=True)
            from pbe_tpu.data import transforms as T
            T.save_image(outs[name]["pixel"][0].astype(np.float32),
                         os.path.join(opt.save_dir, f"{name}.png"))

    # interior tile borders in latent space -> pixel space. The SEAMS of a
    # stitch land on stride multiples (non-overlap) / the half-overlap
    # handoff lines; measure every interior stride multiple for both.
    exact = outs["exact"]
    for name, spec in arms:
        o = outs[name]
        stride = spec.stride[0] if spec else ks
        borders_lat = list(range(stride, lat, stride))
        borders_px = [b * f for b in borders_lat]
        seam, bg = seam_stats(o["pixel"][0], borders_px)
        row = {
            "arm": name, "size": H, "steps": opt.steps, "ks": ks,
            "stride": stride if spec else None,
            "latent_rel_l2": round(float(
                np.linalg.norm(o["latent"] - exact["latent"]) /
                max(np.linalg.norm(exact["latent"]), 1e-12)), 6),
            "pixel_rel_l2": round(float(
                np.linalg.norm(o["pixel"] - exact["pixel"]) /
                max(np.linalg.norm(exact["pixel"]), 1e-12)), 6),
            "pixel_mean_abs": round(float(
                np.abs(o["pixel"] - exact["pixel"]).mean()), 6),
            "seam_grad": round(seam, 6),
            "bg_grad": round(bg, 6),
            "seam_ratio": round(seam / max(bg, 1e-12), 3),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
