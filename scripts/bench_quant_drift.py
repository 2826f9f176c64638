"""Pipeline-level int8-vs-fp accuracy bound at production geometry.

Layer-level w8a8 relative error is tested in tests/test_quant.py (<2%);
this measures what actually matters for serving: the COMPOUNDED drift of
a full fixed-seed 50-step CFG edit at v1 geometry (512^2, bf16 UNet) —
int8 vs fp from identical inputs/x_T, reported in latent space (the
sampled x0, before the VAE decode) and in pixel space ([0,1] output).
Weights are random (no pretrained weights exist in this environment), so
this bounds numerical drift, not perceptual quality — the weights-arrival
runbook A/Bs FID/CLIP when real weights land.

    python scripts/bench_quant_drift.py                    # real chip, v1
    JAX_PLATFORMS=cpu python scripts/bench_quant_drift.py \
        --H 64 --W 64 --steps 2 --unet_channels 128        # CPU smoke

Prints one JSON line per space (latent, pixel) with rel-l2 / max-abs /
mean-abs.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", default="plms")
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--unet_channels", type=int, default=0,
                   help="override UNet model_channels (CPU smoke runs)")
    p.add_argument("--attn", default="pallas")
    p.add_argument("--variant", choices=["int8", "int8-static"],
                   default="int8",
                   help="int8-static: calibrated constant scales "
                        "(EditPipeline.calibrate_int8) instead of per-row "
                        "runtime amax")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExampleConfig
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
    # random-init alone leaves the zero-init eps head at eps==0 — every
    # trajectory identical regardless of quantization (the round-4 vacuous
    # result). Perturb the zero leaves and PROVE eps is nontrivial first.
    variables = randomize_zero_params(init_variables(model, seed=0), seed=1)
    eps_rms = eps_rms_probe(model, variables, opt.H, opt.W)
    assert eps_rms > 1e-3, (
        f"eps RMS {eps_rms:.2e}: the UNet is still computing ~0 — the "
        f"drift measurement would be vacuous")
    print(f"eps_rms_probe = {eps_rms:.4f}", file=sys.stderr)
    fp = EditPipeline(model, variables)

    g = np.random.default_rng(opt.seed)
    b, H, W = opt.batch, opt.H, opt.W
    image = g.uniform(-1, 1, (b, H, W, 3)).astype(np.float32)
    mask = np.ones((b, H, W, 1), np.float32)
    mask[:, H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 0.0
    r = fp.ref_size
    ref = g.standard_normal((b, r, r, 3)).astype(np.float32)
    f = model.latent_downsample
    x_T = g.standard_normal((b, H // f, W // f, 4)).astype(np.float32)

    scales = None
    if opt.variant == "int8-static":
        scales = EditPipeline(model, variables, quantize="int8") \
            .calibrate_int8(image, mask, ref, seed=opt.seed)
        print(f"calibrated {len(scales)} static op scales", file=sys.stderr)
    q = EditPipeline(model, variables, quantize="int8", quant_scales=scales)

    # det_first_stage=False matches bench_sweep's program variant exactly
    # (the encode noise comes from the shared seed, so the comparison is
    # still fixed-seed deterministic) — pixel-space programs are then
    # compile-cache hits from the sweep runs
    kw = dict(steps=opt.steps, sampler=opt.sampler, scale=opt.scale,
              x_T=x_T, seed=opt.seed)
    rows = []
    for space, output in (("latent", "latent"), ("pixel", "float32")):
        a = np.asarray(fp.edit_batch(image, mask, ref, output=output, **kw),
                       np.float64)
        c = np.asarray(q.edit_batch(image, mask, ref, output=output, **kw),
                       np.float64)
        d = c - a
        row = {
            "space": space, "H": H, "W": W, "steps": opt.steps,
            "sampler": opt.sampler, "scale": opt.scale, "batch": b,
            "rel_l2": round(float(np.linalg.norm(d) /
                                  max(np.linalg.norm(a), 1e-12)), 6),
            "max_abs": round(float(np.abs(d).max()), 6),
            "mean_abs": round(float(np.abs(d).mean()), 6),
            "ref_rms": round(float(np.sqrt(np.mean(a * a))), 6),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    lat, pix = rows
    print(f"\nint8 vs fp drift ({opt.steps}-step {opt.sampler}, {H}x{W}): "
          f"latent rel-l2 {lat['rel_l2']:.4f}, "
          f"pixel mean|d| {pix['mean_abs']:.4f} "
          f"(~{pix['mean_abs'] * 255:.1f}/255)", file=sys.stderr)


if __name__ == "__main__":
    main()
