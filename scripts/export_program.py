"""Freeze one edit configuration into a deployable artifact directory.

Writes <outdir>/edit.stablehlo (the traced program, jax.export) and
<outdir>/params.npz (the parameters, flattened — pickle-free) plus a
manifest. A serving host then needs jax + pbe_tpu/export_runtime.py only:

    from pbe_tpu.export_runtime import load_edit_program_file, load_params_npz
    fn = load_edit_program_file("artifact/edit.stablehlo")
    variables = load_params_npz("artifact/params.npz")
    img01 = fn(variables, image, mask, ref, x_T, scale, jax.random.PRNGKey(s))

No reference counterpart (the reference ships the python model stack to
every host). See DESIGN.md §Online serving / Frozen programs.
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
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--config", type=str, default="")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true", default=True)
    p.add_argument("--ddim", dest="plms", action="store_false")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--scale", type=float, default=5.0,
                   help="only CFG-vs-not is baked in (scale stays a runtime "
                        "argument); scale=1 freezes the no-CFG fast path")
    p.add_argument("--paste_back", type=int, default=None, metavar="FEATHER")
    p.add_argument("--det_first_stage", action="store_true")
    p.add_argument("--precision", choices=["full", "autocast"],
                   default="autocast")
    p.add_argument("--skip_params", action="store_true",
                   help="write only the program (params ship separately)")
    p.add_argument("--quantize", choices=["int8", "int8-static"],
                   default=None,
                   help="freeze the w8a8 program (ops/quant.py); "
                        "int8-static calibrates constant scales on a "
                        "synthetic edit at the export geometry first "
                        "(the PTQ grid ships inside the artifact)")
    p.add_argument("--data_parallel", action="store_true",
                   help="freeze a partitioned program: batch sharded over "
                        "every chip of the slice (requires the same device "
                        "count at load time)")
    opt = p.parse_args()

    import jax.numpy as jnp

    from pbe_tpu.export_runtime import save_edit_program, save_params_npz
    from pbe_tpu.pipelines.export import export_edit_program
    from pbe_tpu.pipelines.loading import load_pipeline

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    config = opt.config or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "v1.yaml")
    qmode = "int8" if opt.quantize else None
    pipeline, _ = load_pipeline(config, opt.ckpt or None, dtype=dtype,
                                quantize=qmode)
    if opt.quantize == "int8-static":
        import numpy as np

        g = np.random.default_rng(0)
        ci = g.uniform(-1, 1, (1, opt.H, opt.W, 3)).astype(np.float32)
        cm = np.ones((1, opt.H, opt.W, 1), np.float32)
        cm[:, opt.H // 4: 3 * opt.H // 4, opt.W // 4: 3 * opt.W // 4] = 0.0
        r = pipeline.ref_size
        cr = g.standard_normal((1, r, r, 3)).astype(np.float32)
        pipeline.quant_scales = pipeline.calibrate_int8(ci, cm, cr)
        print(f"calibrated {len(pipeline.quant_scales)} static int8 op "
              "scales", file=sys.stderr)
    if opt.data_parallel:
        pipeline = pipeline.shard()

    os.makedirs(opt.outdir, exist_ok=True)
    blob = export_edit_program(
        pipeline, batch=opt.batch, height=opt.H, width=opt.W,
        steps=opt.ddim_steps, sampler="plms" if opt.plms else "ddim",
        eta=opt.ddim_eta, cfg=opt.scale != 1.0, paste_back=opt.paste_back,
        det_first_stage=opt.det_first_stage)
    save_edit_program(os.path.join(opt.outdir, "edit.stablehlo"), blob)
    if not opt.skip_params:
        save_params_npz(os.path.join(opt.outdir, "params.npz"),
                        pipeline.variables)
    manifest = {
        "config": config, "ckpt": opt.ckpt or "RANDOM INIT",
        "batch": opt.batch, "H": opt.H, "W": opt.W,
        "steps": opt.ddim_steps,
        "sampler": "plms" if opt.plms else "ddim", "eta": opt.ddim_eta,
        "cfg": opt.scale != 1.0, "paste_back": opt.paste_back,
        "det_first_stage": opt.det_first_stage,
        "dtype": "float32" if opt.precision == "full" else "bfloat16",
        "quantize": opt.quantize,
        "ref_size": pipeline.ref_size,
        "latent_downsample": pipeline.model.latent_downsample,
        "program_bytes": len(blob),
        "signature": "(variables, image, mask, ref, x_T, scale, rng) -> img01",
    }
    with open(os.path.join(opt.outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
