"""DDIM vs PLMS step sweep (BASELINE.md config #2): 10/25/50 steps with CFG
batching on one chip, bf16. Prints one JSON line per config plus a summary
table to stderr.

    python scripts/bench_sweep.py [--steps 10 25 50] [--samplers ddim plms]
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
    p.add_argument("--steps", type=int, nargs="*", default=[10, 25, 50])
    p.add_argument("--samplers", nargs="*", default=["ddim", "plms"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--attn", default="pallas")
    p.add_argument("--quantize", choices=["int8", "int8-static"],
                   default=None,
                   help="w8a8 UNet matmuls/convs (ops/quant.py); int8-static"
                        " = calibrated constant scales, no runtime amax")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExampleConfig
    from pbe_tpu.pipelines.inference import EditPipeline
    from pbe_tpu.pipelines.loading import init_variables

    model = PaintByExampleConfig().build(dtype=jnp.bfloat16, attn_impl=opt.attn)
    variables = init_variables(model, seed=0, )
    qmode = "int8" if opt.quantize else None

    k = jax.random.PRNGKey(0)
    b = opt.batch
    image = jax.random.uniform(k, (b, 512, 512, 3), jnp.bfloat16, -1, 1)
    mask = jnp.ones((b, 512, 512, 1), jnp.bfloat16)
    mask = mask.at[:, 128:384, 128:384, :].set(0.0)
    ref = jax.random.normal(k, (b, 224, 224, 3), jnp.bfloat16)
    x_T = jax.random.normal(k, (b, 64, 64, 4), jnp.bfloat16)
    rng = jax.random.PRNGKey(321)
    scale = jnp.asarray(5.0, jnp.float32)

    scales = None
    if opt.quantize == "int8-static":
        # calibrate on the bench input itself (PTQ deployment shape);
        # the serving programs then carry constant quantize/rescale only
        scales = EditPipeline(model, variables, quantize="int8") \
            .calibrate_int8(image, mask, ref, n_t=4)
        print(f"calibrated {len(scales)} static op scales", file=sys.stderr)
    pipeline = EditPipeline(model, variables, quantize=qmode,
                            quant_scales=scales)

    rows = []
    for sampler in opt.samplers:
        for steps in opt.steps:
            fn = pipeline._fn(steps, sampler, 0.0, True)
            args = (pipeline.variables, image, mask, ref, x_T, scale, rng)
            from pbe_tpu.ops import quant
            qkw = {"static": scales} if scales else {}
            with quant.quantized(qmode, **qkw):  # trace happens here
                out = fn(*args)
            _ = float(jnp.mean(out))
            ts = []
            for _i in range(opt.repeats):
                t0 = time.perf_counter()
                # keep the context active so a mid-loop retrace (cache
                # eviction, weak-type drift) can't silently time the fp
                # program under an int8 label — free post-compilation
                with quant.quantized(qmode, **qkw):
                    out = fn(*args)
                _ = float(jnp.mean(out))
                ts.append(time.perf_counter() - t0)
            p50 = float(np.median(ts))
            row = {
                "sampler": sampler, "steps": steps, "batch": b,
                "p50_s": round(p50, 4),
                "edits_per_s": round(b / p50, 4),
            }
            if opt.quantize:
                row["quantize"] = opt.quantize
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\nsampler steps p50(s) edits/s", file=sys.stderr)
    for r in rows:
        print(f"{r['sampler']:>6} {r['steps']:>5} {r['p50_s']:>7.3f} "
              f"{r['edits_per_s']:>7.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
