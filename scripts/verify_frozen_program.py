"""Prove the frozen-program deployment path at production scale.

Exports the full v1-geometry 50-step 512^2 edit program, then runs it in
a MODEL-CODE-FREE subprocess (imports jax + pbe_tpu.export_runtime only
— the deployment-host footprint) against the same inputs, and checks
equivalence with the live pipeline. Records artifact size, export time,
subprocess first-call (compile or cache-load) and warm-call times.

Equality criterion (decided round 5, after round 4 disproved "bitwise"):
the StableHLO serialize->deserialize->recompile round trip does not
guarantee the same XLA fusion choices as the live jit, and different
fusion order changes bf16 rounding; over 50 sampler steps that drift
reached max|diff| 0.0098 (~2.5/255 of the [0,1] output) at v1 geometry.
The deployment criterion is therefore: PASS iff max|diff| <= --tol
(default 0.02 ~= 5/255, i.e. every pixel within ~5 uint8 levels), with
the bitwise flag still reported for the record. Outputs being float01,
we also report the max difference in uint8 levels after rounding.

    python scripts/verify_frozen_program.py --outdir /tmp/frozen_v1 \
        [--H 512 --W 512 --steps 50] [--quantize int8]
    JAX_PLATFORMS=cpu python scripts/verify_frozen_program.py \
        --config configs/tiny.yaml --H 64 --W 64 --steps 2 --outdir /tmp/f

Prints one JSON line with the verdict + timings.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_RUNNER = r"""
import json, os, sys, time
import numpy as np
# deployment-host footprint: jax + the runtime loader ONLY. Guard against
# accidental model-stack imports.
import jax
from pbe_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from pbe_tpu import export_runtime as rt
banned = [m for m in sys.modules
          if m.startswith(("pbe_tpu.models", "pbe_tpu.pipelines", "flax"))]
assert not banned, f"model stack leaked into the serving host: {banned}"

outdir = sys.argv[1]
fn = rt.load_edit_program_file(os.path.join(outdir, "edit.stablehlo"))
# to_device=True (the default) pays the ~GB-scale params H2D exactly once
# here — passing numpy leaves instead re-uploads per call (round-4 bug:
# warm call 176 s vs the live pipeline's ~1 s)
t0 = time.perf_counter()
variables = rt.load_params_npz(os.path.join(outdir, "params.npz"))
jax.block_until_ready(variables)
params_load_s = time.perf_counter() - t0
d = np.load(os.path.join(outdir, "inputs.npz"))
# the frozen dtypes (e.g. bfloat16) come from the program itself — the
# last 6 flat avals are image/mask/ref/x_T/scale/rng
av = fn.in_avals[-6:]
import jax.numpy as jnp
args = (variables,
        jnp.asarray(d["image"], av[0].dtype),
        jnp.asarray(d["mask"], av[1].dtype),
        jnp.asarray(d["ref"], av[2].dtype),
        jnp.asarray(d["x_T"], av[3].dtype),
        np.float32(d["scale"]), jax.random.PRNGKey(int(d["seed"])))
t0 = time.perf_counter()
out = np.asarray(fn(*args))
first_s = time.perf_counter() - t0
t0 = time.perf_counter()
out2 = np.asarray(fn(*args))
warm_s = time.perf_counter() - t0
assert np.array_equal(out, out2), "frozen program is nondeterministic"
np.save(os.path.join(outdir, "frozen_out.npy"), out)
print(json.dumps({"params_load_s": round(params_load_s, 3),
                  "first_call_s": round(first_s, 3),
                  "warm_call_s": round(warm_s, 3)}))
"""


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", required=True)
    p.add_argument("--config", type=str, default="")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=9)
    p.add_argument("--quantize", choices=["int8"], default=None)
    p.add_argument("--tol", type=float, default=0.02,
                   help="max|diff| tolerance in the [0,1] output space "
                        "(~5 uint8 levels); see module docstring for why "
                        "bitwise is not the criterion")
    p.add_argument("--det_first_stage", type=int, default=1,
                   help="0 samples the VAE posterior from the seed instead "
                        "of taking its mode — same program variant as "
                        "bench_sweep, so the LIVE side is a compile-cache "
                        "hit on a host that ran the sweep (both settings "
                        "are fixed-seed deterministic; bitwise comparison "
                        "is unaffected)")
    opt = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.export_runtime import save_edit_program, save_params_npz
    from pbe_tpu.pipelines.export import export_edit_program
    from pbe_tpu.pipelines.loading import load_pipeline

    config = opt.config or os.path.join(ROOT, "configs", "v1.yaml")
    pipeline, _ = load_pipeline(config, opt.ckpt or None,
                                dtype=jnp.bfloat16, quantize=opt.quantize)
    os.makedirs(opt.outdir, exist_ok=True)

    g = np.random.default_rng(opt.seed)
    b, H, W = opt.batch, opt.H, opt.W
    f = pipeline.model.latent_downsample
    r = pipeline.ref_size
    image = g.uniform(-1, 1, (b, H, W, 3)).astype(np.float32)
    mask = np.ones((b, H, W, 1), np.float32)
    mask[:, H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 0.0
    ref = g.standard_normal((b, r, r, 3)).astype(np.float32)
    x_T = g.standard_normal((b, H // f, W // f, 4)).astype(np.float32)
    np.savez(os.path.join(opt.outdir, "inputs.npz"),
             image=image, mask=mask, ref=ref, x_T=x_T,
             scale=opt.scale, seed=opt.seed)

    det = bool(opt.det_first_stage)
    t0 = time.perf_counter()
    blob = export_edit_program(pipeline, batch=b, height=H, width=W,
                               steps=opt.steps, det_first_stage=det)
    export_s = time.perf_counter() - t0
    save_edit_program(os.path.join(opt.outdir, "edit.stablehlo"), blob)
    save_params_npz(os.path.join(opt.outdir, "params.npz"),
                    pipeline.variables)

    # live result (same process, same chip)
    t0 = time.perf_counter()
    want = pipeline.edit_batch(image, mask, ref, steps=opt.steps,
                               scale=opt.scale, seed=opt.seed, x_T=x_T,
                               det_first_stage=det)
    live_first_s = time.perf_counter() - t0
    np.save(os.path.join(opt.outdir, "live_out.npy"), want)

    env = {**os.environ,
           "PYTHONPATH": ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")}
    r2 = subprocess.run([sys.executable, "-c", _RUNNER, opt.outdir],
                        capture_output=True, text=True, timeout=3600,
                        env=env)
    if r2.returncode != 0:
        print(r2.stdout[-3000:], file=sys.stderr)
        print(r2.stderr[-3000:], file=sys.stderr)
        raise SystemExit("model-code-free runner failed")
    timings = json.loads(r2.stdout.strip().splitlines()[-1])
    got = np.load(os.path.join(opt.outdir, "frozen_out.npy"))
    want = np.asarray(want, np.float64)
    bitwise = bool(np.array_equal(got, want))
    diff = np.abs(got.astype(np.float64) - want)
    max_diff = float(diff.max())
    u8_levels = int(np.abs(
        np.rint(got.astype(np.float64) * 255) - np.rint(want * 255)
    ).max())
    ok = bitwise or max_diff <= opt.tol
    row = {
        "H": H, "W": W, "steps": opt.steps, "batch": b,
        "quantize": opt.quantize, "det_first_stage": det,
        "pass": ok, "tol": opt.tol,
        "bitwise_equal_to_live": bitwise,
        "max_abs_diff": round(max_diff, 6),
        "uint8_maxdiff_levels": u8_levels,
        "program_mb": round(len(blob) / 1e6, 2),
        "params_mb": round(os.path.getsize(
            os.path.join(opt.outdir, "params.npz")) / 1e6, 1),
        "export_s": round(export_s, 2),
        "live_first_call_s": round(live_first_s, 3),
        **timings,
    }
    print(json.dumps(row))
    if not ok:
        print(f"max|diff| = {max_diff} > tol {opt.tol}", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
