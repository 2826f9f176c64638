"""Headline benchmark: 512^2 exemplar-guided edits/sec/chip at 50-step PLMS.

Runs the full edit program (VAE encode + CLIP encode + 50-step CFG PLMS scan
+ VAE decode) on one chip in bf16 with the production v1 geometry (randomly
initialized weights — identical FLOPs/memory to trained ones).

Prints ONE JSON line:
  {"metric": ..., "value": edits/sec/chip, "unit": "edits/s",
   "vs_baseline": baseline_latency(1.5s) / measured_latency}
vs_baseline > 1 beats the BASELINE.md target of <1.5 s / 50-step edit.
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_LATENCY_S = 1.5  # BASELINE.md: 50-step 512^2 edit p50 target on v5e
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))  # 1024 = the stretch config
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
SAMPLER = os.environ.get("BENCH_SAMPLER", "plms")
ATTN = os.environ.get("BENCH_ATTN", "pallas")  # 'pallas' | 'xla'
SCALE = float(os.environ.get("BENCH_SCALE", "5.0"))  # 1.0 = no-CFG fast path
# '1': cast >=2-d params (conv/dense kernels) to bf16, halving the ~3.4 GB of
# parameter HBM traffic per UNet call; 1-d norm affines stay fp32 (islands)
BF16_PARAMS = os.environ.get("BENCH_BF16_PARAMS", "0") == "1"

# bf16 dense peak by device kind (public spec sheets); env overrides, and
# unknown kinds fall back to the v5e figure this repo's MFU history uses.
_PEAK_BY_KIND = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0, "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0, "TPU v6e": 918.0,
}


def _device_peak_tflops() -> float:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:
        return 197.0
    for prefix, peak in _PEAK_BY_KIND.items():
        if kind.startswith(prefix):
            return peak
    return 197.0


_FLOPS_PROBE = r"""
import json, sys
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from pbe_tpu.models.pbe import PaintByExampleConfig, PaintByExample

batch, size, steps, sampler, cfg = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5] == "1",
)
model = PaintByExampleConfig().build(dtype=jnp.bfloat16)
bf = jnp.bfloat16
var_shapes = jax.eval_shape(
    lambda k, im, mk, rf: model.init(
        k, im, mk, rf, jax.random.PRNGKey(1), method=PaintByExample.initialize_all
    ),
    jax.random.PRNGKey(0),
    jax.ShapeDtypeStruct((1, size, size, 3), bf),
    jax.ShapeDtypeStruct((1, size, size, 1), bf),
    jax.ShapeDtypeStruct((1, 224, 224, 3), bf),
)

def flops_of(fn, *args):
    ca = jax.jit(fn).lower(var_shapes, *args).cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])

lat = size // model.latent_downsample
eb = 2 * batch if cfg else batch  # CFG doubles the UNet batch
unet = flops_of(
    lambda v, x, t, c: model.apply(v, x, t, c, method=PaintByExample.apply_model),
    jax.ShapeDtypeStruct((eb, lat, lat, 9), bf),
    jax.ShapeDtypeStruct((eb,), jnp.float32),
    jax.ShapeDtypeStruct((eb, 1, 768), bf),
)
enc = flops_of(
    lambda v, x, k: model.apply(v, x, k, method=PaintByExample.encode_first_stage),
    jax.ShapeDtypeStruct((batch, size, size, 3), bf), jax.random.PRNGKey(0),
)
dec = flops_of(
    lambda v, z: model.apply(v, z, method=PaintByExample.decode_first_stage),
    jax.ShapeDtypeStruct((batch, lat, lat, 4), bf),
)
clip = flops_of(
    lambda v, r: model.apply(v, r, method=PaintByExample.get_conditioning),
    jax.ShapeDtypeStruct((batch, 224, 224, 3), bf),
)
# model calls per edit: PLMS peels a Heun double-call on step 0 (steps+1);
# DDIM is one call per step; ancestral DDPM walks the full chain
n_calls = {"plms": steps + 1, "ddim": steps, "ddpm": model.timesteps}[sampler]
print(json.dumps({
    "total_flops": unet * n_calls + enc + dec + clip,
    "unet_call_tflops": unet / 1e12,
    "n_unet_calls": n_calls,
}))
"""


def _true_flops() -> dict | None:
    """Per-program FLOPs with the sampler loop unrolled by hand.

    The compiled program's cost_analysis() counts a lax.scan body ONCE, not
    x trip count, so it under-reports a 50-step sampler ~8x. Instead this
    lowers each pipeline stage abstractly on the CPU backend (a subprocess,
    because this process's jax is already bound to the TPU) and sums
    unoptimized-HLO FLOPs x call counts — the honest MFU numerator.
    """
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c", _FLOPS_PROBE, str(BATCH), str(SIZE),
             str(STEPS), SAMPLER, "1" if SCALE != 1.0 else "0"],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # When the axon tunnel is down, backend init blocks forever with no
    # error (observed: multi-hour outage, r3). Emit a diagnosable record
    # instead of hanging the driver. Only backend init is under the
    # watchdog — the (legitimately long) first compile is not.
    import threading

    init_done = threading.Event()
    init_budget = float(os.environ.get("PBE_BENCH_INIT_TIMEOUT_S", "600"))

    def _watchdog() -> None:
        if not init_done.wait(timeout=init_budget):
            print(json.dumps({
                "metric": f"{SIZE}^2 edits/sec/chip ({STEPS}-step "
                          f"{SAMPLER.upper()}, bf16, batch {BATCH})",
                "value": 0.0,
                "unit": "edits/s",
                "vs_baseline": 0.0,
                "error": f"TPU backend init exceeded {init_budget:.0f}s "
                         "(tunnel down?)",
            }))
            sys.stdout.flush()
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    jax.devices()  # force backend init under the watchdog
    init_done.set()

    import jax.numpy as jnp
    import numpy as np

    from pbe_tpu.models.pbe import PaintByExampleConfig
    from pbe_tpu.pipelines.inference import EditPipeline
    from pbe_tpu.pipelines.loading import init_variables

    model = PaintByExampleConfig().build(dtype=jnp.bfloat16, attn_impl=ATTN)
    with contextlib.redirect_stdout(io.StringIO()):
        variables = init_variables(model, seed=0)
        if BF16_PARAMS:
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x,
                variables,
            )
        pipeline = EditPipeline(model, variables)

        # inputs created on device: measures chip latency, not the dev
        # tunnel's host<->device image transfer (production hosts have
        # local PCIe); completion forced via a 4-byte scalar readback
        k = jax.random.PRNGKey(0)
        dt = jnp.bfloat16
        s, q = SIZE, SIZE // 4
        image = jax.random.uniform(k, (BATCH, s, s, 3), dt, -1, 1)
        mask = jnp.ones((BATCH, s, s, 1), dt)
        mask = mask.at[:, q: 3 * q, q: 3 * q, :].set(0.0)
        ref = jax.random.normal(k, (BATCH, 224, 224, 3), dt)
        x_T = jax.random.normal(k, (BATCH, s // 8, s // 8, 4), dt)
        rng = jax.random.PRNGKey(321)
        scale = jnp.asarray(SCALE, jnp.float32)
        fn = pipeline._fn(STEPS, SAMPLER, 0.0, SCALE != 1.0)
        args = (pipeline.variables, image, mask, ref, x_T, scale, rng)
        fn = fn.lower(*args).compile()
        out = fn(*args)  # warm
        _ = float(jnp.mean(out))
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.mean(out))
            times.append(time.perf_counter() - t0)
        assert np.isfinite(np.asarray(out)).all()

    p50 = float(np.median(times))
    latency_per_edit = p50 / BATCH
    baseline = BASELINE_LATENCY_S * (STEPS / 50)  # target scales with steps
    flops = _true_flops()
    record = {
        "metric": f"{SIZE}^2 edits/sec/chip ({STEPS}-step {SAMPLER.upper()}, "
                  f"bf16, batch {BATCH})",
        "value": round(BATCH / p50, 4),
        "unit": "edits/s",
        "vs_baseline": round(baseline / latency_per_edit, 4),
        "p50_latency_s": round(latency_per_edit, 4),
    }
    if flops:
        peak = _device_peak_tflops()
        record["mfu"] = round(flops["total_flops"] / (p50 * peak * 1e12), 4)
        record["program_tflops"] = round(flops["total_flops"] / 1e12, 2)
        record["unet_call_tflops"] = round(flops["unet_call_tflops"], 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
