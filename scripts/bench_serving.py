"""Serving throughput benchmark: concurrent clients against EditServer.

Measures sustained edits/s and batching behavior of the micro-batcher at a
given offered concurrency — the serving counterpart of bench.py's
device-only numbers (bench.py measures the compiled program; this measures
the full dispatch path: queue -> coalesce -> pad -> device -> fan-out).

    JAX_PLATFORMS=cpu python scripts/bench_serving.py \
        --config configs/tiny.yaml --H 64 --W 64 --ddim_steps 2 \
        --n_requests 24 --concurrency 8          # CPU smoke
    python scripts/bench_serving.py --n_requests 64 --concurrency 8 \
        --warmup                                  # real chip, v1 geometry

Prints one JSON line: edits/s, p50/p95 client latency, mean batch
occupancy, batches.
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--quantize", choices=["int8", "int8-static"],
                   default=None,
                   help="w8a8 UNet matmuls/convs (ops/quant.py, opt-in); "
                        "int8-static = calibrated constant scales")
    p.add_argument("--precision", type=str, choices=["full", "autocast"],
                   default="autocast")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--max_wait_ms", type=float, default=50.0)
    p.add_argument("--n_requests", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=8,
                   help="client threads keeping requests in flight")
    p.add_argument("--deadline_s", type=float, default=0.0,
                   help="per-request queueing budget (0 = none): expired "
                        "requests resolve DeadlineExceeded, never reach "
                        "the device")
    p.add_argument("--queue_depth", type=int, default=256,
                   help="admission queue bound; full => ServerOverloaded")
    p.add_argument("--arrival_rate", type=float, default=0.0,
                   help="OPEN-LOOP mode: Poisson arrivals/s submitted "
                        "regardless of completions (set above capacity to "
                        "create true overload — the closed-loop "
                        "--concurrency mode self-throttles and can never "
                        "grow the queue past the thread count). 0 = "
                        "closed-loop mode")
    p.add_argument("--duration_s", type=float, default=60.0,
                   help="open-loop offered-load duration")
    p.add_argument("--warmup", action="store_true",
                   help="precompile every bucket before timing")
    p.add_argument("--data_parallel", action="store_true")
    p.add_argument("--uint8_out", action="store_true",
                   help="on-device uint8 conversion (4x smaller readback)")
    return p


def run_open_loop(opt, server, image, mask, ref) -> None:
    """Open-loop offered load: submit at Poisson rate for duration_s, then
    drain. With a deadline + bounded queue (shaping ON) the server sheds
    load at admission/expiry and completed-request latency stays bounded;
    without (shaping OFF) the queue grows and p95 explodes — the VERDICT
    r4 item 7 comparison, run at the SAME offered load both ways."""
    from pbe_tpu.serving.server import ServerOverloaded

    g = np.random.default_rng(1)
    submitted = 0
    rejected_at_submit = 0
    pending: list[tuple[float, object]] = []
    # Latency must be stamped when the future RESOLVES, not when a drain
    # loop later polls it (the r5 queue-1 runs recorded drain-loop reach
    # time and inflated every latency toward the full offered window).
    done_at: dict[int, float] = {}
    t0 = time.perf_counter()
    t_end = t0 + opt.duration_s
    while time.perf_counter() < t_end:
        try:
            f = server.submit(image, mask, ref, seed=submitted)
            idx = len(pending)
            f.add_done_callback(
                lambda _f, i=idx: done_at.setdefault(i, time.perf_counter()))
            pending.append((time.perf_counter(), f))
        except ServerOverloaded:
            rejected_at_submit += 1
        submitted += 1
        dt = g.exponential(1.0 / opt.arrival_rate)
        # sleep off the remaining inter-arrival gap (submit() is cheap)
        time.sleep(max(0.0, dt))
    offered_wall = time.perf_counter() - t0

    latencies: list[float] = []
    expired = 0
    errors: list[str] = []
    for i, (t_sub, f) in enumerate(pending):
        try:
            out = f.result()
            assert out.shape == (opt.H, opt.W, 3)
            latencies.append(done_at.get(i, time.perf_counter()) - t_sub)
        except Exception as e:
            name = type(e).__name__
            if name == "DeadlineExceeded":
                expired += 1
            else:
                errors.append(f"{name}: {e}")
    wall = time.perf_counter() - t0
    stats = server.stats()
    server.close()

    record = {
        "metric": f"open-loop served {opt.H}x{opt.W} edits/s "
                  f"({opt.ddim_steps}-step, {opt.arrival_rate}/s offered)",
        "value": round(len(latencies) / wall, 4),
        "unit": "edits/s",
        "offered_per_s": opt.arrival_rate,
        "offered_wall_s": round(offered_wall, 2),
        "wall_s": round(wall, 2),
        "submitted": submitted,
        "completed": len(latencies),
        "rejected_at_submit": rejected_at_submit,
        "expired": expired,
        "server_rejected": stats["rejected"],
        "server_expired": stats["expired"],
        "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 3),
        "batches": stats["batches"],
        "quantize": opt.quantize,
        "deadline_s": opt.deadline_s or None,
        "queue_depth": opt.queue_depth,
        "shaping": bool(opt.deadline_s),
    }
    if latencies:
        record["p50_latency_s"] = round(float(np.percentile(latencies, 50)), 3)
        record["p95_latency_s"] = round(float(np.percentile(latencies, 95)), 3)
        record["max_latency_s"] = round(max(latencies), 3)
    if errors:
        record["errors"] = len(errors)
        record["first_error"] = errors[0]
    print(json.dumps(record))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    opt = get_parser().parse_args()

    import jax.numpy as jnp

    from pbe_tpu.pipelines.loading import load_pipeline
    from pbe_tpu.serving import EditServer

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    config = opt.config or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "v1.yaml")
    qmode = "int8" if opt.quantize else None
    pipeline, _ = load_pipeline(config, opt.ckpt or None, dtype=dtype,
                                verbose=False, quantize=qmode)
    if opt.quantize == "int8-static":
        gq = np.random.default_rng(0)
        ci = gq.uniform(-1, 1, (1, opt.H, opt.W, 3)).astype(np.float32)
        cm = np.ones((1, opt.H, opt.W, 1), np.float32)
        cm[:, opt.H // 4: 3 * opt.H // 4, opt.W // 4: 3 * opt.W // 4] = 0.0
        r = pipeline.ref_size
        cr = gq.standard_normal((1, r, r, 3)).astype(np.float32)
        pipeline.quant_scales = pipeline.calibrate_int8(ci, cm, cr)
    if opt.data_parallel:
        pipeline = pipeline.shard()
    server = EditServer(
        pipeline, steps=opt.ddim_steps, scale=opt.scale,
        buckets=opt.buckets, max_wait_ms=opt.max_wait_ms,
        # throughput bench: multi-bucket int8 waives seed-reproducibility
        # (int8 results are bucket-shape-dependent — see EditServer)
        allow_batch_variant_sampling=bool(opt.quantize)
        and len(set(opt.buckets)) > 1,
        deadline_s=opt.deadline_s or None,
        queue_depth=opt.queue_depth,
        output_uint8=opt.uint8_out)

    g = np.random.default_rng(0)
    image = g.uniform(-1, 1, (opt.H, opt.W, 3)).astype(np.float32)
    mask = np.ones((opt.H, opt.W, 1), np.float32)
    q = opt.H // 4
    mask[q: 3 * q, q: 3 * q] = 0.0
    ref_size = pipeline.ref_size
    ref = g.standard_normal((ref_size, ref_size, 3)).astype(np.float32)

    if opt.warmup:
        server.warmup(opt.H, opt.W)

    if opt.arrival_rate > 0:
        run_open_loop(opt, server, image, mask, ref)
        return

    latencies: list[float] = []
    client_errors: list[str] = []
    lock = threading.Lock()
    counter = iter(range(opt.n_requests))

    def client() -> None:
        while True:
            with lock:
                k = next(counter, None)
            if k is None:
                return
            t0 = time.perf_counter()
            try:
                out = server.edit(image, mask, ref, seed=k)
                assert out.shape == (opt.H, opt.W, 3)
            except Exception as e:  # count it; don't die silently
                with lock:
                    client_errors.append(f"request {k}: {e!r}")
                continue
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client)
               for _ in range(opt.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = server.stats()
    server.close()

    record = {
        "metric": f"served {opt.H}x{opt.W} edits/s "
                  f"({opt.ddim_steps}-step, concurrency {opt.concurrency})",
        "value": round(len(latencies) / wall, 4),  # completed only
        "unit": "edits/s",
        "wall_s": round(wall, 2),
        "completed": len(latencies),
        "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 3),
        "batches": stats["batches"],
        "padded_rows": stats["padded_rows"],
        "uint8_out": bool(opt.uint8_out),
        "quantize": opt.quantize,
        "rejected": stats["rejected"],
        "expired": stats["expired"],
        "deadline_s": opt.deadline_s or None,
    }
    if latencies:
        record["p50_latency_s"] = round(float(np.percentile(latencies, 50)), 3)
        record["p95_latency_s"] = round(float(np.percentile(latencies, 95)), 3)
    if client_errors:
        record["errors"] = len(client_errors)
        record["first_error"] = client_errors[0]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
