"""HTTP edit server — production serving front-end for pbe_tpu.

No reference counterpart (the reference deploys via per-image CLI runs,
scripts/inference.py); this wraps the micro-batching
:class:`pbe_tpu.serving.EditServer` so concurrent clients share compiled
batch programs on the chip(s). stdlib-only (http.server), JSON+base64 API:

    POST /edit      {"image": <b64 PNG>, "mask": <b64 PNG>,
                     "reference": <b64 PNG/JPG>, "seed": 42}
                 -> {"result": <b64 PNG>, "latency_ms": ..., "seed": ...}
    GET  /healthz -> {"ok": true}
    GET  /stats   -> batching counters (requests, batches, occupancy, ...)

Sampler configuration (steps/sampler/scale/paste_back) is fixed per
deployment — each combination is its own compiled XLA program; per-request
knobs are the images and the seed. Start with --warmup to pre-compile
every batch bucket before accepting traffic. --data_parallel shards each
batch over all chips of the slice.
"""
import argparse
import base64
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--config", type=str, default="")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true", default=True)
    p.add_argument("--ddim", dest="plms", action="store_false")
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--paste_back", type=int, default=None, metavar="FEATHER")
    p.add_argument("--quantize", choices=["int8", "int8-static"],
                   default=None,
                   help="w8a8 UNet matmuls/convs (ops/quant.py, opt-in); "
                        "int8-static calibrates constant scales at startup "
                        "on a synthetic edit at the serving geometry (no "
                        "runtime amax; point --calib_image/--calib_mask/"
                        "--calib_ref at a real example for production PTQ)")
    p.add_argument("--calib_image", type=str, default="")
    p.add_argument("--calib_mask", type=str, default="")
    p.add_argument("--calib_ref", type=str, default="")
    p.add_argument("--precision", type=str, choices=["full", "autocast"],
                   default="autocast")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4, 8],
                   help="batch sizes to compile; requests coalesce into the "
                        "smallest bucket that fits")
    p.add_argument("--max_wait_ms", type=float, default=20.0,
                   help="how long the batcher waits for co-riders")
    p.add_argument("--max_body_mb", type=int, default=64,
                   help="reject request bodies larger than this (413)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over every chip of the slice")
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket before serving")
    p.add_argument("--prewarm_only", action="store_true",
                   help="compile every bucket into the persistent XLA "
                        "cache, then exit — run once offline so later "
                        "server starts (same config) load in seconds")
    p.add_argument("--deadline_s", type=float, default=0.0,
                   help="per-request queueing budget (0 = none): requests "
                        "still queued past it get 503 instead of a stale "
                        "result")
    p.add_argument("--queue_depth", type=int, default=256,
                   help="admission bound: submits beyond this backlog get "
                        "429 immediately (reject-fast over ballooning)")
    p.add_argument("--sample_first_stage", action="store_true",
                   help="reference-parity posterior *sampling* for the "
                        "masked-source latent (batch-mates then perturb the "
                        "draw); default is the posterior mode, which makes "
                        "results batch-invariant")
    return p


def make_handler(server, size, max_body_mb: int = 64):
    """Build the request handler bound to an EditServer. Split out so tests
    can drive the HTTP surface on an ephemeral port."""
    from http.server import BaseHTTPRequestHandler

    from pbe_tpu.data import transforms as T
    from pbe_tpu.serving import DeadlineExceeded, ServerOverloaded

    ref_size = server.pipeline.ref_size  # exemplar side of the deployed model
    max_body = max_body_mb * 1024 * 1024

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                self._send(200, server.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/edit":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > max_body:
                    self._send(413, {"error": f"body {n} bytes exceeds "
                                              f"{max_body} limit"})
                    return
                req = json.loads(self.rfile.read(n))
                image = T.load_image(
                    io.BytesIO(base64.b64decode(req["image"])), size)
                mask = T.load_mask(
                    io.BytesIO(base64.b64decode(req["mask"])), size)
                ref = T.load_reference(
                    io.BytesIO(base64.b64decode(req["reference"])), ref_size)
                seed = int(req.get("seed", 42))
            except Exception as e:
                self._send(400, {"error": f"bad request: {e}"})
                return
            try:
                t0 = time.perf_counter()
                out = server.edit(image, mask, ref, seed=seed)
                ms = (time.perf_counter() - t0) * 1000.0
                buf = io.BytesIO()
                from PIL import Image

                arr = out if out.dtype == np.uint8 else T.to_uint8(out)
                Image.fromarray(arr).save(buf, format="PNG")
                self._send(200, {
                    "result": base64.b64encode(buf.getvalue()).decode(),
                    "latency_ms": round(ms, 1),
                    "seed": seed,
                })
            except ServerOverloaded as e:
                self._send(429, {"error": str(e)})
            except DeadlineExceeded as e:
                self._send(503, {"error": f"deadline exceeded: {e}"})
            except Exception as e:
                self._send(500, {"error": str(e)})

    return Handler


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
                                quantize=qmode)
    if opt.quantize == "int8-static":
        import numpy as np

        if opt.calib_image:
            from pbe_tpu.data import transforms as T

            img = T.load_image(opt.calib_image, (opt.H, opt.W))[None]
            msk = T.load_mask(opt.calib_mask, (opt.H, opt.W))[None]
            cref = T.load_reference(opt.calib_ref)[None]
        else:
            g = np.random.default_rng(0)
            img = g.uniform(-1, 1, (1, opt.H, opt.W, 3)).astype(np.float32)
            msk = np.ones((1, opt.H, opt.W, 1), np.float32)
            msk[:, opt.H // 4: 3 * opt.H // 4,
                opt.W // 4: 3 * opt.W // 4] = 0.0
            r = pipeline.ref_size
            cref = g.standard_normal((1, r, r, 3)).astype(np.float32)
        pipeline.quant_scales = pipeline.calibrate_int8(img, msk, cref)
        print(f"calibrated {len(pipeline.quant_scales)} static int8 op "
              "scales", file=sys.stderr)
    if opt.data_parallel:
        pipeline = pipeline.shard()

    server = EditServer(
        pipeline,
        steps=opt.ddim_steps,
        sampler="plms" if opt.plms else "ddim",
        scale=opt.scale,
        paste_back=opt.paste_back,
        det_first_stage=not opt.sample_first_stage,
        buckets=opt.buckets,
        max_wait_ms=opt.max_wait_ms,
        # int8 results depend on the bucket shape (~1e-2 pixel-level:
        # quantization-step flips on XLA's shape-dependent fp noise), so
        # multi-bucket int8 serving opts out of seed-reproducibility;
        # pass --buckets N alone to keep it
        allow_batch_variant_sampling=bool(opt.quantize)
        and len(set(opt.buckets)) > 1,
        deadline_s=opt.deadline_s or None,
        queue_depth=opt.queue_depth,
        # results leave as PNGs — convert on device, read back 4x less
        output_uint8=True,
    )
    if opt.quantize and len(set(opt.buckets)) > 1:
        print("note: --quantize int8 with multiple buckets: outputs vary "
              "~1e-2 with batch occupancy (use a single bucket for "
              "seed-reproducible serving)", file=sys.stderr)
    if opt.warmup or opt.prewarm_only:
        print(f"warming up buckets {server.buckets} ...", flush=True)
        t0 = time.perf_counter()
        server.warmup(opt.H, opt.W)
        print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)
    if opt.prewarm_only:
        # every bucket's program is now in the persistent XLA cache
        # (utils/cache.py) — a later serve.py with the same config skips
        # straight to load-from-cache
        server.close()
        print("prewarm complete; exiting", flush=True)
        return

    from http.server import ThreadingHTTPServer

    handler = make_handler(server, (opt.H, opt.W), opt.max_body_mb)
    httpd = ThreadingHTTPServer((opt.host, opt.port), handler)
    print(f"serving on http://{opt.host}:{opt.port} "
          f"(steps={opt.ddim_steps}, scale={opt.scale}, "
          f"buckets={server.buckets})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        server.close()


if __name__ == "__main__":
    main()
