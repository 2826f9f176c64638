"""HTTP surface of scripts/serve.py: /edit, /healthz, /stats, error paths.
Runs a real ThreadingHTTPServer on a loopback ephemeral port with the tiny
pipeline behind the micro-batcher."""
import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image

from pbe_tpu.serving import EditServer

S = 32


def _b64_png(arr_u8: np.ndarray, mode: str) -> str:
    buf = io.BytesIO()
    Image.fromarray(arr_u8, mode).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def http_server():
    # reuse the tiny pipeline builder from the serving tests
    from http.server import ThreadingHTTPServer

    from tests.test_serving import pipeline as pipeline_fixture  # noqa: F401
    import tests.test_serving as ts

    pipe = ts.pipeline.__wrapped__()
    server = EditServer(pipe, steps=2, buckets=(1, 2), max_wait_ms=5)

    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "serve.py"))
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    handler = serve_mod.make_handler(server, (S, S))
    try:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    except OSError as e:  # sandbox without loopback bind
        server.close()
        pytest.skip(f"cannot bind loopback: {e}")
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()
    httpd.server_close()
    server.close()


def _request(addr, method, path, payload=None):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    body = json.dumps(payload).encode() if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"} if body else {})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_healthz_and_stats(http_server):
    status, out = _request(http_server, "GET", "/healthz")
    assert (status, out) == (200, {"ok": True})
    status, out = _request(http_server, "GET", "/stats")
    assert status == 200 and "requests" in out


def test_edit_roundtrip(http_server):
    g = np.random.default_rng(0)
    img = g.integers(0, 255, (S, S, 3), np.uint8)
    msk = np.zeros((S, S), np.uint8)
    msk[8:24, 8:24] = 255  # white = edit region
    payload = {
        "image": _b64_png(img, "RGB"),
        "mask": _b64_png(msk, "L"),
        "reference": _b64_png(g.integers(0, 255, (S, S, 3), np.uint8), "RGB"),
        "seed": 3,
    }
    status, out = _request(http_server, "POST", "/edit", payload)
    assert status == 200, out
    result = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(out["result"]))))
    assert result.shape == (S, S, 3)
    assert out["seed"] == 3 and out["latency_ms"] > 0

    # same seed -> identical bytes; different seed -> different image
    _, out2 = _request(http_server, "POST", "/edit", payload)
    assert out2["result"] == out["result"]
    payload["seed"] = 4
    _, out3 = _request(http_server, "POST", "/edit", payload)
    assert out3["result"] != out["result"]


def test_bad_requests(http_server):
    status, out = _request(http_server, "GET", "/nope")
    assert status == 404
    status, out = _request(http_server, "POST", "/edit",
                           {"image": "not-base64-png"})
    assert status == 400 and "error" in out
