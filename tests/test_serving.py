"""EditServer micro-batcher: coalescing, bucketing, batch-invariance,
error propagation, shutdown. Tiny model on CPU (serving layer has no
reference counterpart — the reference deploys via one-image CLI runs)."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbe_tpu.models.clip_vit import CLIPVisionConfig
from pbe_tpu.models.exemplar import ExemplarEncoderConfig
from pbe_tpu.models.pbe import PaintByExample
from pbe_tpu.models.unet import UNetConfig
from pbe_tpu.models.vae import AutoencoderKLConfig
from pbe_tpu.pipelines.inference import EditPipeline
from pbe_tpu.serving import EditServer

S = 32  # image side


@pytest.fixture(scope="module")
def pipeline():
    model = PaintByExample(
        unet_config=UNetConfig(model_channels=8, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(1,),
                               num_heads=2, context_dim=768,
                               use_checkpoint=False),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 8, "ch_mult": [1, 2, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": S},
            embed_dim=4),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=1024, num_layers=1, num_heads=4,
                                  mlp_dim=32, patch_size=8, image_size=32),
            mapper_layers=1),
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, S, S, 3)), jnp.ones((1, S, S, 1)),
        jnp.zeros((1, S, S, 3)), rng, method=PaintByExample.initialize_all)
    variables = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0)
        .standard_normal(p.shape).astype(np.float32), variables)
    return EditPipeline(model, variables)


def _example(i: int):
    g = np.random.default_rng(i)
    image = g.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    mask = np.ones((S, S, 1), np.float32)
    mask[8:24, 8:24] = 0.0
    ref = g.standard_normal((32, 32, 3)).astype(np.float32)
    return image, mask, ref


def test_single_request_roundtrip(pipeline):
    with EditServer(pipeline, steps=2, buckets=(1, 2), max_wait_ms=1) as srv:
        image, mask, ref = _example(0)
        out = srv.edit(image, mask, ref, seed=7, timeout=120)
        assert out.shape == (S, S, 3)
        assert np.isfinite(out).all() and 0.0 <= out.min() and out.max() <= 1.0
        st = srv.stats()
        assert st["requests"] == 1 and st["batches"] == 1


def test_results_are_batch_invariant(pipeline):
    """A request's output must not depend on its batch-mates: solo result ==
    result when co-batched with other requests (per-request x_T + posterior
    mode first stage)."""
    image, mask, ref = _example(1)
    with EditServer(pipeline, steps=2, buckets=(1, 2, 4),
                    max_wait_ms=1) as srv:
        solo = srv.edit(image, mask, ref, seed=11, timeout=120)

    with EditServer(pipeline, steps=2, buckets=(4,), max_wait_ms=500) as srv:
        futs = [srv.submit(*_example(k), seed=100 + k) for k in (2, 3)]
        futs.append(srv.submit(image, mask, ref, seed=11))
        outs = [f.result(120) for f in futs]
        st = srv.stats()
    assert st["batches"] == 1, st  # all three coalesced (+1 padded row)
    assert st["padded_rows"] == 1, st
    # semantic invariance; tiny tolerance for XLA batch-size-dependent
    # fusion/layout choices
    np.testing.assert_allclose(outs[2], solo, atol=1e-5)


def test_coalescing_and_bucketing(pipeline):
    with EditServer(pipeline, steps=2, buckets=(1, 2, 4),
                    max_wait_ms=400) as srv:
        futs = [srv.submit(*_example(k), seed=k) for k in range(3)]
        outs = [f.result(120) for f in futs]
        st = srv.stats()
    assert all(o.shape == (S, S, 3) for o in outs)
    assert st["requests"] == 3
    assert st["batches"] == 1          # one coalesced batch
    assert st["padded_rows"] == 1      # 3 -> bucket 4
    assert 0.0 < st["mean_batch_occupancy"] <= 1.0
    # distinct seeds -> distinct noise -> distinct edits
    assert not np.array_equal(outs[0], outs[1])


def test_seed_determinism_across_servers(pipeline):
    image, mask, ref = _example(4)
    def run_once():
        with EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1) as s:
            return s.edit(image, mask, ref, seed=99, timeout=120)
    np.testing.assert_array_equal(run_once(), run_once())


def test_error_propagates_and_server_survives(pipeline):
    with EditServer(pipeline, steps=2, buckets=(1, 2), max_wait_ms=1) as srv:
        image, mask, ref = _example(5)
        bad = srv.submit(image[: S // 2], mask, ref)  # wrong spatial shape
        with pytest.raises(Exception):
            bad.result(120)
        # server keeps serving afterwards
        ok = srv.edit(image, mask, ref, seed=1, timeout=120)
        assert ok.shape == (S, S, 3)
        assert srv.stats()["errors"] == 1


def test_submit_after_close_raises(pipeline):
    srv = EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1)
    srv.close()
    image, mask, ref = _example(6)
    with pytest.raises(RuntimeError):
        srv.submit(image, mask, ref)


def test_concurrent_submitters(pipeline):
    """Many client threads, one device thread: all futures resolve, results
    deterministic per seed."""
    with EditServer(pipeline, steps=2, buckets=(1, 2, 4),
                    max_wait_ms=30) as srv:
        results: dict[int, np.ndarray] = {}
        lock = threading.Lock()

        def client(k: int):
            image, mask, ref = _example(7)
            out = srv.edit(image, mask, ref, seed=k, timeout=180)
            with lock:
                results[k] = out

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(240)
        st = srv.stats()
    assert len(results) == 6
    assert st["requests"] == 6
    assert st["batches"] <= 6  # at least some coalescing is allowed, none required
    # same inputs, different seeds -> different outputs
    assert not np.array_equal(results[0], results[1])


def test_cancelled_request_is_skipped(pipeline):
    """Future.cancel() while queued: the request never reaches the device,
    later requests still serve."""
    with EditServer(pipeline, steps=2, buckets=(1, 2),
                    max_wait_ms=400) as srv:
        image, mask, ref = _example(8)
        # block the dispatch thread with a first request so the second one
        # is definitely still queued when cancelled
        first = srv.submit(image, mask, ref, seed=0)
        doomed = srv.submit(image, mask, ref, seed=1)
        assert doomed.cancel()
        first.result(180)
        ok = srv.edit(image, mask, ref, seed=2, timeout=180)
        st = srv.stats()
    assert doomed.cancelled()
    assert ok.shape == (S, S, 3)
    assert st["requests"] == 2  # the cancelled one never counted


def test_stochastic_sampler_config_rejected(pipeline):
    with pytest.raises(ValueError, match="batch-invariance"):
        EditServer(pipeline, steps=2, sampler="ddim", eta=1.0)
    srv = EditServer(pipeline, steps=2, sampler="ddim", eta=1.0,
                     allow_batch_variant_sampling=True)
    srv.close()


def test_mixed_shape_request_fails_alone(pipeline):
    """A shape-mismatched request must not poison its batch-mates."""
    with EditServer(pipeline, steps=2, buckets=(2,), max_wait_ms=500) as srv:
        image, mask, ref = _example(9)
        good = srv.submit(image, mask, ref, seed=1)
        bad = srv.submit(image[: S // 2], mask[: S // 2], ref, seed=2)
        out = good.result(180)
        with pytest.raises(ValueError, match="differ from the batch"):
            bad.result(180)
        st = srv.stats()
    assert out.shape == (S, S, 3)
    assert st["errors"] == 1 and st["requests"] == 1


def test_warmup_compiles_buckets_directly(pipeline):
    """warmup() must work for non-224 CLIP models (ref size from the
    pipeline) and precompile without racing the coalescing window."""
    with EditServer(pipeline, steps=2, buckets=(1, 2), max_wait_ms=1) as srv:
        srv.warmup(S, S)  # would crash with a hardcoded 224 ref
        out = srv.edit(*_example(10), seed=0, timeout=120)
    assert out.shape == (S, S, 3)


def test_negative_seed_is_folded(pipeline):
    with EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1) as srv:
        image, mask, ref = _example(11)
        out = srv.edit(image, mask, ref, seed=-1, timeout=120)
        same = srv.edit(image, mask, ref, seed=2**64 - 1, timeout=120)
    np.testing.assert_array_equal(out, same)


def test_uint8_output(pipeline):
    """output_uint8=True: device-side conversion matches the host formula
    applied to the float path (same values through the same program tail)."""
    from pbe_tpu.data.transforms import to_uint8

    image, mask, ref = _example(12)
    with EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1) as srv:
        f32 = srv.edit(image, mask, ref, seed=5, timeout=120)
    with EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1,
                    output_uint8=True) as srv:
        u8 = srv.edit(image, mask, ref, seed=5, timeout=120)
    assert u8.dtype == np.uint8 and u8.shape == (S, S, 3)
    # XLA may fuse the convert differently than the float program; allow
    # one code of rounding slack, require near-total exact agreement
    diff = np.abs(u8.astype(np.int16) - to_uint8(f32).astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_pipelined_dispatch_burst(pipeline):
    """buckets=(1,): a burst of sequential batches exercises the
    double-buffered path (batch k+1 dispatched while k is in flight);
    every result must still be the request's own seed-deterministic edit."""
    image, mask, ref = _example(13)
    with EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1) as srv:
        solo = {k: srv.edit(image, mask, ref, seed=k, timeout=120)
                for k in range(3)}
    with EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1) as srv:
        futs = [srv.submit(image, mask, ref, seed=k) for k in range(3)]
        outs = [f.result(120) for f in futs]
        st = srv.stats()
    assert st["requests"] == 3 and st["batches"] == 3
    for k in range(3):
        np.testing.assert_array_equal(outs[k], solo[k])


def test_pipelined_dispatch_error_isolation(pipeline):
    """With a batch in flight, a following bad-shape batch must fail alone
    and the in-flight batch must still resolve."""
    image, mask, ref = _example(14)
    with EditServer(pipeline, steps=2, buckets=(1,), max_wait_ms=1) as srv:
        good = srv.submit(image, mask, ref, seed=1)
        bad = srv.submit(image[: S // 2], mask[: S // 2],
                         ref[: S // 2], seed=2)
        good2 = srv.submit(image, mask, ref, seed=3)
        assert good.result(180).shape == (S, S, 3)
        with pytest.raises(Exception):
            bad.result(180)
        assert good2.result(180).shape == (S, S, 3)
        st = srv.stats()
    assert st["errors"] == 1 and st["requests"] == 2


# -- latency shaping (deadline + admission control) -------------------------

class _SlowStubPipeline:
    """Pipeline stand-in with a controllable device time — lets the
    shaping tests exercise queue dynamics deterministically without
    model latency noise."""

    quantize = None

    def __init__(self, delay_s: float):
        import types
        self.delay_s = delay_s
        self.model = types.SimpleNamespace(latent_downsample=8)
        self.ref_size = 32

    def edit_batch(self, image, mask, ref, **kw):
        time.sleep(self.delay_s)
        return (np.asarray(image, np.float32) * 0.0 + 0.5)


def test_deadline_expired_requests_are_dropped():
    from pbe_tpu.serving import DeadlineExceeded

    srv = EditServer(_SlowStubPipeline(0.5), steps=2, buckets=(1,),
                     max_wait_ms=1, deadline_s=0.05)
    image, mask, ref = _example(0)
    futs = [srv.submit(image, mask, ref, seed=i) for i in range(4)]
    out0 = futs[0].result(30)  # dequeued immediately: inside its budget
    assert out0.shape == image.shape
    expired = 0
    for f in futs[1:]:
        try:
            f.result(30)
        except DeadlineExceeded:
            expired += 1
    assert expired >= 2  # they sat behind a 0.5s batch with a 50ms budget
    st = srv.stats()
    srv.close()
    assert st["expired"] == expired


def test_per_request_deadline_overrides_server_default():
    from pbe_tpu.serving import DeadlineExceeded

    srv = EditServer(_SlowStubPipeline(0.3), steps=2, buckets=(1,),
                     max_wait_ms=1)  # no server-wide deadline
    image, mask, ref = _example(1)
    f0 = srv.submit(image, mask, ref, seed=0)
    f1 = srv.submit(image, mask, ref, seed=1, deadline_s=0.01)
    f2 = srv.submit(image, mask, ref, seed=2)  # unlimited budget
    assert f0.result(30).shape == image.shape
    with pytest.raises(DeadlineExceeded):
        f1.result(30)
    assert f2.result(30).shape == image.shape
    srv.close()


def test_admission_queue_full_rejects_fast():
    from pbe_tpu.serving import ServerOverloaded

    srv = EditServer(_SlowStubPipeline(0.5), steps=2, buckets=(1,),
                     max_wait_ms=1, queue_depth=1)
    image, mask, ref = _example(2)
    f0 = srv.submit(image, mask, ref, seed=0)
    time.sleep(0.1)  # let the worker move f0 onto the "device"
    f1 = srv.submit(image, mask, ref, seed=1)  # fills the 1-deep queue
    t0 = time.perf_counter()
    with pytest.raises(ServerOverloaded):
        srv.submit(image, mask, ref, seed=2)
    assert time.perf_counter() - t0 < 0.1  # rejected, not blocked
    assert f0.result(30).shape == image.shape
    assert f1.result(30).shape == image.shape
    st = srv.stats()
    srv.close()
    assert st["rejected"] == 1


def test_open_loop_bench_shaping_smoke():
    """Subprocess regression of scripts/bench_serving.py --arrival_rate:
    overload a deliberately slow tiny server with shaping on; the run must
    finish, shed load (rejected+expired > 0), and emit the JSON record."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": root + os.pathsep + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, "scripts/bench_serving.py",
         "--config", "configs/tiny.yaml", "--H", "64", "--W", "64",
         "--ddim_steps", "2", "--warmup",
         "--arrival_rate", "40", "--duration_s", "2",
         "--deadline_s", "1", "--queue_depth", "4"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["shaping"] is True
    assert row["submitted"] > row["completed"]
    assert row["rejected_at_submit"] + row["expired"] > 0
    # every submitted request is accounted for exactly once
    assert (row["completed"] + row["rejected_at_submit"] + row["expired"]
            + row.get("errors", 0) == row["submitted"])
