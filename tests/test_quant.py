"""w8a8 int8 execution (ops/quant.py): layer-level accuracy, shape
gating, and pipeline integration. CPU (XLA lowers int8 dot/conv on every
backend; the speed claims are the chip probe's, benchmarks/
int8_probe_r3.jsonl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbe_tpu.ops import quant

jax.config.update("jax_platforms", "cpu")


def _dn_dense(lhs_ndim):
    return (((lhs_ndim - 1,), (0,)), ((), ()))


def test_dot_general_int8_accuracy():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((512, 256)), jnp.float32)
    w = jnp.asarray(g.standard_normal((256, 512)) * 0.05, jnp.float32)
    ref = jax.lax.dot_general(x, w, _dn_dense(2))
    out = quant.dot_general_int8(x, w, _dn_dense(2))
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # per-channel w8 / per-tensor a8 on gaussians


def test_dot_general_int8_gating_small_falls_back_exactly():
    g = np.random.default_rng(1)
    # contraction 64 < MIN_CONTRACT -> plain fp path, bitwise identical
    x = jnp.asarray(g.standard_normal((512, 64)), jnp.float32)
    w = jnp.asarray(g.standard_normal((64, 512)), jnp.float32)
    ref = jax.lax.dot_general(x, w, _dn_dense(2))
    out = quant.dot_general_int8(x, w, _dn_dense(2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # M=4 rows < MIN_ROWS -> fallback too
    x2 = jnp.asarray(g.standard_normal((4, 256)), jnp.float32)
    w2 = jnp.asarray(g.standard_normal((256, 256)), jnp.float32)
    ref2 = jax.lax.dot_general(x2, w2, _dn_dense(2))
    out2 = quant.dot_general_int8(x2, w2, _dn_dense(2))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))


def _conv(x, k, fn):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return fn(x, k, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(1, 1),
              rhs_dilation=(1, 1), dimension_numbers=dn)


def test_conv_int8_accuracy():
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((2, 24, 24, 128)), jnp.float32)
    k = jnp.asarray(g.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    ref = _conv(x, k, jax.lax.conv_general_dilated)
    out = _conv(x, k, quant.conv_general_dilated_int8)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_conv_int8_gating():
    g = np.random.default_rng(3)
    # 8x8 spatial (the probe's 3x-regression case) -> exact fallback
    x = jnp.asarray(g.standard_normal((2, 8, 8, 128)), jnp.float32)
    k = jnp.asarray(g.standard_normal((3, 3, 128, 128)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_conv(x, k, quant.conv_general_dilated_int8)),
        np.asarray(_conv(x, k, jax.lax.conv_general_dilated)))
    # 9 input channels (the UNet's x-concat input conv) -> fallback
    x2 = jnp.asarray(g.standard_normal((2, 32, 32, 9)), jnp.float32)
    k2 = jnp.asarray(g.standard_normal((3, 3, 9, 128)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_conv(x2, k2, quant.conv_general_dilated_int8)),
        np.asarray(_conv(x2, k2, jax.lax.conv_general_dilated)))


def test_zero_init_weights_give_exact_zero():
    g = np.random.default_rng(4)
    x = jnp.asarray(g.standard_normal((2, 24, 24, 128)), jnp.float32)
    k = jnp.zeros((3, 3, 128, 128), jnp.float32)
    out = _conv(x, k, quant.conv_general_dilated_int8)
    assert float(jnp.abs(out).max()) == 0.0


def test_context_is_trace_time_only():
    assert not quant.is_active()
    with quant.quantized("int8"):
        assert quant.is_active()
        with quant.quantized(None):
            assert quant.is_active()  # None nests transparently
    assert not quant.is_active()
    with pytest.raises(ValueError):
        with quant.quantized("fp4"):
            pass


@pytest.fixture(scope="module")
def eligible_pipeline_pair():
    """A CPU-sized model whose UNet layers clear the int8 gates
    (128 channels, 16x16 latents => conv spatial 256, dense M 512)."""
    from pbe_tpu.models.clip_vit import CLIPVisionConfig
    from pbe_tpu.models.exemplar import ExemplarEncoderConfig
    from pbe_tpu.models.pbe import PaintByExample
    from pbe_tpu.models.unet import UNetConfig
    from pbe_tpu.models.vae import AutoencoderKLConfig
    from pbe_tpu.pipelines.inference import EditPipeline

    S = 64
    model = PaintByExample(
        unet_config=UNetConfig(model_channels=128, channel_mult=(1,),
                               num_res_blocks=1, attention_resolutions=(1,),
                               num_heads=4, context_dim=768,
                               use_checkpoint=False),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 16, "ch_mult": [1, 2, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": S},
            embed_dim=4),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=1024, num_layers=1,
                                  num_heads=4, mlp_dim=32, patch_size=8,
                                  image_size=32),
            mapper_layers=1))
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, S, S, 3)), jnp.ones((1, S, S, 1)),
        jnp.zeros((1, 32, 32, 3)), rng, method=PaintByExample.initialize_all)
    variables = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(0)
        .standard_normal(p.shape).astype(np.float32), variables)
    return (EditPipeline(model, variables),
            EditPipeline(model, variables, quantize="int8"), S)


def test_pipeline_int8_close_to_fp(eligible_pipeline_pair):
    fp, q, S = eligible_pipeline_pair
    g = np.random.default_rng(5)
    image = g.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    mask = np.ones((1, S, S, 1), np.float32)
    mask[:, 16:48, 16:48] = 0.0
    ref = g.standard_normal((1, 32, 32, 3)).astype(np.float32)
    a = fp.edit_batch(image, mask, ref, steps=2, seed=7)
    b = q.edit_batch(image, mask, ref, steps=2, seed=7)
    assert b.shape == a.shape and np.isfinite(b).all()
    # int8 path engaged: results differ, but stay close in image space
    assert not np.array_equal(a, b)
    assert float(np.abs(a - b).mean()) < 0.05, float(np.abs(a - b).mean())


def test_pipeline_int8_deterministic(eligible_pipeline_pair):
    _, q, S = eligible_pipeline_pair
    g = np.random.default_rng(6)
    image = g.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    mask = np.ones((1, S, S, 1), np.float32)
    ref = g.standard_normal((1, 32, 32, 3)).astype(np.float32)
    a = q.edit_batch(image, mask, ref, steps=2, seed=9)
    b = q.edit_batch(image, mask, ref, steps=2, seed=9)
    np.testing.assert_array_equal(a, b)


def test_int8_batch_invariance():
    """A request's int8 output must not depend on co-batched neighbors
    (per-row activation scales; int32 accumulation is exact so tiling
    order can't perturb it either) — EditServer relies on this."""
    g = np.random.default_rng(7)
    a = jnp.asarray(g.standard_normal((1, 24, 24, 128)), jnp.float32)
    # large-amplitude neighbor: would shift a shared per-tensor scale
    b = jnp.asarray(g.standard_normal((1, 24, 24, 128)) * 50, jnp.float32)
    k = jnp.asarray(g.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    solo = _conv(a, k, quant.conv_general_dilated_int8)
    both = _conv(jnp.concatenate([a, b]), k, quant.conv_general_dilated_int8)
    np.testing.assert_array_equal(np.asarray(solo), np.asarray(both[:1]))
    x = jnp.asarray(g.standard_normal((1, 512, 256)), jnp.float32)
    y = jnp.asarray(g.standard_normal((1, 512, 256)) * 50, jnp.float32)
    w = jnp.asarray(g.standard_normal((256, 512)) * 0.05, jnp.float32)
    ds = quant.dot_general_int8(x, w, _dn_dense(3))
    db = quant.dot_general_int8(jnp.concatenate([x, y]), w, _dn_dense(3))
    np.testing.assert_array_equal(np.asarray(ds), np.asarray(db[:1]))


def test_conv_int8_non_nhwc_layout_falls_back_exactly():
    g = np.random.default_rng(8)
    x = jnp.asarray(g.standard_normal((2, 128, 24, 24)), jnp.float32)
    k = jnp.asarray(g.standard_normal((128, 128, 3, 3)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    common = dict(window_strides=(1, 1), padding=((1, 1), (1, 1)),
                  dimension_numbers=dn)
    ref = jax.lax.conv_general_dilated(x, k, **common)
    out = quant.conv_general_dilated_int8(x, k, **common)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_context_is_thread_local():
    import threading
    seen = {}

    def probe():
        seen["other_thread"] = quant.is_active()

    with quant.quantized("int8"):
        t = threading.Thread(target=probe)
        t.start()
        t.join()
        assert quant.is_active()
    assert seen["other_thread"] is False


def test_server_int8_guards_and_content_invariance(eligible_pipeline_pair):
    """Multi-bucket + quantized pipeline must raise (int8 output is
    bucket-shape-dependent); at a FIXED bucket, co-batched content must
    not change a request's output bitwise (per-row activation scales)."""
    from pbe_tpu.serving import EditServer

    _, q, S = eligible_pipeline_pair
    with pytest.raises(ValueError, match="quantized"):
        EditServer(q, steps=2, buckets=(1, 2, 4))
    g = np.random.default_rng(5)
    img = g.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    msk = np.ones((S, S, 1), np.float32)
    msk[16:48, 16:48] = 0.0
    ref = g.standard_normal((32, 32, 3)).astype(np.float32)
    hot = np.full_like(img, 0.999)  # would shift a shared per-tensor scale
    with EditServer(q, steps=2, buckets=(4,), max_wait_ms=5.0) as srv:
        solo = srv.edit(img, msk, ref, seed=7)  # padded with its own rows
        futs = [srv.submit(img, msk, ref, seed=7),
                srv.submit(hot, msk, ref, seed=8),
                srv.submit(hot, msk, ref, seed=9)]
        batched = futs[0].result(300)
    np.testing.assert_array_equal(solo, batched)


# -- calibrated static-scale mode (round 5) ---------------------------------


def test_dot_general_int8_static_matches_calibrated_dynamic():
    """Static scales calibrated on the same input reproduce the per-tensor
    dynamic result (up to reciprocal-multiply rounding) with no runtime
    amax in the traced program."""
    g = np.random.default_rng(10)
    x = jnp.asarray(g.standard_normal((1, 512, 256)), jnp.float32)
    w = jnp.asarray(g.standard_normal((256, 512)) * 0.05, jnp.float32)
    with quant.calibration() as col:
        out_fp = quant.dot_general_int8(x, w, _dn_dense(3))
    # calibration executes the exact fp path
    np.testing.assert_array_equal(
        np.asarray(out_fp), np.asarray(jax.lax.dot_general(x, w,
                                                           _dn_dense(3))))
    recs = jax.tree_util.tree_map(np.asarray, col.records)
    scales = quant.scales_from_records([recs])
    assert len(scales) == 1 and len(scales[0][1]) == 512
    with quant.quantized("int8", static=scales):
        out_st = quant.dot_general_int8(x, w, _dn_dense(3))
    with quant.quantized("int8", per_row=False):
        out_dyn = quant.dot_general_int8(x, w, _dn_dense(3))
    rel = float(jnp.linalg.norm(out_st - out_dyn)
                / jnp.linalg.norm(out_dyn))
    assert rel < 1e-3, rel
    ref = jax.lax.dot_general(x, w, _dn_dense(3))
    rel_fp = float(jnp.linalg.norm(out_st - ref) / jnp.linalg.norm(ref))
    assert rel_fp < 0.02, rel_fp


def test_conv_int8_static_accuracy_and_invariance():
    g = np.random.default_rng(11)
    x = jnp.asarray(g.standard_normal((2, 24, 24, 128)), jnp.float32)
    k = jnp.asarray(g.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    with quant.calibration() as col:
        _conv(x, k, quant.conv_general_dilated_int8)
    scales = quant.scales_from_records(
        [jax.tree_util.tree_map(np.asarray, col.records)])
    with quant.quantized("int8", static=scales):
        out = _conv(x, k, quant.conv_general_dilated_int8)
    ref = _conv(x, k, jax.lax.conv_general_dilated)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # static scales are input-independent -> trivially batch-invariant
    with quant.quantized("int8", static=scales):
        both = _conv(jnp.concatenate([x[:1], x[1:] * 50]), k,
                     quant.conv_general_dilated_int8)
        solo = _conv(x[:1], k, quant.conv_general_dilated_int8)
    np.testing.assert_array_equal(np.asarray(solo), np.asarray(both[:1]))


def test_static_scale_count_mismatch_raises():
    g = np.random.default_rng(12)
    x = jnp.asarray(g.standard_normal((1, 512, 256)), jnp.float32)
    w = jnp.asarray(g.standard_normal((256, 512)), jnp.float32)
    with quant.calibration() as col:
        quant.dot_general_int8(x, w, _dn_dense(3))
    scales = quant.scales_from_records(
        [jax.tree_util.tree_map(np.asarray, col.records)])
    # two calibrated ops claimed, one traced -> whole-trace check fires
    with pytest.raises(RuntimeError, match="static-scale mismatch"):
        with quant.quantized("int8", static=scales + scales + scales[:1]):
            quant.dot_general_int8(x, w, _dn_dense(3))
    # wrong out-dim weight scale vector -> immediate trace-time error
    bad = ((scales[0][0], scales[0][1][:17]),)
    with pytest.raises(RuntimeError, match="misaligned"):
        with quant.quantized("int8", static=bad):
            quant.dot_general_int8(x, w, _dn_dense(3))


def test_calibration_records_inside_jit():
    g = np.random.default_rng(13)
    xn = g.standard_normal((2, 24, 24, 128)).astype(np.float32)
    kn = (g.standard_normal((3, 3, 128, 128)) * 0.05).astype(np.float32)

    @jax.jit
    def f(x, k):
        with quant.calibration() as col:
            y = _conv(x, k, quant.conv_general_dilated_int8)
        return y, col.records

    _, recs = f(jnp.asarray(xn), jnp.asarray(kn))
    assert len(recs) == 1
    act, wmax = recs[0]
    np.testing.assert_allclose(float(act), float(np.abs(xn).max()),
                               rtol=1e-6)
    assert np.asarray(wmax).shape == (128,)


def test_static_repeated_traces_under_one_context():
    """PLMS warm-up traces the eps closure several times under one
    quantized() context; the scale cursor must wrap per trace."""
    g = np.random.default_rng(14)
    x = jnp.asarray(g.standard_normal((1, 512, 256)), jnp.float32)
    w = jnp.asarray(g.standard_normal((256, 512)) * 0.05, jnp.float32)
    with quant.calibration() as col:
        quant.dot_general_int8(x, w, _dn_dense(3))
    scales = quant.scales_from_records(
        [jax.tree_util.tree_map(np.asarray, col.records)])
    with quant.quantized("int8", static=scales):
        a = quant.dot_general_int8(x, w, _dn_dense(3))
        b = quant.dot_general_int8(x, w, _dn_dense(3))  # second trace
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_int8_static_calibrated(eligible_pipeline_pair):
    """End-to-end: calibrate on a representative edit input, serve with
    constant-scale int8 — close to fp, deterministic, and guarded."""
    from pbe_tpu.pipelines.inference import EditPipeline

    fp, q, S = eligible_pipeline_pair
    g = np.random.default_rng(15)
    image = g.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    mask = np.ones((1, S, S, 1), np.float32)
    mask[:, 16:48, 16:48] = 0.0
    ref = g.standard_normal((1, 32, 32, 3)).astype(np.float32)
    scales = q.calibrate_int8(image, mask, ref, n_t=3)
    assert len(scales) > 0
    st = EditPipeline(q.model, q.variables, quantize="int8",
                      quant_scales=scales)
    a = fp.edit_batch(image, mask, ref, steps=2, seed=7)
    b = st.edit_batch(image, mask, ref, steps=2, seed=7)
    assert b.shape == a.shape and np.isfinite(b).all()
    assert not np.array_equal(a, b)  # int8 path engaged
    assert float(np.abs(a - b).mean()) < 0.05, float(np.abs(a - b).mean())
    c = st.edit_batch(image, mask, ref, steps=2, seed=7)
    np.testing.assert_array_equal(b, c)
    with pytest.raises(ValueError, match="quant_scales"):
        EditPipeline(q.model, q.variables, quant_scales=scales)
