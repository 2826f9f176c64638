"""ops/conv.py — small-spatial im2col conv formulation.

The override must be numerically equivalent to lax.conv_general_dilated
(exact on TPU — ds8_conv_r5.jsonl measured rel err 0.0; on CPU the
accumulation order differs, so tests use a tight tolerance), take the
im2col path only inside its gates, and fall back to lax everywhere else.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from pbe_tpu.ops import conv as conv_ops

DN = ("NHWC", "HWIO", "NHWC")


def _lax(x, w, strides=(1, 1), pad=((1, 1), (1, 1)), **kw):
    return jax.lax.conv_general_dilated(
        x, w, strides, pad, dimension_numbers=DN, **kw)


def _small(x, w, strides=(1, 1), pad=((1, 1), (1, 1)), **kw):
    return conv_ops.conv_general_dilated_small(
        x, w, strides, pad, dimension_numbers=DN, **kw)


def _rand(shape, dtype=jnp.float32, seed=0):
    g = np.random.default_rng(seed)
    return jnp.asarray(g.standard_normal(shape) * 0.1, dtype)


@pytest.mark.parametrize("b,h,w,ci,co", [
    (2, 8, 8, 96, 64),     # ds8-like
    (1, 16, 16, 64, 32),   # ds4-like
    (3, 5, 7, 8, 16),      # odd extents
])
def test_im2col_matches_lax_gated(b, h, w, ci, co):
    x, k = _rand((b, h, w, ci)), _rand((3, 3, ci, co), seed=1)
    a, bq = _lax(x, k), _small(x, k)
    assert bq.shape == a.shape and bq.dtype == a.dtype
    np.testing.assert_allclose(np.asarray(bq), np.asarray(a),
                               rtol=1e-4, atol=1e-4)


def test_im2col_is_applied_not_a_conv_fallback():
    """The gated path must actually lower to dot, not conv (otherwise the
    whole module is a no-op): check the jaxpr contains no conv primitive."""
    x, k = _rand((1, 8, 8, 16)), _rand((3, 3, 16, 16), seed=1)
    jaxpr = str(jax.make_jaxpr(lambda a, b: _small(a, b))(x, k))
    assert "conv_general_dilated" not in jaxpr
    assert "dot_general" in jaxpr


@pytest.mark.parametrize("case", [
    "stride2", "big_spatial", "k1", "grouped", "valid_pad", "dilated"])
def test_fallback_cases_match_lax(case):
    ci = co = 16
    if case == "big_spatial":
        x = _rand((1, 32, 32, ci))
    else:
        x = _rand((1, 8, 8, ci))
    kk = 1 if case == "k1" else 3
    k = _rand((kk, kk, ci, co), seed=1)
    kw, strides, pad = {}, (1, 1), ((kk // 2,) * 2,) * 2
    if case == "stride2":
        strides = (2, 2)
    elif case == "valid_pad":
        pad = ((0, 0), (0, 0))
    elif case == "grouped":
        k = _rand((3, 3, ci // 2, co), seed=1)
        kw["feature_group_count"] = 2
    elif case == "dilated":
        kw["rhs_dilation"] = (2, 2)
        pad = ((2, 2), (2, 2))
    a = _lax(x, k, strides, pad, **kw)
    bq = _small(x, k, strides, pad, **kw)
    np.testing.assert_array_equal(np.asarray(bq), np.asarray(a))
    # and the jaxpr still contains the conv primitive (it fell back)
    jaxpr = str(jax.make_jaxpr(
        lambda a_, b_: conv_ops.conv_general_dilated_small(
            a_, b_, strides, pad, dimension_numbers=DN, **kw))(x, k))
    assert "conv_general_dilated" in jaxpr


def test_bf16_dtype_preserved_and_close():
    x = _rand((2, 8, 8, 32), jnp.bfloat16)
    k = _rand((3, 3, 32, 32), jnp.bfloat16, seed=1)
    a, bq = _lax(x, k), _small(x, k)
    assert bq.dtype == jnp.bfloat16 == a.dtype
    diff = np.abs(np.asarray(bq, np.float32) - np.asarray(a, np.float32))
    # within ~1 bf16 ulp of the output scale (accumulation-order noise)
    assert diff.max() <= 0.02 * max(1.0, float(np.abs(np.asarray(a)).max()))


def test_context_activation_and_env_escape():
    assert not conv_ops.is_active()
    with conv_ops.small_spatial():
        assert conv_ops.is_active()
        with conv_ops.small_spatial():
            assert conv_ops.is_active()
        assert conv_ops.is_active()
    assert not conv_ops.is_active()
    os.environ["PBE_TPU_SMALL_CONV"] = "0"
    try:
        with conv_ops.small_spatial():
            assert not conv_ops.is_active()
    finally:
        del os.environ["PBE_TPU_SMALL_CONV"]


def test_unet_conv_picks_override_under_context():
    """models/unet._conv must wire the override at trace time iff the
    context is active (and quant mode must win when both are active)."""
    from pbe_tpu.models.unet import _conv
    from pbe_tpu.ops import quant

    c = _conv(8, 3, jnp.float32, "c")
    assert "conv_general_dilated" not in str(c.conv_general_dilated)
    with conv_ops.small_spatial():
        c = _conv(8, 3, jnp.float32, "c")
        assert c.conv_general_dilated is conv_ops.conv_general_dilated_small
        with quant.quantized("int8"):
            c = _conv(8, 3, jnp.float32, "c")
            assert c.conv_general_dilated is quant.conv_general_dilated_int8


def test_grad_flows_through_gated_path():
    x, k = _rand((1, 8, 8, 16)), _rand((3, 3, 16, 16), seed=1)

    def loss(k_):
        return _small(x, k_).sum()

    g = jax.grad(loss)(k)
    g_ref = jax.grad(lambda k_: _lax(x, k_).sum())(k)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
