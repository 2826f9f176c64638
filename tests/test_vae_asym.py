"""Detail-preserving decode (vae_asym): paste_back exactness, feathering,
and the AsymmetricDecoder's plain-decoder-equivalence at zero-init gates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbe_tpu.models.vae import Decoder
from pbe_tpu.models.vae_asym import (
    AsymmetricDecoder,
    AsymmetricDecoderConfig,
    feather_mask,
    paste_back,
)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)


def _mask(n=1, hw=32, keep_border=True):
    m = np.zeros((n, hw, hw, 1), np.float32)
    if keep_border:
        m[:] = 1.0
        m[:, 8:24, 8:24] = 0.0  # edit the center square
    return m


def test_paste_back_hard_composite_exact(np_rng):
    decoded = np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    original = np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = _mask()
    out = np.asarray(paste_back(jnp.asarray(decoded), jnp.asarray(original),
                                jnp.asarray(mask), feather=0))
    np.testing.assert_array_equal(out[mask[..., 0] == 1.0],
                                  original[mask[..., 0] == 1.0])
    np.testing.assert_array_equal(out[mask[..., 0] == 0.0],
                                  decoded[mask[..., 0] == 0.0])


def test_paste_back_feather_keeps_mask1_exact_and_blends_interior(np_rng):
    decoded = np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    original = np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = _mask()
    out = np.asarray(paste_back(jnp.asarray(decoded), jnp.asarray(original),
                                jnp.asarray(mask), feather=4))
    # one-sided feather: every keep pixel is still bit-exact original
    np.testing.assert_array_equal(out[mask[..., 0] == 1.0],
                                  original[mask[..., 0] == 1.0])
    # just inside the edit boundary the result is a genuine blend...
    edge = out[0, 8, 8:24]
    assert not np.array_equal(edge, decoded[0, 8, 8:24])
    # ...while the deep interior of the edit region is pure decode
    np.testing.assert_array_equal(out[0, 14:18, 14:18], decoded[0, 14:18, 14:18])


def test_feather_mask_monotone_band():
    m = jnp.asarray(_mask())
    f = np.asarray(feather_mask(m, radius=3))
    assert f.min() >= 0.0 and f.max() <= 1.0
    # weights inside the edit region near the boundary are in (0, 1)
    assert 0.0 < f[0, 9, 9, 0] < 1.0
    # deep edit interior remains 0
    assert f[0, 16, 16, 0] == 0.0


GEOM = dict(ch=8, out_ch=3, ch_mult=(1, 2), num_res_blocks=1)


def test_asym_decoder_equals_plain_decoder_at_zero_gates(np_rng):
    """Trunk names match vae.Decoder byte-for-byte, and the zero-init
    blend_scale gates make the conditional branch a no-op: loading a plain
    checkpoint's trunk must reproduce the plain decode exactly."""
    z = jnp.asarray(np_rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    cond = jnp.asarray(np_rng.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    mask = jnp.asarray(_mask(hw=16))

    plain = Decoder(**GEOM)
    pvars = plain.init(jax.random.PRNGKey(0), z)
    asym = AsymmetricDecoder(**GEOM, cond_ch=4)
    avars = asym.init(jax.random.PRNGKey(1), z, cond, mask)

    # graft the plain trunk into the asym params (shared module names)
    aparams = dict(avars["params"])
    for k, v in pvars["params"].items():
        assert k in aparams, f"trunk module {k} missing from AsymmetricDecoder"
        aparams[k] = v
    got = asym.apply({"params": aparams}, z, cond, mask)
    want = plain.apply(pvars, z)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_asym_decoder_uses_condition_when_gates_open(np_rng):
    z = jnp.asarray(np_rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    cond = jnp.asarray(np_rng.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    mask = jnp.asarray(_mask(hw=16))
    asym = AsymmetricDecoder(**GEOM, cond_ch=4)
    avars = asym.init(jax.random.PRNGKey(1), z, cond, mask)

    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.ones_like(p)
        if "blend_scale" in jax.tree_util.keystr(path) else p,
        avars["params"])
    base = asym.apply(avars, z, cond, mask)
    open_ = asym.apply({"params": params}, z, cond, mask)
    assert np.abs(np.asarray(open_) - np.asarray(base)).max() > 1e-6
    # changing the condition image changes the output only via the branch
    open2 = asym.apply({"params": params}, z, cond * 0.5, mask)
    assert np.abs(np.asarray(open2) - np.asarray(open_)).max() > 1e-6
    base2 = asym.apply(avars, z, cond * 0.5, mask)
    np.testing.assert_array_equal(np.asarray(base2), np.asarray(base))


def test_asym_decoder_jits_and_config_builds(np_rng):
    cfg = AsymmetricDecoderConfig(
        ddconfig={"ch": 8, "out_ch": 3, "ch_mult": [1, 2],
                  "num_res_blocks": 1, "z_channels": 4}, cond_ch=4)
    asym = cfg.build()
    z = jnp.asarray(np_rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    cond = jnp.asarray(np_rng.uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    mask = jnp.asarray(np.concatenate([_mask(hw=16), _mask(hw=16)]))
    avars = asym.init(jax.random.PRNGKey(0), z, cond, mask)
    out = jax.jit(asym.apply)(avars, z, cond, mask)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
