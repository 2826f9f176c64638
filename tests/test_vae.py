"""Shape/behavior tests for the KL-VAE (tiny geometry for CPU speed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbe_tpu.models.vae import (
    AutoencoderKL,
    AutoencoderKLConfig,
    diagonal_gaussian_kl,
    sample_diagonal_gaussian,
)

TINY = dict(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=3, embed_dim=3)


@pytest.fixture(scope="module")
def tiny_vae():
    vae = AutoencoderKL(**TINY)
    x = jnp.zeros((1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(0), x, sample=False)
    return vae, params


def test_encode_shape_and_downsample_factor(tiny_vae):
    vae, params = tiny_vae
    x = jnp.ones((2, 16, 16, 3))
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    # len(ch_mult)-1 downsamples -> /2
    assert mean.shape == (2, 8, 8, TINY["embed_dim"])
    assert logvar.shape == mean.shape
    assert np.all(np.asarray(logvar) >= -30.0) and np.all(np.asarray(logvar) <= 20.0)


def test_decode_roundtrip_shape(tiny_vae):
    vae, params = tiny_vae
    z = jnp.ones((2, 8, 8, TINY["z_channels"]))
    out = vae.apply(params, z, method=AutoencoderKL.decode)
    assert out.shape == (2, 16, 16, 3)


def test_sample_statistics(rng):
    mean = jnp.full((4, 8, 8, 4), 2.0)
    logvar = jnp.zeros((4, 8, 8, 4))
    z = sample_diagonal_gaussian(rng, mean, logvar)
    assert abs(float(z.mean()) - 2.0) < 0.1
    assert abs(float(z.std()) - 1.0) < 0.1


def test_kl_zero_for_standard_normal():
    mean = jnp.zeros((2, 4, 4, 4))
    logvar = jnp.zeros_like(mean)
    np.testing.assert_allclose(np.asarray(diagonal_gaussian_kl(mean, logvar)), 0.0)


def test_config_builds_v1_geometry():
    cfg = AutoencoderKLConfig(
        ddconfig={
            "double_z": True, "z_channels": 4, "resolution": 256,
            "in_channels": 3, "out_ch": 3, "ch": 128,
            "ch_mult": [1, 2, 4, 4], "num_res_blocks": 2,
            "attn_resolutions": [], "dropout": 0.0,
        },
        embed_dim=4,
    )
    vae = cfg.build()
    assert vae.ch == 128 and vae.ch_mult == (1, 2, 4, 4) and vae.embed_dim == 4


def test_vae_is_translation_consistent(tiny_vae, rng):
    """Fully-convolutional: doubling spatial size doubles latent size."""
    vae, params = tiny_vae
    x = jax.random.normal(rng, (1, 32, 32, 3))
    mean, _ = vae.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 16, 16, TINY["embed_dim"])
