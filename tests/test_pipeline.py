"""End-to-end EditPipeline on a tiny model (CPU): shapes, determinism,
mask/x_T plumbing, sampler/steps cache behavior."""
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


@pytest.fixture(scope="module")
def pipeline():
    model = PaintByExample(
        unet_config=UNetConfig(model_channels=8, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(1,),
                               num_heads=2, context_dim=768, use_checkpoint=False),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 8, "ch_mult": [1, 2, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": 32},
            embed_dim=4),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=1024, num_layers=1, num_heads=4,
                                  mlp_dim=32, patch_size=8, image_size=32),
            mapper_layers=1),
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 1)),
        jnp.zeros((1, 32, 32, 3)), rng,
        method=PaintByExample.initialize_all,
    )
    # perturb the zero-init UNet head so eps is non-trivial
    variables = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0).standard_normal(p.shape)
        .astype(np.float32), variables)
    return EditPipeline(model, variables)


def _inputs(b=1):
    g = np.random.default_rng(0)
    image = g.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32)
    mask = np.ones((b, 32, 32, 1), np.float32)
    mask[:, 8:24, 8:24] = 0.0
    ref = g.standard_normal((b, 32, 32, 3)).astype(np.float32)
    return image, mask, ref


def test_edit_shapes_and_range(pipeline):
    image, mask, ref = _inputs()
    out = pipeline.edit_batch(image, mask, ref, steps=3, scale=5.0, seed=1)
    assert out.shape == (1, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()


def test_edit_deterministic_given_seed(pipeline):
    image, mask, ref = _inputs()
    a = pipeline.edit_batch(image, mask, ref, steps=3, seed=7)
    b = pipeline.edit_batch(image, mask, ref, steps=3, seed=7)
    c = pipeline.edit_batch(image, mask, ref, steps=3, seed=8)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_scale_change_does_not_recompile(pipeline):
    image, mask, ref = _inputs()
    pipeline.edit_batch(image, mask, ref, steps=3, scale=1.5, seed=1)
    n_compiled = len(pipeline._fns)
    out2 = pipeline.edit_batch(image, mask, ref, steps=3, scale=9.0, seed=1)
    assert len(pipeline._fns) == n_compiled
    assert np.isfinite(out2).all()


def test_ddim_and_plms_both_run(pipeline):
    image, mask, ref = _inputs()
    a = pipeline.edit_batch(image, mask, ref, steps=4, sampler="plms", seed=1)
    b = pipeline.edit_batch(image, mask, ref, steps=4, sampler="ddim", seed=1)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 0  # different integrators


def test_fixed_code_reproducible(pipeline):
    image, mask, ref = _inputs()
    x_T = np.random.default_rng(3).standard_normal((1, 8, 8, 4)).astype(np.float32)
    a = pipeline.edit_batch(image, mask, ref, steps=3, x_T=x_T, seed=1)
    b = pipeline.edit_batch(image, mask, ref, steps=3, x_T=x_T, seed=1)
    np.testing.assert_array_equal(a, b)


def test_ddpm_ancestral_sampler_in_pipeline(pipeline):
    image, mask, ref = _inputs()
    # tiny model has timesteps=1000 by default; use a short-chain model copy
    import dataclasses

    short = dataclasses.replace(pipeline.model, timesteps=8)
    from pbe_tpu.pipelines.inference import EditPipeline

    p = EditPipeline(short, pipeline.variables)
    out = p.edit_batch(image, mask, ref, steps=8, sampler="ddpm", seed=3)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_paste_back_preserves_unmasked_pixels(pipeline):
    image, mask, ref = _inputs()
    out = pipeline.edit_batch(image, mask, ref, steps=3, seed=1, paste_back=2)
    plain = pipeline.edit_batch(image, mask, ref, steps=3, seed=1)
    src01 = (image + 1.0) / 2.0
    keep = mask[0, ..., 0] == 1.0
    # mask==1 pixels are the original source, bit-exact (fp32 composite)
    np.testing.assert_allclose(out[0][keep], src01[0][keep], atol=1e-6)
    # the deep edit interior is untouched by the feather
    np.testing.assert_array_equal(out[0, 14:18, 14:18], plain[0, 14:18, 14:18])


def test_tiled_pipeline_single_crop_matches_untiled(pipeline):
    # a ks == latent tiling has one crop: the stitch is fn(x)*w/w, so the
    # tiled program must reproduce the untiled edit to fp noise
    from pbe_tpu.ops.tiling import TilingSpec
    from pbe_tpu.pipelines.inference import EditPipeline

    image, mask, ref = _inputs()
    tiled = EditPipeline(pipeline.model, pipeline.variables,
                         tiling=TilingSpec(ks=(8, 8), stride=(8, 8)))
    kw = dict(steps=3, scale=5.0, seed=1, det_first_stage=True)
    a = pipeline.edit_batch(image, mask, ref, **kw)
    b = tiled.edit_batch(image, mask, ref, **kw)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_tiled_pipeline_overlapping_runs_and_is_deterministic(pipeline):
    # 4x4 crops at stride 2 over the 8x8 latent (9 crops, reference
    # split_input_params semantics latent_diffusion.py:656-736): per-crop
    # attention differs from global attention, so only mechanics +
    # determinism are asserted here; quality deltas are measured at
    # production geometry by scripts/bench_tiling_seams.py (PERF.md §6)
    from pbe_tpu.ops.tiling import TilingSpec
    from pbe_tpu.pipelines.inference import EditPipeline

    image, mask, ref = _inputs()
    tiled = EditPipeline(pipeline.model, pipeline.variables,
                         tiling=TilingSpec(ks=(4, 4), stride=(2, 2)))
    kw = dict(steps=3, scale=5.0, seed=1, det_first_stage=True)
    a = tiled.edit_batch(image, mask, ref, **kw)
    b = tiled.edit_batch(image, mask, ref, **kw)
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    plain = pipeline.edit_batch(image, mask, ref, **kw)
    assert np.abs(a - plain).max() > 0  # it really changed the math
