"""Batch inference API + checkpoint overlay/surgery tests (CPU, tiny model)."""
import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from pbe_tpu.models.clip_vit import CLIPVisionConfig
from pbe_tpu.models.exemplar import ExemplarEncoderConfig
from pbe_tpu.models.pbe import PaintByExample
from pbe_tpu.models.unet import UNetConfig
from pbe_tpu.models.vae import AutoencoderKLConfig
from pbe_tpu.pipelines.batch import (
    infer_all,
    infer_one,
    load_mask_from_image_or_txt,
)
from pbe_tpu.pipelines.inference import EditPipeline


@pytest.fixture(scope="module")
def pipeline():
    model = PaintByExample(
        unet_config=UNetConfig(model_channels=8, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(1,),
                               num_heads=2, context_dim=768, use_checkpoint=False),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": 32},
            embed_dim=4),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=1024, num_layers=1, num_heads=2,
                                  mlp_dim=32, patch_size=32, image_size=224),
            mapper_layers=1),
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 1)),
        jnp.zeros((1, 224, 224, 3)), rng,
        method=PaintByExample.initialize_all,
    )
    return EditPipeline(model, variables)


def _write_assets(tmp_path, n=3):
    g = np.random.default_rng(0)
    for sub in ("img", "mask", "ref"):
        (tmp_path / sub).mkdir(exist_ok=True)
    for i in range(n):
        Image.fromarray(g.integers(0, 255, (32, 32, 3), np.uint8)).save(
            tmp_path / "img" / f"ex{i}.png")
        m = np.zeros((32, 32), np.uint8)
        m[8:24, 8:24] = 255  # white = edit region
        Image.fromarray(m, "L").save(tmp_path / "mask" / f"ex{i}.png")
        Image.fromarray(g.integers(0, 255, (48, 48, 3), np.uint8)).save(
            tmp_path / "ref" / f"ex{i}.jpg")
    return tmp_path


def test_load_mask_from_txt(tmp_path):
    p = tmp_path / "bbox.txt"
    p.write_text("4 8 12 20\n")
    mask = load_mask_from_image_or_txt(str(p), (32, 32))
    assert mask.shape == (32, 32, 1)
    assert mask[10, 6, 0] == 0.0  # inside bbox = edit = keep 0
    assert mask[0, 0, 0] == 1.0


def test_infer_one_and_all(pipeline, tmp_path):
    root = _write_assets(tmp_path)
    out = infer_one(
        pipeline, str(root / "img" / "ex0.png"), str(root / "mask" / "ex0.png"),
        str(root / "ref" / "ex0.jpg"), str(tmp_path / "out1"),
        size=(32, 32), steps=2, scale=5.0,
    )
    assert out.shape == (1, 32, 32, 3)
    assert (tmp_path / "out1" / "grid_ex0.png").exists()
    assert (tmp_path / "out1" / "pred_ex0.png").exists()

    n = infer_all(
        pipeline, str(root / "img"), str(root / "mask"), str(root / "ref"),
        str(tmp_path / "out2"), size=(32, 32), batch_size=2, steps=2,
    )
    assert n == 3
    assert len(list((tmp_path / "out2").glob("pred_*.png"))) == 3


def test_overlay_checkpoint_with_9ch_surgery(pipeline, tmp_path):
    from pbe_tpu.pipelines.loading import overlay_checkpoint

    # a 4-channel torch checkpoint (SD-style) for the tiny 9-ch model
    variables = pipeline.variables
    want = np.asarray(
        variables["params"]["model"]["input_blocks_0_0"]["kernel"])
    assert want.shape[2] == 9
    w4 = torch.randn(8, 4, 3, 3)
    sd = {
        "model.diffusion_model.input_blocks.0.0.weight": w4,
        "model.diffusion_model.input_blocks.0.0.bias": torch.randn(8),
        "learnable_vector": torch.randn(1, 1, 768),
        "betas": torch.zeros(10),
    }
    path = tmp_path / "sd4.ckpt"
    torch.save({"state_dict": sd}, path)
    new_vars = overlay_checkpoint(variables, str(path), verbose=False)
    got = np.asarray(new_vars["params"]["model"]["input_blocks_0_0"]["kernel"])
    assert got.shape == want.shape
    np.testing.assert_allclose(
        got[:, :, :4, :], np.transpose(w4.numpy(), (2, 3, 1, 0)), atol=1e-6)
    np.testing.assert_array_equal(got[:, :, 4:, :], 0.0)
    # untouched params keep their init values
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["proj_out"]["kernel"]),
        np.asarray(variables["params"]["proj_out"]["kernel"]))
