"""Trainer loop: fit a few steps on synthetic data, checkpoint, resume."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pbe_tpu.data.loader import DataLoader
from pbe_tpu.data.openimages import OpenImagesDataset
from pbe_tpu.models.clip_vit import CLIPVisionConfig
from pbe_tpu.models.exemplar import ExemplarEncoderConfig
from pbe_tpu.models.pbe import PaintByExample
from pbe_tpu.models.unet import UNetConfig
from pbe_tpu.models.vae import AutoencoderKLConfig
from pbe_tpu.training.trainer import Trainer


def _tiny_model():
    return PaintByExample(
        unet_config=UNetConfig(model_channels=8, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(1,),
                               num_heads=2, context_dim=768, use_checkpoint=False),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": 16},
            embed_dim=4),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=1024, num_layers=1, num_heads=4,
                                  mlp_dim=32, patch_size=8, image_size=224),
            mapper_layers=1),
    )


class SyntheticDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        g = np.random.default_rng(i)
        image = g.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
        mask = np.ones((16, 16, 1), np.float32)
        mask[4:12, 4:12] = 0.0
        return {
            "image": image, "inpaint_image": image * mask, "mask": mask,
            "ref": g.standard_normal((224, 224, 3)).astype(np.float32),
        }


def test_fit_checkpoint_resume(tmp_path):
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 16, 16, 3)), jnp.ones((1, 16, 16, 1)),
        jnp.zeros((1, 224, 224, 3)), rng,
        method=PaintByExample.initialize_all,
    )
    loader = DataLoader(SyntheticDataset(), batch_size=4, shuffle=True,
                        num_workers=2)
    logdir = str(tmp_path / "run")
    trainer = Trainer(model, variables, base_lr=1e-4, logdir=logdir,
                      zero_shard=False, num_devices=4)
    trainer.fit(loader, val_loader=loader, max_steps=4, log_every=2,
                val_every=2, ckpt_every=2)
    assert int(trainer.state.step) == 4
    # metrics written
    lines = [json.loads(l) for l in open(trainer.logger.path)]
    assert any("train/loss" in l for l in lines)
    assert any("val/loss_simple" in l for l in lines)
    # checkpoints saved
    assert trainer.ckpt_mgr.latest_step() is not None

    # resume into a fresh trainer
    trainer2 = Trainer(model, variables, base_lr=1e-4, logdir=logdir,
                       zero_shard=False, num_devices=4)
    assert trainer2.restore()
    assert int(trainer2.state.step) == trainer.ckpt_mgr.latest_step()
    p_old = jax.tree.leaves(trainer.state.params)[0]
    p_new = jax.tree.leaves(trainer2.state.params)[0]
    assert p_old.shape == p_new.shape


def test_log_images(tmp_path):
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 16, 16, 3)), jnp.ones((1, 16, 16, 1)),
        jnp.zeros((1, 224, 224, 3)), rng,
        method=PaintByExample.initialize_all,
    )
    trainer = Trainer(model, variables, base_lr=1e-4,
                      logdir=str(tmp_path / "run"), zero_shard=False,
                      num_devices=1)
    ds = SyntheticDataset()
    batch = {k: np.stack([ds[i][k] for i in range(2)]) for k in ds[0]}
    preds = trainer.log_images(batch, steps=2)
    assert preds.shape == (2, 16, 16, 3)
    import glob
    outs = glob.glob(str(tmp_path / "run" / "samples" / "*" / "grid_*.png"))
    assert len(outs) == 2


def test_fit_samples_images_and_fid(tmp_path):
    """VERDICT item: log_images + FIDTrioTracker wired into Trainer.fit on
    the validation cadence (main.py:287-295, callback_fid.py:146-189)."""
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 16, 16, 3)), jnp.ones((1, 16, 16, 1)),
        jnp.zeros((1, 224, 224, 3)), rng,
        method=PaintByExample.initialize_all,
    )
    loader = DataLoader(SyntheticDataset(), batch_size=4, shuffle=False,
                        num_workers=2)
    trainer = Trainer(model, variables, base_lr=1e-4,
                      logdir=str(tmp_path / "run"), zero_shard=False,
                      num_devices=1)

    # cheap stand-in feature fn (production: jitted InceptionV3 pool3)
    def feature_fn(x01):
        small = jax.image.resize(x01, (x01.shape[0], 4, 4, 3), "bilinear")
        return small.reshape(x01.shape[0], -1)

    trainer.fit(loader, val_loader=loader, max_steps=2, log_every=1,
                val_every=2, ckpt_every=2, sample_images=True,
                fid_feature_fn=feature_fn, fid_batches=2, sample_steps=2)

    import glob
    grids = glob.glob(str(tmp_path / "run" / "samples" / "*" / "grid_*.png"))
    assert len(grids) >= 4  # 2 batches x 4 examples... at least one round
    lines = [json.loads(l) for l in open(trainer.logger.path)]
    fid_rows = [l for l in lines if "val/fid_global" in l]
    assert fid_rows, "val/fid_* not logged to the JSONL stream"
    for k in ("val/fid_global", "val/fid_local", "val/fid_ref"):
        assert np.isfinite(fid_rows[-1][k])


def test_pad_ragged_pads_and_weights():
    from pbe_tpu.training.trainer import Trainer

    g = np.random.default_rng(0)
    arrays = {"image": g.uniform(size=(3, 8, 8, 3)).astype(np.float32),
              "mask": np.ones((3, 8, 8, 1), np.float32)}
    out = Trainer._pad_ragged(dict(arrays), 8)
    assert out["image"].shape[0] == 8
    np.testing.assert_array_equal(out["image"][:3], arrays["image"])
    # padding repeats the last row
    np.testing.assert_array_equal(out["image"][3], arrays["image"][2])
    np.testing.assert_array_equal(
        out["weight"], np.array([1, 1, 1, 0, 0, 0, 0, 0], np.float32))
    # divisible batches still get an (all-ones) weight so the jit signature
    # is stable across full and ragged batches
    full = Trainer._pad_ragged({"image": arrays["image"][:2]}, 2)
    assert full["image"].shape[0] == 2
    np.testing.assert_array_equal(full["weight"], np.ones(2, np.float32))
