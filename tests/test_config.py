"""Config layer: reference v1.yaml loads unchanged; alias registry; dotlist."""
import pytest

from pbe_tpu import config as config_lib
from pbe_tpu.models.pbe import PaintByExampleConfig


def test_v1_yaml_loads_and_builds():
    raw = config_lib.load_config("configs/v1.yaml")
    model_cfg = config_lib.instantiate_from_config(raw["model"])
    assert isinstance(model_cfg, PaintByExampleConfig)
    assert model_cfg.scale_factor == 0.18215
    assert model_cfg.u_cond_percent == 0.2
    assert model_cfg.timesteps == 1000
    model = model_cfg.build()
    assert model.unet_config.model_channels == 320
    assert model.unet_config.in_channels == 9
    assert tuple(model.vae_config.ddconfig["ch_mult"]) == (1, 2, 4, 4)
    assert model.latent_downsample == 8
    # data section resolves to the data module
    dm = config_lib.instantiate_from_config(raw["data"])
    assert dm.batch_size == 4


def test_reference_target_aliases():
    fn = config_lib.get_obj_from_str(
        "ldm.modules.diffusionmodules.openaimodel.UNetModel")
    from pbe_tpu.models.unet import UNetConfig

    assert fn is UNetConfig
    # unaliased dotted paths resolve by import
    fn2 = config_lib.get_obj_from_str("pbe_tpu.models.unet.UNetConfig")
    assert fn2 is UNetConfig


def test_identity_loss_target():
    ident = config_lib.instantiate_from_config({"target": "torch.nn.Identity"})
    assert ident(42) == 42


def test_dotlist_types():
    cfg = {"a": {"b": 1}}
    config_lib.merge_dotlist(cfg, ["a.b=2.5", "a.c=true", "a.d=[1,2]", "a.e=text"])
    assert cfg["a"] == {"b": 2.5, "c": True, "d": [1, 2], "e": "text"}


def test_instantiate_rejects_missing_target():
    with pytest.raises(KeyError):
        config_lib.instantiate_from_config({"params": {}})
