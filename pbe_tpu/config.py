"""Config system: YAML files with ``target:`` / ``params:`` dependency injection.

Keeps the public surface of the reference's configs/v1.yaml intact: the same
YAML loads here, with the reference's dotted ``target`` strings transparently
remapped onto this package's registry (ref engine: ldm/util.py:78-93).

CLI dotlist overrides (``model.params.timesteps=500``) are supported the same
way OmegaConf's ``from_dotlist`` merge was used at main.py:217-219.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable

import yaml

# Reference target strings -> pbe_tpu equivalents. Anything not listed resolves
# via normal dotted import so user-extended configs keep working.
_TARGET_ALIASES: dict[str, str] = {
    # model layer (ddpm.LatentDiffusion is the v1.yaml spelling; the fork moved
    # the class to latent_diffusion.py -- both map to our PaintByExample).
    "ldm.models.diffusion.ddpm.LatentDiffusion": "pbe_tpu.models.pbe.PaintByExampleConfig",
    "ldm.models.diffusion.latent_diffusion.LatentDiffusion": "pbe_tpu.models.pbe.PaintByExampleConfig",
    "ldm.modules.diffusionmodules.openaimodel.UNetModel": "pbe_tpu.models.unet.UNetConfig",
    "ldm.modules.diffusionmodules.openaimodel.EncoderUNetModel": "pbe_tpu.models.encoder_unet.EncoderUNetConfig",
    "ldm.models.autoencoder.AutoencoderKL": "pbe_tpu.models.vae.AutoencoderKLConfig",
    "ldm.modules.encoders.modules.FrozenCLIPImageEmbedder": "pbe_tpu.models.exemplar.ExemplarEncoderConfig",
    # legacy SD text/conditioning encoders (x_transformer path)
    "ldm.modules.encoders.modules.BERTEmbedder": "pbe_tpu.models.text_transformer.BERTEmbedderConfig",
    "ldm.modules.encoders.modules.TransformerEmbedder": "pbe_tpu.models.text_transformer.TransformerEmbedderConfig",
    "ldm.modules.encoders.modules.ClassEmbedder": "pbe_tpu.models.text_transformer.ClassEmbedder",
    "ldm.modules.encoders.modules.SpatialRescaler": "pbe_tpu.models.text_transformer.SpatialRescaler",
    "torch.nn.Identity": "pbe_tpu.config.Identity",
    # schedulers
    "ldm.lr_scheduler.LambdaLinearScheduler": "pbe_tpu.training.lr_schedule.LambdaLinearScheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler": "pbe_tpu.training.lr_schedule.LambdaWarmUpCosineScheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler2": "pbe_tpu.training.lr_schedule.LambdaWarmUpCosineScheduler2",
    # data layer
    "ldm.data.open-images.OpenImageDataset": "pbe_tpu.data.openimages.OpenImagesDataset",
    "ldm.data.open-images.PBEQuadrupleDataset": "pbe_tpu.data.quadruple.QuadrupleDataset",
    "ldm.data.test_bench_dataset.COCOImageDataset": "pbe_tpu.data.test_bench.COCOEEDataset",
    "main.DataModuleFromConfig": "pbe_tpu.data.loader.DataModuleConfig",
    # legacy SD datasets
    "ldm.data.imagenet.ImageNetTrain": "pbe_tpu.data.legacy.ImageNetTrain",
    "ldm.data.imagenet.ImageNetValidation": "pbe_tpu.data.legacy.ImageNetValidation",
    "ldm.data.imagenet.ImageNetSRTrain": "pbe_tpu.data.legacy.ImageNetSRTrain",
    "ldm.data.imagenet.ImageNetSRValidation": "pbe_tpu.data.legacy.ImageNetSRValidation",
    "ldm.data.lsun.LSUNChurchesTrain": "pbe_tpu.data.legacy.LSUNChurchesTrain",
    "ldm.data.lsun.LSUNChurchesValidation": "pbe_tpu.data.legacy.LSUNChurchesValidation",
    "ldm.data.lsun.LSUNBedroomsTrain": "pbe_tpu.data.legacy.LSUNBedroomsTrain",
    "ldm.data.lsun.LSUNBedroomsValidation": "pbe_tpu.data.legacy.LSUNBedroomsValidation",
    "ldm.data.lsun.LSUNCatsTrain": "pbe_tpu.data.legacy.LSUNCatsTrain",
    "ldm.data.lsun.LSUNCatsValidation": "pbe_tpu.data.legacy.LSUNCatsValidation",
}


class Identity:
    """Stand-in for torch.nn.Identity in lossconfig (configs/v1.yaml:68-69)."""

    def __init__(self, *args: Any, **kwargs: Any):
        pass

    def __call__(self, x: Any) -> Any:
        return x


def get_obj_from_str(string: str) -> Callable[..., Any]:
    string = _TARGET_ALIASES.get(string, string)
    module, cls = string.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def instantiate_from_config(config: dict[str, Any]) -> Any:
    if not isinstance(config, dict) or "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return config
        raise KeyError(f"Expected a dict with a `target` key, got: {config!r}")
    return get_obj_from_str(config["target"])(**config.get("params", {}))


def load_config(path: str) -> dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def _parse_scalar(s: str) -> Any:
    return yaml.safe_load(s)


def merge_dotlist(config: dict[str, Any], dotlist: list[str]) -> dict[str, Any]:
    """Apply ``a.b.c=value`` overrides in place, returning the config."""
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not of the form key=value")
        key, value = item.split("=", 1)
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_scalar(value)
    return config
