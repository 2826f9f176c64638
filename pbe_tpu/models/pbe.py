"""PaintByExample — the product model.

Reassembles the reference's LatentDiffusion for PBE
(ldm/models/diffusion/latent_diffusion.py:85-135, 255-276, 371-442, 617-634,
763-809) as one flax module + pure helper functions:

  * frozen KL-VAE first stage, scale_factor=0.18215 (v1.yaml:18)
  * frozen CLIP ViT-L/14 trunk + trainable mapper/final_ln exemplar encoder
  * trainable proj_out Linear(1024->768) and learnable unconditional vector
    (1,1,768) for classifier-free guidance (latent_diffusion.py:111-112)
  * 9-channel latent assembly z_new = [z, z_inpaint, mask@latent-res]
    (latent_diffusion.py:383-390)
  * eps-parameterized DDPM with 1000-step linear(sqrt) beta schedule

All tensors NHWC. Everything here is functional: params flow through
``.apply``; PRNG keys are explicit.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pbe_tpu import config as config_lib
from pbe_tpu.models.exemplar import ExemplarEncoderConfig
from pbe_tpu.models.unet import UNetConfig
from pbe_tpu.models.vae import AutoencoderKLConfig, sample_diagonal_gaussian
from pbe_tpu.ops.image import resize_nhwc
from pbe_tpu.schedules import DiffusionSchedule


class PaintByExample(nn.Module):
    unet_config: UNetConfig
    vae_config: AutoencoderKLConfig
    cond_config: ExemplarEncoderConfig
    scale_factor: float = 0.18215
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    u_cond_percent: float = 0.2
    parameterization: str = "eps"
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False

    @property
    def latent_downsample(self) -> int:
        """Image->latent spatial factor (8 for the v1 VAE: 2^(len(ch_mult)-1))."""
        return 2 ** (len(self.vae_config.ddconfig.get("ch_mult", (1, 2, 4, 4))) - 1)

    @property
    def schedule(self) -> DiffusionSchedule:
        return DiffusionSchedule.create(
            timesteps=self.timesteps,
            beta_schedule="linear",
            linear_start=self.linear_start,
            linear_end=self.linear_end,
            parameterization=self.parameterization,
        )

    def setup(self):
        # names mirror the torch state_dict roots: model.diffusion_model.*,
        # first_stage_model.*, cond_stage_model.*, proj_out.*, learnable_vector
        self.model = self.unet_config.build(
            dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat
        )
        self.first_stage_model = self.vae_config.build(
            dtype=self.dtype, attn_impl=self.attn_impl
        )
        self.cond_stage_model = self.cond_config.build(dtype=self.dtype)
        self.proj_out = nn.Dense(
            768, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out"
        )
        self.learnable_vector = self.param(
            "learnable_vector", nn.initializers.normal(1.0), (1, 1, 768), jnp.float32
        )

    # ---- first stage -----------------------------------------------------
    def encode_moments(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """x NHWC [-1,1] -> VAE posterior (mean, logvar)."""
        return self.first_stage_model.encode(x)

    def encode_first_stage(self, x: jnp.ndarray, rng: jax.Array | None = None) -> jnp.ndarray:
        """Sampled, scale-factored latent (latent_diffusion.py:255-262).

        With rng=None uses the posterior mode (deterministic)."""
        mean, logvar = self.first_stage_model.encode(x)
        z = mean if rng is None else sample_diagonal_gaussian(rng, mean, logvar)
        return self.scale_factor * z

    def decode_first_stage(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.first_stage_model.decode(z / self.scale_factor)

    # ---- fold/unfold tiled first stage (split_input_params path) ----------
    def encode_first_stage_tiled(self, x: jnp.ndarray, spec) -> jnp.ndarray:
        """Tiled deterministic encode for resolutions beyond one-shot VAE
        memory (latent_diffusion.py:571-610 split path). spec: a
        pbe_tpu.ops.tiling.TilingSpec with ks/stride in IMAGE pixels,
        divisible by the latent downsample factor."""
        from pbe_tpu.ops.tiling import tiled_apply

        f = self.latent_downsample
        return tiled_apply(
            lambda p: self.scale_factor * self.first_stage_model.encode(p)[0],
            x, spec, df=f,
        )

    def decode_first_stage_tiled(self, z: jnp.ndarray, spec) -> jnp.ndarray:
        """Tiled decode (latent_diffusion.py:444-508 split path). spec
        ks/stride in LATENT pixels."""
        from pbe_tpu.ops.tiling import tiled_apply

        return tiled_apply(
            lambda p: self.first_stage_model.decode(p / self.scale_factor),
            z, spec, uf=self.latent_downsample,
        )

    # ---- conditioning ----------------------------------------------------
    def get_conditioning(self, ref: jnp.ndarray) -> jnp.ndarray:
        """ref: (B,224,224,3) CLIP-normalized -> (B,1,768) context token
        (get_learned_conditioning + proj_out, latent_diffusion.py:264-276,624-625)."""
        c = self.cond_stage_model(ref)
        return self.proj_out(c)

    def uncond_vector(self, batch: int) -> jnp.ndarray:
        return jnp.broadcast_to(
            self.learnable_vector.astype(self.dtype), (batch, 1, 768)
        )

    # ---- diffusion backbone ----------------------------------------------
    def apply_model(self, x9: jnp.ndarray, t: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """UNet eps-prediction on the 9-channel latent (NHWC)."""
        return self.model(x9, t, context)

    def __call__(self, x9: jnp.ndarray, t: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        return self.apply_model(x9, t, context)

    # ---- latent assembly ---------------------------------------------------
    def prepare_latents(
        self,
        image: jnp.ndarray,
        inpaint_image: jnp.ndarray,
        mask: jnp.ndarray,
        rng: jax.Array | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(z, z_inpaint, mask_latent) per latent_diffusion.py:383-390.

        image/inpaint_image: NHWC [-1,1]; mask: (B,H,W,1) in {0,1} where 1
        keeps source pixels. mask is bilinearly resized to the latent grid.
        """
        r1, r2 = (None, None) if rng is None else jax.random.split(rng)
        z = self.encode_first_stage(image, r1)
        z_inpaint = self.encode_first_stage(inpaint_image, r2)
        mask_latent = resize_nhwc(mask, z.shape[1:3], method="bilinear")
        return z, z_inpaint, mask_latent.astype(z.dtype)

    def initialize_all(
        self,
        image: jnp.ndarray,
        mask: jnp.ndarray,
        ref: jnp.ndarray,
        rng: jax.Array,
    ) -> jnp.ndarray:
        """Touches every submodule once so .init builds the full param tree."""
        z, z_inpaint, m = self.prepare_latents(image, image * mask, mask, rng)
        c = self.get_conditioning(ref)
        _ = self.uncond_vector(image.shape[0])
        x9 = jnp.concatenate([z, z_inpaint, m], axis=-1)
        t = jnp.zeros((image.shape[0],), jnp.int32)
        eps = self.apply_model(x9, t, c)
        return self.decode_first_stage(z[..., :4] + 0.0 * eps)


@dataclasses.dataclass
class PaintByExampleConfig:
    """configs/v1.yaml ``model.params``-compatible constructor."""

    unet_config: dict | UNetConfig = None
    first_stage_config: dict | AutoencoderKLConfig = None
    cond_stage_config: dict | ExemplarEncoderConfig = None
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    timesteps: int = 1000
    num_timesteps_cond: int = 1
    log_every_t: int = 200
    first_stage_key: str = "inpaint"
    cond_stage_key: str = "image"
    image_size: int = 64
    channels: int = 4
    cond_stage_trainable: bool = True
    conditioning_key: str = "crossattn"
    monitor: str = "val/loss_simple_ema"
    u_cond_percent: float = 0.2
    scale_factor: float = 0.18215
    use_ema: bool = False
    scheduler_config: dict | None = None
    base_learning_rate: float = 1.0e-05

    def _sub(self, cfg, default_cls):
        if cfg is None:
            return default_cls()
        if isinstance(cfg, dict):
            return config_lib.instantiate_from_config(cfg)
        return cfg

    def build(self, dtype: Any = jnp.float32, attn_impl: str = "xla",
              remat: bool | None = None) -> PaintByExample:
        unet = self._sub(self.unet_config, UNetConfig)
        vae = self._sub(
            self.first_stage_config,
            lambda: AutoencoderKLConfig(ddconfig={
                "double_z": True, "z_channels": 4, "resolution": 256,
                "in_channels": 3, "out_ch": 3, "ch": 128,
                "ch_mult": [1, 2, 4, 4], "num_res_blocks": 2,
                "attn_resolutions": [], "dropout": 0.0,
            }),
        )
        cond = self._sub(self.cond_stage_config, ExemplarEncoderConfig)
        return PaintByExample(
            unet_config=unet,
            vae_config=vae,
            cond_config=cond,
            scale_factor=self.scale_factor,
            timesteps=self.timesteps,
            linear_start=self.linear_start,
            linear_end=self.linear_end,
            u_cond_percent=self.u_cond_percent,
            dtype=dtype,
            attn_impl=attn_impl,
            remat=bool(remat) if remat is not None else False,
        )


def build_from_yaml(path: str, dtype: Any = jnp.float32, attn_impl: str = "xla",
                    remat: bool | None = None) -> tuple[PaintByExample, dict]:
    """Load a configs/v1.yaml-style file and build the model."""
    raw = config_lib.load_config(path)
    model_cfg = config_lib.instantiate_from_config(raw["model"])
    return model_cfg.build(dtype=dtype, attn_impl=attn_impl, remat=remat), raw
