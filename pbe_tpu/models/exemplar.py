"""Exemplar (reference-image) conditioning encoder.

Reference behavior (ldm/modules/encoders/modules.py:138-171 +
ldm/modules/encoders/xf.py:22-131): frozen CLIP ViT-L/14 vision tower ->
pooler_output (1024) -> unsqueeze to one token -> trainable 5-layer,
width-1024, 1-head transformer "mapper" -> trainable LayerNorm(1024).
Downstream, LatentDiffusion applies proj_out Linear(1024->768)
(latent_diffusion.py:111-112) — that projection lives on the PaintByExample
model here too, matching the reference parameter layout.

The mapper attends over exactly one token, so its attention simplifies
exactly to the value path: out = c_proj(v) where v is the value third of
c_qkv(x) (softmax over a single key is 1).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pbe_tpu.models.clip_vit import CLIPVisionConfig
from pbe_tpu.ops.norms import LayerNormF32


class MapperBlock(nn.Module):
    """xf.ResidualAttentionBlock specialized to n_ctx=1 (xf.py:80-101)."""

    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        h = LayerNormF32(name="ln_1")(x)
        qkv = dense(self.width * 3, "attn_c_qkv")(h)
        # single-token attention == value path (see module docstring)
        v = qkv[..., 2 * self.width:]
        x = x + dense(self.width, "attn_c_proj")(v)
        h = LayerNormF32(name="ln_2")(x)
        h = dense(self.width * 4, "mlp_c_fc")(h)
        h = nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        x = x + dense(self.width, "mlp_c_proj")(h)
        return x


class ExemplarEncoder(nn.Module):
    """CLIP tower + mapper + final LayerNorm -> (B, 1, 1024) token."""

    clip: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    mapper_layers: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """image: (B, 224, 224, 3) CLIP-normalized NHWC."""
        tower = self.clip.build(self.dtype, name="transformer")
        _, pooled = tower(image)
        x = pooled[:, None, :]  # one token
        for i in range(self.mapper_layers):
            x = MapperBlock(self.clip.hidden_size, self.dtype,
                            name=f"mapper_resblocks_{i}")(x)
        return LayerNormF32(name="final_ln")(x)


@dataclasses.dataclass
class ExemplarEncoderConfig:
    """cond_stage_config-compatible constructor (configs/v1.yaml:71-72)."""

    version: str = "openai/clip-vit-large-patch14"
    clip: CLIPVisionConfig | None = None
    mapper_layers: int = 5

    def __post_init__(self):
        if isinstance(self.clip, dict):  # YAML-provided override geometry
            self.clip = CLIPVisionConfig(**self.clip)

    def build(self, dtype: Any = jnp.float32) -> ExemplarEncoder:
        return ExemplarEncoder(
            clip=self.clip or CLIPVisionConfig(),
            mapper_layers=self.mapper_layers,
            dtype=dtype,
        )
