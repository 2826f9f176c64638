"""CLIP ViT vision tower (ViT-L/14 by default), JAX/flax implementation.

Behavioral spec: HuggingFace ``CLIPVisionModel`` as used by the reference's
FrozenCLIPImageEmbedder (ldm/modules/encoders/modules.py:138-171) — the PBE
conditioning consumes only ``pooler_output`` (post-layernormed CLS token).

openai/clip-vit-large-patch14 geometry: hidden 1024, 24 layers, 16 heads,
MLP 4096, patch 14, image 224 (257 positions incl. CLS), quick-GELU.

Param tree mirrors the HF state_dict ('.' -> '_', 'vision_model.' stripped)
for mechanical weight conversion.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pbe_tpu.ops.attention import multi_head_attention
from pbe_tpu.ops.norms import LayerNormF32


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        dense = lambda name: nn.Dense(
            dim, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        out = multi_head_attention(q, k, v, self.heads)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    heads: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = LayerNormF32(name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, self.dtype, name="self_attn")(h)
        h = LayerNormF32(name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """pixel_values NHWC (CLIP-normalized) -> (last_hidden_state, pooler_output)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 14
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        b = pixel_values.shape[0]
        num_pos = (self.image_size // self.patch_size) ** 2 + 1
        patches = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, self.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden_size,),
            jnp.float32,
        )
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (num_pos, self.hidden_size), jnp.float32,
        )
        x = x + pos.astype(self.dtype)[None]
        x = LayerNormF32(name="pre_layrnorm")(x)  # HF spells it this way
        for i in range(self.num_layers):
            x = CLIPEncoderLayer(
                self.num_heads, self.mlp_dim, self.dtype, name=f"layers_{i}"
            )(x)
        pooled = LayerNormF32(name="post_layernorm")(x[:, 0])
        return x, pooled


@dataclasses.dataclass
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 14
    image_size: int = 224

    def build(self, dtype: Any = jnp.float32, name: str | None = None) -> CLIPVisionTower:
        return CLIPVisionTower(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            patch_size=self.patch_size,
            image_size=self.image_size,
            dtype=dtype,
            name=name,
        )
