"""VGG16 perceptual (LPIPS-style) feature loss for VAE-GAN training.

Behavioral reference: the LPIPS perceptual term inside the reference's
LPIPSWithDiscriminator (ldm/modules/losses/contperceptual.py:7-60, via the
external `taming.modules.losses.LPIPS`): a VGG16 feature stack evaluated at
relu{1_2, 2_2, 3_3, 4_3, 5_3}, channel-unit-normalized, squared-difference,
spatially averaged, summed over layers, returned per-sample so it broadcasts
onto the elementwise reconstruction loss.

TPU-native design: the tower is a flax module (NHWC, fp32) whose weights are
converted from a torchvision VGG16 state_dict on the host — this zero-egress
image cannot fetch pretrained weights, so the conversion path is the product
surface (same pattern as pbe_tpu.convert for the PBE checkpoint) and any
VGG16 .pth a user supplies works. LPIPS's learned linear layer weights are
optional; without them layers are weighted 1.0 (the standard "VGG perceptual
loss").

Input convention: images in [-1, 1], scaled by LPIPS's ScalingLayer constants
(shift/scale below) exactly as taming's LPIPS does.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv indices, grouped by block; a 2x2 maxpool
# follows each block. Feature taps are the last relu of each block.
_BLOCKS: tuple[tuple[int, ...], ...] = ((0, 2), (5, 7), (10, 12, 14),
                                        (17, 19, 21), (24, 26, 28))
_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS ScalingLayer constants (maps [-1,1] inputs to VGG's expected stats)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the five LPIPS feature taps (NHWC)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        h = (x - _SHIFT) / _SCALE
        taps = []
        for b, (idxs, ch) in enumerate(zip(_BLOCKS, _CHANNELS)):
            if b:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for i in idxs:
                h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv_{i}")(h)
                h = nn.relu(h)
            taps.append(h)
        return taps


def convert_torchvision_vgg16(state_dict: Mapping[str, Any]) -> dict:
    """torchvision ``vgg16().state_dict()`` (or its ``features.*`` subset)
    -> VGG16Features params. Classifier keys are ignored."""
    params: dict = {}
    for idxs in _BLOCKS:
        for i in idxs:
            w = np.asarray(state_dict[f"features.{i}.weight"], np.float32)
            b = np.asarray(state_dict[f"features.{i}.bias"], np.float32)
            params[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0)),
                                   "bias": b}
    return {"params": params}


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + eps)


def make_vgg_perceptual_fn(
    params: dict,
    layer_weights: Sequence[float] | None = None,
    dtype: Any = jnp.float32,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build perceptual_fn(x, y) -> (B,1,1,1) distance, pluggable into
    make_vae_train_step(perceptual_fn=...).

    layer_weights replaces LPIPS's learned 1x1 'lin' layers with per-layer
    scalars (default 1.0 each).
    """
    tower = VGG16Features(dtype=dtype)
    w = layer_weights or (1.0,) * len(_BLOCKS)

    def perceptual_fn(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        fx = tower.apply(params, x)
        fy = tower.apply(params, y)
        total = 0.0
        for a, b, wl in zip(fx, fy, w):
            d = (_unit_normalize(a.astype(jnp.float32))
                 - _unit_normalize(b.astype(jnp.float32))) ** 2
            total = total + wl * jnp.mean(d, axis=(1, 2, 3))
        return total[:, None, None, None]

    return perceptual_fn
