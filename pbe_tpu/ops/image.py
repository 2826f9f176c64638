"""Jittable image ops and normalization constants.

Replaces the torchvision/PIL transform stack of the reference
(scripts/inference.py:36-44,106-124) with pure-JAX equivalents on NHWC arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# CLIP preprocessing statistics (scripts/inference.py:42-43). Kept as host
# (numpy) constants: a module-level jnp.asarray would initialize the device
# backend at import time — every CLI would open the TPU tunnel (and hang if
# it is down) just to import the package.
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize_image(x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] (get_tensor, scripts/inference.py:106-114)."""
    return x01 * 2.0 - 1.0


def unnormalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] clamp-free (un_norm, scripts/inference.py:354-355)."""
    return (x + 1.0) / 2.0


def normalize_clip(x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> CLIP-normalized (get_tensor_clip)."""
    return (x01 - CLIP_MEAN) / CLIP_STD


def unnormalize_clip(x: jnp.ndarray) -> jnp.ndarray:
    return x * CLIP_STD + CLIP_MEAN


def resize_nhwc(x: jnp.ndarray, hw: tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    """Resize NHWC (or HWC) images. torchvision Resize uses bilinear+antialias
    for downsizing; jax.image.resize bilinear matches within test tolerance for
    the small factors used here (512->64 mask, 224 crops)."""
    if x.ndim == 3:
        return jax.image.resize(x, (*hw, x.shape[-1]), method=method)
    return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), method=method)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample on NHWC, matching
    F.interpolate(scale_factor=2, mode='nearest')."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def binarize_mask(mask: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """mask >= threshold -> 1 else 0 (scripts/inference.py:315-316)."""
    return (mask >= threshold).astype(mask.dtype)
