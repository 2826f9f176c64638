"""Normalization layers with fp32 islands.

The reference keeps GroupNorm/LayerNorm math in float32 even under fp16
autocast (GroupNorm32 at diffusionmodules/util.py:214-216, LayerNorm at
encoders/xf.py:22-28). Under bf16 on TPU we replicate those fp32 islands so
activation statistics match; the result is cast back to the compute dtype.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32, output cast back to input dtype.

    eps defaults: the UNet's `normalization()` uses torch GroupNorm default
    (1e-5); the VAE's `Normalize` uses 1e-6 — pass explicitly.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        # all production channel counts are multiples of 32, where gcd == 32;
        # the gcd only matters for tiny unit-test geometries
        groups = math.gcd(self.num_groups, x.shape[-1])
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 (ref: encoders/xf.py:22-28)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)
