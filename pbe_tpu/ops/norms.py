"""Normalization layers with fp32 islands.

The reference keeps GroupNorm/LayerNorm math in float32 even under fp16
autocast (GroupNorm32 at diffusionmodules/util.py:214-216, LayerNorm at
encoders/xf.py:22-28). Under bf16 on TPU we replicate those fp32 islands so
activation statistics match; the result is cast back to the compute dtype.

TPU note: the textbook GroupNorm formulation reshapes channels into
(groups, group_size) and reduces the trailing group axis — with
channels-last data that reshape shuffles the 128-wide lane dimension and XLA
lowers it to transpose copies (profiled: the single largest cost of the UNet
step after attention). The implementation here instead computes per-CHANNEL
sums in the native (..., C) layout and folds them into per-group statistics
with a tiny (C, G) grouping matmul, so the activation tensor is only ever
read/written in lane order. The math is identical.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _Affine(nn.Module):
    """Holds the affine params under a child scope so the param tree keeps
    the <layer>/norm/{scale,bias} paths the checkpoint converter expects."""

    features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


def group_norm_lane_friendly(
    x: jnp.ndarray,
    groups: int,
    eps: float,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """GroupNorm over channels-last x without any group reshape/transpose."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    gs = c // groups
    x32 = x.astype(jnp.float32)
    spatial = tuple(range(1, x.ndim - 1))
    n_spatial = np.prod(x.shape[1:-1]) if x.ndim > 2 else 1
    # per-channel first/second moments in lane order
    s1 = jnp.sum(x32, axis=spatial)  # (B, C)
    s2 = jnp.sum(x32 * x32, axis=spatial)
    # fold channels into groups: (B, C) @ (C, G) with a constant 0/1 matrix
    gmat = jnp.asarray(
        np.kron(np.eye(groups), np.ones((gs, 1))), jnp.float32
    )  # (C, G)
    cnt = gs * n_spatial
    mean_g = (s1 @ gmat) / cnt  # (B, G)
    var_g = (s2 @ gmat) / cnt - mean_g**2
    inv_g = jax.lax.rsqrt(var_g + eps)
    # back to per-channel vectors (B, C) via the transpose of the 0/1 matrix
    mean_c = mean_g @ gmat.T
    inv_c = inv_g @ gmat.T
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
    y = (x32 - mean_c.reshape(shape)) * inv_c.reshape(shape)
    y = y * scale + bias
    return y.astype(orig_dtype)


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32, output cast back to input dtype.

    eps defaults: the UNet's `normalization()` uses torch GroupNorm default
    (1e-5); the VAE's `Normalize` uses 1e-6 — pass explicitly.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # all production channel counts are multiples of 32, where gcd == 32;
        # the gcd only matters for tiny unit-test geometries
        groups = math.gcd(self.num_groups, c)
        scale, bias = _Affine(c, name="norm")()
        return group_norm_lane_friendly(x, groups, self.epsilon, scale, bias)


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
