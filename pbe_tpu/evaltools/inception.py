"""InceptionV3 pool3 feature extractor (FID/QS backbone) in flax, NHWC.

Architecture spec: torchvision ``Inception3`` as used by the reference's
eval_tool/fid/inception.py (pytorch-fid variant). The pytorch-fid tweak —
``count_include_pad=False`` average pooling inside the Inception blocks and
a max-pool branch in the last InceptionE — is exposed as ``fid_pools`` /
handled per-block, since the original TF FID weights assume it.

Weights: converted from any torchvision Inception3 state_dict via
``convert_inception_state_dict`` (no network access needed — bring your own
file). BatchNorm runs in inference form (eps 1e-3).

Input: (B, 299, 299, 3) in [0,1]; set ``normalize_input`` to map to [-1,1]
as pytorch-fid does. Output: (B, 2048) pool3 features.
"""
from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _avg_pool_3x3_same_nopad(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool, padding 1, count_include_pad=False."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return sum_ / cnt


def _avg_pool_3x3_incpad(x: jnp.ndarray) -> jnp.ndarray:
    """torchvision default: count_include_pad=True."""
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return sum_ / 9.0


def _max_pool(x: jnp.ndarray, k: int, s: int, pad: int = 0) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_ch, self.kernel, strides=(self.stride, self.stride),
            padding=(self.padding[0], self.padding[1]) if isinstance(self.padding, tuple)
            else self.padding,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _conv(out, k, s=1, p=(0, 0), name=None, dtype=jnp.float32):
    return BasicConv2d(out, k, s, p, dtype, name=name)


class InceptionA(nn.Module):
    pool_features: int
    fid_pools: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = _conv(64, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b5 = _conv(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x)
        b5 = _conv(64, (5, 5), p=(2, 2), name="branch5x5_2", dtype=self.dtype)(b5)
        b3 = _conv(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        b3 = _conv(96, (3, 3), p=(1, 1), name="branch3x3dbl_2", dtype=self.dtype)(b3)
        b3 = _conv(96, (3, 3), p=(1, 1), name="branch3x3dbl_3", dtype=self.dtype)(b3)
        pool = (_avg_pool_3x3_same_nopad if self.fid_pools else _avg_pool_3x3_incpad)(x)
        bp = _conv(self.pool_features, (1, 1), name="branch_pool", dtype=self.dtype)(pool)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = _conv(384, (3, 3), s=2, name="branch3x3", dtype=self.dtype)(x)
        bd = _conv(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = _conv(96, (3, 3), p=(1, 1), name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = _conv(96, (3, 3), s=2, name="branch3x3dbl_3", dtype=self.dtype)(bd)
        return jnp.concatenate([b3, bd, _max_pool(x, 3, 2)], axis=-1)


class InceptionC(nn.Module):
    c7: int
    fid_pools: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = _conv(192, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b7 = _conv(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x)
        b7 = _conv(c7, (1, 7), p=(0, 3), name="branch7x7_2", dtype=self.dtype)(b7)
        b7 = _conv(192, (7, 1), p=(3, 0), name="branch7x7_3", dtype=self.dtype)(b7)
        bd = _conv(c7, (1, 1), name="branch7x7dbl_1", dtype=self.dtype)(x)
        bd = _conv(c7, (7, 1), p=(3, 0), name="branch7x7dbl_2", dtype=self.dtype)(bd)
        bd = _conv(c7, (1, 7), p=(0, 3), name="branch7x7dbl_3", dtype=self.dtype)(bd)
        bd = _conv(c7, (7, 1), p=(3, 0), name="branch7x7dbl_4", dtype=self.dtype)(bd)
        bd = _conv(192, (1, 7), p=(0, 3), name="branch7x7dbl_5", dtype=self.dtype)(bd)
        pool = (_avg_pool_3x3_same_nopad if self.fid_pools else _avg_pool_3x3_incpad)(x)
        bp = _conv(192, (1, 1), name="branch_pool", dtype=self.dtype)(pool)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = _conv(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = _conv(320, (3, 3), s=2, name="branch3x3_2", dtype=self.dtype)(b3)
        b7 = _conv(192, (1, 1), name="branch7x7x3_1", dtype=self.dtype)(x)
        b7 = _conv(192, (1, 7), p=(0, 3), name="branch7x7x3_2", dtype=self.dtype)(b7)
        b7 = _conv(192, (7, 1), p=(3, 0), name="branch7x7x3_3", dtype=self.dtype)(b7)
        b7 = _conv(192, (3, 3), s=2, name="branch7x7x3_4", dtype=self.dtype)(b7)
        return jnp.concatenate([b3, b7, _max_pool(x, 3, 2)], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # 'avg' (7b) | 'max' (7c, pytorch-fid FIDInceptionE_2)
    fid_pools: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = _conv(320, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b3 = _conv(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = jnp.concatenate([
            _conv(384, (1, 3), p=(0, 1), name="branch3x3_2a", dtype=self.dtype)(b3),
            _conv(384, (3, 1), p=(1, 0), name="branch3x3_2b", dtype=self.dtype)(b3),
        ], axis=-1)
        bd = _conv(448, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = _conv(384, (3, 3), p=(1, 1), name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = jnp.concatenate([
            _conv(384, (1, 3), p=(0, 1), name="branch3x3dbl_3a", dtype=self.dtype)(bd),
            _conv(384, (3, 1), p=(1, 0), name="branch3x3dbl_3b", dtype=self.dtype)(bd),
        ], axis=-1)
        if self.pool_kind == "max":
            pool = _max_pool(x, 3, 1, pad=1)
        else:
            pool = (_avg_pool_3x3_same_nopad if self.fid_pools
                    else _avg_pool_3x3_incpad)(x)
        bp = _conv(192, (1, 1), name="branch_pool", dtype=self.dtype)(pool)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """(B, 299, 299, 3) -> (B, 2048) pool3 features."""

    fid_pools: bool = True
    normalize_input: bool = True  # [0,1] -> [-1,1] (pytorch-fid convention)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        if self.normalize_input:
            x = x * 2.0 - 1.0
        x = _conv(32, (3, 3), s=2, name="Conv2d_1a_3x3", dtype=self.dtype)(x)
        x = _conv(32, (3, 3), name="Conv2d_2a_3x3", dtype=self.dtype)(x)
        x = _conv(64, (3, 3), p=(1, 1), name="Conv2d_2b_3x3", dtype=self.dtype)(x)
        x = _max_pool(x, 3, 2)
        x = _conv(80, (1, 1), name="Conv2d_3b_1x1", dtype=self.dtype)(x)
        x = _conv(192, (3, 3), name="Conv2d_4a_3x3", dtype=self.dtype)(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, self.fid_pools, self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, self.fid_pools, self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, self.fid_pools, self.dtype, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.fid_pools, self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, self.fid_pools, self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, self.fid_pools, self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, self.fid_pools, self.dtype, name="Mixed_6e")(x)
        x = InceptionD(self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", self.fid_pools, self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid_pools else "avg", self.fid_pools,
                       self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> 2048


def convert_inception_state_dict(
    state_dict: Mapping[str, Any], dtype: Any = np.float32
) -> dict:
    """torchvision Inception3 state_dict -> InceptionV3Features params."""
    params: dict = {}

    def set_(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(v, dtype)

    for key, v in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        if parts[-1] == "num_batches_tracked":
            continue
        if len(parts) == 3:  # e.g. Conv2d_1a_3x3.conv.weight
            block, mod, leaf = parts
            prefix = (block,)
        elif len(parts) == 4:  # Mixed_5b.branch1x1.conv.weight
            block, branch, mod, leaf = parts
            prefix = (block, branch)
        else:
            continue
        if mod == "conv" and leaf == "weight":
            set_(prefix + ("conv", "kernel"), np.transpose(v, (2, 3, 1, 0)))
        elif mod == "bn":
            name = {
                "weight": "bn_scale", "bias": "bn_bias",
                "running_mean": "bn_mean", "running_var": "bn_var",
            }[leaf]
            set_(prefix + (name,), v)
    return {"params": params}
