"""Legacy VQ/SD-era conv nets from diffusionmodules/model.py:218-780.

The remaining half of reference component #13 that the PBE path never
touches: the original pixel-space DDPM UNet (``Model``), the small decoders
(``SimpleDecoder``, ``UpsampleDecoder``), and the latent-rescaling family
(``LatentRescaler``, ``MergedRescaleEncoder``, ``MergedRescaleDecoder``,
``Upsampler``, ``Resize``). Rebuilt TPU-native (NHWC, fp32-island GroupNorm,
jittable) on the production VAE blocks; the timestep-aware residual block
(``ResnetBlockT``) mirrors model.py:84-143 including the post-conv1 temb
injection.

Attention placement follows the reference's current-resolution bookkeeping
(attn at levels whose running resolution is in ``attn_resolutions``,
model.py:252-264) — the production Encoder/Decoder omit this because the v1
VAE config has attn_resolutions=[].
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pbe_tpu.models.unet import timestep_embedding
from pbe_tpu.models.vae import (
    AttnBlock,
    Decoder,
    Downsample,
    Encoder,
    ResnetBlock,
    Upsample,
    _conv,
)
from pbe_tpu.ops.norms import GroupNorm32


class ResnetBlockT(nn.Module):
    """model.py:84-143 with temb_channels > 0: temb is projected and added
    after conv1."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray | None) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_ch, 3, self.dtype, "conv1")(h)
        if temb is not None:
            proj = nn.Dense(self.out_ch, dtype=self.dtype,
                            param_dtype=jnp.float32, name="temb_proj")
            h = h + proj(nn.silu(temb))[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_ch, 3, self.dtype, "conv2")(h)
        if in_ch != self.out_ch:
            x = _conv(self.out_ch, 1, self.dtype, "nin_shortcut")(x)
        return x + h


class Model(nn.Module):
    """The original pixel-space DDPM UNet (model.py:218-367): VAE-style
    blocks + timestep embedding + skip connections, attention by running
    resolution. forward(x, t=None, context=None) — context concatenates on
    channels (model.py:321-323)."""

    ch: int
    out_ch: int
    num_res_blocks: int
    resolution: int
    in_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    attn_resolutions: Sequence[int] = ()
    use_timestep: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray | None = None,
                 context: jnp.ndarray | None = None) -> jnp.ndarray:
        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        if self.use_timestep:
            assert t is not None
            temb = timestep_embedding(t, self.ch)
            temb = nn.Dense(4 * self.ch, dtype=self.dtype,
                            param_dtype=jnp.float32, name="temb_dense_0")(
                temb.astype(self.dtype))
            temb = nn.Dense(4 * self.ch, dtype=self.dtype,
                            param_dtype=jnp.float32, name="temb_dense_1")(
                nn.silu(temb))
        else:
            temb = None

        res = lambda out, name: ResnetBlockT(out, self.dtype, name=name)
        attn = lambda name: AttnBlock(self.dtype, self.attn_impl, name=name)

        nres = len(self.ch_mult)
        curr_res = self.resolution
        hs = [_conv(self.ch, 3, self.dtype, "conv_in")(x.astype(self.dtype))]
        for i_level in range(nres):
            for i_block in range(self.num_res_blocks):
                h = res(self.ch * self.ch_mult[i_level],
                        f"down_{i_level}_block_{i_block}")(hs[-1], temb)
                if curr_res in self.attn_resolutions:
                    h = attn(f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != nres - 1:
                hs.append(Downsample(self.dtype,
                                     name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2

        h = res(hs[-1].shape[-1], "mid_block_1")(hs[-1], temb)
        h = attn("mid_attn_1")(h)
        h = res(h.shape[-1], "mid_block_2")(h, temb)

        for i_level in reversed(range(nres)):
            for i_block in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(self.ch * self.ch_mult[i_level],
                        f"up_{i_level}_block_{i_block}")(h, temb)
                if curr_res in self.attn_resolutions:
                    h = attn(f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(self.out_ch, 3, self.dtype, "conv_out")(h)


class SimpleDecoder(nn.Module):
    """model.py:583-617: 1x1 -> 3 ResnetBlocks (x2, x4, x2 widths) -> 1x1 ->
    Upsample -> norm/silu/conv_out."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.in_channels
        h = _conv(c, 1, self.dtype, "model_0")(x.astype(self.dtype))
        h = ResnetBlock(2 * c, self.dtype, name="model_1")(h)
        h = ResnetBlock(4 * c, self.dtype, name="model_2")(h)
        h = ResnetBlock(2 * c, self.dtype, name="model_3")(h)
        h = _conv(c, 1, self.dtype, "model_4")(h)
        h = Upsample(self.dtype, name="model_5")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(self.out_channels, 3, self.dtype, "conv_out")(h)


class UpsampleDecoder(nn.Module):
    """model.py:619-664: per level num_res_blocks+1 ResnetBlocks then
    Upsample (except last), norm/silu/conv_out."""

    in_channels: int
    out_channels: int
    ch: int
    num_res_blocks: int
    resolution: int
    ch_mult: Sequence[int] = (2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        nres = len(self.ch_mult)
        for i_level in range(nres):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * self.ch_mult[i_level], self.dtype,
                                name=f"res_{i_level}_{i_block}")(h)
            if i_level != nres - 1:
                h = Upsample(self.dtype, name=f"upsample_{i_level}")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(self.out_channels, 3, self.dtype, "conv_out")(h)


class LatentRescaler(nn.Module):
    """model.py:667-702: conv_in -> depth ResnetBlocks -> nearest resize by
    `factor` -> AttnBlock -> depth ResnetBlocks -> 1x1 conv_out."""

    factor: float
    in_channels: int
    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = _conv(self.mid_channels, 3, self.dtype, "conv_in")(
            x.astype(self.dtype))
        for i in range(self.depth):
            h = ResnetBlock(self.mid_channels, self.dtype,
                            name=f"res_block1_{i}")(h)
        b, hh, ww, c = h.shape
        new = (int(round(hh * self.factor)), int(round(ww * self.factor)))
        # torch F.interpolate default mode is 'nearest' (model.py:696)
        h = jax.image.resize(h, (b, *new, c), "nearest")
        h = AttnBlock(self.dtype, self.attn_impl, name="attn")(h)
        for i in range(self.depth):
            h = ResnetBlock(self.mid_channels, self.dtype,
                            name=f"res_block2_{i}")(h)
        return _conv(self.out_channels, 1, self.dtype, "conv_out")(h)


class MergedRescaleEncoder(nn.Module):
    """model.py:704-721: Encoder (double_z=False) -> LatentRescaler."""

    in_channels: int
    ch: int
    resolution: int
    out_ch: int
    num_res_blocks: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.ch * self.ch_mult[-1]
        h = Encoder(ch=self.ch, ch_mult=tuple(self.ch_mult),
                    num_res_blocks=self.num_res_blocks, z_channels=mid,
                    double_z=False, dtype=self.dtype, name="encoder")(x)
        return LatentRescaler(self.rescale_factor, mid, mid, self.out_ch,
                              self.rescale_module_depth, self.dtype,
                              name="rescaler")(h)


class MergedRescaleDecoder(nn.Module):
    """model.py:723-737: LatentRescaler -> Decoder."""

    z_channels: int
    out_ch: int
    resolution: int
    num_res_blocks: int
    ch: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        tmp = self.z_channels * self.ch_mult[-1]
        h = LatentRescaler(self.rescale_factor, self.z_channels, tmp, tmp,
                           self.rescale_module_depth, self.dtype,
                           name="rescaler")(x)
        return Decoder(ch=self.ch, out_ch=self.out_ch,
                       ch_mult=tuple(self.ch_mult),
                       num_res_blocks=self.num_res_blocks, dtype=self.dtype,
                       name="decoder")(h)


class Upsampler(nn.Module):
    """model.py:740-757: LatentRescaler (fractional factor) + all-upsample
    Decoder; out_size/in_size power-of-two growth."""

    in_size: int
    out_size: int
    in_channels: int
    out_channels: int
    ch_mult: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.out_size >= self.in_size
        num_blocks = int(math.log2(self.out_size // self.in_size)) + 1
        factor_up = 1.0 + (self.out_size % self.in_size)
        h = LatentRescaler(factor_up, self.in_channels, 2 * self.in_channels,
                           self.in_channels, dtype=self.dtype,
                           name="rescaler")(x)
        return Decoder(ch=self.in_channels, out_ch=self.out_channels,
                       ch_mult=tuple(self.ch_mult for _ in range(num_blocks)),
                       num_res_blocks=2, dtype=self.dtype, name="decoder")(h)


class Resize(nn.Module):
    """model.py:759-780 (learned=False path; the learned conv branch raises
    NotImplementedError upstream too)."""

    mode: str = "bilinear"

    def __call__(self, x: jnp.ndarray, scale_factor: float = 1.0) -> jnp.ndarray:
        if scale_factor == 1.0:
            return x
        b, h, w, c = x.shape
        return jax.image.resize(
            x, (b, int(h * scale_factor), int(w * scale_factor), c), self.mode
        )
