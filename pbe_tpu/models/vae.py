"""KL-regularized convolutional autoencoder (Stable-Diffusion first stage).

TPU-native rebuild of the reference VAE:
  * architecture spec: ldm/modules/diffusionmodules/model.py:370-580 (Encoder/
    Decoder), ldm/models/autoencoder.py:18-78 (AutoencoderKL + quant convs),
    ldm/modules/distributions/distributions.py:24-62 (diagonal Gaussian).
  * config: configs/v1.yaml:48-69 — ch=128, ch_mult=(1,2,4,4), 2 res blocks,
    no down-path attention, mid attention, double_z, z_channels=4.

Design departures from the torch original (deliberate, TPU-first):
  * NHWC layout end to end (XLA's native conv layout on TPU).
  * bf16 compute with fp32 GroupNorm islands instead of fp16 autocast.
  * Attention in the mid block runs through the shared attention primitive
    (XLA or Pallas flash path) instead of explicit bmm chains.

Module names mirror the torch state_dict paths ('.' -> '_') so the checkpoint
converter is a pure key map.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pbe_tpu.ops.attention import multi_head_attention
from pbe_tpu.ops.image import nearest_upsample_2x
from pbe_tpu.ops.norms import GroupNorm32


def _conv(features: int, kernel: int, dtype: Any, name: str, stride: int = 1,
          padding: Any = "SAME") -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding=padding,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class ResnetBlock(nn.Module):
    """VAE residual block (diffusionmodules/model.py:84-143); no time emb."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_ch, 3, self.dtype, "conv1")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_ch, 3, self.dtype, "conv2")(h)
        if in_ch != self.out_ch:
            x = _conv(self.out_ch, 1, self.dtype, "nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions
    (diffusionmodules/model.py:152-204)."""

    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hn = GroupNorm32(epsilon=1e-6, name="norm")(x)
        q = _conv(c, 1, self.dtype, "q")(hn).reshape(b, h * w, c)
        k = _conv(c, 1, self.dtype, "k")(hn).reshape(b, h * w, c)
        v = _conv(c, 1, self.dtype, "v")(hn).reshape(b, h * w, c)
        out = multi_head_attention(q, k, v, num_heads=1, impl=self.attn_impl)
        out = _conv(c, 1, self.dtype, "proj_out")(out.reshape(b, h, w, c))
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv with the reference's asymmetric (0,1,0,1) padding
    (diffusionmodules/model.py:62-81)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _conv(
            x.shape[-1], 3, self.dtype, "conv", stride=2, padding=((0, 1), (0, 1))
        )(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (diffusionmodules/model.py:44-59)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _conv(x.shape[-1], 3, self.dtype, "conv")(nearest_upsample_2x(x))


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = _conv(self.ch, 3, self.dtype, "conv_in")(x.astype(self.dtype))
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    self.ch * mult, self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(self.dtype, name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, self.attn_impl, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _conv(out_ch, 3, self.dtype, "conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        block_in = self.ch * self.ch_mult[-1]
        h = _conv(block_in, 3, self.dtype, "conv_in")(z.astype(self.dtype))
        h = ResnetBlock(block_in, self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, self.attn_impl, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_2")(h)
        # reference iterates reversed(range(num_resolutions)) but registers
        # modules under their level index (model.py:518-537)
        for i_level in reversed(range(len(self.ch_mult))):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    block_out, self.dtype, name=f"up_{i_level}_block_{i_block}"
                )(h)
            if i_level != 0:
                h = Upsample(self.dtype, name=f"up_{i_level}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(self.out_ch, 3, self.dtype, "conv_out")(h)


class AutoencoderKL(nn.Module):
    """Encoder/Decoder with 1x1 quant convs (autoencoder.py:18-78).

    encode() returns the Gaussian moments (mean, logvar) rather than a
    distribution object — sampling is the caller's job with an explicit PRNG
    key (functional-JAX replacement for DiagonalGaussianDistribution.sample).
    """

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, double_z=True, dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.quant_conv = nn.Conv(
            2 * self.embed_dim, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.z_channels, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="post_quant_conv",
        )

    def encode(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """x: NHWC in [-1,1] -> (mean, logvar), each (N, H/8, W/8, embed_dim).

        logvar is clamped to [-30, 20] as in distributions.py:29."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(
        self, x: jnp.ndarray, rng: jax.Array | None = None, sample: bool = True
    ) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray]]:
        mean, logvar = self.encode(x)
        z = sample_diagonal_gaussian(rng, mean, logvar) if sample else mean
        return self.decode(z), (mean, logvar)


def sample_diagonal_gaussian(
    rng: jax.Array, mean: jnp.ndarray, logvar: jnp.ndarray
) -> jnp.ndarray:
    """z = mean + std * eps (distributions.py:36-40)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


def diagonal_gaussian_kl(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0,1)) per example (distributions.py:42-52, other=None)."""
    var = jnp.exp(logvar)
    return 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=tuple(range(1, mean.ndim)))


@dataclasses.dataclass
class AutoencoderKLConfig:
    """configs/v1.yaml-compatible constructor (first_stage_config node)."""

    ddconfig: dict[str, Any]
    embed_dim: int = 4
    lossconfig: Any = None
    monitor: str | None = None
    ckpt_path: str | None = None
    ignore_keys: tuple = ()
    image_key: str = "image"
    colorize_nlabels: int | None = None

    def build(self, dtype: Any = jnp.float32, attn_impl: str = "xla") -> AutoencoderKL:
        dd = self.ddconfig
        return AutoencoderKL(
            ch=dd.get("ch", 128),
            out_ch=dd.get("out_ch", 3),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            z_channels=dd.get("z_channels", 4),
            embed_dim=self.embed_dim,
            dtype=dtype,
            attn_impl=attn_impl,
        )
