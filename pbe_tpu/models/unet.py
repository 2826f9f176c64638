"""The Paint-by-Example UNet: SD-v1 epsilon-predictor widened to 9 input
channels (4 noisy latents + 4 masked-source latents + 1 mask).

Architecture spec (what, not how): ldm/modules/diffusionmodules/openaimodel.py
:528-889 (UNetModel), ldm/modules/attention.py:189-298 (SpatialTransformer /
CrossAttention / GEGLU), configured by configs/v1.yaml:30-46 — in_channels=9,
model_channels=320, channel_mult=(1,2,4,4), 2 res blocks/level, attention at
downsample ratios {1,2,4}, 8 heads, transformer_depth=1, context_dim=768.

TPU-first design choices:
  * NHWC everywhere; channels ride the 128-wide lane dimension.
  * bf16 compute, fp32 params, fp32 GroupNorm/LayerNorm/softmax islands
    (replicating the reference's autocast-fp32 islands so stats match).
  * Cross-attention context is a single 768-d exemplar token, for which
    attention degenerates exactly to a broadcast of the value projection —
    computed that way (pbe_tpu.ops.attention.single_token_attention), saving
    two N-length matmuls + softmax per transformer block per step.
  * Self-attention runs on the shared attention primitive with an optional
    Pallas flash kernel.
  * Gradient checkpointing via nn.remat over whole encoder/decoder blocks
    (analogue of the reference's CheckpointFunction, util.py:102-148).

Module names mirror torch state_dict paths ('.' -> '_'): e.g. torch
``input_blocks.1.0.in_layers.2.weight`` lives at
``input_blocks_1_0/in_layers_2/kernel`` here.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pbe_tpu.ops import conv as conv_ops
from pbe_tpu.ops import quant
from pbe_tpu.ops.attention import multi_head_attention, single_token_attention
from pbe_tpu.ops.image import nearest_upsample_2x
from pbe_tpu.ops.norms import GroupNorm32, LayerNormF32


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embedding, [cos, sin] order (diffusionmodules/util.py:151-171).

    Computed in fp32; t may be fractional.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _conv(features: int, kernel: int, dtype: Any, name: str, zero_init: bool = False,
          stride: int = 1) -> nn.Conv:
    # torch Conv2d(k=3, padding=1) semantics: symmetric padding regardless of
    # stride (SAME would pad (0,1) at stride 2 and shift the grid by one).
    pad = (kernel - 1) // 2
    extra = {}
    if quant.is_active():  # trace-time w8a8 serving mode (ops/quant.py)
        extra["conv_general_dilated"] = quant.conv_general_dilated_int8
    elif conv_ops.is_active():
        # exact im2col formulation for the deep-level 3x3 convs (ds4/ds8
        # spatial extents where XLA's native schedule is 29-61% of
        # roofline — ops/conv.py, PERF.md §5/§9); other convs fall back
        # to lax inside the override
        extra["conv_general_dilated"] = conv_ops.conv_general_dilated_small
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dtype=dtype, param_dtype=jnp.float32, name=name,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        **extra,
    )


def _dense(features: int, dtype: Any, name: str, use_bias: bool = True) -> nn.Dense:
    extra = {}
    if quant.is_active():
        extra["dot_general"] = quant.dot_general_int8
    return nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32, use_bias=use_bias,
        name=name, **extra,
    )


class ResBlock(nn.Module):
    """Timestep-conditioned residual block (openaimodel.py:163-275,
    use_scale_shift_norm=False path)."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_layers_0")(x)
        h = nn.silu(h)
        h = _conv(self.out_ch, 3, self.dtype, "in_layers_2")(h)
        emb_out = _dense(self.out_ch, self.dtype, "emb_layers_1")(nn.silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(name="out_layers_0")(h)
        h = nn.silu(h)
        h = _conv(self.out_ch, 3, self.dtype, "out_layers_3", zero_init=True)(h)
        if in_ch != self.out_ch:
            x = _conv(self.out_ch, 1, self.dtype, "skip_connection")(x)
        return x + h


class MyResBlock(nn.Module):
    """The fork's front-block residual variant (openaimodel.py:278-390,
    use_scale_shift_norm=False, no up/down — the only configuration the fork
    instantiates at :644-652). Quirk preserved: `_forward` returns the
    zero-init 4-channel out conv WITHOUT adding the skip (openaimodel.py:390),
    so the declared `skip_connection` parameters are dead weight — like the
    single-token cross-attention's to_q/to_k they are not instantiated here
    and the checkpoint converter drops them."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        h = GroupNorm32(name="in_layers_0")(x)
        h = nn.silu(h)
        h = _conv(self.out_ch, 3, self.dtype, "in_layers_2")(h)
        emb_out = _dense(self.out_ch, self.dtype, "emb_layers_1")(nn.silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(name="out_layers_0")(h)
        h = nn.silu(h)
        return _conv(4, 3, self.dtype, "out_layers_3", zero_init=True)(h)


class CrossAttention(nn.Module):
    """QKV attention with linear projections (attention.py:189-230).

    When ``context`` has one token the output is computed exactly as a
    broadcast of the value projection (see module docstring).
    """

    heads: int
    dim_head: int
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None = None) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        query_dim = x.shape[-1]
        ctx = x if context is None else context
        if context is not None and context.shape[1] == 1:
            # Single-token exemplar conditioning: softmax over 1 key == 1, so
            # the output is independent of q and k. to_q/to_k are not even
            # instantiated (their gradient is exactly zero in the reference
            # too); the checkpoint converter drops those keys. to_out runs on
            # the 1 token and the RESULT broadcasts (identical rows through
            # the same dense — equal by row independence of the matmul),
            # instead of a dense over N identical rows.
            v = _dense(inner, self.dtype, "to_v", use_bias=False)(ctx)
            out = _dense(query_dim, self.dtype, "to_out_0")(v)
            return single_token_attention(out, x.shape[1])
        q = _dense(inner, self.dtype, "to_q", use_bias=False)(x)
        k = _dense(inner, self.dtype, "to_k", use_bias=False)(ctx)
        v = _dense(inner, self.dtype, "to_v", use_bias=False)(ctx)
        out = multi_head_attention(q, k, v, self.heads, impl=self.attn_impl)
        return _dense(query_dim, self.dtype, "to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward, mult=4 (attention.py:38-65)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * 4
        proj = _dense(inner * 2, self.dtype, "net_0_proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)
        return _dense(dim, self.dtype, "net_2")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LN residuals
    (attention.py:233-252)."""

    heads: int
    dim_head: int
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None) -> jnp.ndarray:
        attn = lambda name: CrossAttention(
            self.heads, self.dim_head, self.dtype, self.attn_impl, name=name
        )
        x = attn("attn1")(LayerNormF32(name="norm1")(x)) + x
        x = attn("attn2")(LayerNormF32(name="norm2")(x), context) + x
        x = FeedForward(self.dtype, name="ff")(LayerNormF32(name="norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj -> transformer blocks -> 1x1 zero-proj + residual
    (attention.py:255-298)."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        x = _conv(inner, 1, self.dtype, "proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.dtype, self.attn_impl,
                name=f"transformer_blocks_{d}",
            )(x, context)
        x = x.reshape(b, h, w, inner)
        x = _conv(c, 1, self.dtype, "proj_out", zero_init=True)(x)
        return x + x_in


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _conv(x.shape[-1], 3, self.dtype, "op", stride=2)(x)


class Upsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _conv(x.shape[-1], 3, self.dtype, "conv")(nearest_upsample_2x(x))


class UNetModel(nn.Module):
    """epsilon-predictor UNet; forward signature (x_NHWC, t, context) -> eps.

    x: (B, H, W, in_channels=9); t: (B,) int/float DDPM timesteps;
    context: (B, n_ctx, context_dim) cross-attention tokens (n_ctx=1 for PBE).
    """

    in_channels: int = 9
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    add_conv_in_front_of_unet: bool = False
    num_classes: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, context: jnp.ndarray,
                 y: jnp.ndarray | None = None) -> jnp.ndarray:
        mc = self.model_channels
        time_embed_dim = mc * 4
        t_emb = timestep_embedding(t, mc)
        emb = _dense(time_embed_dim, self.dtype, "time_embed_0")(t_emb.astype(self.dtype))
        emb = _dense(time_embed_dim, self.dtype, "time_embed_2")(nn.silu(emb))
        if self.num_classes is not None:
            # class-conditional ('adm') path: label embedding added to the
            # time embedding (openaimodel.py:630-631, 862-870)
            assert y is not None, "num_classes set but no y labels given"
            emb = emb + nn.Embed(
                self.num_classes, time_embed_dim, param_dtype=jnp.float32,
                name="label_emb",
            )(y).astype(emb.dtype)

        if self.add_conv_in_front_of_unet:
            # fork front block (openaimodel.py:634-655, 874-876): 9-ch input
            # -> conv to model_channels -> MyResBlock compressing to the
            # 4-channel in_channels the main trunk then consumes. Torch's
            # 'add_resbolck' typo kept for state_dict name compatibility.
            h0 = _conv(mc, 3, self.dtype, "add_resbolck_0_0")(x.astype(self.dtype))
            x = MyResBlock(mc, self.dtype, name="add_resbolck_1_0")(h0, emb)

        res_block = nn.remat(ResBlock) if self.remat else ResBlock
        spatial_tf = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer

        def make_res(out_ch: int, name: str):
            return res_block(out_ch, self.dtype, name=name)

        def make_tf(ch: int, name: str):
            return spatial_tf(
                self.num_heads, ch // self.num_heads, self.transformer_depth,
                self.dtype, self.attn_impl, name=name,
            )

        h = _conv(mc, 3, self.dtype, "input_blocks_0_0")(x.astype(self.dtype))
        hs = [h]
        ch = mc
        ds = 1
        idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = make_res(mult * mc, f"input_blocks_{idx}_0")(h, emb)
                ch = mult * mc
                if ds in self.attention_resolutions:
                    h = make_tf(ch, f"input_blocks_{idx}_1")(h, context)
                hs.append(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype, name=f"input_blocks_{idx}_0")(h)
                hs.append(h)
                ds *= 2
                idx += 1

        h = make_res(ch, "middle_block_0")(h, emb)
        h = make_tf(ch, "middle_block_1")(h, context)
        h = make_res(ch, "middle_block_2")(h, emb)

        idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = make_res(mc * mult, f"output_blocks_{idx}_0")(h, emb)
                ch = mc * mult
                sub = 1
                if ds in self.attention_resolutions:
                    h = make_tf(ch, f"output_blocks_{idx}_{sub}")(h, context)
                    sub += 1
                if level and i == self.num_res_blocks:
                    h = Upsample(self.dtype, name=f"output_blocks_{idx}_{sub}")(h)
                    ds //= 2
                idx += 1

        h = GroupNorm32(name="out_0")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, 3, self.dtype, "out_2", zero_init=True)(h)
        return h.astype(x.dtype)


@dataclasses.dataclass
class UNetConfig:
    """configs/v1.yaml unet_config-compatible constructor."""

    image_size: int = 32  # unused, kept for config parity (v1.yaml:33)
    in_channels: int = 9
    out_channels: int = 4
    model_channels: int = 320
    attention_resolutions: Sequence[int] = (4, 2, 1)
    num_res_blocks: int = 2
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    context_dim: int = 768
    use_checkpoint: bool = True
    legacy: bool = False
    add_conv_in_front_of_unet: bool = False
    num_classes: int | None = None

    def build(self, dtype: Any = jnp.float32, attn_impl: str = "xla",
              remat: bool | None = None) -> UNetModel:
        return UNetModel(
            add_conv_in_front_of_unet=self.add_conv_in_front_of_unet,
            num_classes=self.num_classes,
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            num_heads=self.num_heads,
            transformer_depth=self.transformer_depth,
            context_dim=self.context_dim,
            dtype=dtype,
            attn_impl=attn_impl,
            remat=self.use_checkpoint if remat is None else remat,
        )
