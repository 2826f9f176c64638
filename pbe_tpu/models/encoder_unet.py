"""Encoder-half UNet + noisy-latent classifier (guided-diffusion lineage).

Rebuilds the reference's legacy classifier path, TPU-native:

  * ``LegacyAttentionBlock``  == openaimodel.py:392-441 (GroupNorm -> 1x1 qkv
    -> QKV self-attention -> zero 1x1 proj, residual), with both channel
    orders: legacy heads-before-qkv (QKVAttentionLegacy, :462-487) and
    qkv-before-heads (QKVAttention, :490-525). Both scale q AND k by
    ch^-0.25 and softmax in fp32.
  * ``AttentionPool2d``       == openaimodel.py:32-59 (CLIP-style mean-token
    attention pooling; the query is the prepended mean token).
  * ``EncoderUNetModel``      == openaimodel.py:892-1108: the down path +
    middle of the UNet with a pooling head ('adaptive' | 'attention' |
    'spatial' | 'spatial_v2') producing (B, out_channels) logits.
  * ``classifier_loss`` / ``top_k_accuracy`` == the functional core of
    ldm/models/diffusion/classifier.py:107-225 (NoisyLatentImageClassifier):
    q_sample the latent to a uniform t, classify the noisy latent,
    cross-entropy + acc@k; per-noise-level accuracy via fixed-t evaluation.

All tensors NHWC; module names mirror the torch state_dict so
``convert_encoder_unet_state_dict`` is a mechanical remap (parity-tested in
tests/test_encoder_unet.py against the reference module).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.models.unet import Downsample, ResBlock, _conv, _dense, timestep_embedding
from pbe_tpu.ops.norms import GroupNorm32
from pbe_tpu.schedules import DiffusionSchedule


def _qkv_attention(qkv: jnp.ndarray, heads: int, legacy_order: bool) -> jnp.ndarray:
    """(B, T, 3*H*ch) -> (B, T, H*ch).

    legacy_order: channels laid out per-head [q,k,v] blocks
    (QKVAttentionLegacy, openaimodel.py:470-480); else [q all | k all | v all]
    (QKVAttention, :500-520).
    """
    b, t, width = qkv.shape
    ch = width // (3 * heads)
    if legacy_order:
        grouped = qkv.reshape(b, t, heads, 3, ch)
        q, k, v = grouped[:, :, :, 0], grouped[:, :, :, 1], grouped[:, :, :, 2]
    else:
        q, k, v = jnp.split(qkv.reshape(b, t, 3, heads, ch), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    scale = ch**-0.25  # applied to q AND k (more stable in low precision)
    s = jnp.einsum(
        "bthc,bshc->bhts", q * scale, k * scale,
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshc->bthc", p, v)
    return out.reshape(b, t, heads * ch)


class LegacyAttentionBlock(nn.Module):
    """Self-attention block of the guided-diffusion UNet
    (openaimodel.py:392-441)."""

    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        heads = (
            self.num_heads if self.num_head_channels == -1
            else c // self.num_head_channels
        )
        flat = x.reshape(b, h * w, c)
        y = GroupNorm32(name="norm")(flat)
        qkv = _dense(3 * c, self.dtype, "qkv")(y)
        a = _qkv_attention(qkv, heads, legacy_order=not self.use_new_attention_order)
        a = nn.Dense(
            c, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out",
            kernel_init=nn.initializers.zeros,
        )(a)
        return (flat + a).reshape(b, h, w, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (openaimodel.py:32-59): prepend the
    spatial mean token, add a learned positional embedding, one QKV
    attention pass (new order), return the pooled token."""

    num_head_channels: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        tok = jnp.concatenate([flat.mean(axis=1, keepdims=True), flat], axis=1)
        pos = self.param(
            "positional_embedding",
            lambda k, s: jax.random.normal(k, s) / (c**0.5),
            (h * w + 1, c),
        )
        tok = tok + pos[None].astype(tok.dtype)
        qkv = _dense(3 * c, self.dtype, "qkv_proj")(tok)
        a = _qkv_attention(qkv, c // self.num_head_channels, legacy_order=False)
        out = _dense(self.output_dim, self.dtype, "c_proj")(a)
        return out[:, 0]


class EncoderUNetModel(nn.Module):
    """Down-path UNet classifier trunk (openaimodel.py:892-1108).

    forward(x NHWC, t) -> (B, out_channels) logits.
    """

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    pool: str = "adaptive"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        mc = self.model_channels
        emb = _dense(4 * mc, self.dtype, "time_embed_0")(
            timestep_embedding(t, mc).astype(self.dtype)
        )
        emb = _dense(4 * mc, self.dtype, "time_embed_2")(nn.silu(emb))

        def attn(name: str):
            return LegacyAttentionBlock(
                self.num_heads, self.num_head_channels,
                self.use_new_attention_order, self.dtype, name=name,
            )

        spatial = self.pool.startswith("spatial")
        results = []

        def collect(h):
            if spatial:
                results.append(h.astype(jnp.float32).mean(axis=(1, 2)))

        h = _conv(mc, 3, self.dtype, "input_blocks_0_0")(x.astype(self.dtype))
        collect(h)
        ch, ds, idx = mc, 1, 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * mc, self.dtype, name=f"input_blocks_{idx}_0")(h, emb)
                ch = mult * mc
                if ds in self.attention_resolutions:
                    h = attn(f"input_blocks_{idx}_1")(h)
                collect(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype, name=f"input_blocks_{idx}_0")(h)
                collect(h)
                ds *= 2
                idx += 1

        h = ResBlock(ch, self.dtype, name="middle_block_0")(h, emb)
        h = attn("middle_block_1")(h)
        h = ResBlock(ch, self.dtype, name="middle_block_2")(h, emb)

        if self.pool == "adaptive":
            h = GroupNorm32(name="out_0")(h)
            h = nn.silu(h)
            h = h.mean(axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d((1,1))
            h = _conv(self.out_channels, 1, self.dtype, "out_3", zero_init=True)(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            assert self.num_head_channels != -1
            h = GroupNorm32(name="out_0")(h)
            h = nn.silu(h)
            return AttentionPool2d(
                self.num_head_channels, self.out_channels, self.dtype,
                name="out_2",
            )(h)
        if spatial:
            collect(h)
            feats = jnp.concatenate(results, axis=-1).astype(self.dtype)
            h = _dense(2048, self.dtype, "out_0")(feats)
            if self.pool == "spatial_v2":
                h = GroupNorm32(name="out_1")(h[:, None, None, :])[:, 0, 0]
                h = nn.silu(h)
            else:
                h = nn.relu(h)
            return _dense(self.out_channels, self.dtype,
                          "out_2" if self.pool == "spatial" else "out_3")(h)
        raise NotImplementedError(f"Unexpected {self.pool} pooling")


@dataclasses.dataclass
class EncoderUNetConfig:
    """openaimodel.EncoderUNetModel constructor surface (classifier configs)."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    pool: str = "adaptive"

    def build(self, dtype: Any = jnp.float32) -> EncoderUNetModel:
        return EncoderUNetModel(
            image_size=self.image_size, in_channels=self.in_channels,
            model_channels=self.model_channels, out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult), num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_new_attention_order=self.use_new_attention_order,
            pool=self.pool, dtype=dtype,
        )


# --------------------------------------------------------------------------
# NoisyLatentImageClassifier functional core (classifier.py:107-225)


def classifier_loss(
    apply_fn,
    schedule: DiffusionSchedule,
    z: jnp.ndarray,
    labels: jnp.ndarray,
    rng: jax.Array,
    t: jnp.ndarray | int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Noise the latent to timestep t (uniform when None; classifier.py:184),
    classify, per-sample cross-entropy (classifier.py:189).

    Returns (loss (B,), logits (B, K))."""
    b = z.shape[0]
    r_t, r_noise = jax.random.split(rng)
    if t is None:
        t = jax.random.randint(r_t, (b,), 0, schedule.num_timesteps)
    else:
        t = jnp.full((b,), t, jnp.int32)
    noise = jax.random.normal(r_noise, z.shape, jnp.float32)
    sqrt_acp = jnp.asarray(schedule.sqrt_alphas_cumprod, jnp.float32)
    sqrt_1macp = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod, jnp.float32)
    z32 = z.astype(jnp.float32)
    x_noisy = (
        sqrt_acp[t][:, None, None, None] * z32
        + sqrt_1macp[t][:, None, None, None] * noise
    ).astype(z.dtype)
    logits = apply_fn(x_noisy, t).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return loss, logits


def top_k_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean top-k hit rate (classifier.py:150-155)."""
    _, top = jax.lax.top_k(logits, k)
    return (top == labels[:, None]).any(axis=-1).astype(jnp.float32).mean()


# --------------------------------------------------------------------------
# torch interop


def convert_encoder_unet_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """torch EncoderUNetModel state_dict -> flax variables.

    Same renaming rules as the main UNet converter: dots in block indices
    become underscores in module names; conv kernels (O,I,kh,kw)->(kh,kw,I,O);
    1d convs (O,I,1)->Dense (I,O); linears transpose; GroupNorm/LayerNorm
    weight->scale under the 'norm' affine child.
    """
    p: dict[str, Any] = {}

    def put(path: tuple[str, ...], value: np.ndarray) -> None:
        node = p
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value

    for key, v in state_dict.items():
        w = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                       np.float32)
        parts = key.split(".")
        leaf = parts[-1]  # weight | bias
        mod = parts[:-1]
        # module path: join block indices into torch-mirroring flax names
        if mod[0] in ("input_blocks", "middle_block", "output_blocks", "out",
                      "time_embed"):
            if mod[0] in ("input_blocks", "output_blocks"):
                name = f"{mod[0]}_{mod[1]}_{mod[2]}"
                sub = mod[3:]
            else:  # middle_block.N... | out.N... | time_embed.N...
                name = f"{mod[0]}_{mod[1]}"
                sub = mod[2:]
        else:
            raise KeyError(f"unexpected root in {key}")
        subname = "_".join(sub)
        path = (name, *((subname,) if subname else ()))
        if leaf == "positional_embedding":
            put((*path, "positional_embedding"), w.T)  # (C, HW+1) -> (HW+1, C)
        elif w.ndim == 4:  # conv2d: (O,I,kh,kw) -> (kh,kw,I,O)
            put((*path, "kernel"), w.transpose(2, 3, 1, 0))
        elif w.ndim == 3:  # conv1d (qkv/proj_out/qkv_proj/c_proj) -> Dense
            put((*path, "kernel"), w[..., 0].T)
        elif w.ndim == 2:  # linear
            put((*path, "kernel"), w.T)
        else:  # 1-d: a bias, or a norm affine ('weight' -> flax 'scale');
            # _fix_norm_children wraps {scale, bias} pairs under the
            # GroupNorm32 'norm' affine child afterwards
            put((*path, "scale" if leaf == "weight" else "bias"), w)
    return {"params": _fix_norm_children(p)}


def _fix_norm_children(tree: dict) -> dict:
    """GroupNorm32 stores its affine under a 'norm' child module with
    scale/bias; torch stores weight/bias directly on the norm module. After
    the mechanical remap above, any {scale, bias} pair that belongs to a
    GroupNorm32 needs wrapping as {'norm': {'scale':..., 'bias':...}}."""
    out: dict[str, Any] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            if set(v) <= {"scale", "bias"} and "scale" in v:
                out[k] = {"norm": v}
            else:
                out[k] = _fix_norm_children(v)
        else:
            out[k] = v
    return out
