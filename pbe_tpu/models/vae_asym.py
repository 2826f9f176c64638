"""Detail-preserving decode for 1024²-class edits (BASELINE configs #5).

The reference pipeline decodes the full latent and returns the decoded
image everywhere — unmasked pixels are VAE round-tripped, which at 1024²
visibly softens fine detail the edit never touched. Two TPU-native
remedies, in increasing fidelity:

1. ``paste_back`` — exact: composite the decoded edit over the original
   pixels with a feathered mask. Zero extra FLOPs, bit-exact preservation
   outside the mask, a short feather hides the seam. This is the
   production default for detail preservation (pure function, fuses into
   the decode program).

2. ``AsymmetricDecoder`` — the asymmetric-VQGAN design (Zhu et al.,
   arXiv:2306.04632; the inpainting decoder shipped with SD-style
   pipelines): the decoder additionally receives the *unmasked original
   pixels* and the mask, runs a lightweight conv pyramid over them, and
   mask-blends those multi-scale features into the decode trunk at every
   resolution. Unmasked regions are then reconstructed from full-res
   pixel evidence instead of the 8×-downsampled latent, removing both the
   round-trip softening and the paste seam. Needs fine-tuned decoder
   weights to be useful (the trunk is initialized from and stays
   state-dict-compatible with the plain ``Decoder``; the conditional
   branch trains from scratch per the paper).

Layout/dtype conventions follow ``pbe_tpu.models.vae``: NHWC, bf16 compute
with fp32 GroupNorm islands, trunk module names identical to ``Decoder`` so
plain first-stage checkpoints load into the trunk as-is.

Mask convention matches the repo's data path (``data/masks.py``): mask==1
KEEP (unmasked background), mask==0 edit region.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pbe_tpu.models.vae import (
    AttnBlock,
    Downsample,
    ResnetBlock,
    Upsample,
    _conv,
)
from pbe_tpu.ops.norms import GroupNorm32


def feather_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Soften a {0,1} keep-mask with an iterated 3x3 box blur (separable,
    VPU-cheap). radius = number of blur passes ≈ half-width in pixels of
    the transition band. mask: (N, H, W, 1) in [0, 1]."""
    if radius <= 0:
        return mask

    def blur_axis(m: jnp.ndarray, axis: int) -> jnp.ndarray:
        pad = [(0, 0)] * m.ndim
        pad[axis] = (1, 1)
        p = jnp.pad(m, pad, mode="edge")
        lo = jax.lax.slice_in_dim(p, 0, m.shape[axis], axis=axis)
        hi = jax.lax.slice_in_dim(p, 2, m.shape[axis] + 2, axis=axis)
        return 0.25 * lo + 0.5 * m + 0.25 * hi

    m = mask
    for _ in range(radius):
        m = blur_axis(blur_axis(m, 1), 2)
    # every originally-kept pixel stays weight 1: the feather eats into the
    # edit region only, so preservation is bit-exact on ALL of mask==1
    return jnp.where(mask >= 1.0, jnp.ones_like(m), m)


def paste_back(
    decoded: jnp.ndarray,
    original: jnp.ndarray,
    mask: jnp.ndarray,
    feather: int = 8,
) -> jnp.ndarray:
    """Exact detail preservation: original pixels where mask==1 (keep),
    decoded pixels where mask==0, feathered transition in between.

    decoded/original: (N, H, W, 3) in the same value range; mask: (N, H, W, 1)
    with 1 = keep. With feather=0 this is a hard composite; feather>0 blurs
    only the blend weights, never the pixels, and the feather is one-sided
    (eats into the edit region), so every mask==1 pixel stays bit-exact."""
    w = feather_mask(mask.astype(decoded.dtype), feather)
    return original * w + decoded * (1.0 - w)


class MaskCondEncoder(nn.Module):
    """Conv pyramid over concat(masked original, mask) producing one feature
    map per decode-trunk resolution, widths matching the trunk's so they can
    be mask-blended in place (arXiv:2306.04632 §3.2 'conditional branch')."""

    ch: int
    ch_mult: Sequence[int]  # decoder ch_mult; level i feature width = ch*mult[i]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray, mask: jnp.ndarray) -> list[jnp.ndarray]:
        """cond: (N, H, W, 3) unmasked-original pixels (in [-1, 1]),
        mask: (N, H, W, 1), 1 = keep. Returns features coarse-to-fine order
        aligned with ``AsymmetricDecoder``'s trunk: index i ↔ level i
        (i = 0 finest, full res), plus index len(ch_mult) ↔ latent res."""
        x = jnp.concatenate([cond * mask, mask], axis=-1).astype(self.dtype)
        feats = []
        h = _conv(self.ch * self.ch_mult[0], 3, self.dtype, "conv_in")(x)
        for i_level, mult in enumerate(self.ch_mult):
            h = ResnetBlock(self.ch * mult, self.dtype,
                            name=f"level_{i_level}_block")(h)
            feats.append(h)
            # same pyramid as vae.Encoder: the last level stays at latent res
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(self.dtype, name=f"level_{i_level}_down")(h)
        h = ResnetBlock(self.ch * self.ch_mult[-1], self.dtype,
                        name="latent_block")(h)
        feats.append(h)
        return feats


def _mask_at(mask: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize the keep-mask to a trunk resolution (N, h, w, 1)."""
    n, _, _, c = mask.shape
    return jax.image.resize(mask, (n, hw[0], hw[1], c), method="nearest")


class AsymmetricDecoder(nn.Module):
    """``vae.Decoder`` trunk + mask-blended conditional features.

    Trunk submodule names are byte-identical to ``Decoder``'s, so a plain
    first-stage checkpoint initializes the trunk directly and, with
    ``blend_scale`` params at their zero init, the module computes exactly
    the plain decode (tested: test_vae_asym.py). Each resolution then
    blends in the conditional feature inside the keep region only:

        h <- h + scale_i * m_i * (f_i - h)

    with ``scale_i`` a learnable scalar starting at 0 — training moves the
    keep-region reconstruction onto pixel evidence without perturbing the
    pretrained edit-region path (paper's zero-init gating, adapted)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    cond_ch: int = 32
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, cond: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        feats = MaskCondEncoder(
            self.cond_ch, tuple(self.ch_mult), self.dtype, name="cond_encoder"
        )(cond, mask)
        n_levels = len(self.ch_mult)

        def blend(h: jnp.ndarray, idx: int) -> jnp.ndarray:
            f = feats[idx]
            if f.shape[-1] != h.shape[-1]:
                f = _conv(h.shape[-1], 1, self.dtype, f"cond_proj_{idx}")(f)
            m = _mask_at(mask.astype(h.dtype), h.shape[1:3])
            scale = self.param(f"blend_scale_{idx}", nn.initializers.zeros, ())
            return h + scale.astype(h.dtype) * m * (f - h)

        block_in = self.ch * self.ch_mult[-1]
        h = _conv(block_in, 3, self.dtype, "conv_in")(z.astype(self.dtype))
        h = ResnetBlock(block_in, self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, self.attn_impl, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_2")(h)
        h = blend(h, n_levels)
        for i_level in reversed(range(n_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    block_out, self.dtype, name=f"up_{i_level}_block_{i_block}"
                )(h)
            h = blend(h, i_level)
            if i_level != 0:
                h = Upsample(self.dtype, name=f"up_{i_level}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(self.out_ch, 3, self.dtype, "conv_out")(h)


@dataclasses.dataclass
class AsymmetricDecoderConfig:
    """YAML-constructible spec mirroring first_stage ddconfig keys."""

    ddconfig: dict[str, Any]
    cond_ch: int = 32

    def build(self, dtype: Any = jnp.float32,
              attn_impl: str = "xla") -> AsymmetricDecoder:
        dd = self.ddconfig
        return AsymmetricDecoder(
            ch=dd.get("ch", 128),
            out_ch=dd.get("out_ch", 3),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            cond_ch=self.cond_ch,
            dtype=dtype,
            attn_impl=attn_impl,
        )
