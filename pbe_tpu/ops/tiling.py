"""Fold/unfold spatial tiling (the reference's split_input_params path).

Rebuilds latent_diffusion.py:280-367 (delta_border / get_weighting /
get_fold_unfold) and the tiled apply_model/first-stage loops
(latent_diffusion.py:656-736, 444-508) as pure JAX functions, TPU-first:

  * the reference runs ONE CUDA dispatch PER CROP in a Python loop
    (latent_diffusion.py:713); here all L crops are folded into the batch
    dimension and the wrapped function runs ONCE at batch L*B — the MXU sees
    one large program, XLA fuses the stitch.
  * crop extraction/stitching use static slice indices (kernel/stride are
    Python ints), so everything jits with no dynamic shapes.
  * border-distance weighting matches the reference bit-for-bit: normalized
    min-distance-to-border clipped to [clip_min_weight, clip_max_weight],
    optionally tie-broken by the same map over the (Ly, Lx) crop grid
    (latent_diffusion.py:286-316).

``uf``/``df`` mirror the reference semantics: the wrapped fn up/downsamples
its patch by that factor (VAE decode: uf=8; encode: df=8), and stitching
happens at the output resolution (latent_diffusion.py:338-363).

This is the model-parallel fallback for resolutions beyond what one chip's
flash attention covers; at 1024^2 (16384 tokens) the grid-streamed flash
kernel already handles the UNet un-tiled, so tiling is an OPT-IN mode:
off by default, enabled per-pipeline via ``EditPipeline(tiling=TilingSpec
(...))`` or on the CLI via ``--tile_ks/--tile_stride`` (it wraps the eps
model inside the sampler loop; see pipelines/inference.py).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TilingSpec:
    """split_input_params subset controlling the crop grid + weighting
    (latent_diffusion.py:302-316; configs use e.g. ks=(128,128),
    stride=(64,64))."""

    ks: tuple[int, int]
    stride: tuple[int, int]
    clip_min_weight: float = 0.01
    clip_max_weight: float = 0.5
    tie_braker: bool = True
    clip_min_tie_weight: float = 0.01
    clip_max_tie_weight: float = 0.5


def delta_border(h: int, w: int) -> np.ndarray:
    """Normalized distance to the nearest border: 0 at the edge, 0.5 at the
    center (latent_diffusion.py:286-298). Degenerate 1-wide axes (a
    single-crop grid's tie-breaker map) use a guarded denominator instead
    of the reference's 0/0 NaN — the constant cancels in the fold's
    num/den anyway."""
    y = np.broadcast_to(
        np.arange(h, dtype=np.float64)[:, None] / max(h - 1, 1), (h, w))
    x = np.broadcast_to(
        np.arange(w, dtype=np.float64)[None, :] / max(w - 1, 1), (h, w))
    dist = np.minimum.reduce([y, x, 1.0 - y, 1.0 - x])
    return dist.astype(np.float32)


def tile_weighting(kh: int, kw: int, ly: int, lx: int, spec: TilingSpec) -> np.ndarray:
    """Per-pixel stitch weights for one crop, (kh, kw, ly*lx)
    (latent_diffusion.py:300-316)."""
    w = np.clip(delta_border(kh, kw), spec.clip_min_weight, spec.clip_max_weight)
    w = np.repeat(w[:, :, None], ly * lx, axis=2)
    if spec.tie_braker:
        tie = np.clip(delta_border(ly, lx), spec.clip_min_tie_weight,
                      spec.clip_max_tie_weight).reshape(-1)
        w = w * tie[None, None, :]
    return w.astype(np.float32)


def _grid(h: int, w: int, ks: tuple[int, int], stride: tuple[int, int]):
    ly = (h - ks[0]) // stride[0] + 1
    lx = (w - ks[1]) // stride[1] + 1
    if ly < 1 or lx < 1:
        raise ValueError(f"kernel {ks} larger than input ({h}, {w})")
    if (h - ks[0]) % stride[0] or (w - ks[1]) % stride[1]:
        raise ValueError(
            f"tiling must cover the input exactly: ({h},{w}) with ks={ks} "
            f"stride={stride} leaves a remainder (same constraint as torch "
            "Fold/Unfold round-tripping)"
        )
    return ly, lx


def unfold(x: jnp.ndarray, ks: tuple[int, int], stride: tuple[int, int]) -> jnp.ndarray:
    """x (B, H, W, C) -> crops (L, B, kh, kw, C), row-major over the grid
    (torch Unfold order, latent_diffusion.py:668-671)."""
    _, h, w, _ = x.shape
    ly, lx = _grid(h, w, ks, stride)
    crops = [
        x[:, iy * stride[0]: iy * stride[0] + ks[0],
          ix * stride[1]: ix * stride[1] + ks[1], :]
        for iy in range(ly) for ix in range(lx)
    ]
    return jnp.stack(crops, axis=0)


def fold(crops: jnp.ndarray, out_hw: tuple[int, int],
         stride: tuple[int, int]) -> jnp.ndarray:
    """crops (L, B, kh, kw, C) -> (B, H, W, C) by overlap-summing (torch
    Fold semantics)."""
    l, b, kh, kw, c = crops.shape
    h, w = out_hw
    ly, lx = _grid(h, w, (kh, kw), stride)
    assert ly * lx == l, (ly, lx, l)
    out = jnp.zeros((b, h, w, c), crops.dtype)
    for i in range(l):
        iy, ix = divmod(i, lx)
        out = out.at[:, iy * stride[0]: iy * stride[0] + kh,
                     ix * stride[1]: ix * stride[1] + kw, :].add(crops[i])
    return out


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    spec: TilingSpec,
    uf: int = 1,
    df: int = 1,
) -> jnp.ndarray:
    """Apply `fn` over overlapping crops and stitch with border weighting
    (latent_diffusion.py:656-736 / 444-508, batched over crops).

    fn maps (N, kh, kw, C) -> (N, kh*uf/df, kw*uf/df, C'); exactly one of
    uf/df may exceed 1 (upsampling decode / downsampling encode)."""
    if uf > 1 and df > 1:
        raise NotImplementedError("uf and df cannot both exceed 1")
    b, h, w, _ = x.shape
    ks, stride = spec.ks, spec.stride
    ly, lx = _grid(h, w, ks, stride)
    scale = uf if uf > 1 else 1
    if df > 1:
        if ks[0] % df or ks[1] % df or stride[0] % df or stride[1] % df:
            raise ValueError("ks/stride must be divisible by df")

    crops = unfold(x, ks, stride)  # (L, B, kh, kw, C)
    l = crops.shape[0]
    flat = crops.reshape(l * b, *crops.shape[2:])
    out = fn(flat)  # ONE batched call for all crops
    okh = ks[0] * scale // (df if df > 1 else 1)
    okw = ks[1] * scale // (df if df > 1 else 1)
    if out.shape[1:3] != (okh, okw):
        raise ValueError(
            f"fn returned spatial {out.shape[1:3]}, expected ({okh}, {okw}) "
            f"for uf={uf} df={df}"
        )
    out = out.reshape(l, b, okh, okw, out.shape[-1])

    weighting = jnp.asarray(tile_weighting(okh, okw, ly, lx, spec))
    # (kh,kw,L) -> (L,1,kh,kw,1) to broadcast over batch/channels
    wgt = jnp.moveaxis(weighting, -1, 0)[:, None, :, :, None].astype(out.dtype)
    ostride = (
        stride[0] * scale // (df if df > 1 else 1),
        stride[1] * scale // (df if df > 1 else 1),
    )
    out_hw = (
        h * scale // (df if df > 1 else 1),
        w * scale // (df if df > 1 else 1),
    )
    num = fold(out * wgt, out_hw, ostride)
    den = fold(jnp.broadcast_to(wgt, (l, 1, okh, okw, 1)), out_hw, ostride)
    return num / den
