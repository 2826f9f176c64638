"""Stable-Diffusion safety checker, TPU-native.

Behavioral spec: diffusers' ``StableDiffusionSafetyChecker`` as loaded by
the reference at scripts/inference.py:28-30 and invoked through
``check_safety`` (:97-100, :350): a CLIP vision tower whose projected pooled
embedding is cosine-compared against 17 fixed "concept" and 3 "special care"
embeddings; an image is flagged when any per-concept score
``round(cos - threshold + adjustment, 3)`` is positive, where the 0.01
adjustment kicks in once any special-care score is positive, and flagged
images are replaced by black frames.

The reference *discards* the checker's verdict one line after computing it
(scripts/inference.py:351, ``x_checked_image = x_samples_ddim``), so the CLI
default here is report-only; ``--enforce_safety`` applies the blackout the
reference skips. The checker only runs when the user supplies the
``CompVis/stable-diffusion-safety-checker`` weights (zero-egress machine:
nothing is downloaded).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.models.clip_vit import CLIPVisionTower
from pbe_tpu.ops.image import normalize_clip


def cosine_distance(image_embeds: jnp.ndarray, concept_embeds: jnp.ndarray) -> jnp.ndarray:
    """Row-normalized ``image_embeds @ concept_embeds.T`` (diffusers'
    ``cosine_distance``; despite the name it is a cosine *similarity*)."""
    a = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = concept_embeds / jnp.linalg.norm(concept_embeds, axis=-1, keepdims=True)
    return a @ b.T


def _round3(x: jnp.ndarray) -> jnp.ndarray:
    # diffusers rounds scores to 3 decimals before comparing against 0
    return jnp.round(x * 1000.0) / 1000.0


def safety_scores(
    image_embeds: jnp.ndarray,
    concept_embeds: jnp.ndarray,
    concept_thresholds: jnp.ndarray,
    special_embeds: jnp.ndarray,
    special_thresholds: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(has_nsfw[b], concept_scores[b,17], special_scores[b,3]).

    Vectorization of the diffusers per-image loop: the running
    ``adjustment`` starts at 0 and becomes 0.01 only *after* a special
    score goes positive, so the first positive special score is always
    evaluated at adjustment 0 — "any special care" is exactly
    ``any(round3(cos - thr) > 0)``, and all concept scores then share the
    0.01 adjustment.
    """
    special_cos = cosine_distance(image_embeds, special_embeds)
    concept_cos = cosine_distance(image_embeds, concept_embeds)
    special_scores = _round3(special_cos - special_thresholds)
    special_care = jnp.any(special_scores > 0, axis=-1)
    adjustment = jnp.where(special_care, 0.01, 0.0)
    concept_scores = _round3(concept_cos - concept_thresholds + adjustment[:, None])
    has_nsfw = jnp.any(concept_scores > 0, axis=-1)
    return has_nsfw, concept_scores, special_scores


class SafetyChecker(nn.Module):
    """CLIP vision tower + visual projection + fixed concept banks.

    Param tree mirrors the diffusers state_dict for mechanical conversion
    (``convert.safety.convert_safety_checker_state_dict``).
    """

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 768
    num_concepts: int = 17
    num_special: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        """pixel_values: (b, image_size, image_size, 3) CLIP-normalized."""
        _, pooled = CLIPVisionTower(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            patch_size=self.patch_size,
            image_size=self.image_size,
            dtype=self.dtype,
            name="vision_model",
        )(pixel_values)
        embeds = nn.Dense(
            self.projection_dim, use_bias=False, dtype=jnp.float32,
            param_dtype=jnp.float32, name="visual_projection",
        )(pooled.astype(jnp.float32))
        ones = nn.initializers.ones
        concept = self.param(
            "concept_embeds", ones, (self.num_concepts, self.projection_dim),
            jnp.float32)
        special = self.param(
            "special_care_embeds", ones, (self.num_special, self.projection_dim),
            jnp.float32)
        c_thr = self.param(
            "concept_embeds_weights", ones, (self.num_concepts,), jnp.float32)
        s_thr = self.param(
            "special_care_embeds_weights", ones, (self.num_special,), jnp.float32)
        return safety_scores(embeds, concept, c_thr, special, s_thr)


def preprocess_for_safety(images01: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[0,1] NHWC frames -> CLIP-normalized (b, image_size, image_size, 3).

    Mirrors the CLIPFeatureExtractor the reference builds at
    scripts/inference.py:29 (shortest-edge bicubic resize, center crop,
    CLIP normalize). All shapes are static at trace time.
    """
    b, h, w, c = images01.shape
    if h <= w:
        nh, nw = image_size, max(image_size, round(w * image_size / h))
    else:
        nh, nw = max(image_size, round(h * image_size / w)), image_size
    x = jax.image.resize(images01, (b, nh, nw, c), method="cubic")
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    x = x[:, top:top + image_size, left:left + image_size, :]
    return normalize_clip(jnp.clip(x, 0.0, 1.0))


@dataclasses.dataclass
class LoadedSafetyChecker:
    """A converted checker bound to jitted apply: ``check(images01)``."""

    module: SafetyChecker
    params: dict
    _apply: Callable = dataclasses.field(init=False)

    def __post_init__(self):
        def fwd(params, images01):
            pixel_values = preprocess_for_safety(images01, self.module.image_size)
            has_nsfw, _, _ = self.module.apply(params, pixel_values)
            return has_nsfw

        self._apply = jax.jit(fwd)

    def check(self, images01: np.ndarray, enforce: bool = False
              ) -> tuple[np.ndarray, list[bool]]:
        """images01: (b,h,w,3) float [0,1]. Returns (images, has_nsfw).

        With ``enforce`` the flagged frames are blacked out (what diffusers
        does); without, images pass through untouched (what the reference
        effectively does at scripts/inference.py:351).
        """
        has_nsfw = [bool(v) for v in np.asarray(self._apply(self.params, images01))]
        out = np.array(images01, copy=True)
        if enforce:
            for i, flag in enumerate(has_nsfw):
                if flag:
                    out[i] = 0.0
        return out, has_nsfw


def load_safety_checker(path: str, dtype: Any = jnp.float32) -> LoadedSafetyChecker:
    """Build a SafetyChecker from a diffusers checkpoint (.bin/.pt/.ckpt
    torch state_dict or .safetensors), inferring the geometry from shapes."""
    from pbe_tpu.convert.torch_ckpt import (
        convert_safety_checker_state_dict,
        load_torch_checkpoint,
    )

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        sd = load_torch_checkpoint(path)

    pos = sd["vision_model.vision_model.embeddings.position_embedding.weight"]
    patch = sd["vision_model.vision_model.embeddings.patch_embedding.weight"]
    fc1 = sd["vision_model.vision_model.encoder.layers.0.mlp.fc1.weight"]
    n_layers = 1 + max(
        int(k.split(".")[4]) for k in sd
        if k.startswith("vision_model.vision_model.encoder.layers.")
    )
    hidden = int(patch.shape[0])
    patch_size = int(patch.shape[-1])
    grid = int(round((pos.shape[0] - 1) ** 0.5))
    module = SafetyChecker(
        hidden_size=hidden,
        num_layers=n_layers,
        num_heads=hidden // 64,
        mlp_dim=int(fc1.shape[0]),
        patch_size=patch_size,
        image_size=grid * patch_size,
        projection_dim=int(sd["visual_projection.weight"].shape[0]),
        num_concepts=int(sd["concept_embeds"].shape[0]),
        num_special=int(sd["special_care_embeds"].shape[0]),
        dtype=dtype,
    )
    params, dropped = convert_safety_checker_state_dict(sd)
    return LoadedSafetyChecker(module=module, params=params)
