"""Region CLIP score.

Spec: eval_tool/clip_score/region_clip_score.py:28-43 — for each (result,
exemplar) pair: crop the result to the mask bbox, resize to 224, embed both
with CLIP ViT-B/32 image encoder, cosine similarity x100, mean over pairs.

The embedder here is the pbe_tpu CLIP tower + the CLIP joint-space visual
projection; weights come from any HF CLIPVisionModelWithProjection /
CLIPModel state_dict via the converter (bring your own file, no egress).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pbe_tpu.data.masks import mask_bbox
from pbe_tpu.models.clip_vit import CLIPVisionConfig


VIT_B32 = CLIPVisionConfig(
    hidden_size=768, num_layers=12, num_heads=12, mlp_dim=3072,
    patch_size=32, image_size=224,
)


class CLIPImageEmbedder:
    """pooled CLIP features + optional joint-space projection + L2 norm."""

    def __init__(self, config: CLIPVisionConfig = VIT_B32,
                 variables: dict | None = None,
                 projection: np.ndarray | None = None, seed: int = 0):
        self.tower = config.build()
        if variables is None:
            variables = jax.jit(self.tower.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, config.image_size, config.image_size, 3)),
            )
        self.variables = variables
        self.projection = None if projection is None else jnp.asarray(projection)
        use_proj = self.projection is not None

        # weights are runtime args, NOT closure constants — closing over them
        # would bake hundreds of MB into the compiled program
        def embed(variables, proj, x):
            _, pooled = self.tower.apply(variables, x)
            if use_proj:
                pooled = pooled @ proj
            return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)

        jitted = jax.jit(embed)
        self._embed = lambda x: jitted(self.variables, self.projection, x)

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        """(B,224,224,3) in [0,1] -> (B,D) unit embeddings."""
        from pbe_tpu.data.transforms import CLIP_MEAN, CLIP_STD

        x = (np.asarray(images01, np.float32) - CLIP_MEAN) / CLIP_STD
        return np.asarray(self._embed(jnp.asarray(x)))

    @classmethod
    def from_torch(cls, path: str, config: CLIPVisionConfig = VIT_B32):
        """Load from an HF CLIPModel / CLIPVisionModelWithProjection
        state_dict file (visual_projection.weight picked up if present)."""
        import torch

        from pbe_tpu.convert import convert_clip_vision_state_dict

        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
              for k, v in sd.items()}
        proj = None
        if "visual_projection.weight" in sd:
            proj = np.transpose(sd.pop("visual_projection.weight"), (1, 0))
        variables, _ = convert_clip_vision_state_dict(sd)
        return cls(config, variables=variables, projection=proj)


def crop_to_mask_bbox(image01: np.ndarray, mask_edit: np.ndarray,
                      size: int = 224) -> np.ndarray:
    """Crop result to the tight bbox of the edit region, resize to 224
    (region_clip_score.py:31-38 / test_bench_dataset.py:80-86)."""
    bb = mask_bbox(mask_edit)
    if bb is None:
        crop = image01
    else:
        x1, y1, x2, y2 = bb
        crop = image01[y1:y2, x1:x2]
    img = Image.fromarray((np.clip(crop, 0, 1) * 255).astype(np.uint8))
    return np.asarray(img.resize((size, size), Image.BICUBIC), np.float32) / 255.0


def region_clip_score(
    embedder: CLIPImageEmbedder,
    results01: list[np.ndarray],
    refs01: list[np.ndarray],
    masks_edit: list[np.ndarray],
    batch_size: int = 64,
) -> float:
    """Mean cosine x100 over pairs."""
    crops = np.stack([
        crop_to_mask_bbox(r, m) for r, m in zip(results01, masks_edit)
    ])
    refs = np.stack([
        np.asarray(
            Image.fromarray((np.clip(r, 0, 1) * 255).astype(np.uint8)).resize(
                (224, 224), Image.BICUBIC), np.float32) / 255.0
        for r in refs01
    ])
    sims = []
    for i in range(0, len(crops), batch_size):
        a = embedder(crops[i:i + batch_size])
        b = embedder(refs[i:i + batch_size])
        sims.append((a * b).sum(axis=-1))
    return float(np.concatenate(sims).mean() * 100.0)
