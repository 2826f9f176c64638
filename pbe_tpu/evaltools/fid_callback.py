"""In-training FID trio: global / local (mask-bbox crops) / ref-vs-crop.

Spec: callback_fid.py:79-189 of the reference —
  * fid_global: full GT images vs full predictions
  * fid_local: 299^2 crops of the mask bbox from GT vs prediction
    (roi_align there; bilinear scale_and_translate here — the TPU-native
    replacement for torchvision.ops.roi_align, SURVEY section 2 table)
  * fid_ref: exemplar images vs prediction crops
Accumulated with streaming statistics across batches, logged at epoch end as
test/fid_{global,local,ref}.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.evaltools.fid import RunningStats, frechet_distance


def bboxes_from_masks(masks_edit: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,1) edit masks -> (B,4) [y1,x1,y2,x2] float boxes; full image
    when the mask is empty (callback_fid.py:23-34)."""
    m = masks_edit[..., 0] > 0.5
    h, w = m.shape[1:3]
    rows = m.any(axis=2)
    cols = m.any(axis=1)
    ridx = jnp.arange(h)[None, :]
    cidx = jnp.arange(w)[None, :]
    y1 = jnp.min(jnp.where(rows, ridx, h), axis=1)
    y2 = jnp.max(jnp.where(rows, ridx + 1, 0), axis=1)
    x1 = jnp.min(jnp.where(cols, cidx, w), axis=1)
    x2 = jnp.max(jnp.where(cols, cidx + 1, 0), axis=1)
    empty = ~m.any(axis=(1, 2))
    y1 = jnp.where(empty, 0, y1)
    x1 = jnp.where(empty, 0, x1)
    y2 = jnp.where(empty, h, y2)
    x2 = jnp.where(empty, w, x2)
    return jnp.stack([y1, x1, y2, x2], axis=1).astype(jnp.float32)


def crop_and_resize(
    images: jnp.ndarray, boxes: jnp.ndarray, size: int = 299
) -> jnp.ndarray:
    """Bilinear ROI crop-and-resize, (B,H,W,C) + (B,4 yxyx) -> (B,size,size,C)."""

    def one(img, box):
        y1, x1, y2, x2 = box
        scale = jnp.stack([size / (y2 - y1), size / (x2 - x1)])
        translation = jnp.stack([-y1 * scale[0], -x1 * scale[1]])
        return jax.image.scale_and_translate(
            img, (size, size, img.shape[-1]), (0, 1), scale, translation,
            method="bilinear",
        )

    return jax.vmap(one)(images, boxes)


class FIDTrioTracker:
    """Streaming FID over (real, fake) pairs for global/local/ref views."""

    def __init__(self, feature_fn, size: int = 299):
        self.feature_fn = feature_fn
        self.size = size
        self.stats = {
            name: (RunningStats(), RunningStats())
            for name in ("global", "local", "ref")
        }
        self._crop = jax.jit(lambda im, bx: crop_and_resize(im, bx, size))

    def _feats(self, images01: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.clip(images01, 0.0, 1.0), jnp.float32)
        if x.shape[1] != self.size:
            x = jax.image.resize(
                x, (x.shape[0], self.size, self.size, x.shape[-1]), "bilinear"
            )
        return np.asarray(self.feature_fn(x))

    def update(self, batch: dict, preds01: np.ndarray) -> None:
        """batch: canonical dict (image [-1,1], mask keep, ref CLIP-norm);
        preds01: (B,H,W,3) in [0,1]."""
        from pbe_tpu.data.transforms import unnormalize, unnormalize_clip

        gt01 = unnormalize(np.asarray(batch["image"]))
        ref01 = np.clip(unnormalize_clip(np.asarray(batch["ref"])), 0, 1)
        edit_mask = 1.0 - np.asarray(batch["mask"])

        real_g, fake_g = self.stats["global"]
        real_g.update(self._feats(gt01))
        fake_g.update(self._feats(preds01))

        boxes = bboxes_from_masks(jnp.asarray(edit_mask))
        gt_crop = np.asarray(self._crop(jnp.asarray(gt01), boxes))
        pred_crop = np.asarray(self._crop(jnp.asarray(preds01), boxes))
        real_l, fake_l = self.stats["local"]
        real_l.update(self._feats(gt_crop))
        fake_l.update(self._feats(pred_crop))

        real_r, fake_r = self.stats["ref"]
        real_r.update(self._feats(ref01))
        fake_r.update(self._feats(pred_crop))

    def compute(self) -> dict[str, float]:
        out = {}
        for name, (real, fake) in self.stats.items():
            mu1, s1 = real.finalize()
            mu2, s2 = fake.finalize()
            out[f"fid_{name}"] = frechet_distance(mu1, s1, mu2, s2)
        return out
