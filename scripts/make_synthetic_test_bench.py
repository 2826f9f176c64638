"""Generate a synthetic COCOEE-layout test bench for at-scale dry runs.

Writes N (GT, Ref, Mask_bbox) triples in the exact disk layout the reference
test bench uses (ldm/data/test_bench_dataset.py:61-105):

    <out>/id_list.npy
    <out>/GT_3500/<id:012>_GT.png        512x512 structured scenes
    <out>/Ref_3500/<id:012>_ref.png      exemplar = bbox crop of the GT
    <out>/Mask_bbox_3500/<id:012>_mask.png  white-in-edit-region bbox mask

Images are deterministic (seeded) smooth color fields with geometric objects,
not pure noise, so the FID/CLIP/QS eval mechanics run on data with real
low-frequency statistics. This proves the 3500-pair bench is a button-press
away once trained weights + the real COCOEE archive are available.

    python scripts/make_synthetic_test_bench.py --n 512 --out /tmp/test_bench
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def _smooth_field(rng: np.random.Generator, size: int, low_res: int = 8) -> np.ndarray:
    """Low-frequency RGB background: bilinear-upsampled random grid, [0,1]."""
    grid = rng.uniform(0.1, 0.9, (low_res, low_res, 3)).astype(np.float32)
    img = Image.fromarray((grid * 255).astype(np.uint8))
    return np.asarray(img.resize((size, size), Image.BILINEAR), np.float32) / 255.0


def _draw_objects(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Stamp 3-6 solid ellipses/rectangles of random color onto the scene."""
    size = img.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(int(rng.integers(3, 7))):
        cx, cy = rng.uniform(0.1, 0.9, 2) * size
        rx, ry = rng.uniform(0.05, 0.2, 2) * size
        color = rng.uniform(0, 1, 3).astype(np.float32)
        if rng.uniform() < 0.5:
            inside = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
        else:
            inside = (np.abs(xx - cx) <= rx) & (np.abs(yy - cy) <= ry)
        img = np.where(inside[..., None], color, img)
    return img


def make_pair(rng: np.random.Generator, size: int = 512):
    gt = _draw_objects(rng, _smooth_field(rng, size))
    # bbox mask: area between ~4% and ~25% of the image, like COCOEE boxes
    w = int(rng.uniform(0.2, 0.5) * size)
    h = int(rng.uniform(0.2, 0.5) * size)
    x0 = int(rng.uniform(0, size - w))
    y0 = int(rng.uniform(0, size - h))
    mask = np.zeros((size, size), np.float32)
    mask[y0:y0 + h, x0:x0 + w] = 1.0  # white = edit region
    ref = gt[y0:y0 + h, x0:x0 + w]
    ref = np.asarray(
        Image.fromarray((ref * 255).astype(np.uint8)).resize(
            (224, 224), Image.BILINEAR
        ),
        np.float32,
    ) / 255.0
    return gt, ref, mask


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--out", type=str, default="/tmp/test_bench")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    opt = p.parse_args()

    rng = np.random.default_rng(opt.seed)
    for sub in ("GT_3500", "Ref_3500", "Mask_bbox_3500"):
        os.makedirs(os.path.join(opt.out, sub), exist_ok=True)

    ids = []
    for i in range(opt.n):
        id_ = 100000 + i
        ids.append(id_)
        gt, ref, mask = make_pair(rng, opt.size)
        Image.fromarray((gt * 255).astype(np.uint8)).save(
            os.path.join(opt.out, "GT_3500", f"{id_:012d}_GT.png"))
        Image.fromarray((ref * 255).astype(np.uint8)).save(
            os.path.join(opt.out, "Ref_3500", f"{id_:012d}_ref.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(opt.out, "Mask_bbox_3500", f"{id_:012d}_mask.png"))
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{opt.n}", flush=True)

    np.save(os.path.join(opt.out, "id_list.npy"), np.asarray(ids, np.int64))
    print(f"wrote {opt.n} pairs to {opt.out}")


if __name__ == "__main__":
    main()
