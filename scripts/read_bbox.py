"""Open-Images annotation prep (reference: scripts/read_bbox.py:1-54).

Converts Open-Images bbox CSV annotations into per-image txt files of pixel
bboxes, filtering boxes covering >80% or <2% of the image area, laid out as
pbe_tpu.data.openimages expects:

    python scripts/read_bbox.py --csv oidv6-train-annotations-bbox.csv \
        --image_dir dataset/open-images/images/train \
        --out_dir dataset/open-images/bbox/train

CSV columns used: ImageID, XMin, XMax, YMin, YMax (normalized [0,1]).
"""
import argparse
import csv
import os
from collections import defaultdict

from PIL import Image


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--min_area_frac", type=float, default=0.02)
    p.add_argument("--max_area_frac", type=float, default=0.8)
    opt = p.parse_args()

    boxes = defaultdict(list)
    with open(opt.csv) as f:
        for row in csv.DictReader(f):
            boxes[row["ImageID"]].append(
                (float(row["XMin"]), float(row["YMin"]),
                 float(row["XMax"]), float(row["YMax"]))
            )

    os.makedirs(opt.out_dir, exist_ok=True)
    written = 0
    for image_id, blist in boxes.items():
        img_path = None
        for ext in (".jpg", ".jpeg", ".png"):
            cand = os.path.join(opt.image_dir, image_id + ext)
            if os.path.exists(cand):
                img_path = cand
                break
        if img_path is None:
            continue
        w, h = Image.open(img_path).size
        lines = []
        for x1, y1, x2, y2 in blist:
            area_frac = (x2 - x1) * (y2 - y1)
            if not (opt.min_area_frac < area_frac < opt.max_area_frac):
                continue
            lines.append(f"{x1 * w:.1f} {y1 * h:.1f} {x2 * w:.1f} {y2 * h:.1f}")
        if lines:
            with open(os.path.join(opt.out_dir, image_id + ".txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
            written += 1
    print(f"wrote bbox files for {written} images to {opt.out_dir}")


if __name__ == "__main__":
    main()
