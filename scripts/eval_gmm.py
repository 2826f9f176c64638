"""QS (GMM) score CLI (reference: eval_tool/gmm/gmm_score_coco.py).

    python scripts/eval_gmm.py <dir> --gmm gmm.pkl [--pca pca.pkl]
        [--weights inception.pt] [--output_file scores.txt]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--gmm", required=True, help="pretrained sklearn GMM pickle")
    p.add_argument("--pca", default="", help="optional PCA pickle")
    p.add_argument("--weights", default="", help="Inception state_dict")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--output_file", default="")
    opt = p.parse_args()

    from pbe_tpu.evaltools.fid import list_images, make_inception_feature_fn
    from pbe_tpu.evaltools.gmm_score import gmm_score, load_gmm

    feature_fn = make_inception_feature_fn(opt.weights or None)
    gmm = load_gmm(opt.gmm)
    pca = load_gmm(opt.pca) if opt.pca else None

    files = list_images(opt.path)
    images = [
        np.asarray(
            Image.open(f).convert("RGB").resize((299, 299), Image.BILINEAR),
            np.float32,
        ) / 255.0
        for f in files
    ]
    score = gmm_score(feature_fn, images, gmm, pca, opt.batch_size)
    if opt.output_file:
        with open(opt.output_file, "w") as f:
            f.write(f"{score}\n")
    print(f"QS score of this folder is: {score:.4f}")


if __name__ == "__main__":
    main()
