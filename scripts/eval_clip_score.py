"""Region CLIP score CLI (reference: eval_tool/clip_score/region_clip_score.py).

    python scripts/eval_clip_score.py --result_dir results/test_bench/results \
        --test_bench_dir test_bench [--weights clip_vit_b32.pt]

For each result: crop to the mask bbox, embed crop + exemplar with CLIP
ViT-B/32, cosine x100, mean over pairs.
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
    p.add_argument("--result_dir", required=True)
    p.add_argument("--test_bench_dir", default="test_bench")
    p.add_argument("--weights", default="", help="CLIP ViT-B/32 state_dict")
    p.add_argument("--batch-size", type=int, default=64)
    opt = p.parse_args()

    from pbe_tpu.data.test_bench import COCOEEDataset
    from pbe_tpu.evaltools.clip_score import (
        VIT_B32, CLIPImageEmbedder, region_clip_score,
    )

    emb = (CLIPImageEmbedder.from_torch(opt.weights)
           if opt.weights else CLIPImageEmbedder(VIT_B32))
    if not opt.weights:
        print("WARNING: no --weights; CLIP is randomly initialized "
              "(score is not meaningful)", file=sys.stderr)

    ds = COCOEEDataset(opt.test_bench_dir)
    results, refs, masks = [], [], []
    for i in range(len(ds)):
        ex = ds[i]
        rp = os.path.join(opt.result_dir, f"{ex['id']}.png")
        if not os.path.exists(rp):
            continue
        results.append(np.asarray(Image.open(rp).convert("RGB"), np.float32) / 255.0)
        from pbe_tpu.data.transforms import unnormalize_clip

        refs.append(np.clip(unnormalize_clip(ex["ref"]), 0, 1))
        masks.append(1.0 - ex["mask"])
    score = region_clip_score(emb, results, refs, masks, opt.batch_size)
    print(f"region CLIP score over {len(results)} pairs: {score:.4f}")


if __name__ == "__main__":
    main()
