"""Two-folder FID CLI (reference: eval_tool/fid/fid_score.py).

    python scripts/eval_fid.py <dir1> <dir2> [--weights inception.pt]
                               [--batch-size 50] [--clip-features]

With --weights, features come from a converted torchvision InceptionV3
state_dict; --clip-features switches to the CLIP tower (bring weights too).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("paths", nargs=2)
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--weights", type=str, default="",
                   help="torchvision InceptionV3 state_dict (.pt/.pth)")
    p.add_argument("--clip-features", action="store_true",
                   help="use CLIP ViT-B/32 features instead of Inception")
    p.add_argument("--clip-weights", type=str, default="")
    opt = p.parse_args()

    from pbe_tpu.evaltools.fid import fid_between_dirs, make_inception_feature_fn

    if opt.clip_features:
        from pbe_tpu.evaltools.clip_score import VIT_B32, CLIPImageEmbedder

        emb = (CLIPImageEmbedder.from_torch(opt.clip_weights)
               if opt.clip_weights else CLIPImageEmbedder(VIT_B32))
        feature_fn, size = emb, 224
    else:
        if not opt.weights:
            print("WARNING: no --weights; Inception is randomly initialized "
                  "(FID value is not meaningful)", file=sys.stderr)
        feature_fn = make_inception_feature_fn(opt.weights or None)
        size = 299

    fid = fid_between_dirs(
        opt.paths[0], opt.paths[1], feature_fn,
        batch_size=opt.batch_size, size=size,
    )
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
