"""COCOEE test-bench batch inference — flag surface matching the reference
scripts/inference_test_bench.py (same knobs as inference.py plus the bench
directory). Shards the 3500 pairs into batches and writes per-id results for
the eval tools (:316-403 behavior)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", type=str, default="results/test_bench")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--n_samples", type=int, default=4, help="batch size")
    p.add_argument("--config", type=str, default="configs/v1.yaml")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=321)
    p.add_argument("--precision", choices=["full", "autocast"], default="autocast")
    p.add_argument("--test_bench_dir", type=str, default="test_bench")
    p.add_argument("--limit", type=int, default=0, help="cap pairs (0 = all 3500)")
    p.add_argument("--skip_grid", action="store_true")
    p.add_argument("--paste_back", type=int, default=None, metavar="FEATHER",
                   help="detail-preserving composite outside the mask "
                        "(feather px; omit for reference parity)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over all local devices (multi-chip "
                        "serving; ragged final batches are padded+trimmed)")
    p.add_argument("--uint8_out", action="store_true",
                   help="read results back as device-converted uint8 "
                        "(4x smaller D2H; PNGs may differ by 1 LSB from "
                        "the float path on rounding boundaries)")
    p.add_argument("--det_first_stage", action="store_true",
                   help="posterior-MODE masked-source latents "
                        "(batch-size-invariant; reference samples)")
    p.add_argument("--quantize", choices=["int8", "int8-static"],
                   default=None,
                   help="w8a8 int8 UNet execution — opt-in quality/speed "
                        "A/B knob; the ragged final batch compiles its own "
                        "bucket, whose int8 rounding may differ ~1e-2 from "
                        "the full-batch program (tests/test_quant.py). "
                        "int8-static calibrates constant scales on the "
                        "first test-bench example (no runtime amax)")
    opt = p.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from pbe_tpu.data import transforms as T
    from pbe_tpu.data.loader import DataLoader
    from pbe_tpu.data.test_bench import COCOEEDataset
    from pbe_tpu.pipelines.batch import infer_batch, visualize_batch
    from pbe_tpu.pipelines.loading import load_pipeline
    from pbe_tpu.utils.async_writer import AsyncWriter

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    qmode = "int8" if opt.quantize else None
    pipeline, _ = load_pipeline(opt.config, opt.ckpt or None, dtype=dtype,
                                quantize=qmode)

    ds = COCOEEDataset(opt.test_bench_dir)
    if opt.quantize == "int8-static":
        ex = ds[0]  # real test-bench statistics for the PTQ scales
        pipeline.quant_scales = pipeline.calibrate_int8(
            ex["image"][None], ex["mask"][None], ex["ref"][None],
            seed=opt.seed)
        print(f"calibrated {len(pipeline.quant_scales)} static int8 op "
              "scales on the first test-bench example", flush=True)
    if opt.data_parallel:
        pipeline.shard()
    if opt.limit:
        ds.ids = ds.ids[: opt.limit]
    dl = DataLoader(ds, opt.n_samples, shuffle=False, drop_last=False)

    result_dir = os.path.join(opt.outdir, "results")
    grid_dir = os.path.join(opt.outdir, "grid")
    os.makedirs(result_dir, exist_ok=True)

    def save_results(ids, preds, batch):
        u8 = preds.dtype == np.uint8
        for i, id_ in enumerate(ids):
            path = os.path.join(result_dir, f"{id_}.png")
            if u8:
                Image.fromarray(preds[i]).save(path)
            else:
                T.save_image(preds[i], path)
        if not opt.skip_grid:
            visualize_batch(
                batch,
                preds.astype(np.float32) / 255.0 if u8 else preds,
                grid_dir, ids=ids)

    # PNG encode/save rides a bounded background queue so the device never
    # idles on host IO (round-2 measured 0.72 edits/s sync vs 1.11
    # device-only on this single-core host — PERF.md §2)
    total, t_total = 0, 0.0
    t_run = time.time()
    steady_t0, steady_n0 = None, 0  # wall clock from after the first batch
    with AsyncWriter(workers=2, max_queue=4) as writer:
        for batch in dl:
            t0 = time.time()
            preds = infer_batch(
                pipeline, batch, steps=opt.ddim_steps, scale=opt.scale,
                sampler="plms" if opt.plms else "ddim", eta=opt.ddim_eta,
                seed=opt.seed, paste_back=opt.paste_back,
                det_first_stage=opt.det_first_stage,
                output="uint8" if opt.uint8_out else "float32",
            )
            t_total += time.time() - t0
            writer.submit(save_results, list(batch["id"]), preds, batch)
            total += len(preds)
            if steady_t0 is None:
                # first batch paid the compile + cache load; steady-state
                # wall rate (incl. host decode/encode IO) starts here
                steady_t0, steady_n0 = time.time(), total
            print(f"{total}/{len(ds)} pairs, "
                  f"{total / max(t_total, 1e-9):.3f} edits/s device-side",
                  flush=True)

    wall = time.time() - t_run
    msg = (f"done: {total} edits in {wall:.1f}s wall / {t_total:.1f}s "
           f"device-side ({total / max(t_total, 1e-9):.3f} edits/s "
           f"device-side incl. first compile)")
    if steady_t0 is not None and total > steady_n0:
        steady = (total - steady_n0) / max(time.time() - steady_t0, 1e-9)
        msg += f"; steady-state {steady:.3f} edits/s wall incl. host IO"
    print(msg)


if __name__ == "__main__":
    main()
