"""Weights-arrival runbook: one command from `model.ckpt` to a parity
table against the paper's published numbers.

Quality parity (FID 3.18 / QS 77.80 / CLIP 84.97, reference README.md:
116-166) is unprovable in this sandbox — no pretrained PBE checkpoint,
Inception/CLIP metric towers, or real COCOEE archive exist here (zero
egress). Everything mechanical has been proven at 3500-pair scale
(PERF.md §2). This script makes the remaining claim a single command the
moment the assets exist:

    python scripts/weights_runbook.py \
        --ckpt model.ckpt --test_bench_dir /path/to/COCOEE \
        [--inception_weights pt_inception.pth] \
        [--clip_weights ViT-B-32.pt] [--gmm gmm.pkl] [--outdir runbook_out]

Steps (each logged, each skippable with --skip_*):
  1. convert  — torch ckpt -> JAX through the production converter;
               reports missing/unexpected/mismatched keys (strict=False
               load, ddpm.py:245-260 semantics).
  2. golden   — fixed-seed (321) 50-step PLMS edit of reference
               example_1; writes PNG + sha256 next to the results (the
               committed test golden, tests/test_golden_examples.py:122).
  2b. frozen  — export the full edit program + verify the model-code-free
               replay against the live pipeline (deployment parity with
               the real weights; scripts/verify_frozen_program.py).
  3. bench    — full test-bench inference (README.md:116-166 command
               equivalent) via scripts/inference_test_bench.py; repeated
               with --quantize int8 (step 3b) so serving quality is A/B'd
               the moment weights land (--skip_int8 to opt out).
  4. metrics  — FID (vs GT_3500), CLIP score (vs Ref_3500), QS/GMM over
               each arm's results, via the three eval CLIs.
  5. report   — PARITY_WEIGHTS.md with paper-vs-fp-vs-int8 table.

--dry_run exercises the whole chain on synthetic assets + random-init
weights (metric values meaningless by construction, mechanics proven).
"""
import argparse
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PAPER = {"FID": 3.18, "QS": 77.80, "CLIP": 84.97}  # README.md:116-166


def run(cmd: list[str], log_path: str) -> str:
    print(f"$ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, text=True,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    with open(log_path, "a") as f:
        f.write(f"$ {' '.join(cmd)}\n{proc.stdout}\n")
    print(proc.stdout[-1500:])
    if proc.returncode != 0:
        raise SystemExit(f"step failed (rc={proc.returncode}); see {log_path}")
    print(f"  [{time.time() - t0:.0f}s]", flush=True)
    return proc.stdout


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="", help="trained PBE torch .ckpt")
    p.add_argument("--config", default="configs/v1.yaml",
                   help="model YAML for every stage (tiny.yaml + "
                        "JAX_PLATFORMS=cpu gives a hardware-free dry run)")
    p.add_argument("--test_bench_dir", default="test_bench",
                   help="real COCOEE layout (id_list.npy + *_3500 dirs)")
    p.add_argument("--inception_weights", default="")
    p.add_argument("--clip_weights", default="")
    p.add_argument("--gmm", default="")
    p.add_argument("--pca", default="")
    p.add_argument("--outdir", default="runbook_out")
    p.add_argument("--n_samples", type=int, default=8, help="bench batch")
    p.add_argument("--dry_run", action="store_true",
                   help="synthetic assets + random init: mechanics only")
    p.add_argument("--bench_size", type=int, default=512,
                   help="synthetic dry-run bench image side (64 for the "
                        "CPU mechanics check)")
    p.add_argument("--skip_bench", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    p.add_argument("--skip_int8", action="store_true",
                   help="skip the int8-vs-fp quality A/B (step 3b/4b)")
    p.add_argument("--int8_static", action="store_true",
                   help="add a third arm: calibrated static-scale int8 "
                        "(--quantize int8-static, constant PTQ scales)")
    p.add_argument("--skip_frozen", action="store_true",
                   help="skip the frozen-program export+verify (step 2b)")
    opt = p.parse_args()

    os.makedirs(opt.outdir, exist_ok=True)
    log = os.path.join(opt.outdir, "runbook.log")
    py = sys.executable

    if opt.dry_run and not os.path.isdir(
        os.path.join(opt.test_bench_dir, "GT_3500")
    ):
        opt.test_bench_dir = os.path.join(opt.outdir, "synthetic_bench")
        run([py, "scripts/make_synthetic_test_bench.py", "--n", "16",
             "--size", str(opt.bench_size), "--out", opt.test_bench_dir], log)

    # 1. convert + validate ------------------------------------------------
    # (the overlay prints the strict=False missing/unexpected/mismatched
    # report; run it as a subprocess so the report lands in the log)
    if opt.ckpt:
        print("== step 1: convert ==", flush=True)
        run([py, "-c",
             "from pbe_tpu.pipelines.loading import load_pipeline; "
             f"load_pipeline({opt.config!r}, {opt.ckpt!r})"], log)
    else:
        print("== step 1: convert SKIPPED (no --ckpt; random init) ==")

    # 2. fixed-seed golden edit -------------------------------------------
    examples = os.environ.get("PBE_EXAMPLES", "/root/reference/examples")
    if os.path.isdir(examples):
        print("== step 2: seed-321 golden edit ==", flush=True)
        cmd = [py, "scripts/inference.py",
               "--image_path", f"{examples}/image/example_1.png",
               "--mask_path", f"{examples}/mask/example_1.png",
               "--reference_path", f"{examples}/reference/example_1.jpg",
               "--outdir", os.path.join(opt.outdir, "golden"),
               "--config", opt.config,
               "--seed", "321", "--scale", "5", "--plms", "--n_iter", "1"]
        if opt.dry_run:  # mechanics-only: match the synthetic bench size
            cmd += ["--H", str(opt.bench_size), "--W", str(opt.bench_size)]
        if opt.ckpt:
            cmd += ["--ckpt", opt.ckpt]
        run(cmd, log)
        import hashlib
        for root_, _, files in os.walk(os.path.join(opt.outdir, "golden")):
            for fn in sorted(files):
                if fn.endswith(".png"):
                    digest = hashlib.sha256(
                        open(os.path.join(root_, fn), "rb").read()
                    ).hexdigest()
                    print(f"  sha256({fn}) = {digest}")
                    with open(os.path.join(opt.outdir,
                                           "golden_sha256.txt"), "a") as f:
                        f.write(f"{fn} {digest}\n")
    else:
        print(f"== step 2 SKIPPED ({examples} not present) ==")

    # 2b. frozen-program deployment parity ----------------------------------
    # export + model-code-free replay of the full edit with THESE weights;
    # passes on max|diff| <= tol (see verify_frozen_program.py for why the
    # AOT path is not held to bitwise). Weights-day produces the deployment
    # artifact and its parity evidence in the same run.
    if not opt.skip_frozen:
        print("== step 2b: frozen-program verification ==", flush=True)
        cmd = [py, "scripts/verify_frozen_program.py",
               "--outdir", os.path.join(opt.outdir, "frozen"),
               "--config", opt.config]
        if opt.dry_run:
            cmd += ["--H", str(opt.bench_size), "--W", str(opt.bench_size),
                    "--steps", "2"]
        if opt.ckpt:
            cmd += ["--ckpt", opt.ckpt]
        run(cmd, log)
    else:
        print("== step 2b SKIPPED (--skip_frozen) ==")

    # 3/3b. full test-bench inference (fp, then the int8 A/B arm) ----------
    # the A/B answers "is --quantize int8 safe to serve with?" the moment
    # real weights land: same pairs, same seeds, metrics side by side
    arms = [("fp", None)] + ([] if opt.skip_int8 else [("int8", "int8")])
    if opt.int8_static and not opt.skip_int8:
        arms.append(("int8static", "int8-static"))
    results_by_arm: dict[str, str] = {}
    for arm, quantize in arms:
        bench_dir = os.path.join(
            opt.outdir, "bench" if arm == "fp" else f"bench_{arm}")
        results_by_arm[arm] = os.path.join(bench_dir, "results")
        if opt.skip_bench:
            continue
        print(f"== step 3 ({arm}): test-bench inference ==", flush=True)
        cmd = [py, "scripts/inference_test_bench.py",
               "--outdir", bench_dir,
               "--test_bench_dir", opt.test_bench_dir,
               "--config", opt.config,
               "--n_samples", str(opt.n_samples), "--plms", "--skip_grid"]
        if quantize:
            cmd += ["--quantize", quantize]
        if opt.ckpt:
            cmd += ["--ckpt", opt.ckpt]
        run(cmd, log)

    # 4. metrics (per arm) --------------------------------------------------
    measured: dict[str, dict[str, float]] = {a: {} for a, _ in arms}
    if not opt.skip_metrics:
        for arm, _ in arms:
            results = results_by_arm[arm]
            if not os.path.isdir(results):
                # e.g. --skip_bench over an outdir whose int8 arm never ran
                # (pre-A/B outdirs, or a prior --skip_int8 run): skip
                # cleanly instead of failing inside eval_fid
                print(f"== step 4 ({arm}) SKIPPED (no results at "
                      f"{results}) ==", flush=True)
                continue
            print(f"== step 4 ({arm}): metrics ==", flush=True)
            fid_cmd = [py, "scripts/eval_fid.py",
                       os.path.join(opt.test_bench_dir, "GT_3500"), results]
            if opt.inception_weights:
                fid_cmd += ["--weights", opt.inception_weights]
            out = run(fid_cmd, log)
            m = re.search(r"FID[:=]?\s*([0-9.]+)", out)
            if m:
                measured[arm]["FID"] = float(m.group(1))

            clip_cmd = [py, "scripts/eval_clip_score.py",
                        "--result_dir", results,
                        "--test_bench_dir", opt.test_bench_dir]
            if opt.clip_weights:
                clip_cmd += ["--weights", opt.clip_weights]
            out = run(clip_cmd, log)
            m = re.search(
                r"(?:CLIP|clip)[ _-]?score[^:=\n]*[:=]\s*([0-9.]+)", out)
            if m:
                measured[arm]["CLIP"] = float(m.group(1))

            if opt.gmm:
                gmm_cmd = [py, "scripts/eval_gmm.py", results,
                           "--gmm", opt.gmm]
                if opt.pca:
                    gmm_cmd += ["--pca", opt.pca]
                if opt.inception_weights:
                    gmm_cmd += ["--weights", opt.inception_weights]
                out = run(gmm_cmd, log)
                m = re.search(
                    r"(?:QS|quality[ _-]?score)[:=]?\s*([0-9.]+)", out, re.I)
                if m:
                    measured[arm]["QS"] = float(m.group(1))
            else:
                print("  (no --gmm pickle: QS skipped)")

    # 5. parity report ------------------------------------------------------
    lines = [
        "# Weights parity report",
        "",
        f"- checkpoint: `{opt.ckpt or 'RANDOM INIT (dry run)'}`",
        f"- test bench: `{opt.test_bench_dir}`",
        f"- metric towers: inception=`{opt.inception_weights or 'RANDOM'}` "
        f"clip=`{opt.clip_weights or 'RANDOM'}` gmm=`{opt.gmm or 'NONE'}`",
        "",
        "| metric | paper (README.md:116-166) | measured (fp) |"
        " measured (int8) | note |",
        "|---|---|---|---|---|",
    ]
    trustworthy = bool(opt.ckpt) and bool(opt.inception_weights)
    for k, paper_v in PAPER.items():
        v = measured.get("fp", {}).get(k)
        v8 = measured.get("int8", {}).get(k)
        note = ("" if trustworthy else
                "random-init towers/weights: value meaningless")
        lines.append(
            f"| {k} | {paper_v} | {v if v is not None else '—'} "
            f"| {v8 if v8 is not None else '—'} | {note} |"
        )
    report_path = os.path.join(opt.outdir, "PARITY_WEIGHTS.md")
    with open(report_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {report_path}")


if __name__ == "__main__":
    main()
