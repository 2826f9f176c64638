"""Subprocess smoke test for scripts/inference_test_bench.py (reference
scripts/inference_test_bench.py:316-403 surface): synthetic COCOEE dir,
tiny config, CPU — covers the batch loop + async writer + the uint8
device-readback path end-to-end and checks uint8 results agree with the
float path within one rounding code."""
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(outdir, bench_dir, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "inference_test_bench.py"),
         "--config", os.path.join(ROOT, "configs", "tiny.yaml"),
         "--test_bench_dir", str(bench_dir), "--outdir", str(outdir),
         "--ddim_steps", "2", "--n_samples", "2", "--plms",
         "--precision", "full", "--seed", "7", "--skip_grid"] + extra,
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc


def test_test_bench_cli_uint8_matches_float(tmp_path):
    bench = tmp_path / "bench"
    gen = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "make_synthetic_test_bench.py"),
         "--n", "3", "--out", str(bench), "--size", "64"],
        cwd=ROOT, capture_output=True, text=True, timeout=120,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    _run(tmp_path / "f32", bench, [])
    _run(tmp_path / "u8", bench, ["--uint8_out"])

    from PIL import Image

    f32_dir = tmp_path / "f32" / "results"
    u8_dir = tmp_path / "u8" / "results"
    names = sorted(os.listdir(f32_dir))
    assert len(names) == 3 and sorted(os.listdir(u8_dir)) == names
    for n in names:
        a = np.asarray(Image.open(f32_dir / n), np.int16)
        b = np.asarray(Image.open(u8_dir / n), np.int16)
        d = np.abs(a - b)
        assert d.max() <= 1, (n, d.max())
        assert (d == 0).mean() > 0.99, (n, (d == 0).mean())
