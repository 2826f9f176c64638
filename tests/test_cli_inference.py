"""Subprocess smoke test for scripts/inference.py (reference CLI surface,
scripts/inference.py:127-402): tiny config, CPU, real argv -> PNGs on disk.

Covers the arg surface end-to-end (flag parsing, pipeline build, sampling,
safety screening, watermarking, file layout) the unit tests can't: the
round-3 TPU-down incident showed the CLI path can break (import-time
backend init) while the library tests stay green.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = "/root/reference/examples"


@pytest.mark.skipif(not os.path.isdir(EXAMPLES), reason="no example assets")
def test_inference_cli_smoke(tmp_path, np_rng):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    # tiny diffusers-layout safety checkpoint whose thresholds flag
    # everything — exercises screening + --enforce_safety blackout
    cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=1, image_size=32, patch_size=8,
        hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModel(cfg).eval()
    sd = {f"vision_model.{k}": v for k, v in hf.state_dict().items()}
    sd["visual_projection.weight"] = torch.randn(24, 64)
    sd["concept_embeds"] = torch.randn(5, 24)
    sd["special_care_embeds"] = torch.randn(3, 24)
    sd["concept_embeds_weights"] = torch.full((5,), -2.0)
    sd["special_care_embeds_weights"] = torch.full((3,), 2.0)
    safety_path = tmp_path / "safety_tiny.bin"
    torch.save(sd, str(safety_path))

    outdir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "inference.py"),
         "--config", os.path.join(ROOT, "configs", "tiny.yaml"),
         "--image_path", f"{EXAMPLES}/image/example_1.png",
         "--mask_path", f"{EXAMPLES}/mask/example_1.png",
         "--reference_path", f"{EXAMPLES}/reference/example_1.jpg",
         "--outdir", str(outdir), "--ddim_steps", "2", "--n_iter", "1",
         "--n_samples", "1", "--plms", "--H", "64", "--W", "64",
         "--precision", "full", "--seed", "7",
         "--safety_ckpt", str(safety_path), "--enforce_safety"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "flagged NSFW — blacked out" in proc.stdout

    from PIL import Image

    result = outdir / "results" / "example_1_7.png"
    grid = outdir / "grid" / "grid-example_1_7.png"
    mask = outdir / "source" / "example_1_7_mask.png"
    for f in (result, grid, mask):
        assert f.exists(), f
    arr = np.asarray(Image.open(result))
    assert arr.shape == (64, 64, 3)
    # blacked out, modulo the (always-stamped) invisible watermark
    assert arr.max() <= 16


@pytest.mark.skipif(not os.path.isdir(EXAMPLES), reason="no example assets")
def test_inference_cli_int8_static(tmp_path):
    """--quantize int8-static: calibrate-on-input PTQ through the real CLI."""
    outdir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "inference.py"),
         "--config", os.path.join(ROOT, "configs", "tiny.yaml"),
         "--image_path", f"{EXAMPLES}/image/example_1.png",
         "--mask_path", f"{EXAMPLES}/mask/example_1.png",
         "--reference_path", f"{EXAMPLES}/reference/example_1.jpg",
         "--outdir", str(outdir), "--ddim_steps", "2", "--n_iter", "1",
         "--n_samples", "1", "--plms", "--H", "64", "--W", "64",
         "--precision", "full", "--seed", "7",
         "--quantize", "int8-static"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "calibrated" in proc.stdout
    assert (outdir / "results" / "example_1_7.png").exists()
