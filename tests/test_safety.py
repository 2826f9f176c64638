"""Safety-checker parity vs a torch mirror of the diffusers implementation.

Spec: diffusers StableDiffusionSafetyChecker (loaded by the reference at
scripts/inference.py:28-30, used at :97-100/:350) — CLIP vision tower +
bias-free visual projection + cosine scores against fixed concept banks,
per-image 0.01 adjustment once a special-care score is positive, scores
rounded to 3 decimals, flagged frames blacked out.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pbe_tpu.convert import convert_safety_checker_state_dict
from pbe_tpu.models.safety import (
    SafetyChecker,
    preprocess_for_safety,
    safety_scores,
)

TINY = dict(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
            patch_size=8, image_size=32, projection_dim=24,
            num_concepts=5, num_special=3)


def _torch_checker_state(np_rng):
    """A tiny random-weight diffusers-layout state_dict + its HF tower."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=TINY["hidden_size"], intermediate_size=TINY["mlp_dim"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        image_size=TINY["image_size"], patch_size=TINY["patch_size"],
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    proj = torch.nn.Linear(TINY["hidden_size"], TINY["projection_dim"],
                           bias=False)
    sd = {f"vision_model.{k}": v.numpy() for k, v in hf.state_dict().items()}
    sd["visual_projection.weight"] = proj.weight.detach().numpy()
    sd["concept_embeds"] = np_rng.standard_normal(
        (TINY["num_concepts"], TINY["projection_dim"])).astype(np.float32)
    sd["special_care_embeds"] = np_rng.standard_normal(
        (TINY["num_special"], TINY["projection_dim"])).astype(np.float32)
    return sd, hf, proj


def _torch_forward(hf, proj, sd, x_nchw):
    """Reference math: pooled -> projection -> cosine vs the banks, then the
    diffusers per-image loop (running adjustment, round to 3 decimals)."""
    with torch.no_grad():
        pooled = hf(pixel_values=x_nchw).pooler_output
        embeds = proj(pooled).numpy()

    def cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return a @ b.T

    special_cos = cos(embeds, sd["special_care_embeds"])
    concept_cos = cos(embeds, sd["concept_embeds"])
    has_nsfw = []
    for i in range(embeds.shape[0]):
        adjustment = 0.0
        for j in range(special_cos.shape[1]):
            score = round(
                float(special_cos[i, j])
                - float(sd["special_care_embeds_weights"][j]) + adjustment, 3)
            if score > 0:
                adjustment = 0.01
        bad = []
        for j in range(concept_cos.shape[1]):
            score = round(
                float(concept_cos[i, j])
                - float(sd["concept_embeds_weights"][j]) + adjustment, 3)
            if score > 0:
                bad.append(j)
        has_nsfw.append(len(bad) > 0)
    return embeds, concept_cos, special_cos, has_nsfw


@pytest.mark.parametrize("thresholds", ["none_flag", "all_flag", "adjustment"])
def test_checker_matches_torch_mirror(np_rng, thresholds):
    sd, hf, proj = _torch_checker_state(np_rng)
    x = np_rng.standard_normal(
        (2, TINY["image_size"], TINY["image_size"], 3)).astype(np.float32)
    x_nchw = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # provisional thresholds to read off the cosine landscape
    sd["concept_embeds_weights"] = np.full(
        TINY["num_concepts"], 2.0, np.float32)
    sd["special_care_embeds_weights"] = np.full(
        TINY["num_special"], 2.0, np.float32)
    _, concept_cos, special_cos, _ = _torch_forward(hf, proj, sd, x_nchw)

    if thresholds == "none_flag":
        pass  # cos <= 1 < 2: nothing can flag
    elif thresholds == "all_flag":
        sd["concept_embeds_weights"][:] = -2.0
    else:
        # special-care fires for image 0 only; concept 0's margin is such
        # that image 0 flags *only through* the 0.01 adjustment
        sd["special_care_embeds_weights"] = (
            special_cos[0] - 0.002).astype(np.float32)
        sd["concept_embeds_weights"] = (
            concept_cos[0] + 0.005).astype(np.float32)

    embeds_t, concept_t, special_t, nsfw_t = _torch_forward(hf, proj, sd, x_nchw)
    if thresholds == "adjustment":
        assert nsfw_t == [True, False] or nsfw_t == [True, True]
        assert nsfw_t[0] is True

    params, dropped = convert_safety_checker_state_dict(sd)
    assert all("position_ids" in d for d in dropped), dropped
    module = SafetyChecker(**TINY)
    has_nsfw, concept_scores, special_scores = module.apply(
        params, jnp.asarray(x))

    c = params["params"]  # converted tree geometry cross-check
    assert c["vision_model"]["patch_embedding"]["kernel"].shape[-1] == 64

    embeds_j, concept_j, special_j = _jax_embeds(module, params, x)
    np.testing.assert_allclose(embeds_j, embeds_t, atol=2e-4)
    np.testing.assert_allclose(concept_j, concept_t, atol=2e-5)
    np.testing.assert_allclose(special_j, special_t, atol=2e-5)
    assert [bool(v) for v in np.asarray(has_nsfw)] == nsfw_t


def _jax_embeds(module, params, x):
    """Pull the projected embeds + raw cosines out of the jax module."""
    from pbe_tpu.models.clip_vit import CLIPVisionTower
    from pbe_tpu.models.safety import cosine_distance

    tower = CLIPVisionTower(
        hidden_size=TINY["hidden_size"], num_layers=TINY["num_layers"],
        num_heads=TINY["num_heads"], mlp_dim=TINY["mlp_dim"],
        patch_size=TINY["patch_size"], image_size=TINY["image_size"],
    )
    _, pooled = tower.apply(
        {"params": params["params"]["vision_model"]}, jnp.asarray(x))
    embeds = pooled @ params["params"]["visual_projection"]["kernel"]
    concept = np.asarray(
        cosine_distance(embeds, params["params"]["concept_embeds"]))
    special = np.asarray(
        cosine_distance(embeds, params["params"]["special_care_embeds"]))
    return np.asarray(embeds), concept, special


def test_safety_scores_adjustment_semantics():
    """The 0.01 adjustment must be triggerable only by a positive special
    score and must be able to tip a concept score over the line."""
    embeds = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    concept = jnp.asarray([[1.0, 0.0]])
    special = jnp.asarray([[1.0, 0.0]])
    # image 0: special cos=1 > 0.9 -> adjustment; concept cos=1 vs thr
    # 1.005 flags only with +0.01.  image 1: cos 0 everywhere -> clean.
    has_nsfw, _, _ = safety_scores(
        embeds, concept, jnp.asarray([1.005]), special, jnp.asarray([0.9]))
    assert [bool(v) for v in np.asarray(has_nsfw)] == [True, False]
    # without the special trigger the same concept threshold stays clean
    has_nsfw, _, _ = safety_scores(
        embeds, concept, jnp.asarray([1.005]), special, jnp.asarray([1.5]))
    assert [bool(v) for v in np.asarray(has_nsfw)] == [False, False]


def test_preprocess_shapes_and_range():
    x = jnp.ones((2, 512, 512, 3)) * 0.5
    out = preprocess_for_safety(x, image_size=32)
    assert out.shape == (2, 32, 32, 3)
    # non-square: shortest edge to 32, center crop
    x = jnp.ones((1, 64, 128, 3)) * 0.5
    out = preprocess_for_safety(x, image_size=32)
    assert out.shape == (1, 32, 32, 3)
    # constant 0.5 image stays constant through resize+crop+normalize
    from pbe_tpu.ops.image import CLIP_MEAN, CLIP_STD
    expected = (0.5 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, 0], expected, atol=1e-5)


def test_load_safety_checker_from_torch_file(np_rng, tmp_path):
    """load_safety_checker: torch .bin round-trip + geometry inference.

    Geometry inference assumes CLIP's universal head_dim=64, so the tiny
    config here uses a single 64-wide head.
    """
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from pbe_tpu.models.safety import load_safety_checker

    cfg = dict(TINY, num_heads=1)  # head_dim 64, as in every real CLIP
    hf_cfg = CLIPVisionConfig(
        hidden_size=cfg["hidden_size"], intermediate_size=cfg["mlp_dim"],
        num_hidden_layers=cfg["num_layers"], num_attention_heads=1,
        image_size=cfg["image_size"], patch_size=cfg["patch_size"],
        hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    hf = CLIPVisionModel(hf_cfg).eval()
    proj = torch.nn.Linear(cfg["hidden_size"], cfg["projection_dim"], bias=False)
    sd = {f"vision_model.{k}": v for k, v in hf.state_dict().items()}
    sd["visual_projection.weight"] = proj.weight.detach()
    sd["concept_embeds"] = torch.from_numpy(np_rng.standard_normal(
        (cfg["num_concepts"], cfg["projection_dim"])).astype(np.float32))
    sd["special_care_embeds"] = torch.from_numpy(np_rng.standard_normal(
        (cfg["num_special"], cfg["projection_dim"])).astype(np.float32))
    sd["concept_embeds_weights"] = torch.full((cfg["num_concepts"],), -2.0)
    sd["special_care_embeds_weights"] = torch.full((cfg["num_special"],), 2.0)
    path = tmp_path / "safety.bin"
    torch.save(sd, str(path))

    checker = load_safety_checker(str(path))
    m = checker.module
    assert (m.hidden_size, m.num_layers, m.num_heads, m.mlp_dim,
            m.patch_size, m.image_size, m.projection_dim) == (
        cfg["hidden_size"], cfg["num_layers"], 1, cfg["mlp_dim"],
        cfg["patch_size"], cfg["image_size"], cfg["projection_dim"])
    images = np_rng.random((2, 48, 48, 3)).astype(np.float32)
    _, flags = checker.check(images)
    assert flags == [True, True]  # thresholds at -2: everything flags


def test_loaded_checker_blackout(np_rng):
    """End-to-end LoadedSafetyChecker.check: report-only passthrough vs
    enforced blackout."""
    from pbe_tpu.models.safety import LoadedSafetyChecker

    sd, hf, proj = _torch_checker_state(np_rng)
    sd["concept_embeds_weights"] = np.full(
        TINY["num_concepts"], -2.0, np.float32)  # everything flags
    sd["special_care_embeds_weights"] = np.full(
        TINY["num_special"], 2.0, np.float32)
    params, _ = convert_safety_checker_state_dict(sd)
    checker = LoadedSafetyChecker(module=SafetyChecker(**TINY), params=params)

    images = np_rng.random((2, 64, 64, 3)).astype(np.float32)
    out, flags = checker.check(images, enforce=False)
    assert flags == [True, True]
    np.testing.assert_array_equal(out, images)  # reference semantics (:351)
    out, flags = checker.check(images, enforce=True)
    assert flags == [True, True]
    assert np.all(out == 0.0)
