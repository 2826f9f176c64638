"""Golden-example regression harness.

The reference's de-facto regression fixtures are three fixed (image, mask,
reference, seed) triples (test.sh:1-29, seeds 321/5876/5065; SURVEY.md §4).
This harness runs the full CLI-equivalent flow on all three with a tiny
random-init model (deterministic params from a fixed PRNG seed) and asserts
the outputs against golden PNGs committed under tests/goldens/ — so a
numerics-changing refactor anywhere in the VAE/UNet/CLIP/sampler/pipeline
stack fails CI, even before trained weights exist.

Regenerate goldens intentionally with:
    PBE_UPDATE_GOLDENS=1 python -m pytest tests/test_golden_examples.py

With a trained checkpoint supplied via PBE_CKPT the same flow additionally
pins the full-model seed-321 output hash.
"""
import hashlib
import os

import numpy as np
import pytest
from PIL import Image

EXAMPLES = os.environ.get("PBE_EXAMPLES", "/root/reference/examples")
CKPT = os.environ.get("PBE_CKPT", "")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = os.environ.get("PBE_UPDATE_GOLDENS", "") == "1"

# the reference test.sh triples
TRIPLES = [(1, 321), (2, 5876), (3, 5065)]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="example assets not available"
)


@pytest.fixture(scope="module")
def tiny_pipeline():
    import jax
    import jax.numpy as jnp

    from pbe_tpu.models.clip_vit import CLIPVisionConfig
    from pbe_tpu.models.exemplar import ExemplarEncoderConfig
    from pbe_tpu.models.pbe import PaintByExample
    from pbe_tpu.models.unet import UNetConfig
    from pbe_tpu.models.vae import AutoencoderKLConfig
    from pbe_tpu.pipelines.inference import EditPipeline

    model = PaintByExample(
        unet_config=UNetConfig(model_channels=8, channel_mult=(1, 2),
                               num_res_blocks=1, attention_resolutions=(1,),
                               num_heads=2, context_dim=768, use_checkpoint=False),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 8, "ch_mult": [1, 2, 2, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": 64},
            embed_dim=4),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=1024, num_layers=1, num_heads=2,
                                  mlp_dim=32, patch_size=8, image_size=32),
            mapper_layers=1),
    )
    from pbe_tpu.data import transforms as T

    image = T.load_image(f"{EXAMPLES}/image/example_1.png", (64, 64))
    mask = T.load_mask(f"{EXAMPLES}/mask/example_1.png", (64, 64))
    ref = T.load_reference(f"{EXAMPLES}/reference/example_1.jpg", 32)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, jnp.asarray(image[None]), jnp.asarray(mask[None]),
        jnp.asarray(ref[None]), rng, method=PaintByExample.initialize_all,
    )
    return EditPipeline(model, variables)


def _load_triple(n: int):
    from pbe_tpu.data import transforms as T

    image = T.load_image(f"{EXAMPLES}/image/example_{n}.png", (64, 64))
    mask = T.load_mask(f"{EXAMPLES}/mask/example_{n}.png", (64, 64))
    ref = T.load_reference(f"{EXAMPLES}/reference/example_{n}.jpg", 32)
    return image, mask, ref


@pytest.mark.parametrize("n,seed", TRIPLES)
def test_golden_example(tiny_pipeline, n, seed):
    image, mask, ref = _load_triple(n)
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    assert mask.mean() < 1.0  # some region is edited

    out = tiny_pipeline.edit(image, mask, ref, steps=4, scale=5.0, seed=seed)
    assert out.shape == (64, 64, 3)
    out_u8 = np.clip(out * 255.0, 0, 255).round().astype(np.uint8)

    golden_path = os.path.join(GOLDEN_DIR, f"example_{n}_seed{seed}.png")
    if UPDATE or not os.path.exists(golden_path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        Image.fromarray(out_u8).save(golden_path)
        if not UPDATE:
            pytest.fail(
                f"golden {golden_path} was missing; wrote it — commit it and "
                "re-run (set PBE_UPDATE_GOLDENS=1 to regenerate intentionally)"
            )
        return

    want = np.asarray(Image.open(golden_path), np.int16)
    diff = np.abs(out_u8.astype(np.int16) - want)
    # tolerate sub-quantization XLA-version drift, fail on real numeric change
    assert diff.mean() <= 2.0, f"mean abs diff {diff.mean():.3f} > 2/255"
    assert (diff > 6).mean() <= 0.01, (
        f"{(diff > 6).mean():.2%} of pixels drifted by >6/255"
    )


def test_example_1_bit_deterministic(tiny_pipeline):
    image, mask, ref = _load_triple(1)
    a = tiny_pipeline.edit(image, mask, ref, steps=4, scale=5.0, seed=321)
    b = tiny_pipeline.edit(image, mask, ref, steps=4, scale=5.0, seed=321)
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not CKPT, reason="PBE_CKPT not set")
def test_example_1_trained_checkpoint_golden():
    from pbe_tpu.data import transforms as T
    from pbe_tpu.pipelines.loading import load_pipeline

    pipeline, _ = load_pipeline("configs/v1.yaml", CKPT)
    image = T.load_image(f"{EXAMPLES}/image/example_1.png")
    mask = T.load_mask(f"{EXAMPLES}/mask/example_1.png")
    ref = T.load_reference(f"{EXAMPLES}/reference/example_1.jpg")
    out = pipeline.edit(image, mask, ref, steps=50, scale=5.0, seed=321,
                        sampler="plms")
    digest = hashlib.sha256(
        (out * 255).round().astype(np.uint8).tobytes()
    ).hexdigest()
    golden = os.path.join(GOLDEN_DIR, "example_1_trained_sha256.txt")
    if UPDATE or not os.path.exists(golden):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(golden, "w") as f:
            f.write(digest + "\n")
        return
    with open(golden) as f:
        assert digest == f.read().strip()
