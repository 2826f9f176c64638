"""Round-trip test of the torch->JAX checkpoint converter against the real
model parameter trees: synthesize a torch-style state_dict from a tiny
model's own params (inverse mapping lives only in this test), convert it,
and require an exact match with zero missing/unexpected keys."""
import re

import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.convert import convert_state_dict
from pbe_tpu.convert.torch_ckpt import validate_against
from pbe_tpu.models.clip_vit import CLIPVisionConfig
from pbe_tpu.models.exemplar import ExemplarEncoderConfig
from pbe_tpu.models.pbe import PaintByExample
from pbe_tpu.models.unet import UNetConfig
from pbe_tpu.models.vae import AutoencoderKLConfig


def _tiny_model():
    return PaintByExample(
        unet_config=UNetConfig(
            model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), num_heads=2, context_dim=768,
            use_checkpoint=False,
        ),
        vae_config=AutoencoderKLConfig(
            ddconfig={"ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
                      "z_channels": 4, "double_z": True, "out_ch": 3,
                      "in_channels": 3, "resolution": 32},
            embed_dim=4,
        ),
        cond_config=ExemplarEncoderConfig(
            clip=CLIPVisionConfig(hidden_size=1024, num_layers=1, num_heads=4,
                                  mlp_dim=64, patch_size=8, image_size=16),
            mapper_layers=2,
        ),
    )


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


_UNDERSCORE_MODULES = re.compile(
    r"^(input_blocks|output_blocks|middle_block|time_embed|out|in_layers|"
    r"out_layers|emb_layers|transformer_blocks|to_out|net_0|net|down|up|mid|"
    r"mapper_resblocks|layers|mlp)_(.+)$"
)


def _torch_key(path):
    """Inverse of the converter's name map (test-only)."""
    if path == ("learnable_vector",):
        return "learnable_vector"
    if path[:2] == ("cond_stage_model", "transformer") and path[-1] in (
        "class_embedding", "position_embedding",
    ):
        suffix = ".weight" if path[-1] == "position_embedding" else ""
        return (
            "cond_stage_model.transformer.vision_model.embeddings."
            + path[-1] + suffix
        )
    parts = list(path)
    leaf = parts.pop()  # kernel/bias/scale or param name
    if parts and parts[-1] == "norm":
        parts.pop()
        leaf = {"scale": "weight", "bias": "bias"}[leaf]
    elif leaf == "kernel":
        leaf = "weight"

    out = []
    root = parts[0] if parts else None
    for i, p in enumerate(parts):
        if i == 0 and p == "model":
            out += ["model", "diffusion_model"]
            continue
        if i == 0:
            out.append(p)
            continue
        # module-name flattening inverses
        p = p.replace("net_0_proj", "net.0.proj").replace("net_2", "net.2")
        p = p.replace("to_out_0", "to_out.0")
        p = re.sub(r"^(input_blocks|output_blocks)_(\d+)_(\d+)$", r"\1.\2.\3", p)
        p = re.sub(r"^middle_block_(\d+)$", r"middle_block.\1", p)
        p = re.sub(r"^time_embed_(\d+)$", r"time_embed.\1", p)
        p = re.sub(r"^out_(\d+)$", r"out.\1", p)
        p = re.sub(r"^(in_layers|out_layers|emb_layers)_(\d+)$", r"\1.\2", p)
        p = re.sub(r"^transformer_blocks_(\d+)$", r"transformer_blocks.\1", p)
        p = re.sub(r"^(down|up)_(\d+)_block_(\d+)$", r"\1.\2.block.\3", p)
        p = re.sub(r"^(down|up)_(\d+)_attn_(\d+)$", r"\1.\2.attn.\3", p)
        p = re.sub(r"^(down|up)_(\d+)_(downsample|upsample)$", r"\1.\2.\3", p)
        p = re.sub(r"^mid_(block_[12]|attn_1)$", r"mid.\1", p)
        p = re.sub(r"^mapper_resblocks_(\d+)$", r"mapper.resblocks.\1", p)
        p = re.sub(r"^(attn|mlp)_(c_\w+)$", r"\1.\2", p)
        p = re.sub(r"^mlp_(fc[12])$", r"mlp.\1", p)
        p = re.sub(r"^layers_(\d+)$", r"encoder.layers.\1", p)
        out.append(p)

    # CLIP tower keys live under vision_model.* in the HF state_dict
    if root == "cond_stage_model" and len(parts) > 1 and parts[1] == "transformer":
        tail = out[2:]
        if tail and tail[0] in ("class_embedding", "patch_embedding",
                                "position_embedding"):
            tail = ["embeddings"] + tail
        if parts[-1] in ("patch_embedding",):
            pass
        out = out[:2] + ["vision_model"] + tail
        if out[-1] == "class_embedding":
            return ".".join(out)
        if out[-1] == "position_embedding":
            return ".".join(out) + ".weight"
    if path == ("learnable_vector",):
        return "learnable_vector"
    return ".".join(out + [leaf])


def _inverse_transform(path, arr):
    arr = np.asarray(arr)
    if path[-1] == "kernel" and arr.ndim == 4:
        return np.transpose(arr, (3, 2, 0, 1))
    if path[-1] == "kernel" and arr.ndim == 2:
        return np.transpose(arr, (1, 0))
    return arr


def test_full_roundtrip_exact():
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((1, 32, 32, 3))
    mask = jnp.ones((1, 32, 32, 1))
    ref = jnp.zeros((1, 16, 16, 3))
    variables = model.init(
        {"params": rng}, image, mask, ref, rng,
        method=PaintByExample.initialize_all,
    )
    # randomize so equality is meaningful
    leaves, treedef = jax.tree.flatten(variables)
    gen = np.random.default_rng(1)
    leaves = [jnp.asarray(gen.standard_normal(l.shape), jnp.float32) for l in leaves]
    variables = jax.tree.unflatten(treedef, leaves)

    # synthesize the torch state_dict
    sd = {}
    for path, arr in _flatten(variables["params"]):
        key = _torch_key(path)
        sd[key] = _inverse_transform(path, arr)

    converted, dropped = convert_state_dict(sd)
    assert dropped == [], f"unexpectedly dropped: {dropped[:10]}"
    missing, unexpected, mismatched = validate_against(
        converted["params"], variables["params"]
    )
    assert missing == [], missing[:10]
    assert unexpected == [], unexpected[:10]
    assert mismatched == [], mismatched[:10]
    # bitwise equality
    for (p1, a), (p2, b) in zip(
        sorted(_flatten(converted["params"])), sorted(_flatten(variables["params"]))
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))


def test_converter_drops_dead_and_schedule_keys():
    sd = {
        "betas": np.zeros(10),
        "alphas_cumprod": np.zeros(10),
        "logvar": np.zeros(10),
        "model_ema.decay": np.zeros(1),
        "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_q.weight": np.zeros((8, 8)),
        "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight": np.zeros((8, 768)),
        "cond_stage_model.transformer.vision_model.embeddings.position_ids": np.zeros(5),
        "learnable_vector": np.zeros((1, 1, 768)),
    }
    converted, dropped = convert_state_dict(sd)
    assert len(dropped) == 7
    assert list(_flatten(converted["params"]))[0][0] == ("learnable_vector",)
    # attn2.to_v would be kept
    sd2 = {"model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_v.weight": np.zeros((8, 768))}
    converted2, dropped2 = convert_state_dict(sd2)
    assert dropped2 == []
