"""PyTorch checkpoint -> pbe_tpu parameter-pytree converter.

The reference ships Lightning ``.ckpt`` files whose ``state_dict`` keys follow
the module paths quoted in SURVEY.md (roots: ``model.diffusion_model.*``,
``first_stage_model.*``, ``cond_stage_model.*``, ``proj_out.*``,
``learnable_vector``; see ldm/models/diffusion/latent_diffusion.py:111-112 and
scripts/modify_checkpoints.py for the 9-channel surgery). pbe_tpu module
names mirror those paths with '.' -> '_', so conversion is a mechanical
key rewrite plus layout transforms:

  * Conv2d weight (O, I, kH, kW)  ->  flax kernel (kH, kW, I, O)
  * Linear weight (O, I)          ->  flax kernel (I, O)
  * Norm weight/bias              ->  <module>/norm/{scale, bias}

Keys with no pbe_tpu counterpart are dropped (and reported), mirroring the
reference's universal ``strict=False`` loading (ddpm.py:245-260):
  * recomputed schedule buffers (betas, alphas_cumprod, ...)
  * EMA shadows (model_ema.*)
  * attn2.to_q / attn2.to_k in UNet cross-attention — provably unused with
    single-token conditioning (softmax over one key is constant 1)
  * torch position_ids buffers
"""
from __future__ import annotations

import re
from typing import Any, Callable, Mapping

import numpy as np

# ---------------------------------------------------------------------------
# transforms

def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _t_id(w: np.ndarray) -> np.ndarray:
    return w


# buffers recomputed at model build / params with no pbe_tpu counterpart
_DROP_PATTERNS = [
    r"^betas$", r"^alphas_cumprod", r"^sqrt_", r"^log_one_minus",
    r"^posterior_", r"^lvlb_weights$", r"^logvar$",
    r"^model_ema\.", r"^first_stage_model\.loss\.",
    r"position_ids$", r"^cond_ids$", r"^ddim_",
    # My_ResBlock declares a skip_connection its forward never uses
    # (openaimodel.py:351-390) — dead weight, not instantiated here
    r"^model\.diffusion_model\.add_resbolck\.1\.0\.skip_connection\.",
]
_DROP_RE = re.compile("|".join(_DROP_PATTERNS))
# attn2.to_q/to_k are provably unused ONLY under single-token conditioning
# (softmax over one key is constant 1 — the PBE path); generic multi-token
# cross-attention (e.g. SD text contexts) needs them
_SINGLE_TOKEN_QK_RE = re.compile(r"\.attn2\.to_q\.|\.attn2\.to_k\.")


def _norm_leaf(leaf: str) -> tuple[str, ...]:
    return ("norm", {"weight": "scale", "bias": "bias"}[leaf])


def _conv_leaf(leaf: str) -> tuple[str, ...]:
    return ({"weight": "kernel", "bias": "bias"}[leaf],)


def _linear_leaf(leaf: str) -> tuple[str, ...]:
    return ({"weight": "kernel", "bias": "bias"}[leaf],)


# module-local classification: which torch submodule names are norms, convs,
# linears inside our models (leaf here = last-but-one component)
_NORM_MODULES = {
    # VAE / UNet group norms and layer norms
    "norm", "norm1", "norm2", "norm3", "norm_out", "in_layers.0",
    "out_layers.0", "out.0",
    # CLIP / mapper layer norms
    "pre_layrnorm", "post_layernorm", "layer_norm1", "layer_norm2",
    "ln_1", "ln_2", "final_ln",
}
_LINEAR_MODULES = {
    "emb_layers.1", "time_embed.0", "time_embed.2",
    "to_q", "to_k", "to_v", "to_out.0", "net.0.proj", "net.2",
    "q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2",
    "c_qkv", "c_proj", "c_fc", "proj_out_linear",
}
# everything else with a 4-D weight is a conv


def _convert_key(key: str, shape: tuple[int, ...],
                 single_token_context: bool = True) -> tuple[tuple[str, ...], Callable] | None:
    """Map one torch state_dict key to (flax path, transform). None = drop."""
    if _DROP_RE.search(key):
        return None
    if single_token_context and _SINGLE_TOKEN_QK_RE.search(key):
        return None

    if key == "learnable_vector":
        return ("learnable_vector",), _t_id
    if key in ("proj_out.weight", "proj_out.bias"):
        leaf = key.rsplit(".", 1)[1]
        tr = _t_linear if leaf == "weight" else _t_id
        return ("proj_out", {"weight": "kernel", "bias": "bias"}[leaf]), tr

    parts = key.split(".")
    leaf = parts[-1]

    # ---- root rewrites -------------------------------------------------
    if parts[0] == "model" and parts[1] == "diffusion_model":
        rest = parts[2:]
        return _convert_unet(rest, leaf, shape, root=("model",))
    if parts[0] == "first_stage_model":
        return _convert_vae(parts[1:], leaf, shape, root=("first_stage_model",))
    if parts[0] == "cond_stage_model":
        return _convert_cond(parts[1:], leaf, shape, root=("cond_stage_model",))
    return None


def _is_norm_weight(shape: tuple[int, ...], leaf: str) -> bool:
    return leaf in ("weight", "bias") and len(shape) == 1


def _convert_unet(rest: list[str], leaf: str, shape, root) -> tuple | None:
    """model.diffusion_model.* -> model/*  (names flattened with '_')."""
    body = ".".join(rest[:-1])  # module path without the leaf

    # time embed / out head
    m = re.fullmatch(r"time_embed\.([02])", body)
    if m:
        return root + (f"time_embed_{m.group(1)}",) + _linear_leaf(leaf), (
            _t_linear if leaf == "weight" else _t_id
        )
    if body == "label_emb":  # class-conditional embedding (openaimodel.py:631)
        return root + ("label_emb", "embedding"), _t_id
    if body == "out.0":
        return root + ("out_0",) + _norm_leaf(leaf), _t_id
    if body == "out.2":
        return root + ("out_2",) + _conv_leaf(leaf), (
            _t_conv if leaf == "weight" else _t_id
        )

    # blocks: input_blocks.N.S... / output_blocks.N.S... / middle_block.S...
    # (+ the fork's add_resbolck front block, openaimodel.py:634-655)
    m = re.match(r"(input_blocks|output_blocks|add_resbolck)\.(\d+)\.(\d+)(?:\.(.*))?$", body)
    if m:
        blocks, n, s, sub = m.group(1), m.group(2), m.group(3), m.group(4)
        prefix = root + (f"{blocks}_{n}_{s}",)
        return _convert_unet_sub(prefix, sub, leaf, shape)
    m = re.match(r"middle_block\.(\d+)(?:\.(.*))?$", body)
    if m:
        prefix = root + (f"middle_block_{m.group(1)}",)
        return _convert_unet_sub(prefix, m.group(2), leaf, shape)
    return None


def _convert_unet_sub(prefix: tuple, sub: str | None, leaf: str, shape) -> tuple | None:
    """Convert within a ResBlock / SpatialTransformer / Down / Up module."""
    if sub is None or sub == "":
        # bare conv module: input_blocks.0.0 (conv_in)
        return prefix + _conv_leaf(leaf), _t_conv if leaf == "weight" else _t_id

    # ResBlock internals
    if sub in ("in_layers.0", "out_layers.0"):
        return prefix + (sub.replace(".", "_"),) + _norm_leaf(leaf), _t_id
    if sub in ("in_layers.2", "out_layers.3", "skip_connection"):
        return prefix + (sub.replace(".", "_"),) + _conv_leaf(leaf), (
            _t_conv if leaf == "weight" else _t_id
        )
    if sub == "emb_layers.1":
        return prefix + ("emb_layers_1",) + _linear_leaf(leaf), (
            _t_linear if leaf == "weight" else _t_id
        )
    # Down/Upsample
    if sub in ("op", "conv"):
        return prefix + (sub,) + _conv_leaf(leaf), _t_conv if leaf == "weight" else _t_id

    # SpatialTransformer internals
    if sub == "norm":
        return prefix + ("norm",) + _norm_leaf(leaf), _t_id
    if sub in ("proj_in", "proj_out"):
        return prefix + (sub,) + _conv_leaf(leaf), _t_conv if leaf == "weight" else _t_id
    m = re.match(r"transformer_blocks\.(\d+)\.(.*)$", sub)
    if m:
        tb = (f"transformer_blocks_{m.group(1)}",)
        inner = m.group(2)
        if inner in ("norm1", "norm2", "norm3"):
            return prefix + tb + (inner,) + _norm_leaf(leaf), _t_id
        m2 = re.fullmatch(r"(attn[12])\.(to_q|to_k|to_v)", inner)
        if m2:
            return prefix + tb + (m2.group(1), m2.group(2), "kernel"), _t_linear
        m2 = re.fullmatch(r"(attn[12])\.to_out\.0", inner)
        if m2:
            return prefix + tb + (m2.group(1), "to_out_0") + _linear_leaf(leaf), (
                _t_linear if leaf == "weight" else _t_id
            )
        if inner == "ff.net.0.proj":
            return prefix + tb + ("ff", "net_0_proj") + _linear_leaf(leaf), (
                _t_linear if leaf == "weight" else _t_id
            )
        if inner == "ff.net.2":
            return prefix + tb + ("ff", "net_2") + _linear_leaf(leaf), (
                _t_linear if leaf == "weight" else _t_id
            )
    return None


def _convert_vae(rest: list[str], leaf: str, shape, root) -> tuple | None:
    body = ".".join(rest[:-1])
    if body in ("quant_conv", "post_quant_conv"):
        return root + (body,) + _conv_leaf(leaf), _t_conv if leaf == "weight" else _t_id

    m = re.match(r"(encoder|decoder)\.(.*)$", body)
    if not m:
        return None
    tower, sub = m.group(1), m.group(2)
    prefix = root + (tower,)

    if sub in ("conv_in", "conv_out"):
        return prefix + (sub,) + _conv_leaf(leaf), _t_conv if leaf == "weight" else _t_id
    if sub == "norm_out":
        return prefix + ("norm_out",) + _norm_leaf(leaf), _t_id

    # down.N.block.M.<x> / up.N.block.M.<x> / down.N.downsample.conv / mid.*
    sub = sub.replace("mid.", "mid_")
    m = re.match(
        r"(down|up)\.(\d+)\.(block\.(\d+)|downsample|upsample|attn\.(\d+))\.(.*)$", sub
    )
    if m:
        updown, n = m.group(1), m.group(2)
        if m.group(3).startswith("block."):
            mod = f"{updown}_{n}_block_{m.group(4)}"
        elif m.group(3).startswith("attn."):
            mod = f"{updown}_{n}_attn_{m.group(5)}"
        else:
            mod = f"{updown}_{n}_{m.group(3)}"
        return _convert_vae_block(prefix + (mod,), m.group(6), leaf, shape)
    m = re.match(r"(mid_block_[12]|mid_attn_1)\.(.*)$", sub)
    if m:
        return _convert_vae_block(prefix + (m.group(1),), m.group(2), leaf, shape)
    return None


def _convert_vae_block(prefix: tuple, sub: str, leaf: str, shape) -> tuple | None:
    if sub in ("norm", "norm1", "norm2"):
        return prefix + (sub,) + _norm_leaf(leaf), _t_id
    if sub in ("conv1", "conv2", "nin_shortcut", "conv_shortcut", "q", "k", "v",
               "proj_out", "conv"):
        return prefix + (sub,) + _conv_leaf(leaf), _t_conv if leaf == "weight" else _t_id
    return None


def _convert_cond(rest: list[str], leaf: str, shape, root) -> tuple | None:
    body = ".".join(rest[:-1])
    full = ".".join(rest)

    if body == "final_ln":
        return root + ("final_ln",) + _norm_leaf(leaf), _t_id

    m = re.match(r"mapper\.resblocks\.(\d+)\.(.*)$", body)
    if m:
        prefix = root + (f"mapper_resblocks_{m.group(1)}",)
        inner = m.group(2)
        if inner in ("ln_1", "ln_2"):
            return prefix + (inner,) + _norm_leaf(leaf), _t_id
        flat = inner.replace(".", "_")  # attn.c_qkv -> attn_c_qkv etc.
        if flat in ("attn_c_qkv", "attn_c_proj", "mlp_c_fc", "mlp_c_proj"):
            return prefix + (flat,) + _linear_leaf(leaf), (
                _t_linear if leaf == "weight" else _t_id
            )
        return None

    if body.startswith("transformer."):
        sd_key = full[len("transformer."):]
        mapped = _convert_clip_key(sd_key, shape)
        if mapped is None:
            return None
        path, tr = mapped
        return root + ("transformer",) + path, tr
    return None


def _convert_clip_key(key: str, shape) -> tuple | None:
    """HF CLIPVisionModel state_dict key (vision_model.*) -> CLIPVisionTower path."""
    key = key.removeprefix("vision_model.")
    parts = key.split(".")
    leaf = parts[-1]
    body = ".".join(parts[:-1])

    if key == "embeddings.class_embedding":
        return ("class_embedding",), _t_id
    if body == "embeddings.patch_embedding":
        return ("patch_embedding", "kernel"), _t_conv
    if key == "embeddings.position_embedding.weight":
        return ("position_embedding",), _t_id
    if body in ("pre_layrnorm", "post_layernorm"):
        return (body,) + _norm_leaf(leaf), _t_id

    m = re.match(r"encoder\.layers\.(\d+)\.(.*)$", body)
    if m:
        prefix = (f"layers_{m.group(1)}",)
        inner = m.group(2)
        if inner in ("layer_norm1", "layer_norm2"):
            return prefix + (inner,) + _norm_leaf(leaf), _t_id
        m2 = re.fullmatch(r"self_attn\.(q_proj|k_proj|v_proj|out_proj)", inner)
        if m2:
            return prefix + ("self_attn", m2.group(1)) + _linear_leaf(leaf), (
                _t_linear if leaf == "weight" else _t_id
            )
        m2 = re.fullmatch(r"mlp\.(fc[12])", inner)
        if m2:
            return prefix + (f"mlp_{m2.group(1)}",) + _linear_leaf(leaf), (
                _t_linear if leaf == "weight" else _t_id
            )
    return None


# ---------------------------------------------------------------------------
# public API

def _set_path(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    dtype: Any = np.float32,
    verbose: bool = False,
    single_token_context: bool = True,
) -> tuple[dict, list[str]]:
    """Convert a full PBE torch state_dict to a ``{'params': ...}`` pytree.

    Returns (params_tree, dropped_keys). Values are numpy arrays.
    """
    params: dict = {}
    dropped: list[str] = []
    for key, value in state_dict.items():
        arr = np.asarray(value, dtype=dtype)
        mapped = _convert_key(key, arr.shape, single_token_context)
        if mapped is None:
            dropped.append(key)
            continue
        path, transform = mapped
        _set_path(params, path, transform(arr))
    if verbose and dropped:
        print(f"convert_state_dict: dropped {len(dropped)} keys (first 10): "
              f"{dropped[:10]}")
    return {"params": params}, dropped


def convert_clip_vision_state_dict(
    state_dict: Mapping[str, Any], dtype: Any = np.float32
) -> tuple[dict, list[str]]:
    """Convert a bare HF CLIPVisionModel state_dict to CLIPVisionTower params."""
    params: dict = {}
    dropped: list[str] = []
    for key, value in state_dict.items():
        arr = np.asarray(value, dtype=dtype)
        mapped = _convert_clip_key(key, arr.shape)
        if mapped is None:
            dropped.append(key)
            continue
        path, transform = mapped
        _set_path(params, path, transform(arr))
    return {"params": params}, dropped


def convert_safety_checker_state_dict(
    state_dict: Mapping[str, Any], dtype: Any = np.float32
) -> tuple[dict, list[str]]:
    """Convert a diffusers StableDiffusionSafetyChecker state_dict to
    ``models.safety.SafetyChecker`` params.

    Keys: ``vision_model.vision_model.*`` (a CLIPVisionModel submodule —
    strip one prefix, then reuse the CLIP key map), ``visual_projection.
    weight`` (bias-free Linear), and the four concept banks stored as
    buffers at the root.
    """
    _root = {
        "concept_embeds", "special_care_embeds",
        "concept_embeds_weights", "special_care_embeds_weights",
    }
    params: dict = {}
    dropped: list[str] = []
    for key, value in state_dict.items():
        arr = np.asarray(value, dtype=dtype)
        if key in _root:
            _set_path(params, (key,), arr)
            continue
        if key == "visual_projection.weight":
            _set_path(params, ("visual_projection", "kernel"), _t_linear(arr))
            continue
        if key.startswith("vision_model."):
            mapped = _convert_clip_key(key.removeprefix("vision_model."), arr.shape)
            if mapped is not None:
                path, transform = mapped
                _set_path(params, ("vision_model",) + path, transform(arr))
                continue
        dropped.append(key)
    return {"params": params}, dropped


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a Lightning/torch .ckpt into {key: numpy} without needing CUDA."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def validate_against(
    converted: dict, target_shapes: dict, prefix: tuple = ()
) -> tuple[list[str], list[str], list[str]]:
    """Compare a converted tree to the model's expected shapes.

    target_shapes: pytree of arrays/ShapeDtypeStructs (e.g. from
    jax.eval_shape of model.init). Returns (missing, unexpected, mismatched).
    """
    missing, unexpected, mismatched = [], [], []

    def walk(c, t, path):
        c_keys = set(c.keys()) if isinstance(c, dict) else None
        t_keys = set(t.keys()) if isinstance(t, dict) else None
        if c_keys is None or t_keys is None:
            c_shape = tuple(np.shape(c))
            t_shape = tuple(t.shape)
            if c_shape != t_shape:
                mismatched.append(f"{'/'.join(path)}: {c_shape} vs {t_shape}")
            return
        for k in t_keys - c_keys:
            missing.append("/".join(path + (k,)))
        for k in c_keys - t_keys:
            unexpected.append("/".join(path + (k,)))
        for k in c_keys & t_keys:
            walk(c[k], t[k], path + (k,))

    walk(converted, target_shapes, prefix)
    return missing, unexpected, mismatched
