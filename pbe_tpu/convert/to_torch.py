"""Export pbe_tpu parameters back to a reference-compatible torch .ckpt.

Inverse of pbe_tpu.convert.torch_ckpt: flax pytree -> the reference's
state_dict key names and (O,I,kH,kW)/(O,I) layouts, so checkpoints trained
here load into the PyTorch reference (strict=False) and vice versa.

Note: attn2.to_q/to_k (provably unused with single-token conditioning) do
not exist here and are simply absent from the export — the reference loads
with strict=False everywhere (ddpm.py:254).
"""
from __future__ import annotations

import re
from typing import Any

import numpy as np


def _torch_key_and_value(path: tuple[str, ...], arr: np.ndarray):
    """flax param path -> (torch key, transformed array)."""
    if path == ("learnable_vector",):
        return "learnable_vector", arr
    if path[:2] == ("cond_stage_model", "transformer") and path[-1] in (
        "class_embedding", "position_embedding",
    ):
        suffix = ".weight" if path[-1] == "position_embedding" else ""
        return (
            "cond_stage_model.transformer.vision_model.embeddings."
            + path[-1] + suffix, arr,
        )

    parts = list(path)
    leaf = parts.pop()
    if parts and parts[-1] == "norm":
        parts.pop()
        leaf = {"scale": "weight", "bias": "bias"}[leaf]
    elif leaf == "kernel":
        leaf = "weight"
        arr = (np.transpose(arr, (3, 2, 0, 1)) if arr.ndim == 4
               else np.transpose(arr, (1, 0)))

    out: list[str] = []
    for i, p in enumerate(parts):
        if i == 0 and p == "model":
            out += ["model", "diffusion_model"]
            continue
        if i == 0:
            out.append(p)
            continue
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
    if path[:2] == ("cond_stage_model", "transformer"):
        tail = out[2:]
        if tail and tail[0] == "patch_embedding":
            tail = ["embeddings"] + tail
        out = out[:2] + ["vision_model"] + tail
    return ".".join(out + [leaf]), arr


def export_state_dict(params: dict[str, Any]) -> dict[str, np.ndarray]:
    """params: the tree under 'params'. Returns {torch_key: numpy array}."""
    import flax.traverse_util as traverse

    sd = {}
    for path, arr in traverse.flatten_dict(params).items():
        key, value = _torch_key_and_value(path, np.asarray(arr, np.float32))
        sd[key] = value
    return sd


def save_torch_checkpoint(
    params: dict[str, Any], path: str, global_step: int = 0
) -> None:
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params).items()}
    torch.save({"state_dict": sd, "global_step": global_step}, path)
