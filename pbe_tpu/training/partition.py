"""Trainable/frozen parameter partition.

The reference trains exactly: the UNet, the exemplar mapper + final_ln,
proj_out, and the learnable unconditional vector; the VAE and the CLIP trunk
stay frozen (latent_diffusion.py:1184-1196, modules.py:153-160). Here the
partition is explicit: the params tree is split into two trees so the frozen
branch never enters autodiff (cheaper than masking gradients).
"""
from __future__ import annotations

from typing import Any

import flax.traverse_util as traverse
import jax


def is_trainable(path: tuple[str, ...]) -> bool:
    root = path[0]
    if root in ("model", "proj_out", "learnable_vector"):
        return True
    if root == "cond_stage_model":
        return path[1].startswith("mapper_resblocks") or path[1] == "final_ln"
    return False  # first_stage_model, cond_stage_model/transformer


def split_params(params: dict) -> tuple[dict, dict]:
    """params (the tree under 'params') -> (trainable, frozen)."""
    flat = traverse.flatten_dict(params)
    train = {k: v for k, v in flat.items() if is_trainable(k)}
    frozen = {k: v for k, v in flat.items() if not is_trainable(k)}
    return traverse.unflatten_dict(train), traverse.unflatten_dict(frozen)


def merge_params(trainable: dict, frozen: dict) -> dict:
    flat = dict(traverse.flatten_dict(frozen))
    flat.update(traverse.flatten_dict(trainable))
    return traverse.unflatten_dict(flat)


def count_params(tree: Any) -> int:
    import numpy as np

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(tree)))
