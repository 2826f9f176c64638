"""Classifier-free guidance folded into a single 2B-batched UNet call.

Matches the reference CFG: eps = eps_uc + scale * (eps_c - eps_uc), computed
from one concatenated forward (plms.py:182-189 / ddim.py:205-213). PBE's
unconditional context is the learnable vector, not an empty prompt.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_cfg_eps_fn(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    cond: jnp.ndarray,
    uncond: jnp.ndarray | None,
    scale: float,
) -> EpsFn:
    """Build eps_fn(x9, t) -> eps with CFG baked in.

    apply_fn: (x9 NHWC, t (B,), context (B,1,768)) -> eps (B,h,w,4)
    cond/uncond: (B,1,768). scale==1 or uncond None disables guidance.
    """
    if uncond is None or scale == 1.0:
        def eps_fn(x9: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
            return apply_fn(x9, t, cond)
        return eps_fn

    ctx = jnp.concatenate([uncond, cond], axis=0)

    def eps_fn(x9: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        x_in = jnp.concatenate([x9, x9], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        e = apply_fn(x_in, t_in, ctx)
        e_uc, e_c = jnp.split(e, 2, axis=0)
        return e_uc + scale * (e_c - e_uc)

    return eps_fn
