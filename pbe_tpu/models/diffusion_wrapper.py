"""Conditioning-key dispatch (the reference's DiffusionWrapper).

Rebuilds ddpm.py:468-515 as a pure function: the reference wraps the UNet in
a Lightning module that routes conditioning by key —

  * None        : unconditional, model(x, t)
  * 'concat'    : channel-concat conditioning, model(cat([x] + c_concat), t)
  * 'crossattn' : token conditioning, model(x, t, context=cat(c_crossattn))
                  (the PBE path — latent_diffusion instantiates
                  DiffusionWrapper(unet_config, 'crossattn'))
  * 'hybrid'    : both of the above
  * 'adm'       : class-label conditioning, model(x, t, y=c_crossattn[0])
                  (needs a UNet built with num_classes)

NHWC: channel concat is on the trailing axis.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

CONDITIONING_KEYS = (None, "concat", "crossattn", "hybrid", "adm")


def apply_diffusion_wrapper(
    model_fn: Callable,
    x: jnp.ndarray,
    t: jnp.ndarray,
    conditioning_key: str | None,
    c_concat: Sequence[jnp.ndarray] | None = None,
    c_crossattn: Sequence[jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """model_fn(x, t, context=None, y=None) -> eps; dispatch per
    ddpm.py:477-495."""
    if conditioning_key not in CONDITIONING_KEYS:
        raise NotImplementedError(f"conditioning_key={conditioning_key!r}")
    if conditioning_key is None:
        return model_fn(x, t, None)
    if conditioning_key == "concat":
        xc = jnp.concatenate([x, *c_concat], axis=-1)
        return model_fn(xc, t, None)
    if conditioning_key == "crossattn":
        cc = jnp.concatenate(list(c_crossattn), axis=1)
        return model_fn(x, t, cc)
    if conditioning_key == "hybrid":
        xc = jnp.concatenate([x, *c_concat], axis=-1)
        cc = jnp.concatenate(list(c_crossattn), axis=1)
        return model_fn(xc, t, cc)
    # 'adm'
    return model_fn(x, t, None, y=c_crossattn[0])
