"""Exponential moving average of parameters.

Semantics of LitEma (ldm/modules/ema.py:5-76): shadow per parameter, decay
warmup ``min(max_decay, (1+n)/(10+n))`` with update count n, update after
every optimizer step; swap in for eval (ema_scope, ddpm.py:230-243).
Off by default in v1 (configs/v1.yaml:19) but fully supported.

Functional form: ema state is (count, shadow_tree); update is a pure pytree
map that jits into the train step.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    shadow: Any


def ema_init(params: Any) -> EmaState:
    return EmaState(jnp.zeros((), jnp.int32), jax.tree.map(jnp.asarray, params))


def ema_update(state: EmaState, params: Any, max_decay: float = 0.9999) -> EmaState:
    count = state.count + 1
    decay = jnp.minimum(max_decay, (1.0 + count) / (10.0 + count))
    one_minus = 1.0 - decay
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)), state.shadow, params
    )
    return EmaState(count, shadow)
