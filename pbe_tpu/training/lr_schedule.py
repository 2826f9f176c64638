"""LR-multiplier schedules (behavioral spec: ldm/lr_scheduler.py:4-97).

v1 uses LambdaLinearScheduler with a 10k-step warmup 1e-6 -> 1.0 then flat
(configs/v1.yaml:21-28). These return *multipliers* on the base LR, applied
per optimizer step, exactly like the reference's LambdaLR hookup
(latent_diffusion.py:1198-1209).

Each class is also exposed as an optax-compatible ``schedule(step) -> mult``
on jnp arrays, so the whole thing jits into the train step.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _cum_cycles(cycle_lengths: Sequence[int]) -> np.ndarray:
    return np.cumsum([0] + list(cycle_lengths))


@dataclasses.dataclass
class LambdaWarmUpCosineScheduler:
    """Single-cycle warmup + cosine decay (lr_scheduler.py:4-33)."""

    warm_up_steps: int
    lr_min: float
    lr_max: float
    lr_start: float
    max_decay_steps: int
    verbosity_interval: int = 0

    def __call__(self, n):
        n = jnp.asarray(n, jnp.float32)
        warm = (self.lr_max - self.lr_start) / self.warm_up_steps * n + self.lr_start
        t = jnp.minimum(
            (n - self.warm_up_steps) / (self.max_decay_steps - self.warm_up_steps), 1.0
        )
        decay = self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
            1 + jnp.cos(t * jnp.pi)
        )
        return jnp.where(n < self.warm_up_steps, warm, decay)

    schedule = __call__


@dataclasses.dataclass
class LambdaWarmUpCosineScheduler2:
    """Multi-cycle variant (lr_scheduler.py:36-78). Only the single-cycle
    config is exercised by v1; multi-cycle is supported via searchsorted."""

    warm_up_steps: Sequence[int]
    f_min: Sequence[float]
    f_max: Sequence[float]
    f_start: Sequence[float]
    cycle_lengths: Sequence[int]
    verbosity_interval: int = 0

    def _cycle(self, n):
        cum = jnp.asarray(_cum_cycles(self.cycle_lengths)[1:], jnp.float32)
        return jnp.searchsorted(cum, jnp.asarray(n, jnp.float32), side="left")

    def _per_cycle(self, n, cycle):
        wu = jnp.asarray(self.warm_up_steps, jnp.float32)[cycle]
        f_min = jnp.asarray(self.f_min, jnp.float32)[cycle]
        f_max = jnp.asarray(self.f_max, jnp.float32)[cycle]
        f_start = jnp.asarray(self.f_start, jnp.float32)[cycle]
        cl = jnp.asarray(self.cycle_lengths, jnp.float32)[cycle]
        warm = (f_max - f_start) / wu * n + f_start
        t = jnp.minimum((n - wu) / (cl - wu), 1.0)
        decay = f_min + 0.5 * (f_max - f_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < wu, warm, decay)

    def __call__(self, n):
        n = jnp.asarray(n, jnp.float32)
        cycle = self._cycle(n)
        cum = jnp.asarray(_cum_cycles(self.cycle_lengths), jnp.float32)
        return self._per_cycle(n - cum[cycle], cycle)

    schedule = __call__


@dataclasses.dataclass
class LambdaLinearScheduler(LambdaWarmUpCosineScheduler2):
    """Linear warmup then linear decay towards f_min over the cycle
    (lr_scheduler.py:81-97). With v1's cycle_length=1e13 and f_min==f_max the
    post-warmup multiplier is effectively constant 1.0."""

    def _per_cycle(self, n, cycle):
        wu = jnp.asarray(self.warm_up_steps, jnp.float32)[cycle]
        f_min = jnp.asarray(self.f_min, jnp.float32)[cycle]
        f_max = jnp.asarray(self.f_max, jnp.float32)[cycle]
        f_start = jnp.asarray(self.f_start, jnp.float32)[cycle]
        cl = jnp.asarray(self.cycle_lengths, jnp.float32)[cycle]
        warm = (f_max - f_start) / wu * n + f_start
        decay = f_min + (f_max - f_min) * (cl - n) / cl
        return jnp.where(n < wu, warm, decay)
