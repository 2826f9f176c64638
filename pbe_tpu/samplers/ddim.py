"""DDIM sampler as a jax.lax.scan loop.

Numerical spec: ddim.py:136-242 of the reference — uniform-stride timestep
subsequence, per-step 9-channel re-concat of (x, z_inpaint, mask), CFG inside
eps_fn, eta-parameterized stochasticity (eta=0 => deterministic).

The per-step scalar tables (a_t, a_prev, sigma, sqrt(1-a_t)) are numpy
constants gathered by the scanned step index, so the whole 50-step loop
compiles to one XLA while-loop with zero host round trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.samplers.cfg import EpsFn
from pbe_tpu.schedules import SamplerSchedule


def ddim_sample(
    eps_fn: EpsFn,
    sched: SamplerSchedule,
    x_T: jnp.ndarray,
    z_inpaint: jnp.ndarray,
    mask_latent: jnp.ndarray,
    rng: jax.Array | None = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Run the full reverse DDIM chain.

    x_T: (B,h,w,4) initial noise; z_inpaint: (B,h,w,4); mask_latent: (B,h,w,1).
    Returns x_0 latents (B,h,w,4).
    """
    S = sched.num_steps
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    # tables indexed by the scanned position p = 0..S-1, which visits DDIM
    # index S-1 down to 0 (reference: index = total_steps - i - 1)
    order = np.arange(S)[::-1]
    steps = f32(sched.timesteps[order])
    a_t = f32(sched.alphas[order])
    a_prev = f32(sched.alphas_prev[order])
    sigma = f32(sched.sigmas[order])
    sqrt_1m_a = f32(sched.sqrt_one_minus_alphas[order])

    stochastic = sched.eta > 0.0
    if stochastic and rng is None:
        raise ValueError("eta > 0 requires a PRNG key")
    rngs = (
        jax.random.split(rng, S) if stochastic else jnp.zeros((S, 2), jnp.uint32)
    )

    b = x_T.shape[0]
    dtype = x_T.dtype

    def step_fn(x, per_step):
        (step, at, aprev, sig, s1ma, key) = per_step
        x9 = jnp.concatenate([x, z_inpaint, mask_latent], axis=-1)
        t = jnp.full((b,), step, jnp.float32)
        e_t = eps_fn(x9, t).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        pred_x0 = (x32 - s1ma * e_t) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(1.0 - aprev - sig**2) * e_t
        x_prev = jnp.sqrt(aprev) * pred_x0 + dir_xt
        if stochastic:
            noise = sig * jax.random.normal(key, x.shape, jnp.float32) * temperature
            x_prev = x_prev + noise
        return x_prev.astype(dtype), None

    x0, _ = jax.lax.scan(
        step_fn, x_T, (steps, a_t, a_prev, sigma, sqrt_1m_a, rngs)
    )
    return x0
