"""Full-chain DDPM ancestral sampler (lax.scan).

Spec: ddpm.py:289-328 of the reference (p_mean_variance / p_sample /
p_sample_loop) — eps-parameterized posterior sampling over all T steps with
optional x0 clipping. Not on the PBE fast path (DDIM/PLMS are), but part of
the DDPM base capability; also usable for ablations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pbe_tpu.samplers.cfg import EpsFn
from pbe_tpu.schedules import DiffusionSchedule


def ddpm_ancestral_sample(
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    x_T: jnp.ndarray,
    z_inpaint: jnp.ndarray,
    mask_latent: jnp.ndarray,
    rng: jax.Array,
    clip_denoised: bool = False,
) -> jnp.ndarray:
    """Reverse the full T-step chain; returns x_0 latents (B,h,w,4)."""
    T = sched.num_timesteps
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    sqrt_recip = f32(sched.sqrt_recip_alphas_cumprod)
    sqrt_recipm1 = f32(sched.sqrt_recipm1_alphas_cumprod)
    coef1 = f32(sched.posterior_mean_coef1)
    coef2 = f32(sched.posterior_mean_coef2)
    log_var = f32(sched.posterior_log_variance_clipped)

    b = x_T.shape[0]
    dtype = x_T.dtype
    ts = jnp.arange(T - 1, -1, -1)
    rngs = jax.random.split(rng, T)

    def step_fn(x, per_step):
        t, key = per_step
        x9 = jnp.concatenate([x, z_inpaint, mask_latent], axis=-1)
        eps = eps_fn(x9, jnp.full((b,), t, jnp.float32)).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        x0 = sqrt_recip[t] * x32 - sqrt_recipm1[t] * eps
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = coef1[t] * x0 + coef2[t] * x32
        noise = jax.random.normal(key, x.shape, jnp.float32)
        nonzero = (t > 0).astype(jnp.float32)
        x_new = mean + nonzero * jnp.exp(0.5 * log_var[t]) * noise
        return x_new.astype(dtype), None

    x0, _ = jax.lax.scan(step_fn, x_T, (ts, rngs))
    return x0
