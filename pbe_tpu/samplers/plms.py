"""PLMS (pseudo linear multistep) sampler as a jax.lax.scan loop.

Numerical spec: plms.py:118-248 of the reference — Adams-Bashforth multistep
on eps with order ramping 1->4: the first step runs a pseudo-Heun double
model call at (t, t_next); later steps combine the eps history
    order 2: (3 e - e1) / 2
    order 3: (23 e - 16 e1 + 5 e2) / 12
    order 4: (55 e - 59 e1 + 37 e2 - 9 e3) / 24
(plms.py:230-244). eta must be 0 (plms.py:25-26).

lax.scan-ready formulation: the eps history is a fixed-shape (3, B, h, w, 4)
ring buffer ordered most-recent-first, plus a step counter; the variable
order becomes a lax.switch over min(counter, 3). The extra model call of the
Heun branch sits inside branch 0 of the switch, so it is only executed on the
first step at runtime.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.samplers.cfg import EpsFn
from pbe_tpu.schedules import SamplerSchedule


def plms_sample(
    eps_fn: EpsFn,
    sched: SamplerSchedule,
    x_T: jnp.ndarray,
    z_inpaint: jnp.ndarray,
    mask_latent: jnp.ndarray,
) -> jnp.ndarray:
    """Run the full reverse PLMS chain; returns x_0 latents (B,h,w,4)."""
    if sched.eta != 0.0:
        raise ValueError("PLMS requires eta == 0 (plms.py:25-26)")
    S = sched.num_steps
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    order = np.arange(S)[::-1]
    steps = f32(sched.timesteps[order])
    # t_next visits the *following* (smaller) timestep; clamped at the end
    # (plms.py:148: time_range[min(i+1, len-1)])
    steps_next = f32(sched.timesteps[np.maximum(order - 1, 0)])
    a_t = f32(sched.alphas[order])
    a_prev = f32(sched.alphas_prev[order])
    sqrt_1m_a = f32(sched.sqrt_one_minus_alphas[order])

    b = x_T.shape[0]
    dtype = x_T.dtype

    def cat9(x):
        return jnp.concatenate([x, z_inpaint, mask_latent], axis=-1)

    def x_prev_from(e, x32, at, aprev, s1ma):
        pred_x0 = (x32 - s1ma * e) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(1.0 - aprev) * e
        return jnp.sqrt(aprev) * pred_x0 + dir_xt

    def step_fn(carry, per_step):
        x, old_eps, count = carry  # old_eps: (3,B,h,w,4) most-recent-first
        step, step_next, at, aprev, s1ma = per_step
        t = jnp.full((b,), step, jnp.float32)
        e_t = eps_fn(cat9(x), t).astype(jnp.float32)
        x32 = x.astype(jnp.float32)

        def heun(_):
            # pseudo improved Euler: second eval at (x_prev, t_next)
            xp = x_prev_from(e_t, x32, at, aprev, s1ma).astype(dtype)
            t_next = jnp.full((b,), step_next, jnp.float32)
            e_next = eps_fn(cat9(xp), t_next).astype(jnp.float32)
            return (e_t + e_next) / 2

        def ab2(_):
            return (3 * e_t - old_eps[0]) / 2

        def ab3(_):
            return (23 * e_t - 16 * old_eps[0] + 5 * old_eps[1]) / 12

        def ab4(_):
            return (55 * e_t - 59 * old_eps[0] + 37 * old_eps[1] - 9 * old_eps[2]) / 24

        e_prime = jax.lax.switch(
            jnp.minimum(count, 3), [heun, ab2, ab3, ab4], None
        )
        x_new = x_prev_from(e_prime, x32, at, aprev, s1ma).astype(dtype)
        new_old = jnp.concatenate([e_t[None], old_eps[:2]], axis=0)
        return (x_new, new_old, count + 1), None

    init = (
        x_T,
        jnp.zeros((3, *x_T.shape), jnp.float32),
        jnp.asarray(0, jnp.int32),
    )
    (x0, _, _), _ = jax.lax.scan(
        step_fn, init, (steps, steps_next, a_t, a_prev, sqrt_1m_a)
    )
    return x0
