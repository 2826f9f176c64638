"""PLMS (pseudo linear multistep) sampler as a jax.lax.scan loop.

Numerical spec: plms.py:118-248 of the reference — Adams-Bashforth multistep
on eps with order ramping 1->4: the first step runs a pseudo-Heun double
model call at (t, t_next); later steps combine the eps history
    order 2: (3 e - e1) / 2
    order 3: (23 e - 16 e1 + 5 e2) / 12
    order 4: (55 e - 59 e1 + 37 e2 - 9 e3) / 24
(plms.py:230-244). eta must be 0 (plms.py:25-26).

TPU formulation: the first three steps (orders 1-3, including the Heun
double model call on step 0) are peeled and unrolled outside the loop; the
remaining S-3 steps scan a single uniform AB4 body with the eps history as a
fixed-shape most-recent-first carry. No data-dependent branching inside the
scan — profiled ~0.4 ms/step cheaper than a lax.switch body.
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

    def eval_eps(x, step):
        return eps_fn(cat9(x), jnp.full((b,), step, jnp.float32)).astype(jnp.float32)

    # ---- peeled order-ramp (steps 0..2) ------------------------------------
    x = x_T
    old: list[jnp.ndarray] = []  # most-recent-first
    n_peel = min(3, S)
    for i in range(n_peel):
        e_t = eval_eps(x, steps[i])
        x32 = x.astype(jnp.float32)
        if i == 0:
            # pseudo improved Euler: second eval at (x_prev, t_next)
            xp = x_prev_from(e_t, x32, a_t[i], a_prev[i], sqrt_1m_a[i]).astype(dtype)
            e_next = eval_eps(xp, steps_next[i])
            e_prime = (e_t + e_next) / 2
        elif i == 1:
            e_prime = (3 * e_t - old[0]) / 2
        else:
            e_prime = (23 * e_t - 16 * old[0] + 5 * old[1]) / 12
        x = x_prev_from(e_prime, x32, a_t[i], a_prev[i], sqrt_1m_a[i]).astype(dtype)
        old = [e_t] + old[:2]
    if S <= 3:
        return x

    # ---- uniform AB4 scan (steps 3..S-1) -----------------------------------
    def step_fn(carry, per_step):
        x, e1, e2, e3 = carry  # eps history, most recent first
        step, at, aprev, s1ma = per_step
        e_t = eval_eps(x, step)
        x32 = x.astype(jnp.float32)
        e_prime = (55 * e_t - 59 * e1 + 37 * e2 - 9 * e3) / 24
        x_new = x_prev_from(e_prime, x32, at, aprev, s1ma).astype(dtype)
        return (x_new, e_t, e1, e2), None

    (x0, _, _, _), _ = jax.lax.scan(
        step_fn,
        (x, old[0], old[1], old[2]),
        (steps[3:], a_t[3:], a_prev[3:], sqrt_1m_a[3:]),
    )
    return x0
