"""Sampler math tests against closed-form results."""
import jax
import jax.numpy as jnp
import numpy as np

from pbe_tpu.samplers import ddim_sample, make_cfg_eps_fn, plms_sample
from pbe_tpu.schedules import DiffusionSchedule, SamplerSchedule


def _sched(steps=10, eta=0.0):
    base = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    return SamplerSchedule.create(base, steps, eta=eta), base


def _zeros_eps(x9, t):
    return jnp.zeros(x9.shape[:-1] + (4,), x9.dtype)


def test_ddim_zero_eps_telescopes():
    """With eps==0 every step maps x -> sqrt(a_prev/a_t) x, so the chain
    telescopes to x_T * sqrt(acp[t0] / acp[tS-1])."""
    ss, base = _sched(10)
    x_T = jnp.full((1, 4, 4, 4), 3.0)
    zi = jnp.zeros_like(x_T)
    m = jnp.zeros((1, 4, 4, 1))
    x0 = ddim_sample(_zeros_eps, ss, x_T, zi, m)
    expected = 3.0 * np.sqrt(ss.alphas_prev[0] / ss.alphas[-1])
    np.testing.assert_allclose(np.asarray(x0), expected, rtol=1e-5)


def test_plms_zero_eps_matches_ddim():
    """All AB combinations of zero eps are zero, so PLMS == DDIM here."""
    ss, _ = _sched(10)
    x_T = jnp.full((1, 4, 4, 4), 3.0)
    zi = jnp.zeros_like(x_T)
    m = jnp.zeros((1, 4, 4, 1))
    x_d = ddim_sample(_zeros_eps, ss, x_T, zi, m)
    x_p = plms_sample(_zeros_eps, ss, x_T, zi, m)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_d), rtol=1e-5)


def test_samplers_see_nine_channels():
    seen = []

    def eps(x9, t):
        seen.append(x9.shape[-1])
        return jnp.zeros(x9.shape[:-1] + (4,), x9.dtype)

    ss, _ = _sched(5)
    x_T = jnp.zeros((2, 4, 4, 4))
    ddim_sample(eps, ss, x_T, jnp.zeros_like(x_T), jnp.zeros((2, 4, 4, 1)))
    assert all(c == 9 for c in seen)


def test_cfg_combination():
    """eps = e_uc + s (e_c - e_uc) with the batched-call convention
    (uncond first half, cond second half — plms.py:185-189)."""

    def apply_fn(x9, t, ctx):
        # eps depends only on the context token value
        val = ctx[:, 0, 0]
        return jnp.broadcast_to(
            val[:, None, None, None], x9.shape[:-1] + (4,)
        )

    c = jnp.full((2, 1, 8), 5.0)
    uc = jnp.full((2, 1, 8), 1.0)
    eps_fn = make_cfg_eps_fn(apply_fn, c, uc, scale=3.0)
    out = eps_fn(jnp.zeros((2, 4, 4, 9)), jnp.zeros((2,)))
    # 1 + 3*(5-1) = 13
    np.testing.assert_allclose(np.asarray(out), 13.0)


def test_cfg_scale_one_single_call():
    calls = []

    def apply_fn(x9, t, ctx):
        calls.append(x9.shape[0])
        return jnp.zeros(x9.shape[:-1] + (4,))

    eps_fn = make_cfg_eps_fn(apply_fn, jnp.zeros((2, 1, 8)), jnp.zeros((2, 1, 8)), 1.0)
    eps_fn(jnp.zeros((2, 4, 4, 9)), jnp.zeros((2,)))
    assert calls == [2]  # no CFG doubling


def test_ddim_eta1_stochastic_but_reproducible():
    ss, _ = _sched(10, eta=1.0)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    zi = jnp.zeros_like(x_T)
    m = jnp.zeros((1, 4, 4, 1))
    a = ddim_sample(_zeros_eps, ss, x_T, zi, m, rng=jax.random.PRNGKey(7))
    b = ddim_sample(_zeros_eps, ss, x_T, zi, m, rng=jax.random.PRNGKey(7))
    c = ddim_sample(_zeros_eps, ss, x_T, zi, m, rng=jax.random.PRNGKey(8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).max()) > 0


def test_plms_matches_numpy_multistep_simulation():
    """Full-order check of the PLMS order ramp (Heun first step, then AB2/3/4)
    against an independent numpy simulation, with eps a function of t only."""
    ss, _ = _sched(8)

    def eps_of_t(t):
        return t / 1000.0 - 0.3

    def eps_fn(x9, t):
        return jnp.broadcast_to(
            eps_of_t(t)[:, None, None, None], x9.shape[:-1] + (4,)
        ).astype(x9.dtype)

    x_T = jnp.full((1, 4, 4, 4), 1.5)
    got = plms_sample(eps_fn, ss, x_T, jnp.zeros_like(x_T), jnp.zeros((1, 4, 4, 1)))

    # numpy simulation of plms.py:118-248 (scalar because eps is spatially
    # constant and x-independent)
    x = 1.5
    old = []
    S = ss.num_steps
    for i, idx in enumerate(range(S - 1, -1, -1)):
        t = float(ss.timesteps[idx])
        t_next = float(ss.timesteps[max(idx - 1, 0)])
        a_t, a_prev = ss.alphas[idx], ss.alphas_prev[idx]
        s1ma = ss.sqrt_one_minus_alphas[idx]

        def upd(e, x):
            pred_x0 = (x - s1ma * e) / np.sqrt(a_t)
            return np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * e

        e_t = eps_of_t(np.asarray(t))
        if len(old) == 0:
            e_next = eps_of_t(np.asarray(t_next))  # x-independent eps
            e_prime = (e_t + e_next) / 2
        elif len(old) == 1:
            e_prime = (3 * e_t - old[-1]) / 2
        elif len(old) == 2:
            e_prime = (23 * e_t - 16 * old[-1] + 5 * old[-2]) / 12
        else:
            e_prime = (55 * e_t - 59 * old[-1] + 37 * old[-2] - 9 * old[-3]) / 24
        x = upd(e_prime, x)
        old.append(e_t)
        if len(old) >= 4:
            old.pop(0)

    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-5)
