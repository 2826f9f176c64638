"""Schedule math vs. the reference's published formulas
(diffusionmodules/util.py:21-74, ddpm.py:175-228)."""
import numpy as np

from pbe_tpu.schedules import (
    DiffusionSchedule,
    SamplerSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
)


def test_linear_beta_schedule_is_sqrt_space():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    assert betas.shape == (1000,)
    expected = np.linspace(0.00085**0.5, 0.0120**0.5, 1000) ** 2
    np.testing.assert_allclose(betas, expected, rtol=1e-12)
    assert betas[0] == 0.00085 and abs(betas[-1] - 0.0120) < 1e-12


def test_diffusion_schedule_identities():
    s = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    np.testing.assert_allclose(
        s.alphas_cumprod, np.cumprod(1 - s.betas), rtol=1e-12
    )
    np.testing.assert_allclose(s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1])
    assert s.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod**2 + s.sqrt_one_minus_alphas_cumprod**2,
        1.0,
        atol=1e-12,
    )
    # lvlb_weights[0] patched to [1] (ddpm.py:226)
    assert s.lvlb_weights[0] == s.lvlb_weights[1]
    assert np.all(np.isfinite(s.lvlb_weights))


def test_ddim_timesteps_uniform_50():
    ts = make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    # range(0, 1000, 20) + 1 (util.py:46-57)
    np.testing.assert_array_equal(ts, np.arange(0, 1000, 20) + 1)


def test_sampler_schedule_eta0_deterministic():
    base = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    ss = SamplerSchedule.create(base, 50, eta=0.0)
    assert np.all(ss.sigmas == 0.0)
    np.testing.assert_allclose(ss.alphas, base.alphas_cumprod[ss.timesteps])
    np.testing.assert_allclose(ss.alphas_prev[1:], ss.alphas[:-1])
    assert ss.alphas_prev[0] == base.alphas_cumprod[0]


def test_sampler_schedule_eta1_sigma_formula():
    base = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    ss = SamplerSchedule.create(base, 25, eta=1.0)
    expected = np.sqrt(
        (1 - ss.alphas_prev) / (1 - ss.alphas) * (1 - ss.alphas / ss.alphas_prev)
    )
    np.testing.assert_allclose(ss.sigmas, expected, rtol=1e-10)
