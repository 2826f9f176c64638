"""FULL-MODEL numerical parity vs the PyTorch reference.

Unlike the op-level goldens in test_torch_parity.py, these tests build the
*actual reference modules* (imported read-only from /root/reference with a
sys.path shim), initialize them randomly, export their state_dict through the
production checkpoint converter (pbe_tpu.convert.convert_state_dict), and
assert activation / trajectory parity of the complete models:

  * UNet eps-prediction on fixed (x9, t, context)
        vs ldm/modules/diffusionmodules/openaimodel.py:528-889
  * VAE encode moments + decode
        vs ldm/modules/diffusionmodules/model.py:370-580 (+ quant convs,
        ldm/models/autoencoder.py:36-37)
  * exemplar mapper + final LayerNorm
        vs ldm/modules/encoders/xf.py:80-131 + modules.py:142-149
  * full multi-step PLMS and DDIM latent trajectories with CFG
        vs ldm/models/diffusion/plms.py:118-248 / ddim.py:136-242

Every zero-initialized reference parameter (zero_module convs, norm biases)
is replaced with random values first, so a consistent-but-wrong key mapping
or a misrouted skip connection cannot pass. The reference's Lightning/CUDA
glue is bypassed with minimal duck-typed stubs (register_buffer pinned to
CPU, an omegaconf module stub); no reference code is copied.

Geometries: a thin 2-level one, a full-depth 4-level one (all attention
placements, multi-group norms), and the production v1 geometry behind
@pytest.mark.slow.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pbe_tpu.convert import convert_state_dict
from pbe_tpu.convert.torch_ckpt import validate_against
from pbe_tpu.models.unet import UNetModel
from pbe_tpu.models.vae import AutoencoderKL
from pbe_tpu.samplers.cfg import make_cfg_eps_fn
from pbe_tpu.samplers.ddim import ddim_sample
from pbe_tpu.samplers.plms import plms_sample
from pbe_tpu.schedules import DiffusionSchedule, SamplerSchedule

# --- reference import shim (read-only; omegaconf is absent in this image) ---
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
if "omegaconf" not in sys.modules:
    _om = types.ModuleType("omegaconf")
    _lc = types.ModuleType("omegaconf.listconfig")

    class _ListConfig:  # only used in a type() == check in openaimodel.py
        pass

    _lc.ListConfig = _ListConfig
    _om.listconfig = _lc
    sys.modules["omegaconf"] = _om
    sys.modules["omegaconf.listconfig"] = _lc

from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet  # noqa: E402
from ldm.modules.diffusionmodules import model as ref_vae  # noqa: E402
from ldm.modules.encoders import xf  # noqa: E402
from ldm.models.diffusion.plms import PLMSSampler  # noqa: E402
from ldm.models.diffusion.ddim import DDIMSampler  # noqa: E402


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous()


def _nhwc(x: torch.Tensor) -> np.ndarray:
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def _randomize_zero_params(module: torch.nn.Module, seed: int = 0, scale: float = 0.1):
    """Replace every all-zero parameter (zero_module convs, norm/linear biases)
    with random values so the parity test exercises ALL weights."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point and torch.count_nonzero(v) == 0:
            sd[k] = torch.randn(v.shape, generator=g, dtype=v.dtype) * scale
    module.load_state_dict(sd)


# ---------------------------------------------------------------------------
# UNet geometries

THIN = dict(model_channels=32, num_res_blocks=1, attention_resolutions=(1, 2),
            channel_mult=(1, 2), num_heads=4, context_dim=48, latent=8)
DEEP = dict(model_channels=32, num_res_blocks=2, attention_resolutions=(4, 2, 1),
            channel_mult=(1, 2, 4, 4), num_heads=8, context_dim=768, latent=32)
V1 = dict(model_channels=320, num_res_blocks=2, attention_resolutions=(4, 2, 1),
          channel_mult=(1, 2, 4, 4), num_heads=8, context_dim=768, latent=64)


def _build_unet_pair(geo: dict, seed: int = 0):
    """Build (torch UNet, our UNet, converted params) with shared random
    weights routed through the production converter."""
    torch.manual_seed(seed)
    tnet = TorchUNet(
        image_size=geo["latent"], in_channels=9, out_channels=4,
        model_channels=geo["model_channels"],
        num_res_blocks=geo["num_res_blocks"],
        attention_resolutions=list(geo["attention_resolutions"]),
        channel_mult=list(geo["channel_mult"]), num_heads=geo["num_heads"],
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=geo["context_dim"], use_checkpoint=False, legacy=False,
    ).eval()
    _randomize_zero_params(tnet, seed=seed)

    sd = {f"model.diffusion_model.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params, dropped = convert_state_dict(sd)
    # only the provably-unused single-token cross-attn q/k may be dropped
    assert all(".attn2.to_q." in k or ".attn2.to_k." in k for k in dropped), dropped

    jnet = UNetModel(
        in_channels=9, model_channels=geo["model_channels"], out_channels=4,
        num_res_blocks=geo["num_res_blocks"],
        attention_resolutions=tuple(geo["attention_resolutions"]),
        channel_mult=tuple(geo["channel_mult"]), num_heads=geo["num_heads"],
        transformer_depth=1, context_dim=geo["context_dim"], remat=False,
    )
    return tnet, jnet, {"params": params["params"]["model"]}


def _unet_forward_parity(geo: dict, batch: int = 2, atol: float = 2e-4):
    tnet, jnet, params = _build_unet_pair(geo)
    g = np.random.default_rng(0)
    n = geo["latent"]
    x = g.standard_normal((batch, n, n, 9)).astype(np.float32)
    t = np.asarray([17, 423][:batch], np.float32)
    c = g.standard_normal((batch, 1, geo["context_dim"])).astype(np.float32)

    # converter completeness: exact tree/shape match against model.init
    shapes = jax.eval_shape(
        jnet.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(c)
    )
    missing, unexpected, mismatched = validate_against(params, shapes)
    assert not missing and not unexpected and not mismatched, (
        missing[:5], unexpected[:5], mismatched[:5])

    got = np.asarray(jnet.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c)))
    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), timesteps=torch.from_numpy(t), context=torch.from_numpy(c)))
    scale = np.abs(want).max()
    assert scale > 1e-3  # guard against trivially-zero outputs
    np.testing.assert_allclose(got, want, atol=atol * scale, rtol=0)
    return got, want


def test_unet_forward_parity_thin():
    _unet_forward_parity(THIN)


def test_unet_forward_parity_full_depth():
    """All 4 levels / 3 attention placements / skip-cat order / emb routing."""
    _unet_forward_parity(DEEP, batch=1)


@pytest.mark.slow
def test_unet_forward_parity_v1_geometry():
    """The production 860M-parameter geometry (openaimodel.py:528-889 with
    configs/v1.yaml:30-46). ~minutes on CPU; run with -m slow."""
    _unet_forward_parity(V1, batch=1)


# ---------------------------------------------------------------------------
# VAE


def _build_vae_pair(ch=32, ch_mult=(1, 2), nrb=1, z=4, res=32, seed=0):
    torch.manual_seed(seed)
    enc = ref_vae.Encoder(ch=ch, out_ch=3, ch_mult=ch_mult, num_res_blocks=nrb,
                          attn_resolutions=[], in_channels=3, resolution=res,
                          z_channels=z, double_z=True).eval()
    dec = ref_vae.Decoder(ch=ch, out_ch=3, ch_mult=ch_mult, num_res_blocks=nrb,
                          attn_resolutions=[], in_channels=3, resolution=res,
                          z_channels=z).eval()
    quant = torch.nn.Conv2d(2 * z, 2 * z, 1)
    post_quant = torch.nn.Conv2d(z, z, 1)
    for m in (enc, dec, quant, post_quant):
        _randomize_zero_params(m, seed=seed)

    sd = {}
    sd.update({f"first_stage_model.encoder.{k}": v.numpy() for k, v in enc.state_dict().items()})
    sd.update({f"first_stage_model.decoder.{k}": v.numpy() for k, v in dec.state_dict().items()})
    sd.update({f"first_stage_model.quant_conv.{k}": v.numpy() for k, v in quant.state_dict().items()})
    sd.update({f"first_stage_model.post_quant_conv.{k}": v.numpy() for k, v in post_quant.state_dict().items()})
    params, dropped = convert_state_dict(sd)
    assert not dropped, dropped

    jvae = AutoencoderKL(ch=ch, ch_mult=ch_mult, num_res_blocks=nrb,
                         z_channels=z, embed_dim=z)
    return (enc, dec, quant, post_quant), jvae, {"params": params["params"]["first_stage_model"]}


def test_vae_encode_decode_parity():
    (enc, dec, quant, post_quant), jvae, params = _build_vae_pair()
    g = np.random.default_rng(1)
    x = (g.uniform(-1, 1, (2, 32, 32, 3))).astype(np.float32)

    mean, logvar = jvae.apply(params, jnp.asarray(x), method=AutoencoderKL.encode)
    with torch.no_grad():
        moments = quant(enc(_nchw(x)))
        w_mean, w_logvar = torch.chunk(moments, 2, dim=1)
    np.testing.assert_allclose(np.asarray(mean), _nhwc(w_mean), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logvar), np.clip(_nhwc(w_logvar), -30.0, 20.0), atol=1e-4)

    z = g.standard_normal((2, 16, 16, 4)).astype(np.float32)
    got = np.asarray(jvae.apply(params, jnp.asarray(z), method=AutoencoderKL.decode))
    with torch.no_grad():
        want = _nhwc(dec(post_quant(_nchw(z))))
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)


# ---------------------------------------------------------------------------
# Exemplar mapper (xf Transformer + final_ln), single-token path


def test_mapper_final_ln_parity():
    import flax.linen as fnn

    from pbe_tpu.models.exemplar import MapperBlock
    from pbe_tpu.ops.norms import LayerNormF32

    width, layers = 64, 3
    torch.manual_seed(2)
    tmapper = xf.Transformer(1, width, layers, 1).eval()
    tln = torch.nn.LayerNorm(width)
    for m in (tmapper, tln):
        _randomize_zero_params(m, seed=2)

    sd = {f"cond_stage_model.mapper.{k}": v.numpy() for k, v in tmapper.state_dict().items()}
    sd.update({f"cond_stage_model.final_ln.{k}": v.numpy() for k, v in tln.state_dict().items()})
    params, dropped = convert_state_dict(sd)
    assert not dropped, dropped

    class _MapperTail(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            for i in range(layers):
                x = MapperBlock(width, name=f"mapper_resblocks_{i}")(x)
            return LayerNormF32(name="final_ln")(x)

    g = np.random.default_rng(2)
    x = g.standard_normal((3, 1, width)).astype(np.float32)
    got = np.asarray(_MapperTail().apply(
        {"params": params["params"]["cond_stage_model"]}, jnp.asarray(x)))
    with torch.no_grad():
        want = tln(tmapper(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Full PLMS / DDIM trajectories (CFG scale 3, injected x_T / z_inpaint / mask)


class _StubLDM:
    """Duck-typed stand-in for LatentDiffusion as seen by the reference
    samplers (plms.py:33-57 reads these attributes only)."""

    def __init__(self, tnet: TorchUNet, sched: DiffusionSchedule):
        self.num_timesteps = sched.num_timesteps
        self.device = torch.device("cpu")
        self.betas = torch.tensor(sched.betas, dtype=torch.float32)
        self.alphas_cumprod = torch.tensor(sched.alphas_cumprod, dtype=torch.float32)
        self.alphas_cumprod_prev = torch.tensor(
            sched.alphas_cumprod_prev, dtype=torch.float32)
        self.parameterization = "eps"
        self._net = tnet

    def apply_model(self, x, t, c):
        return self._net(x, timesteps=t, context=c)


class _CPUPLMS(PLMSSampler):
    def register_buffer(self, name, attr):  # reference pins buffers to cuda
        setattr(self, name, attr.cpu() if isinstance(attr, torch.Tensor) else attr)


class _CPUDDIM(DDIMSampler):
    def register_buffer(self, name, attr):
        setattr(self, name, attr.cpu() if isinstance(attr, torch.Tensor) else attr)


def _trajectory_setup(steps: int):
    tnet, jnet, params = _build_unet_pair(THIN, seed=3)
    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.012)
    stub = _StubLDM(tnet, sched)

    g = np.random.default_rng(3)
    n, ctx = THIN["latent"], THIN["context_dim"]
    x_T = g.standard_normal((1, n, n, 4)).astype(np.float32)
    z_inpaint = g.standard_normal((1, n, n, 4)).astype(np.float32)
    mask = (g.uniform(size=(1, n, n, 1)) > 0.5).astype(np.float32)
    cond = g.standard_normal((1, 1, ctx)).astype(np.float32)
    uncond = g.standard_normal((1, 1, ctx)).astype(np.float32)

    ssched = SamplerSchedule.create(sched, steps, eta=0.0)
    apply_fn = lambda x, t, c: jnet.apply(params, x, t, c)
    eps_fn = make_cfg_eps_fn(apply_fn, jnp.asarray(cond), jnp.asarray(uncond), 3.0)
    kwargs = dict(
        S=steps, batch_size=1, shape=(4, n, n), conditioning=torch.from_numpy(cond),
        verbose=False, x_T=_nchw(x_T), unconditional_guidance_scale=3.0,
        unconditional_conditioning=torch.from_numpy(uncond), eta=0.0,
        disable_tqdm=True,
        test_model_kwargs={"images_inpaint": _nchw(z_inpaint),
                           "images_mask": _nchw(mask)},
    )
    jargs = tuple(map(jnp.asarray, (x_T, z_inpaint, mask)))
    return stub, ssched, eps_fn, kwargs, jargs


@pytest.mark.parametrize("steps", [4, 8])
def test_plms_trajectory_parity(steps):
    """Full reverse PLMS chain (incl. the step-0 Heun double call and the
    order ramp) matches plms.py:118-248 step-for-step at fixed inputs."""
    stub, ssched, eps_fn, kwargs, jargs = _trajectory_setup(steps)
    kwargs.pop("disable_tqdm")  # plms.py has no tqdm kwarg
    sampler = _CPUPLMS(stub)
    # schedule-table cross-check vs the reference's make_ddim_* outputs
    sampler.make_schedule(ddim_num_steps=steps, ddim_eta=0.0, verbose=False)
    np.testing.assert_allclose(sampler.ddim_alphas.numpy(), ssched.alphas, atol=1e-7)
    np.testing.assert_allclose(
        sampler.ddim_alphas_prev, ssched.alphas_prev, atol=1e-7)
    np.testing.assert_array_equal(sampler.ddim_timesteps, ssched.timesteps)

    with torch.no_grad():
        want, _ = sampler.sample(**kwargs)
    got = np.asarray(plms_sample(eps_fn, ssched, *jargs))
    scale = max(np.abs(want.numpy()).max(), 1e-3)
    np.testing.assert_allclose(got, _nhwc(want), atol=5e-4 * scale, rtol=0)


def test_ddim_trajectory_parity():
    stub, ssched, eps_fn, kwargs, jargs = _trajectory_setup(8)
    sampler = _CPUDDIM(stub)
    with torch.no_grad():
        want, _ = sampler.sample(**kwargs)
    got = np.asarray(ddim_sample(eps_fn, ssched, *jargs))
    scale = max(np.abs(want.numpy()).max(), 1e-3)
    np.testing.assert_allclose(got, _nhwc(want), atol=5e-4 * scale, rtol=0)


def test_unet_front_block_parity():
    """add_conv_in_front_of_unet: the fork's 9->model_channels conv +
    My_ResBlock front block compressing to the 4-channel trunk input
    (openaimodel.py:634-655, 874-876). The dead My_ResBlock skip_connection
    is dropped by the converter."""
    geo = THIN
    torch.manual_seed(11)
    tnet = TorchUNet(
        image_size=geo["latent"], in_channels=4, out_channels=4,
        model_channels=geo["model_channels"],
        num_res_blocks=geo["num_res_blocks"],
        attention_resolutions=list(geo["attention_resolutions"]),
        channel_mult=list(geo["channel_mult"]), num_heads=geo["num_heads"],
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=geo["context_dim"], use_checkpoint=False, legacy=False,
        add_conv_in_front_of_unet=True,
    ).eval()
    _randomize_zero_params(tnet, seed=11)

    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in tnet.state_dict().items()}
    params, dropped = convert_state_dict(sd)
    assert all(
        ".attn2.to_q." in k or ".attn2.to_k." in k
        or ".add_resbolck.1.0.skip_connection." in k
        for k in dropped
    ), dropped

    jnet = UNetModel(
        in_channels=4, model_channels=geo["model_channels"], out_channels=4,
        num_res_blocks=geo["num_res_blocks"],
        attention_resolutions=tuple(geo["attention_resolutions"]),
        channel_mult=tuple(geo["channel_mult"]), num_heads=geo["num_heads"],
        transformer_depth=1, context_dim=geo["context_dim"], remat=False,
        add_conv_in_front_of_unet=True,
    )
    jparams = {"params": params["params"]["model"]}

    g = np.random.default_rng(5)
    n = geo["latent"]
    x = g.standard_normal((2, n, n, 9)).astype(np.float32)
    t = np.asarray([7, 911], np.float32)
    c = g.standard_normal((2, 1, geo["context_dim"])).astype(np.float32)

    shapes = jax.eval_shape(
        jnet.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(c))
    missing, unexpected, mismatched = validate_against(jparams, shapes)
    assert not missing and not unexpected and not mismatched, (
        missing[:5], unexpected[:5], mismatched[:5])

    got = np.asarray(jnet.apply(jparams, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(c)))
    with torch.no_grad():
        want = _nhwc(tnet(_nchw(x), timesteps=torch.from_numpy(t),
                          context=torch.from_numpy(c)))
    scale = np.abs(want).max()
    assert scale > 1e-3
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0)
