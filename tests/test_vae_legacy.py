"""Legacy VQ/SD-era conv nets (diffusionmodules/model.py:218-780).

ResnetBlockT and Model get torch value parity (reference module imported
read-only, inline weight mapping); the decoders/rescalers get shape, jit,
and finiteness coverage.
"""
from __future__ import annotations

import sys

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pbe_tpu.models.vae_legacy import (
    LatentRescaler,
    MergedRescaleDecoder,
    MergedRescaleEncoder,
    Model,
    Resize,
    ResnetBlockT,
    SimpleDecoder,
    UpsampleDecoder,
    Upsampler,
)

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


def _map_resblock(sd, prefix=""):
    p = {}
    for tname, jname in [("norm1", "norm1"), ("norm2", "norm2")]:
        p[jname] = {"norm": {"scale": sd[f"{prefix}{tname}.weight"].numpy(),
                             "bias": sd[f"{prefix}{tname}.bias"].numpy()}}
    for cname in ("conv1", "conv2", "nin_shortcut"):
        k = f"{prefix}{cname}.weight"
        if k in sd:
            p[cname] = {"kernel": sd[k].numpy().transpose(2, 3, 1, 0),
                        "bias": sd[f"{prefix}{cname}.bias"].numpy()}
    if f"{prefix}temb_proj.weight" in sd:
        p["temb_proj"] = {"kernel": sd[f"{prefix}temb_proj.weight"].numpy().T,
                          "bias": sd[f"{prefix}temb_proj.bias"].numpy()}
    return p


def test_resnet_block_t_parity():
    from ldm.modules.diffusionmodules.model import ResnetBlock as TorchRB

    torch.manual_seed(0)
    trb = TorchRB(in_channels=32, out_channels=64, temb_channels=16,
                  dropout=0.0).eval()
    with torch.no_grad():
        for v in trb.state_dict().values():
            v.copy_(torch.randn_like(v) * 0.1)

    params = {"params": _map_resblock(trb.state_dict())}
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 6, 32)).astype(np.float32)
    temb = rng.normal(size=(2, 16)).astype(np.float32)

    got = ResnetBlockT(64).apply(params, jnp.asarray(x), jnp.asarray(temb))
    with torch.no_grad():
        want = trb(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(temb)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_model_runs_with_attention_and_context():
    m = Model(ch=16, out_ch=3, num_res_blocks=1, resolution=16,
              in_channels=5, ch_mult=(1, 2), attn_resolutions=(8,))
    x = jnp.zeros((2, 16, 16, 3))
    ctx = jnp.zeros((2, 16, 16, 2))
    t = jnp.asarray([0.0, 500.0])
    v = m.init(jax.random.PRNGKey(0), x, t, ctx)
    names = set(v["params"].keys())
    # attention placed at the 8-res level only (model.py:252-264)
    assert "down_1_attn_0" in names and "down_0_attn_0" not in names
    assert "up_1_attn_0" in names and "up_0_attn_0" not in names
    out = jax.jit(lambda p, x, t, c: m.apply(p, x, t, c))(v, x, t, ctx)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_model_no_timestep():
    m = Model(ch=8, out_ch=3, num_res_blocks=1, resolution=8, in_channels=3,
              ch_mult=(1, 2), use_timestep=False)
    x = jnp.zeros((1, 8, 8, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert "temb_dense_0" not in v["params"]
    assert m.apply(v, x).shape == (1, 8, 8, 3)


def test_simple_and_upsample_decoders():
    sd = SimpleDecoder(in_channels=8, out_channels=3)
    x = jnp.zeros((1, 4, 4, 8))
    v = sd.init(jax.random.PRNGKey(0), x)
    assert sd.apply(v, x).shape == (1, 8, 8, 3)

    ud = UpsampleDecoder(in_channels=8, out_channels=3, ch=8,
                         num_res_blocks=1, resolution=16, ch_mult=(2, 2))
    v = ud.init(jax.random.PRNGKey(0), x)
    assert ud.apply(v, x).shape == (1, 8, 8, 3)  # one upsample for 2 levels


def test_latent_rescaler_factors():
    for factor, want in [(2.0, 8), (0.5, 2), (1.5, 6)]:
        lr = LatentRescaler(factor=factor, in_channels=6, mid_channels=8,
                            out_channels=5, depth=1)
        x = jnp.zeros((1, 4, 4, 6))
        v = lr.init(jax.random.PRNGKey(0), x)
        assert lr.apply(v, x).shape == (1, want, want, 5)


def test_merged_rescale_and_upsampler():
    enc = MergedRescaleEncoder(in_channels=3, ch=8, resolution=16, out_ch=6,
                               num_res_blocks=1, ch_mult=(1, 2),
                               rescale_factor=1.0)
    x = jnp.zeros((1, 16, 16, 3))
    v = enc.init(jax.random.PRNGKey(0), x)
    assert enc.apply(v, x).shape == (1, 8, 8, 6)  # one downsample + rescale 1

    dec = MergedRescaleDecoder(z_channels=4, out_ch=3, resolution=16,
                               num_res_blocks=1, ch=8, ch_mult=(1, 2),
                               rescale_factor=1.0)
    z = jnp.zeros((1, 4, 4, 4))
    v = dec.init(jax.random.PRNGKey(0), z)
    assert dec.apply(v, z).shape == (1, 8, 8, 3)

    up = Upsampler(in_size=8, out_size=16, in_channels=4, out_channels=3)
    z = jnp.zeros((1, 8, 8, 4))
    v = up.init(jax.random.PRNGKey(0), z)
    out = up.apply(v, z)
    assert out.shape[0] == 1 and out.shape[-1] == 3


def test_resize():
    r = Resize()
    x = jnp.ones((1, 8, 8, 2))
    assert r(x) is x
    assert r(x, scale_factor=0.5).shape == (1, 4, 4, 2)
    assert r(x, scale_factor=2.0).shape == (1, 16, 16, 2)
