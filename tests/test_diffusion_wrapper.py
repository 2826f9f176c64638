"""DiffusionWrapper conditioning dispatch + class-conditional UNet
(ddpm.py:468-515; openaimodel.py:630-631,862-870)."""
from __future__ import annotations

import sys

import numpy as np
import pytest
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pbe_tpu.convert import convert_state_dict
from pbe_tpu.models.diffusion_wrapper import apply_diffusion_wrapper
from pbe_tpu.models.unet import UNetModel

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
if "omegaconf" not in sys.modules:  # reference import shim (omegaconf absent)
    import types

    _om = types.ModuleType("omegaconf")
    _lc = types.ModuleType("omegaconf.listconfig")

    class _ListConfig:  # only used in a type() == check in openaimodel.py
        pass

    _lc.ListConfig = _ListConfig
    _om.listconfig = _lc
    sys.modules["omegaconf"] = _om
    sys.modules["omegaconf.listconfig"] = _lc

GEO = dict(model_channels=32, num_res_blocks=1, attention_resolutions=(1, 2),
           channel_mult=(1, 2), num_heads=4, context_dim=48)


def _unet(in_channels=4, num_classes=None):
    return UNetModel(in_channels=in_channels, out_channels=4, remat=False,
                     transformer_depth=1, num_classes=num_classes, **GEO)


def _init(net, n=8, b=2, ctx_tokens=3, y=None):
    x = jnp.zeros((b, n, n, net.in_channels))
    t = jnp.zeros((b,))
    c = jnp.zeros((b, ctx_tokens, GEO["context_dim"]))
    kw = {"y": y} if y is not None else {}
    v = net.init(jax.random.PRNGKey(0), x, t, c, **kw)
    return v


def test_all_conditioning_keys_run():
    b, n = 2, 8
    ctx = jnp.ones((b, 3, GEO["context_dim"]))
    x = jnp.ones((b, n, n, 4))
    t = jnp.zeros((b,))

    # crossattn on a 4-channel UNet
    net = _unet(4)
    v = _init(net)
    fn = lambda x, t, c, y=None: net.apply(v, x, t, c, y=y)
    out = apply_diffusion_wrapper(
        fn, x, t, "crossattn", c_crossattn=[ctx[:, :2], ctx[:, 2:]]
    )
    assert out.shape == (b, n, n, 4)

    # None key: attn2 degenerates to self-attention (context=None), which
    # changes the to_k/to_q widths — its own init
    vn = net.init(jax.random.PRNGKey(0), x, t, None)
    fn_n = lambda x, t, c, y=None: net.apply(vn, x, t, c, y=y)
    out = apply_diffusion_wrapper(fn_n, x, t, None)
    assert out.shape == (b, n, n, 4)

    # concat / hybrid on a 9-channel UNet (4 noisy + 5 conditioning).
    # concat passes context=None (attn2 self-attention) while hybrid passes
    # tokens — the to_k/to_q widths differ, so each gets its own params
    net9 = _unet(9)
    cc = [jnp.ones((b, n, n, 5))]
    x9 = jnp.concatenate([x, *cc], axis=-1)
    vc = net9.init(jax.random.PRNGKey(0), x9, t, None)
    fn_c = lambda x, t, c, y=None: net9.apply(vc, x, t, c, y=y)
    out = apply_diffusion_wrapper(fn_c, x, t, "concat", c_concat=cc)
    assert out.shape == (b, n, n, 4)

    vh = _init(net9)
    fn_h = lambda x, t, c, y=None: net9.apply(vh, x, t, c, y=y)
    out = apply_diffusion_wrapper(
        fn_h, x, t, "hybrid", c_concat=cc, c_crossattn=[ctx]
    )
    assert out.shape == (b, n, n, 4)

    with pytest.raises(NotImplementedError):
        apply_diffusion_wrapper(fn, x, t, "bogus")


def test_adm_class_conditioning_changes_output():
    b, n = 2, 8
    net = _unet(4, num_classes=7)
    y = jnp.asarray([1, 5])
    x = jnp.ones((b, n, n, 4))
    t = jnp.full((b,), 3.0)
    v = net.init(jax.random.PRNGKey(0), x, t, None, y=y)
    # zero-init out conv -> output identically 0; perturb params so the
    # label path is observable
    leaves, treedef = jax.tree.flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    v = jax.tree.unflatten(treedef, [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])
    fn = lambda x, t, c, y=None: net.apply(v, x, t, c, y=y)
    o1 = apply_diffusion_wrapper(fn, x, t, "adm", c_crossattn=[y])
    o2 = apply_diffusion_wrapper(fn, x, t, "adm",
                                 c_crossattn=[jnp.asarray([2, 2])])
    assert o1.shape == (b, n, n, 4)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6  # labels actually condition


def test_adm_unet_torch_parity():
    """Class-conditional UNet vs the reference with converted weights."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(3)
    tnet = TorchUNet(
        image_size=8, in_channels=4, out_channels=4,
        model_channels=GEO["model_channels"],
        num_res_blocks=GEO["num_res_blocks"],
        attention_resolutions=list(GEO["attention_resolutions"]),
        channel_mult=list(GEO["channel_mult"]), num_heads=GEO["num_heads"],
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=GEO["context_dim"], use_checkpoint=False, legacy=False,
        num_classes=7,
    ).eval()
    with torch.no_grad():  # randomize zero-init outs so wiring bugs can't hide
        for name, p in tnet.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.1)

    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in tnet.state_dict().items()}
    # generic multi-token context: keep attn2.to_q/to_k (the single-token
    # fast-path drop applies only to PBE conditioning)
    params, dropped = convert_state_dict(sd, single_token_context=False)
    assert not dropped, dropped

    jnet = _unet(4, num_classes=7)
    jparams = {"params": params["params"]["model"]}
    g = np.random.default_rng(0)
    x = g.standard_normal((2, 8, 8, 4)).astype(np.float32)
    t = np.asarray([11.0, 600.0], np.float32)
    c = g.standard_normal((2, 2, GEO["context_dim"])).astype(np.float32)
    y = np.asarray([0, 6])

    got = np.asarray(jnet.apply(jparams, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(c), y=jnp.asarray(y)))
    with torch.no_grad():
        want = tnet(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            timesteps=torch.from_numpy(t),
            context=torch.from_numpy(c),
            y=torch.from_numpy(y),
        ).permute(0, 2, 3, 1).numpy()
    scale = np.abs(want).max()
    assert scale > 1e-3
    np.testing.assert_allclose(got, want, atol=3e-4 * scale, rtol=0)
