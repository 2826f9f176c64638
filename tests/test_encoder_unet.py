"""EncoderUNetModel + noisy-latent classifier parity vs the reference.

Builds the reference EncoderUNetModel (openaimodel.py:892-1108, imported
read-only) with random weights at every pooling mode, converts the
state_dict through convert_encoder_unet_state_dict, and asserts logits
parity. Also exercises the classifier loss/accuracy core
(classifier.py:107-225 semantics).
"""
from __future__ import annotations

import sys

import numpy as np
import pytest
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pbe_tpu.models.encoder_unet import (
    EncoderUNetConfig,
    classifier_loss,
    convert_encoder_unet_state_dict,
    top_k_accuracy,
)
from pbe_tpu.schedules import DiffusionSchedule

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


GEOM = dict(
    image_size=16, in_channels=4, model_channels=32, out_channels=10,
    num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 4),
    num_head_channels=16,
)


def _reference_model(pool: str, **overrides):
    import importlib

    openaimodel = importlib.import_module(
        "ldm.modules.diffusionmodules.openaimodel"
    )
    torch.manual_seed(0)
    kw = {**GEOM, **overrides}
    m = openaimodel.EncoderUNetModel(pool=pool, **kw)
    with torch.no_grad():
        for v in m.state_dict().values():
            v.copy_(torch.randn_like(v) * 0.05)
    return m.eval()


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial"])
def test_encoder_unet_parity(pool):
    ref = _reference_model(pool)
    variables = convert_encoder_unet_state_dict(ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    t = np.asarray([3, 777], np.float32)

    model = EncoderUNetConfig(pool=pool, **GEOM).build()
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(t))
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t)
        ).numpy()
    assert got.shape == want.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_new_attention_order_parity():
    ref = _reference_model("adaptive", use_new_attention_order=True)
    variables = convert_encoder_unet_state_dict(ref.state_dict())
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    t = np.asarray([100], np.float32)
    model = EncoderUNetConfig(
        pool="adaptive", use_new_attention_order=True, **GEOM
    ).build()
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(t))
    with torch.no_grad():
        want = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t)
        ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_classifier_loss_and_topk():
    model = EncoderUNetConfig(pool="adaptive", **GEOM).build()
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 16, 4)),
                    jnp.float32)
    labels = jnp.asarray([1, 2, 3, 4])
    variables = model.init(jax.random.PRNGKey(0), z, jnp.zeros((4,)))
    sched = DiffusionSchedule.create(timesteps=100)

    apply_fn = lambda x, t: model.apply(variables, x, t)
    loss, logits = classifier_loss(
        apply_fn, sched, z, labels, jax.random.PRNGKey(1)
    )
    assert loss.shape == (4,) and np.isfinite(np.asarray(loss)).all()
    # zero-init head -> uniform logits -> CE == log(K)
    np.testing.assert_allclose(np.asarray(loss), np.log(10.0), rtol=1e-5)

    # fixed-t evaluation (per-noise-level validation accs, classifier.py:205)
    loss_t, _ = classifier_loss(
        apply_fn, sched, z, labels, jax.random.PRNGKey(2), t=50
    )
    assert loss_t.shape == (4,)

    # gradient flows
    def mean_loss(params):
        fn = lambda x, t: model.apply(params, x, t)
        l, _ = classifier_loss(fn, sched, z, labels, jax.random.PRNGKey(1))
        return l.mean()

    g = jax.grad(mean_loss)(variables)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0

    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    assert float(top_k_accuracy(logits, jnp.asarray([1, 1]), 1)) == 0.5
    assert float(top_k_accuracy(logits, jnp.asarray([1, 1]), 2)) == 1.0


def test_yaml_target_builds():
    from pbe_tpu.config import instantiate_from_config

    obj = instantiate_from_config({
        "target": "ldm.modules.diffusionmodules.openaimodel.EncoderUNetModel",
        "params": {**{k: list(v) if isinstance(v, tuple) else v
                      for k, v in GEOM.items()}, "pool": "adaptive"},
    })
    assert isinstance(obj, EncoderUNetConfig)
