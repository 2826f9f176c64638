"""TextTransformer parity vs the reference x_transformer (read-only import).

Builds the reference TransformerWrapper(num_tokens, max_seq_len,
Encoder(dim, depth)) — the only configuration the SD/LDM configs instantiate
(ldm/modules/encoders/modules.py:41,89) — converts its state_dict through
convert_text_transformer_state_dict, and asserts logits/embedding parity,
including under a boolean keep-mask.
"""
from __future__ import annotations

import sys

import numpy as np
import pytest
import torch

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pbe_tpu.models.text_transformer import (
    BERTEmbedderConfig,
    ClassEmbedder,
    SpatialRescaler,
    TextTransformer,
    TransformerEmbedderConfig,
    convert_text_transformer_state_dict,
)

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


def _reference_wrapper(vocab: int, seq: int, dim: int, depth: int):
    from ldm.modules.x_transformer import Encoder, TransformerWrapper

    torch.manual_seed(0)
    m = TransformerWrapper(
        num_tokens=vocab, max_seq_len=seq,
        attn_layers=Encoder(dim=dim, depth=depth),
    )
    # randomize every weight so a consistent-but-wrong mapping cannot pass
    with torch.no_grad():
        for v in m.state_dict().values():
            v.copy_(torch.randn_like(v) * 0.05)
    return m.eval()


@pytest.mark.parametrize("mask", [False, True])
def test_text_transformer_parity(mask):
    vocab, seq, dim, depth = 97, 16, 64, 3
    ref = _reference_wrapper(vocab, seq, dim, depth)
    variables = convert_text_transformer_state_dict(ref.state_dict())

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, vocab, (2, seq))
    keep = np.ones((2, seq), bool)
    if mask:
        keep[0, 9:] = False
        keep[1, 3:] = False

    model = TextTransformer(
        num_tokens=vocab, max_seq_len=seq, dim=dim, depth=depth
    )
    got_logits = model.apply(
        variables, jnp.asarray(tokens),
        mask=jnp.asarray(keep) if mask else None,
    )
    got_emb = model.apply(
        variables, jnp.asarray(tokens), return_embeddings=True,
        mask=jnp.asarray(keep) if mask else None,
    )
    with torch.no_grad():
        t_tokens = torch.from_numpy(tokens)
        t_mask = torch.from_numpy(keep) if mask else None
        want_logits = ref(t_tokens, mask=t_mask).numpy()
        want_emb = ref(t_tokens, mask=t_mask, return_embeddings=True).numpy()

    if mask:  # compare only unmasked positions (masked rows are don't-care)
        got_logits = np.asarray(got_logits)[keep]
        want_logits = want_logits[keep]
        got_emb = np.asarray(got_emb)[keep]
        want_emb = want_emb[keep]
    np.testing.assert_allclose(np.asarray(got_logits), want_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_emb), want_emb,
                               rtol=2e-4, atol=2e-4)


def test_embedder_configs_build_and_run():
    cfg = TransformerEmbedderConfig(n_embed=48, n_layer=2, vocab_size=50,
                                    max_seq_len=12)
    model = cfg.build()
    tokens = jnp.zeros((1, 12), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), tokens, return_embeddings=True)
    z = model.apply(v, tokens, return_embeddings=True)
    assert z.shape == (1, 12, 48)

    bert = BERTEmbedderConfig(n_embed=48, n_layer=2, max_seq_len=12)
    m2 = bert.build()
    v2 = m2.init(jax.random.PRNGKey(0), tokens, return_embeddings=True)
    assert m2.apply(v2, tokens, return_embeddings=True).shape == (1, 12, 48)


def test_reference_yaml_targets_build():
    from pbe_tpu.config import instantiate_from_config

    obj = instantiate_from_config({
        "target": "ldm.modules.encoders.modules.BERTEmbedder",
        "params": {"n_embed": 32, "n_layer": 1},
    })
    assert isinstance(obj, BERTEmbedderConfig)
    assert isinstance(obj.build(), TextTransformer)
    obj = instantiate_from_config({
        "target": "ldm.modules.encoders.modules.TransformerEmbedder",
        "params": {"n_embed": 32, "n_layer": 1, "vocab_size": 10},
    })
    assert isinstance(obj, TransformerEmbedderConfig)
    assert isinstance(obj.build(), TextTransformer)


def test_class_embedder_and_spatial_rescaler():
    emb = ClassEmbedder(embed_dim=24, n_classes=7)
    batch = {"class": jnp.asarray([1, 5])}
    v = emb.init(jax.random.PRNGKey(0), batch)
    out = emb.apply(v, batch)
    assert out.shape == (2, 1, 24)

    # SpatialRescaler parity vs torch F.interpolate bilinear
    resc = SpatialRescaler(n_stages=2, multiplier=0.5, out_channels=None)
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32)
    got = resc.apply({}, jnp.asarray(x))
    assert got.shape == (1, 4, 4, 3)

    remap = SpatialRescaler(n_stages=1, out_channels=5)
    v = remap.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert remap.apply(v, jnp.asarray(x)).shape == (1, 8, 8, 5)
