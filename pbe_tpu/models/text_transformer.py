"""Legacy SD text/conditioning encoders, TPU-native.

Rebuilds the reference's x_transformer text path and the small conditioning
encoders that ride with it (component #17 + the legacy halves of #16's file):

  * ``TextTransformer``    == ldm/modules/x_transformer.py:548-641
    (``TransformerWrapper`` over a plain pre-norm ``Encoder``, the only
    configuration the SD configs ever instantiate: token embedding +
    absolute positional embedding + depth x [self-attention, GELU-MLP]
    pre-LayerNorm residual blocks + final LayerNorm; ``return_embeddings``
    skips the logit head). The lucidrains research knobs the reference
    carries but never enables (rezero, scalenorm, talking heads, memory
    tokens, macaron, sandwich/PAR layouts, entmax) are deliberately not
    ported — they are dead configuration space on the PBE/SD path.
  * ``TransformerEmbedderConfig`` == ldm/modules/encoders/modules.py:36-51
  * ``BERTEmbedderConfig``        == ldm/modules/encoders/modules.py:80-103
    (the HF BERT tokenizer needs downloaded vocab files; tokenization is
    gated behind ``use_tokenizer`` exactly like the reference and raises a
    clear error when the vocab is unavailable offline)
  * ``ClassEmbedder``             == ldm/modules/encoders/modules.py:21-33
  * ``SpatialRescaler``           == ldm/modules/encoders/modules.py:106-134

Sequences are <=77 tokens, so attention is a plain fp32-softmax einsum —
flash blocking would only add overhead at this size. Weight interop:
``convert_text_transformer_state_dict`` maps a torch ``TransformerWrapper``
state_dict onto the flax params (parity-tested against the reference in
tests/test_text_transformer.py).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _SelfAttention(nn.Module):
    """x_transformer.Attention in its default configuration
    (x_transformer.py:215-267): per-head scale 1/sqrt(dim_head), no-bias
    q/k/v projections, biased output projection, fp32 softmax."""

    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        b, n, dim = x.shape
        inner = self.heads * self.dim_head
        dense = lambda name, feat, bias: nn.Dense(
            feat, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        q = dense("to_q", inner, False)(x)
        k = dense("to_k", inner, False)(x)
        v = dense("to_v", inner, False)(x)
        split = lambda t: t.reshape(b, n, self.heads, self.dim_head)
        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum(
            "bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_head**-0.5)
        if mask is not None:
            # boolean (B, N) keep-mask on both q and k sides
            # (x_transformer.py:303-311)
            pair = mask[:, None, :, None] & mask[:, None, None, :]
            s = jnp.where(pair, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhij,bjhd->bihd", p, v).reshape(b, n, inner)
        return dense("to_out", dim, True)(o)


class _FeedForward(nn.Module):
    """x_transformer.FeedForward (x_transformer.py:194-211): Linear -> exact
    GELU -> Linear (mult 4), or GEGLU when ``glu``."""

    mult: int = 4
    glu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        dense = lambda name, feat: nn.Dense(
            feat, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        if self.glu:
            h = dense("w_in", 2 * inner)(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)
        else:
            h = dense("w_in", inner)(x)
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        return dense("w_out", dim)(h)


class TextTransformer(nn.Module):
    """TransformerWrapper(num_tokens, max_seq_len, Encoder(dim, depth)).

    forward(tokens int32 (B, N<=max_seq_len)) -> embeddings (B, N, dim) when
    ``return_embeddings`` (the SD text path, modules.py:46,97) else logits
    (B, N, num_tokens)."""

    num_tokens: int
    max_seq_len: int
    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    ff_glu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        return_embeddings: bool = False,
        mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        emb_init = nn.initializers.normal(0.02)  # init_() x_transformer.py:593
        tok = nn.Embed(
            self.num_tokens, self.dim, embedding_init=emb_init,
            param_dtype=jnp.float32, name="token_emb",
        )(tokens)
        pos = nn.Embed(
            self.max_seq_len, self.dim, embedding_init=emb_init,
            param_dtype=jnp.float32, name="pos_emb",
        )(jnp.arange(tokens.shape[1]))
        x = (tok + pos[None]).astype(self.dtype)

        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        for i in range(self.depth):
            # pre-norm residual blocks (AttentionLayers.forward:497-516)
            x = x + _SelfAttention(
                heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
                name=f"attn_{i}",
            )(ln(f"attn_norm_{i}")(x), mask=mask)
            x = x + _FeedForward(
                mult=self.ff_mult, glu=self.ff_glu, dtype=self.dtype,
                name=f"ff_{i}",
            )(ln(f"ff_norm_{i}")(x))
        x = ln("final_norm")(x)
        if return_embeddings:
            return x
        return nn.Dense(
            self.num_tokens, dtype=self.dtype, param_dtype=jnp.float32,
            name="to_logits",
        )(x)


@dataclasses.dataclass
class TransformerEmbedderConfig:
    """ldm.modules.encoders.modules.TransformerEmbedder constructor surface
    (modules.py:36-43); ``device`` accepted and ignored (no device pinning
    in JAX — placement is the runtime's job)."""

    n_embed: int
    n_layer: int
    vocab_size: int
    max_seq_len: int = 77
    device: str = "tpu"

    def build(self, dtype: Any = jnp.float32) -> TextTransformer:
        return TextTransformer(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer, dtype=dtype,
        )


@dataclasses.dataclass
class BERTEmbedderConfig:
    """ldm.modules.encoders.modules.BERTEmbedder (modules.py:80-103): the
    LDM-BERT text encoder — a 30522-vocab TextTransformer; with
    ``use_tokenizer`` the input is raw text through the HF bert-base-uncased
    tokenizer (requires its vocab on disk; clear error offline)."""

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    use_tokenizer: bool = True
    embedding_dropout: float = 0.0  # accepted for config parity; eval-only path

    def build(self, dtype: Any = jnp.float32) -> TextTransformer:
        return TextTransformer(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer, dtype=dtype,
        )

    def tokenize(self, text: list[str]) -> np.ndarray:
        """Raw text -> (B, max_seq_len) int32 ids (BERTTokenizer,
        modules.py:53-77: padded/truncated, no special-token return dance)."""
        try:
            from transformers import BertTokenizerFast

            tok = BertTokenizerFast.from_pretrained("bert-base-uncased")
        except Exception as e:  # pragma: no cover - offline path
            raise RuntimeError(
                "BERTEmbedder.use_tokenizer needs the bert-base-uncased vocab "
                "on disk (HF cache); tokenize offline or pass token ids"
            ) from e
        enc = tok(
            text, truncation=True, max_length=self.max_seq_len,
            return_length=True, return_overflowing_tokens=False,
            padding="max_length", return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


class ClassEmbedder(nn.Module):
    """ldm.modules.encoders.modules.ClassEmbedder (modules.py:21-33):
    class-id -> (B, 1, embed_dim) conditioning token."""

    embed_dim: int
    n_classes: int = 1000
    key: str = "class"

    @nn.compact
    def __call__(self, batch: Mapping[str, jnp.ndarray], key: str | None = None) -> jnp.ndarray:
        c = batch[key or self.key][:, None]
        return nn.Embed(self.n_classes, self.embed_dim, name="embedding")(c)


class SpatialRescaler(nn.Module):
    """ldm.modules.encoders.modules.SpatialRescaler (modules.py:106-134):
    n_stages x scale-by-multiplier resize (+ optional 1x1 channel remap).
    NHWC (the reference is NCHW)."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: int | None = None
    bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.method in ("nearest", "linear", "bilinear", "trilinear",
                               "bicubic", "area")
        method = {"area": "linear", "trilinear": "linear"}.get(
            self.method, self.method
        )
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, int(h * self.multiplier), int(w * self.multiplier), c),
                method,
            )
        if self.out_channels is not None:
            x = nn.Conv(
                self.out_channels, (1, 1), use_bias=self.bias,
                name="channel_mapper",
            )(x)
        return x


# --------------------------------------------------------------------------
# torch interop


def convert_text_transformer_state_dict(
    state_dict: Mapping[str, Any], prefix: str = ""
) -> dict:
    """torch TransformerWrapper state_dict -> TextTransformer variables.

    Layout mapped (x_transformer.py:548-596): token_emb/pos_emb embeddings;
    attn_layers.layers.{2i}.{0,1} = (LayerNorm, Attention) and .{2i+1} =
    (LayerNorm, FeedForward); attn_layers.norm = final LayerNorm; to_logits.
    torch Linear weights are (out, in) -> transposed to flax (in, out).
    """
    sd = {
        k[len(prefix):]: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                                    np.float32)
        for k, v in state_dict.items() if k.startswith(prefix)
    }
    p: dict[str, Any] = {}

    def lin(dst: str, src: str, bias: bool = True) -> None:
        leaf = {"kernel": sd[f"{src}.weight"].T}
        if bias:
            leaf["bias"] = sd[f"{src}.bias"]
        p[dst] = leaf

    def ln(dst: str, src: str) -> None:
        p[dst] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}

    p["token_emb"] = {"embedding": sd["token_emb.weight"]}
    p["pos_emb"] = {"embedding": sd["pos_emb.emb.weight"]}
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"attn_layers\.layers\.(\d+)\.", k))
    )
    assert depth % 2 == 0, "expected alternating (attention, ff) layers"
    for i in range(depth // 2):
        a, f = 2 * i, 2 * i + 1
        ln(f"attn_norm_{i}", f"attn_layers.layers.{a}.0")
        for proj in ("to_q", "to_k", "to_v"):
            lin(f"attn_{i}.{proj}", f"attn_layers.layers.{a}.1.{proj}", bias=False)
        lin(f"attn_{i}.to_out", f"attn_layers.layers.{a}.1.to_out")
        ln(f"ff_norm_{i}", f"attn_layers.layers.{f}.0")
        lin(f"ff_{i}.w_in", f"attn_layers.layers.{f}.1.net.0.0")
        lin(f"ff_{i}.w_out", f"attn_layers.layers.{f}.1.net.2")
    ln("final_norm", "norm")  # TransformerWrapper.norm (x_transformer.py:577)
    if "to_logits.weight" in sd:
        lin("to_logits", "to_logits")

    def nest(flat: dict) -> dict:
        out: dict = {}
        for k, v in flat.items():
            node = out
            parts = k.split(".")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = v
        return out

    return {"params": nest(p)}
