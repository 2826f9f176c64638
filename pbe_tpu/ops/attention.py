"""Attention primitives.

Semantics match the reference's CrossAttention (attention.py:189-230): scaled
dot-product with the softmax computed in float32 (numerical-stability island),
then cast back to the compute dtype.

Two execution paths:
  * ``xla``    — einsum + softmax; XLA fuses this well for the UNet's modest
                 sequence lengths (<= 4096 tokens at 512^2 images).
  * ``pallas`` — fused flash-attention kernel (pbe_tpu.ops.flash_attention)
                 that never materializes the N^2 matrix in HBM.

The 1-token cross-attention special case (PBE conditions on a single 768-d
exemplar token) degenerates exactly: softmax over one key is 1 regardless of
the logits, so attention output == the value of that token, broadcast over all
queries. Callers should use :func:`single_token_attention` there — it is
bit-equivalent and skips both N×1 matmuls and the softmax.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def default_attn_impl() -> str:
    """'pallas' on TPU backends, 'xla' elsewhere (CPU tests, interpret)."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-head scaled-dot-product attention.

    Args:
        q: (B, Nq, H*D)
        k, v: (B, Nk, H*D)
        num_heads: H
        impl: 'xla' or 'pallas'
    Returns:
        (B, Nq, H*D)
    """
    b, nq, inner = q.shape
    nk = k.shape[1]
    d = inner // num_heads
    qh = q.reshape(b, nq, num_heads, d)
    kh = k.reshape(b, nk, num_heads, d)
    vh = v.reshape(b, nk, num_heads, d)

    if impl == "pallas":
        from pbe_tpu.ops.flash_attention import flash_attention

        out = flash_attention(qh, kh, vh)
        return out.reshape(b, nq, inner)
    if impl != "xla":
        raise ValueError(f"unknown attention impl {impl!r}")

    scale = d**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), vh,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return out.reshape(b, nq, inner)


def single_token_attention(v: jnp.ndarray, num_queries: int) -> jnp.ndarray:
    """Exact attention result when the context is a single token.

    softmax over one key == 1, so out_i = v for every query i
    (see module docstring). v: (B, 1, C) -> (B, num_queries, C).
    """
    return jnp.broadcast_to(v, (v.shape[0], num_queries, v.shape[2]))
