"""Fused flash attention for TPU (Pallas).

Online-softmax attention that never materializes the (N, N) score matrix in
HBM — the TPU-native replacement for the reference's einsum-softmax-einsum
chains (attention.py:215-229, diffusionmodules/model.py:186-199).

Shapes served (PBE UNet/VAE self-attention at 512^2 images):
    (2, 4096, 8, 40), (2, 1024, 8, 80), (2, 256, 8, 160), (B, 4096, 1, 512)
Head dims are padded to the 128-lane boundary inside the kernel; zero-padded
q/k columns add 0 to the logits and zero-padded v columns are sliced off, so
padding is exact.

Layout: the grid is (batch*heads, q-blocks); each program streams K/V blocks
through VMEM with a running (max, sum, acc) online-softmax state carried in
f32. Softmax statistics stay in registers/VMEM; only the final normalized
output is written.

Backward: jax.custom_vjp whose backward recomputes attention with the XLA
path and differentiates that (correct, O(N^2) memory at backward time only).
A fused Pallas backward is future work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attention_xla(q, k, v):
    """Reference O(N^2) attention on (BH, N, D) arrays, fp32 softmax."""
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * (d**-0.5), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _flash_kernel_resident(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                           block_k: int):
    """K/V fully VMEM-resident variant — fastest when the whole (N, Dp)
    K and V fit comfortably (UNet self-attention: N<=4096, Dp=128 -> 1MB
    each). One program per q block, k loop inside."""
    n_k = k_ref.shape[1]
    num_blocks = n_k // block_k
    q = q_ref[0]  # (Bq, Dp) native dtype -> bf16 MXU rate
    bq, dp = q.shape

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dp), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float):
    """Grid-blocked flash attention: grid = (batch*heads, q-blocks, k-blocks)
    with the k axis innermost; the online-softmax state (m, l, acc) lives in
    VMEM scratch and is carried across k iterations of the same output block.
    VMEM holds only one (q, k, v) block triple at a time, so the footprint is
    independent of sequence length (the previous full-K/V-resident version
    OOMed 16MB VMEM at batch 8 / 16384 tokens)."""
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # keep q/k/v in their native dtype (bf16 in production) so the MXU runs
    # at bf16 rate; accumulate in f32 via preferred_element_type. Upcasting
    # the operands would silently force 8x-slower f32 matmuls.
    q = q_ref[0]   # (Bq, Dp)
    kb = k_ref[0]  # (Bk, Dp)
    vb = v_ref[0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, Bk) f32
    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_k - 1)
    def _finalize():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


def _flash_fwd_bhnd(q, k, v, block_q: int = 256, block_k: int = 512):
    """(BH, N, D) -> (BH, N, D)."""
    bh, n, d = q.shape
    scale = d**-0.5
    dp = _round_up(d, 128)
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    if n % block_q or n % block_k:
        return _attention_xla(q, k, v)
    if dp != d:
        pad = [(0, 0), (0, 0), (0, dp - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # strategy: keep K/V resident in VMEM when they fit with room for Mosaic
    # double-buffering (~20% faster end-to-end at 512^2); stream blocks via
    # the grid otherwise (VAE 512-wide head, 1024^2 / 16384-token sequences)
    kv_bytes = 2 * n * dp * q.dtype.itemsize
    if kv_bytes <= 4 * 1024 * 1024:
        out = pl.pallas_call(
            functools.partial(_flash_kernel_resident, scale=scale,
                              block_k=block_k),
            out_shape=jax.ShapeDtypeStruct((bh, n, dp), v.dtype),
            grid=(bh, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        )(q, k, v)
        return out[..., :d]

    grid = (bh, n // block_q, n // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, dp), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, dp), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return out[..., :d]


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, N, H, D) self-attention; returns (B, N, H, D)."""
    return _flash_apply(q, k, v)


def _flash_apply(q, k, v):
    b, n, h, d = q.shape
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    out = _flash_fwd_bhnd(to_bhnd(q), to_bhnd(k), to_bhnd(v))
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _fwd(q, k, v):
    return _flash_apply(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    b, n, h, d = q.shape
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    from_bhnd = lambda x: x.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    _, vjp = jax.vjp(_attention_xla, to_bhnd(q), to_bhnd(k), to_bhnd(v))
    dq, dk, dv = vjp(to_bhnd(g))
    return from_bhnd(dq), from_bhnd(dk), from_bhnd(dv)


flash_attention.defvjp(_fwd, _bwd)
