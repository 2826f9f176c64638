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

Backward: fused two-pass Pallas backward (standard flash-attention VJP).
The forward (training path only) additionally emits the per-row logsumexp
L = m + log(l); the backward recomputes P = exp(S - L) blockwise and forms
    D  = rowsum(dO * O)                     (XLA, elementwise)
    dV = P^T dO
    dS = P * (dO V^T - D),  dQ = scale * dS K,  dK = scale * dS^T Q
in two kernels — dq (k-blocks innermost) and dk/dv (q-blocks innermost) —
so backward VMEM/HBM stays O(N * D) like the forward. Statistics ride a
128-lane-broadcast layout ((BH, N, 128) f32) to stay tile-friendly.
Non-divisible sequence lengths fall back to the XLA O(N^2) VJP.
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


def _flash_kernel_resident(q_ref, k_ref, v_ref, o_ref, *maybe_lse,
                           scale: float, block_k: int):
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
    if maybe_lse:  # training path: emit logsumexp, lane-broadcast
        maybe_lse[0][0] = jnp.broadcast_to(m + jnp.log(l), (bq, 128))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale: float):
    """Grid-blocked flash attention: grid = (batch*heads, q-blocks, k-blocks)
    with the k axis innermost; the online-softmax state (m, l, acc) lives in
    VMEM scratch and is carried across k iterations of the same output block.
    VMEM holds only one (q, k, v) block triple at a time, so the footprint is
    independent of sequence length (the previous full-K/V-resident version
    OOMed 16MB VMEM at batch 8 / 16384 tokens)."""
    lse_ref = rest[0] if len(rest) == 4 else None
    m_scr, l_scr, acc_scr = rest[-3:]
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
        if lse_ref is not None:
            lse_ref[0] = jnp.broadcast_to(
                m_scr[...] + jnp.log(l_scr[...]), (o_ref.shape[1], 128)
            )


def _flash_fwd_bhnd(q, k, v, block_q: int = 256, block_k: int = 512,
                    return_stats: bool = False):
    """(BH, N, D) -> (BH, N, D), or (out, lse (BH, N, 128) f32) with stats.

    Returns None when the geometry is unsupported (caller falls back to XLA);
    plain calls fall back internally."""
    bh, n, d = q.shape
    scale = d**-0.5
    dp = _round_up(d, 128)
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    if n % block_q or n % block_k:
        return None if return_stats else _attention_xla(q, k, v)
    if dp != d:
        pad = [(0, 0), (0, 0), (0, dp - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    lse_shape = jax.ShapeDtypeStruct((bh, n, 128), jnp.float32)
    lse_spec_2 = pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0),
                              memory_space=pltpu.VMEM)
    lse_spec_3 = pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0),
                              memory_space=pltpu.VMEM)

    # strategy: keep K/V resident in VMEM when they fit with room for Mosaic
    # double-buffering (~20% faster end-to-end at 512^2); stream blocks via
    # the grid otherwise (VAE 512-wide head, 1024^2 / 16384-token sequences)
    kv_bytes = 2 * n * dp * q.dtype.itemsize
    if kv_bytes <= 4 * 1024 * 1024:
        qspec = pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_flash_kernel_resident, scale=scale,
                              block_k=block_k),
            out_shape=(
                [jax.ShapeDtypeStruct((bh, n, dp), v.dtype), lse_shape]
                if return_stats else jax.ShapeDtypeStruct((bh, n, dp), v.dtype)
            ),
            grid=(bh, n // block_q),
            in_specs=[
                qspec,
                pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[qspec, lse_spec_2] if return_stats else qspec,
        )(q, k, v)
        if return_stats:
            return out[0][..., :d], out[1]
        return out[..., :d]

    grid = (bh, n // block_q, n // block_k)
    qspec = pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        out_shape=(
            [jax.ShapeDtypeStruct((bh, n, dp), v.dtype), lse_shape]
            if return_stats else jax.ShapeDtypeStruct((bh, n, dp), v.dtype)
        ),
        grid=grid,
        in_specs=[
            qspec,
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[qspec, lse_spec_3] if return_stats else qspec,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, dp), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    if return_stats:
        return out[0][..., :d], out[1]
    return out[..., :d]


# ---------------------------------------------------------------------------
# fused backward (two-pass flash-attention VJP)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                         dq_ref, dq_scr, *, scale: float):
    """dQ pass: grid (BH, q-blocks, k-blocks), k innermost; dq accumulates
    in VMEM scratch across the k sweep."""
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]  # (Bq, 1) f32, lane-broadcast storage
    dd = dd_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # (Bq, Bk) f32
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dd) * scale
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_k - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float):
    """dK/dV pass: grid (BH, k-blocks, q-blocks), q innermost; dk/dv
    accumulate in VMEM scratch across the q sweep."""
    i = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    dd = dd_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # (Bq, Bk)
    # dV += P^T dO
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dd) * scale  # (Bq, Bk)
    # dK += dS^T Q
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd_bhnd(q, k, v, o, lse, do, block_q: int = 256,
                    block_k: int = 256):
    """(BH, N, D) gradients via the fused kernels. lse: (BH, N, 128) f32."""
    bh, n, d = q.shape
    scale = d**-0.5
    dp = _round_up(d, 128)
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0  # caller checked

    # D = rowsum(dO * O), lane-broadcast like lse
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dd = jnp.broadcast_to(dd[..., None], (bh, n, 128))

    if dp != d:
        pad = [(0, 0), (0, 0), (0, dp - d)]
        q, k, v, do = (jnp.pad(x, pad) for x in (q, k, v, do))

    qspec = lambda im: pl.BlockSpec((1, block_q, dp), im, memory_space=pltpu.VMEM)
    kspec = lambda im: pl.BlockSpec((1, block_k, dp), im, memory_space=pltpu.VMEM)
    sspec = lambda im: pl.BlockSpec((1, block_q, 128), im, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
        grid=(bh, n // block_q, n // block_k),
        in_specs=[
            qspec(lambda b, i, j: (b, i, 0)),
            kspec(lambda b, i, j: (b, j, 0)),
            kspec(lambda b, i, j: (b, j, 0)),
            qspec(lambda b, i, j: (b, i, 0)),
            sspec(lambda b, i, j: (b, i, 0)),
            sspec(lambda b, i, j: (b, i, 0)),
        ],
        out_specs=qspec(lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, n, dp), v.dtype),
        ],
        grid=(bh, n // block_k, n // block_q),
        in_specs=[
            qspec(lambda b, j, i: (b, i, 0)),
            kspec(lambda b, j, i: (b, j, 0)),
            kspec(lambda b, j, i: (b, j, 0)),
            qspec(lambda b, j, i: (b, i, 0)),
            sspec(lambda b, j, i: (b, i, 0)),
            sspec(lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            kspec(lambda b, j, i: (b, j, 0)),
            kspec(lambda b, j, i: (b, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), jnp.float32),
            pltpu.VMEM((block_k, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse, dd)
    return dq[..., :d], dk[..., :d], dv[..., :d]


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
    b, n, h, d = q.shape
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    from_bhnd = lambda x: x.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    qh, kh, vh = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    res = _flash_fwd_bhnd(qh, kh, vh, return_stats=True)
    if res is None:
        # unsupported geometry: XLA forward, O(N^2) XLA VJP (lse=None flags it)
        return from_bhnd(_attention_xla(qh, kh, vh)), (q, k, v, None, None)
    o, lse = res
    return from_bhnd(o), (q, k, v, o, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    b, n, h, d = q.shape
    to_bhnd = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    from_bhnd = lambda x: x.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    if lse is None:
        _, vjp = jax.vjp(_attention_xla, to_bhnd(q), to_bhnd(k), to_bhnd(v))
        dq, dk, dv = vjp(to_bhnd(g))
    else:
        dq, dk, dv = _flash_bwd_bhnd(
            to_bhnd(q), to_bhnd(k), to_bhnd(v), o, lse, to_bhnd(g)
        )
    return from_bhnd(dq), from_bhnd(dk), from_bhnd(dv)


flash_attention.defvjp(_fwd, _bwd)
