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

Softmax runs in the exp2 domain: q is pre-scaled by d^-0.5 * log2(e) so the
probabilities are exp2(s2 - m2) — the same values as exp(s - m) (the VPU's
exp is exp2(x*log2e) anyway; folding the multiply into the tiny q tensor
removes an N^2-sized f32 multiply pass). The logsumexp handed to the
backward is therefore in the log2 domain, L2 = m2 + log2(l), and the
backward recomputes P = exp2(S2 - L2).

Four forward variants, picked by VMEM footprint (auto):
  * rowblock — K/V resident AND a full (block_q, N) score row-block
    materialized in one MXU call: one max, one exp2, one sum; zero online
    rescale passes. Fastest when 2*N*Dp*2 + 2*block_q*N*4 fits VMEM
    (all UNet self-attention shapes at 512^2).
  * pipelined — rowblock footprint, but the N axis is chunked into a
    two-pass schedule whose MXU and VPU stages of adjacent chunks are
    independent, so Mosaic can overlap score matmuls with softmax passes
    (see _flash_kernel_pipelined).
  * resident — K/V resident, online softmax over k blocks (VAE mid at
    batch>2 and other mid-size shapes).
  * streamed — grid-blocked k axis, VMEM independent of N (16384-token
    1024^2 sequences).

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


_LOG2E = 1.4426950408889634  # log2(e): exp(x) == exp2(x * _LOG2E)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _prescale(q_block, scale: float):
    """Fold softmax scale * log2(e) into q (f32 multiply of the small
    (Bq, Dp) block, cast back to the matmul dtype) so the (Bq, N) logits
    come out of the MXU already in the exp2 domain."""
    return (q_block.astype(jnp.float32) * (scale * _LOG2E)).astype(
        q_block.dtype
    )


def _attention_xla(q, k, v):
    """Reference O(N^2) attention on (BH, N, D) arrays, fp32 softmax."""
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * (d**-0.5), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _flash_kernel_rowblock(q_ref, k_ref, v_ref, o_ref, *maybe_lse,
                           scale: float):
    """K/V resident AND the full (Bq, N) score row-block materialized from
    one MXU call: softmax is a single max / exp2 / sum — no online-softmax
    running state, no alpha rescales of the accumulator. The cheapest
    formulation whenever the row-block fits VMEM (UNet N<=4096 shapes)."""
    q = _prescale(q_ref[0], scale)  # (Bq, Dp)
    k = k_ref[0]                    # (N, Dp)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, N) f32, already in the exp2 domain
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if maybe_lse:  # log2-domain logsumexp, lane-broadcast
        maybe_lse[0][0] = jnp.broadcast_to(
            m + jnp.log2(l), (q.shape[0], 128)
        )


def _flash_kernel_pipelined(q_ref, k_ref, v_ref, o_ref, *maybe_lse,
                            scale: float, block_c: int):
    """Two-pass chunked rowblock tuned for MXU/VPU overlap.

    The plain rowblock kernel computes the (Bq, N) scores in ONE matmul,
    then runs max/exp2/sum as whole-tensor VPU passes, then one PV matmul
    — every stage depends wholly on the previous one, so the MXU idles
    during softmax and the VPU idles during the matmuls (measured: 1508 us
    at ds=1 vs a 698 us MXU + ~300 us VPU composite, PERF.md §3).

    Chunking the N axis breaks that dependency at chunk granularity so
    Mosaic's scheduler can overlap the units across chunks:
      pass 1: S_j = Q K_j^T (MXU) is independent of rowmax(S_{j-1}) (VPU)
      pass 2: exp2(S_j - m) + rowsum + bf16 cast (VPU) is independent of
              the PV matmul of chunk j-1 (MXU)
    Because the row max is final before pass 2 starts, there are NO
    online-softmax rescales of the accumulator (same single-max math as
    rowblock, just chunk-reassociated sums — bitwise it differs from both
    rowblock and the XLA path exactly as any reassociation does).
    Python-unrolled: nc = N // block_c is small (4-8) and static.
    """
    q = _prescale(q_ref[0], scale)  # (Bq, Dp)
    nc = k_ref.shape[1] // block_c

    # pass 1: materialize score chunks; stagger each chunk's row max so it
    # can run on the VPU while the next chunk's matmul occupies the MXU
    s = []
    m = None
    for j in range(nc):
        kb = k_ref[0, pl.ds(j * block_c, block_c), :]
        s.append(jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        if j > 0:
            mj = jnp.max(s[j - 1], axis=-1, keepdims=True)
            m = mj if m is None else jnp.maximum(m, mj)
    mj = jnp.max(s[-1], axis=-1, keepdims=True)
    m = mj if m is None else jnp.maximum(m, mj)

    # pass 2: exp2/sum/cast chunk j overlaps PV matmul of chunk j-1
    l = None
    acc = None
    prev = None
    for j in range(nc):
        p = jnp.exp2(s[j] - m)
        lj = jnp.sum(p, axis=-1, keepdims=True)
        l = lj if l is None else l + lj
        p16 = p.astype(v_ref.dtype)
        if prev is not None:
            jp, pp = prev
            vb = v_ref[0, pl.ds(jp * block_c, block_c), :]
            a = jax.lax.dot_general(
                pp, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = a if acc is None else acc + a
        prev = (j, p16)
    jp, pp = prev
    vb = v_ref[0, pl.ds(jp * block_c, block_c), :]
    a = jax.lax.dot_general(
        pp, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    acc = a if acc is None else acc + a
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if maybe_lse:  # log2-domain logsumexp, lane-broadcast
        maybe_lse[0][0] = jnp.broadcast_to(
            m + jnp.log2(l), (q.shape[0], 128)
        )


def _flash_kernel_resident(q_ref, k_ref, v_ref, o_ref, *maybe_lse,
                           scale: float, block_k: int):
    """K/V fully VMEM-resident variant — fastest when the whole (N, Dp)
    K and V fit comfortably (UNet self-attention: N<=4096, Dp=128 -> 1MB
    each). One program per q block, k loop inside."""
    n_k = k_ref.shape[1]
    num_blocks = n_k // block_k
    q = _prescale(q_ref[0], scale)  # (Bq, Dp) native dtype -> bf16 MXU rate
    bq, dp = q.shape

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
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
    if maybe_lse:  # training path: log2-domain logsumexp, lane-broadcast
        maybe_lse[0][0] = jnp.broadcast_to(m + jnp.log2(l), (bq, 128))


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
    q = _prescale(q_ref[0], scale)  # (Bq, Dp)
    kb = k_ref[0]  # (Bk, Dp)
    vb = v_ref[0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, Bk) f32, exp2 domain
    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
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
                m_scr[...] + jnp.log2(l_scr[...]), (o_ref.shape[1], 128)
            )


def _rowblock_bq(n: int, kv_bytes: int, block_q: int) -> int | None:
    """Largest q-block for which K+V, the (Bq, N) f32 score row-block and
    its bf16 prob copy fit VMEM with headroom; None when none fits.

    Footprint is kv + 6*Bq*N (f32 scores reused in place by exp2 + a bf16
    prob block for the PV matmul). Measured on-chip at (16, 4096, 40):
    bq 128/256/512 -> 1573/1529/1505 us — a 4% spread, so the exact pick
    barely matters; 12MB keeps a safe margin under the 16MB/core VMEM."""
    for bq in sorted({block_q, 512, 256, 128}, reverse=True):
        if bq <= n and n % bq == 0 and (
            kv_bytes + 6 * bq * n <= 12 * 1024 * 1024
        ):
            return bq
    return None


def _flash_fwd_bhnd(q, k, v, block_q: int = 256, block_k: int = 512,
                    return_stats: bool = False, variant: str = "auto",
                    block_c: int = 512):
    """(BH, N, D) -> (BH, N, D), or (out, lse (BH, N, 128) f32) with stats
    (lse is in the LOG2 domain: m2 + log2(l)).

    Returns None when the geometry is unsupported (caller falls back to XLA);
    plain calls fall back internally. variant: auto|rowblock|resident|
    streamed (non-auto for benchmarking; auto picks by VMEM footprint)."""
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

    def lse_spec(bq, rank3):
        im = (lambda b, i, j: (b, i, 0)) if rank3 else (lambda b, i: (b, i, 0))
        return pl.BlockSpec((1, bq, 128), im, memory_space=pltpu.VMEM)

    # strategy: materialize the whole score row-block when K/V AND the
    # (Bq, N) f32 scores fit VMEM (all 512^2 UNet shapes) — single-pass
    # softmax, no online rescales; else keep K/V resident with the online
    # k loop; else stream k blocks via the grid (VAE 512-wide head at
    # batch>2, 1024^2 / 16384-token sequences)
    kv_bytes = 2 * n * dp * q.dtype.itemsize
    bq_rb = _rowblock_bq(n, kv_bytes, block_q)
    # rowblock only pays when K/V are small (UNet dp=128 shapes): at the
    # VAE's dp=512 the resident 8.4MB K/V starves the score-block pipeline
    # and the tuned streamed path wins (949 vs 1120 us measured, r3 sweep)
    use_pipelined = variant == "pipelined" and bq_rb is not None
    use_rowblock = variant == "rowblock" or (
        variant == "auto" and bq_rb and kv_bytes <= 4 * 1024 * 1024
    )
    use_resident = variant == "resident" or (
        variant == "auto" and not use_rowblock
        and kv_bytes <= 4 * 1024 * 1024
    )
    if variant == "auto" and not (use_rowblock or use_resident):
        # streamed fallback: wide-d / long-N shapes prefer big blocks
        # (vae_mid (2,4096,512): (256,512) 1390us -> (512,1024) 949us;
        #  1024² ds1 (16,16384,40): (256,512) 35.2ms -> (1024,1024) 17.6ms)
        if n % 1024 == 0:
            block_q = max(block_q, 1024 if n >= 8192 else 512)
            block_k = max(block_k, 1024)

    if use_rowblock or use_resident or use_pipelined:
        if use_pipelined:
            bq = bq_rb or block_q
            kernel = functools.partial(
                _flash_kernel_pipelined, scale=scale,
                block_c=min(block_c, n) if n % min(block_c, n) == 0 else n,
            )
        elif use_rowblock:
            bq = bq_rb or block_q
            kernel = functools.partial(_flash_kernel_rowblock, scale=scale)
        else:
            bq = block_q
            kernel = functools.partial(_flash_kernel_resident, scale=scale,
                                       block_k=block_k)
        qspec = pl.BlockSpec((1, bq, dp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=(
                [jax.ShapeDtypeStruct((bh, n, dp), v.dtype), lse_shape]
                if return_stats else jax.ShapeDtypeStruct((bh, n, dp), v.dtype)
            ),
            grid=(bh, n // bq),
            in_specs=[
                qspec,
                pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[qspec, lse_spec(bq, False)] if return_stats else qspec,
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
        out_specs=[qspec, lse_spec(block_q, True)] if return_stats else qspec,
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
    lse = lse_ref[0][:, :1]  # (Bq, 1) f32, log2-domain, lane-broadcast
    dd = dd_ref[0][:, :1]

    s2 = jax.lax.dot_general(
        _prescale(q, scale), kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(s2 - lse)  # (Bq, Bk) f32
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - dd) * scale  # gradients live in the natural domain
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
    lse = lse_ref[0][:, :1]  # log2-domain
    dd = dd_ref[0][:, :1]

    s2 = jax.lax.dot_general(
        _prescale(q, scale), kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(s2 - lse)  # (Bq, Bk)
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
