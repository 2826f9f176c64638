"""Flash-attention kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pbe_tpu.ops.attention import multi_head_attention
from pbe_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("shape", [
    (2, 256, 2, 40),   # padded head dim
    (1, 512, 4, 128),  # aligned head dim
    (1, 256, 1, 160),
])
def test_flash_matches_xla(np_rng, shape):
    b, n, h, d = shape
    q = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    want = multi_head_attention(
        q.reshape(b, n, h * d), k.reshape(b, n, h * d), v.reshape(b, n, h * d),
        num_heads=h,
    ).reshape(b, n, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gradients_match_xla(np_rng):
    b, n, h, d = 1, 128, 2, 40
    q = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        out = multi_head_attention(
            q.reshape(b, n, h * d), k.reshape(b, n, h * d),
            v.reshape(b, n, h * d), num_heads=h,
        )
        return (out ** 2).sum()

    # the context must cover the backward kernels too (traced at grad time)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


@pytest.mark.parametrize("shape", [
    (1, 256, 2, 64),    # resident-forward geometry, aligned-ish head dim
    (2, 512, 2, 40),    # padded head dim, multiple k blocks in backward
])
def test_fused_flash_backward_matches_xla(np_rng, shape):
    """The fused Pallas dq/dk/dv kernels vs the XLA O(N^2) VJP."""
    b, n, h, d = shape
    q = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)
    g = jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(flash_attention, q, k, v)
        got = vjp(g)

    def ref(q, k, v):
        return multi_head_attention(
            q.reshape(b, n, h * d), k.reshape(b, n, h * d),
            v.reshape(b, n, h * d), num_heads=h,
        ).reshape(b, n, h, d)

    _, vjp_ref = jax.vjp(ref, q, k, v)
    want = vjp_ref(g)
    for a, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), atol=5e-4)


@pytest.mark.parametrize("variant", ["rowblock", "resident", "streamed",
                                     "pipelined"])
def test_fwd_variants_match_xla_and_agree_on_lse(np_rng, variant):
    """All four forward formulations (single-pass rowblock, online
    resident, grid-streamed, chunked two-pass pipelined) must produce the
    same outputs and the same log2-domain logsumexp."""
    from pbe_tpu.ops import flash_attention as fa

    bh, n, d = 2, 256, 40
    q = jnp.asarray(np_rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((bh, n, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, lse = fa._flash_fwd_bhnd(
            q, k, v, block_q=128, block_k=128, return_stats=True,
            variant=variant,
        )
    want = fa._attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
    # lse must equal log2(sum(exp2(s2))) with s2 = scale*log2e*qk
    s2 = np.einsum("bqd,bkd->bqk", q, k) * (d ** -0.5) * np.log2(np.e)
    m = s2.max(-1, keepdims=True)
    want_lse = (m + np.log2(np.exp2(s2 - m).sum(-1, keepdims=True)))[..., 0]
    np.testing.assert_allclose(
        np.asarray(lse[..., 0]), want_lse, atol=1e-4
    )


def test_pipelined_multichunk_matches_xla(np_rng):
    """The chunked two-pass schedule with several N chunks (the production
    configuration: nc = N/block_c in 4..8) must agree with XLA."""
    from pbe_tpu.ops import flash_attention as fa

    bh, n, d = 2, 256, 40
    q = jnp.asarray(np_rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((bh, n, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, lse = fa._flash_fwd_bhnd(
            q, k, v, block_q=128, block_k=128, return_stats=True,
            variant="pipelined", block_c=64,  # 4 chunks
        )
    want = fa._attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
    s2 = np.einsum("bqd,bkd->bqk", q, k) * (d ** -0.5) * np.log2(np.e)
    m = s2.max(-1, keepdims=True)
    want_lse = (m + np.log2(np.exp2(s2 - m).sum(-1, keepdims=True)))[..., 0]
    np.testing.assert_allclose(np.asarray(lse[..., 0]), want_lse, atol=1e-4)


def test_flash_bf16(np_rng):
    b, n, h, d = 1, 256, 2, 64
    mk = lambda: jnp.asarray(np_rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    want = multi_head_attention(
        q.reshape(b, n, h * d), k.reshape(b, n, h * d), v.reshape(b, n, h * d),
        num_heads=h,
    ).reshape(b, n, h, d)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )
