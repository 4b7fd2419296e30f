"""Pallas flash-attention kernel vs the XLA oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.ops.attention import mha_xla
from visper_lm_tpu.ops.flash_attention import flash_attention


def _rand(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


@pytest.mark.parametrize("nq,nkv", [(4, 4), (4, 2)])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_forward_matches_xla(nq, nkv, causal):
    b, t, h = 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(ks[0], (b, t, nq, h))
    k = _rand(ks[1], (b, t, nkv, h))
    v = _rand(ks[2], (b, t, nkv, h))

    out = flash_attention(q, k, v, causal=causal, interpret=True, block_q=128, block_k=128)
    ref = mha_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(np.array(out), np.array(ref), rtol=2e-4, atol=2e-5)


def test_flash_kv_lengths_mask():
    b, t, nq, nkv, h = 2, 256, 2, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(ks[0], (b, t, nq, h))
    k = _rand(ks[1], (b, t, nkv, h))
    v = _rand(ks[2], (b, t, nkv, h))
    lengths = jnp.array([100, 256], dtype=jnp.int32)

    out = flash_attention(
        q, k, v, causal=True, kv_lengths=lengths, interpret=True,
        block_q=128, block_k=128,
    )
    ref = mha_xla(q, k, v, causal=True, kv_lengths=lengths)
    # rows < length must match; rows past length are don't-care (padding)
    np.testing.assert_allclose(
        np.array(out[0, :100]), np.array(ref[0, :100]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.array(out[1]), np.array(ref[1]), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("nq,nkv", [(2, 2), (4, 2)])
def test_flash_backward_matches_xla(nq, nkv):
    b, t, h = 1, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = _rand(ks[0], (b, t, nq, h))
    k = _rand(ks[1], (b, t, nkv, h))
    v = _rand(ks[2], (b, t, nkv, h))
    lengths = jnp.array([200], dtype=jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, causal=True, kv_lengths=lengths, interpret=True,
            block_q=128, block_k=128,
        )
        # only valid rows contribute (padding rows are don't-care)
        return jnp.sum(jnp.sin(o[:, :200]))

    def loss_ref(q, k, v):
        o = mha_xla(q, k, v, causal=True, kv_lengths=lengths)
        return jnp.sum(jnp.sin(o[:, :200]))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.array(a), np.array(b_), rtol=5e-4, atol=5e-5)


def test_flash_kv_starts_left_padding():
    """Left-pad mask: columns before kv_starts contribute nothing."""
    b, t, n, h = 2, 256, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = _rand(ks[0], (b, t, n, h))
    k = _rand(ks[1], (b, t, n, h))
    v = _rand(ks[2], (b, t, n, h))
    starts = jnp.array([64, 0], dtype=jnp.int32)

    out = flash_attention(
        q, k, v, causal=True, kv_starts=starts, interpret=True,
        block_q=128, block_k=128,
    )
    # oracle: poison the padded prefix keys/values of sample 0
    k2 = k.at[0, :64].set(1e6)
    v2 = v.at[0, :64].set(1e6)
    out2 = flash_attention(
        q, k2, v2, causal=True, kv_starts=starts, interpret=True,
        block_q=128, block_k=128,
    )
    np.testing.assert_allclose(
        np.array(out[0, 64:]), np.array(out2[0, 64:]), rtol=2e-4, atol=2e-5
    )
    # matches the XLA path
    ref = mha_xla(q, k, v, causal=True, kv_starts=starts)
    np.testing.assert_allclose(
        np.array(out[:, 64:]), np.array(ref[:, 64:]), rtol=2e-4, atol=2e-5
    )

    # gradients flow and match
    def lf(q, k, v):
        o = flash_attention(q, k, v, causal=True, kv_starts=starts, interpret=True,
                            block_q=128, block_k=128)
        return jnp.sum(jnp.sin(o[:, 64:]))

    def lr(q, k, v):
        o = mha_xla(q, k, v, causal=True, kv_starts=starts)
        return jnp.sum(jnp.sin(o[:, 64:]))

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.array(a), np.array(b_), rtol=5e-4, atol=5e-5)
