"""Parity tests for the Pallas flash-decode kernel (interpret mode on CPU).

Reference: ops.attention.mha_xla over the equivalent sequence-major cache with
q_offset = length-1 (the newest token), which is the decode semantics of the
XLA fallback path in models/decoder._block_forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visper_lm_tpu.models.decoder import _quantize_head_vectors
from visper_lm_tpu.ops.attention import mha_xla
from visper_lm_tpu.ops.decode_attention import decode_attention


def _ref(q, k, v, lens, starts):
    return mha_xla(
        q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), causal=True,
        q_offset=lens - 1, kv_lengths=lens, kv_starts=starts,
    )


@pytest.mark.parametrize("nq,nkv", [(8, 8), (8, 2)])
def test_decode_attention_dense_parity(nq, nkv):
    rng = np.random.default_rng(0)
    B, H, S = 3, 64, 128
    q = jnp.asarray(rng.normal(size=(B, 1, nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, H)).astype(np.float32))
    lens = jnp.asarray([40, 128, 77], jnp.int32)
    starts = jnp.asarray([5, 0, 20], jnp.int32)

    out = decode_attention(
        q, k, v, kv_lengths=lens, kv_starts=starts, interpret=True, block_k=32
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, lens, starts)),
        rtol=2e-5, atol=2e-5,
    )


def test_decode_attention_int8_matches_dequantized_reference():
    rng = np.random.default_rng(1)
    B, nq, nkv, H, S = 2, 4, 4, 32, 96
    q = jnp.asarray(rng.normal(size=(B, 1, nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, H)).astype(np.float32))
    lens = jnp.asarray([96, 50], jnp.int32)
    starts = jnp.asarray([0, 10], jnp.int32)

    kq, ks = _quantize_head_vectors(k)
    vq, vs = _quantize_head_vectors(v)
    out = decode_attention(
        q, kq, vq, ks[..., 0], vs[..., 0], kv_lengths=lens, kv_starts=starts,
        interpret=True, block_k=32,
    )
    kd = kq.astype(jnp.float32) * ks
    vd = vq.astype(jnp.float32) * vs
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, kd, vd, lens, starts)),
        rtol=1e-4, atol=1e-4,
    )


def test_decode_attention_fully_masked_row_is_zero():
    # a batch element with an empty valid window must produce zeros, not NaN
    B, nq, nkv, H, S = 2, 2, 2, 32, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, 1, nq, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, H)).astype(np.float32))
    lens = jnp.asarray([0, 64], jnp.int32)
    starts = jnp.asarray([0, 0], jnp.int32)
    out = decode_attention(
        q, k, v, kv_lengths=lens, kv_starts=starts, interpret=True, block_k=32
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[0]), 0.0)


@pytest.mark.parametrize("t,nq,nkv", [(1, 8, 8), (1, 8, 2), (4, 8, 2)])
def test_mha_xla_cache_matches_full_attention(t, nq, nkv):
    """Cache-slice + in-register-extras attention == one full causal attention.

    Builds a full (B, L, Nkv, H) KV history, splits it into a slot-major cache
    holding [0, cache_len) plus the current chunk as extras, and checks
    mha_xla_cache against mha_xla over the whole history.
    """
    from visper_lm_tpu.ops.attention import mha_xla, mha_xla_cache

    rng = np.random.default_rng(3)
    B, H, S = 2, 32, 64
    cache_len = 48                       # current chunk occupies [48, 48+t)
    q = jnp.asarray(rng.normal(size=(B, t, nq, H)).astype(np.float32))
    k_full = jnp.asarray(rng.normal(size=(B, cache_len + t, nkv, H)).astype(np.float32))
    v_full = jnp.asarray(rng.normal(size=(B, cache_len + t, nkv, H)).astype(np.float32))
    starts = jnp.asarray([0, 7], jnp.int32)

    ref = mha_xla(
        q, k_full, v_full, causal=True, q_offset=cache_len,
        kv_lengths=jnp.full((B,), cache_len + t, jnp.int32), kv_starts=starts,
    )

    # slot-major cache (S, B, Nkv, H) padded to S slots, holding [0, cache_len)
    ck = jnp.zeros((S, B, nkv, H), jnp.float32)
    cv = jnp.zeros((S, B, nkv, H), jnp.float32)
    ck = ck.at[:cache_len].set(jnp.swapaxes(k_full[:, :cache_len], 0, 1))
    cv = cv.at[:cache_len].set(jnp.swapaxes(v_full[:, :cache_len], 0, 1))
    got = mha_xla_cache(
        q, ck, cv,
        extra_k=k_full[:, cache_len:], extra_v=v_full[:, cache_len:],
        cache_len=cache_len, kv_starts=starts,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
