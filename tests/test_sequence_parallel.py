"""Ulysses sequence-parallel attention: exactness vs single-device attention.

Runs on the 8-virtual-CPU-device mesh (conftest). The all-to-all exchange is
value-exact (a re-partition, not an approximation), so forward AND gradients
must match the plain XLA attention to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.ops.attention import mha_xla
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.parallel.sequence import ring_attention, ulysses_attention

# heavyweight (subprocess / AOT compile / oracle / e2e) — excluded from the
# fast default suite (pytest.ini addopts); run everything with: pytest -m ''
pytestmark = pytest.mark.slow


def _inputs(rng, b, t, nq, nkv, h):
    q = jnp.asarray(rng.normal(size=(b, t, nq, h)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, nkv, h)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, nkv, h)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("dp,sp,nkv", [(2, 2, 4), (1, 4, 4), (2, 2, 2)])
def test_ulysses_matches_single_device(dp, sp, nkv):
    if len(jax.devices()) < dp * sp:
        pytest.skip("needs more devices")
    rng = np.random.default_rng(0)
    b, t, nq, h = 2 * dp, 32, 4, 16
    q, k, v = _inputs(rng, b, t, nq, nkv, h)
    kv_lengths = jnp.asarray([t] * (b - 1) + [t - 5], jnp.int32)
    kv_starts = jnp.asarray([0] * (b - 1) + [3], jnp.int32)

    ref = mha_xla(q, k, v, causal=True, kv_lengths=kv_lengths,
                  kv_starts=kv_starts)
    mesh = make_mesh(dp=dp, sp=sp, tp=1,
                     devices=jax.devices()[: dp * sp])
    with mesh:
        got = ulysses_attention(
            q, k, v, mesh=mesh, causal=True, kv_lengths=kv_lengths,
            kv_starts=kv_starts, use_pallas=False,
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ulysses_gradients_match():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(1)
    b, t, nq, nkv, h = 2, 32, 4, 4, 16
    q, k, v = _inputs(rng, b, t, nq, nkv, h)
    mesh = make_mesh(dp=1, sp=4, tp=1, devices=jax.devices()[:4])

    def loss_sp(q, k, v):
        out = ulysses_attention(
            q, k, v, mesh=mesh, causal=True, use_pallas=False
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_xla(q, k, v, causal=True)))

    with mesh:
        g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_sp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5
        )


def test_sp1_mesh_falls_through():
    """sp==1 on the mesh dispatches to plain attention (no axis needed)."""
    rng = np.random.default_rng(2)
    q, k, v = _inputs(rng, 2, 32, 4, 4, 16)
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    ref = mha_xla(q, k, v, causal=True)
    got = ulysses_attention(q, k, v, mesh=mesh, causal=True, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_head_divisibility_guard():
    rng = np.random.default_rng(3)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    q, k, v = _inputs(rng, 2, 32, 4, 2, 16)   # nkv=2 < sp=4
    mesh = make_mesh(dp=1, sp=4, tp=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError):
        ulysses_attention(q, k, v, mesh=mesh, use_pallas=False)


@pytest.mark.parametrize("dp,sp,nq,nkv", [
    (1, 4, 4, 4),    # MHA
    (1, 4, 4, 2),    # GQA: nkv=2 < sp=4 — Ulysses ineligible, ring's case
    (2, 2, 4, 1),    # MQA under dp
    (1, 8, 2, 1),    # sp beyond the head count entirely
])
def test_ring_matches_single_device(dp, sp, nq, nkv):
    if len(jax.devices()) < dp * sp:
        pytest.skip("needs more devices")
    rng = np.random.default_rng(10)
    b, t, h = 2 * dp, 32, 16
    q, k, v = _inputs(rng, b, t, nq, nkv, h)
    kv_lengths = jnp.asarray([t] * (b - 1) + [t - 5], jnp.int32)
    kv_starts = jnp.asarray([0] * (b - 1) + [3], jnp.int32)

    ref = mha_xla(q, k, v, causal=True, kv_lengths=kv_lengths,
                  kv_starts=kv_starts)
    mesh = make_mesh(dp=dp, sp=sp, tp=1, devices=jax.devices()[: dp * sp])
    with mesh:
        got = ring_attention(
            q, k, v, mesh=mesh, causal=True, kv_lengths=kv_lengths,
            kv_starts=kv_starts,
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ring_gradients_match():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(11)
    b, t, nq, nkv, h = 2, 32, 4, 2, 16
    q, k, v = _inputs(rng, b, t, nq, nkv, h)
    mesh = make_mesh(dp=1, sp=4, tp=1, devices=jax.devices()[:4])

    def loss_sp(q, k, v):
        out = ring_attention(q, k, v, mesh=mesh, causal=True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(mha_xla(q, k, v, causal=True)))

    with mesh:
        g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_sp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5
        )


def test_dispatch_routes_gqa_to_ring():
    """multi_head_attention under an sp mesh with nkv % sp != 0 must still be
    sequence-parallel (via the ring), not silently fall back to replicated."""
    from visper_lm_tpu.ops.attention import multi_head_attention

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(12)
    q, k, v = _inputs(rng, 2, 32, 4, 2, 16)   # nkv=2, sp=4
    ref = mha_xla(q, k, v, causal=True)
    mesh = make_mesh(dp=1, sp=4, tp=1, devices=jax.devices()[:4])
    with mesh:
        got = multi_head_attention(q, k, v, causal=True, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_decoder_forward_under_sp_mesh_matches_single_device():
    """One knob: decoder_forward run inside a make_mesh(sp=4) context routes
    attention through the Ulysses exchange and reproduces single-device
    logits — the long-context seam is a mesh argument, not a model rewrite."""
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.models.decoder import decoder_forward, init_decoder

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = tiny_test_vlm(distill=False).decoder
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    embeds = jnp.asarray(
        rng.normal(size=(2, 32, cfg.hidden_size)), jnp.float32
    )

    ref = decoder_forward(params, cfg, embeds, use_pallas=False)["logits"]
    mesh = make_mesh(dp=1, sp=4, tp=1, devices=jax.devices()[:4])
    with mesh:
        got = decoder_forward(params, cfg, embeds, use_pallas=False)["logits"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5
    )
