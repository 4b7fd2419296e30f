"""Expert-parallel MoE layer: exactness, sharding, gradients, aux losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.ops.moe import init_moe_mlp, moe_mlp
from visper_lm_tpu.parallel.mesh import make_mesh


def _dense_silu_mlp(gate, up, down, x):
    g = jnp.einsum("btd,df->btf", x, gate)
    u = jnp.einsum("btd,df->btf", x, up)
    return jnp.einsum("btf,fd->btd", jax.nn.silu(g) * u, down)


def test_single_expert_equals_dense_mlp():
    """E=1, K=1: routing is the identity, so the MoE layer must reproduce the
    plain silu-MLP on the same weights."""
    key = jax.random.PRNGKey(0)
    params = init_moe_mlp(key, d_model=32, mlp_dim=64, num_experts=1,
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32), jnp.float32)
    out, aux = moe_mlp(params, x, top_k=1, capacity_factor=2.0)
    ref = _dense_silu_mlp(params["gate"][0], params["up"][0],
                          params["down"][0], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert float(aux["dropped_frac"]) == 0.0
    assert float(aux["lb_loss"]) == pytest.approx(1.0)  # E * 1 * 1


def test_topk_all_experts_ample_capacity_is_convex_combination():
    """K=E with ample capacity: every token reaches every expert, so the
    output equals the gate-weighted sum of all per-expert dense MLPs."""
    key = jax.random.PRNGKey(2)
    e = 4
    params = init_moe_mlp(key, d_model=16, mlp_dim=32, num_experts=e,
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16), jnp.float32)
    out, aux = moe_mlp(params, x, top_k=e, capacity_factor=float(e) + 1)
    assert float(aux["dropped_frac"]) == 0.0

    logits = jnp.einsum("btd,de->bte", x, params["router"])
    probs = jax.nn.softmax(logits, axis=-1)
    ref = jnp.zeros_like(x)
    for i in range(e):
        yi = _dense_silu_mlp(params["gate"][i], params["up"][i],
                             params["down"][i], x)
        ref = ref + probs[..., i:i + 1] * yi
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_capacity_overflow_drops_tokens():
    """A capacity of ~1 slot per expert must drop tokens (combine weight 0),
    reported in aux.dropped_frac."""
    params = init_moe_mlp(jax.random.PRNGKey(4), 16, 32, num_experts=2,
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 16), jnp.float32)
    out, aux = moe_mlp(params, x, top_k=1, capacity_factor=0.1)
    assert float(aux["dropped_frac"]) > 0.5
    assert np.all(np.isfinite(np.asarray(out)))
    # dropped tokens produce exactly zero (the residual stream carries them)
    n_zero_rows = int(np.sum(np.all(np.asarray(out) == 0.0, axis=-1)))
    assert n_zero_rows > 0


def test_expert_parallel_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    params = init_moe_mlp(jax.random.PRNGKey(6), 32, 64, num_experts=4,
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 16, 32), jnp.float32)
    ref, _ = moe_mlp(params, x, top_k=2, capacity_factor=2.0)
    mesh = make_mesh(dp=2, ep=2, tp=2, devices=jax.devices())
    with mesh:
        got, aux = jax.jit(
            lambda p, xx: moe_mlp(p, xx, top_k=2, capacity_factor=2.0)
        )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_flow_and_balance_loss_behaves():
    params = init_moe_mlp(jax.random.PRNGKey(8), 16, 32, num_experts=4,
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16), jnp.float32)

    def loss(p):
        out, aux = moe_mlp(p, x, top_k=2, capacity_factor=2.0)
        return jnp.mean(jnp.square(out)) + 0.01 * aux["lb_loss"]

    grads = jax.grad(loss)(params)
    for name in ("router", "gate", "up", "down"):
        g = np.asarray(grads[name], np.float32)
        assert np.all(np.isfinite(g)), name
        assert np.any(g != 0), name

    # perfectly uniform routing minimizes the Switch loss at exactly 1.0
    uniform = dict(params)
    uniform["router"] = jnp.zeros_like(params["router"])
    _, aux = moe_mlp(uniform, x, top_k=1, capacity_factor=4.0)
    assert float(aux["lb_loss"]) == pytest.approx(1.0, abs=0.15)
