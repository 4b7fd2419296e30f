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


# ---------------------------------------------------------------------------
# Decoder integration (config.moe_experts > 0)
# ---------------------------------------------------------------------------


def _moe_decoder_cfg():
    from visper_lm_tpu.config import DecoderConfig

    return DecoderConfig(
        vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
        num_kv_heads=2, head_dim=8, mlp_dim=64, dtype="float32",
        max_seq_len=64, moe_experts=4, moe_top_k=2, moe_capacity_factor=4.0,
    )


def test_moe_decoder_forward_taps_and_aux():
    """moe_experts>0 swaps the dense MLP for the MoE layer; aux losses are
    per-layer means surfaced in out['moe_aux'], identical between the plain
    scan and the tap-segmented scan (same tokens, same routing)."""
    from visper_lm_tpu.models import decoder as decoder_lib

    cfg = _moe_decoder_cfg()
    params = decoder_lib.init_decoder(jax.random.PRNGKey(0), cfg)
    assert "moe_router" in params["blocks"]
    assert "gate_proj" not in params["blocks"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, cfg.hidden_size))

    out = decoder_lib.decoder_forward(params, cfg, x)
    assert np.all(np.isfinite(np.asarray(out["logits"])))
    aux = out["moe_aux"]
    assert aux is not None
    assert float(aux["lb_loss"]) >= 0.99  # Switch loss lower bound is 1.0
    assert abs(float(aux["dropped_frac"])) < 1e-6  # ample capacity

    out_t = decoder_lib.decoder_forward(params, cfg, x, tap_layers=(1, 3))
    assert len(out_t["taps"]) == 2
    np.testing.assert_allclose(
        np.asarray(out_t["logits"]), np.asarray(out["logits"]),
        rtol=2e-5, atol=2e-5,
    )
    for k in ("lb_loss", "z_loss", "dropped_frac"):
        assert float(out_t["moe_aux"][k]) == pytest.approx(
            float(aux[k]), abs=1e-5
        )


def test_moe_decoder_cache_decode_matches_full_forward():
    """Per-step cached decode through the MoE MLP == teacher-forced full
    forward (routing is per-token; ample capacity means no drops either way)."""
    from visper_lm_tpu.models import decoder as decoder_lib

    cfg = _moe_decoder_cfg()
    params = decoder_lib.init_decoder(jax.random.PRNGKey(2), cfg)
    b, t = 2, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (b, t, cfg.hidden_size))

    full = decoder_lib.decoder_forward(params, cfg, x)

    cache = decoder_lib.init_kv_cache(cfg, b, t, dtype=jnp.float32)
    logits_steps = []
    for i in range(t):
        out = decoder_lib.decoder_forward(
            params, cfg, x[:, i : i + 1],
            cache=cache, q_offset=i,
            kv_lengths=jnp.full((b,), i + 1, jnp.int32),
        )
        cache = out["cache"]
        logits_steps.append(out["logits"][:, 0])
    stepped = jnp.stack(logits_steps, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full["logits"]), rtol=2e-4, atol=2e-4
    )


def test_moe_train_loss_includes_aux_and_grads_flow():
    """The train loss adds moe_aux_weight·lb + 1e-3·z, and router/expert
    gradients are nonzero through the full decoder."""
    from visper_lm_tpu.models import decoder as decoder_lib

    cfg = _moe_decoder_cfg()
    params = decoder_lib.init_decoder(jax.random.PRNGKey(4), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, cfg.hidden_size))

    def loss(p):
        out = decoder_lib.decoder_forward(p, cfg, x)
        aux = out["moe_aux"]
        return (
            jnp.mean(jnp.square(out["hidden"]))
            + cfg.moe_aux_weight * aux["lb_loss"]
            + 1e-3 * aux["z_loss"]
        )

    grads = jax.grad(loss)(params)
    for name in ("moe_router", "moe_gate", "moe_up", "moe_down"):
        g = np.asarray(grads["blocks"][name]["kernel"], np.float32)
        assert np.all(np.isfinite(g)), name
        assert np.any(g != 0), name


def test_moe_banks_stay_dense_under_serving_quantization():
    """quantize_linear_weights{,_int4} must leave MoE banks raw (ops/moe.py
    consumes plain kernels) while still quantizing the attention projections;
    the quantized tree must still run the full forward."""
    from visper_lm_tpu.models import decoder as decoder_lib
    from visper_lm_tpu.utils.param import (
        quantize_linear_weights,
        quantize_linear_weights_int4,
    )

    cfg = _moe_decoder_cfg()
    params = decoder_lib.init_decoder(jax.random.PRNGKey(10), cfg)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 6, cfg.hidden_size))
    ref = decoder_lib.decoder_forward(params, cfg, x)["logits"]

    q8 = quantize_linear_weights(params)
    for bank in ("moe_router", "moe_gate", "moe_up", "moe_down"):
        assert "kernel" in q8["blocks"][bank], bank
        assert "kernel_q8" not in q8["blocks"][bank], bank
    assert "kernel_q8" in q8["blocks"]["q_proj"]
    got = decoder_lib.decoder_forward(q8, cfg, x)["logits"]
    assert got.shape == ref.shape
    g, r = np.asarray(got).ravel(), np.asarray(ref).ravel()
    assert np.all(np.isfinite(g))
    assert np.corrcoef(g, r)[0, 1] > 0.99  # w8a16 drift only

    q4 = quantize_linear_weights_int4(params)
    for bank in ("moe_router", "moe_gate", "moe_up", "moe_down"):
        assert "kernel" in q4["blocks"][bank], bank
        assert "kernel_q4p" not in q4["blocks"][bank], bank
