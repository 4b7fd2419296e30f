"""Unit tests for core math modules: norms, rope, attention, decoder, resampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.config import (
    DecoderConfig,
    ResamplerConfig,
    parse_layer_indices_dsl,
    parse_loss_weights_dsl,
    tiny_test_vlm,
)
from visper_lm_tpu.models import decoder as decoder_lib
from visper_lm_tpu.models.resampler import init_resampler, resampler_forward
from visper_lm_tpu.models.rope import apply_rope, rope_cos_sin
from visper_lm_tpu.ops.attention import mha_xla
from visper_lm_tpu.utils.param import count_params


def test_layer_dsl_parity():
    # dash = LIST of 1-indexed layers (base_ola_vlm.py:97-102), not a range
    out = parse_layer_indices_dsl("d18-20_s10-18_g12-20")
    assert out == {"depth": [17, 19], "seg": [9, 17], "gen": [11, 19]}
    assert parse_loss_weights_dsl("d0.5_s0.25_g1.0") == {
        "depth": 0.5,
        "seg": 0.25,
        "gen": 1.0,
    }


def test_rope_matches_reference_formula():
    # Independent recomputation of NeoX-style rope on a (1, 3, 2, 4) tensor.
    head_dim, theta = 4, 10000.0
    positions = jnp.arange(3)[None, :]
    cos, sin = rope_cos_sin(positions, head_dim, theta)
    x = jnp.arange(1 * 3 * 2 * 4, dtype=jnp.float32).reshape(1, 3, 2, 4)
    got = apply_rope(x, cos[0], sin[0])

    inv = 1.0 / (theta ** (np.arange(2) / 2))
    for t in range(3):
        ang = t * inv
        c, s = np.cos(ang), np.sin(ang)
        for n in range(2):
            v = np.array(x[0, t, n])
            expect = np.concatenate(
                [v[:2] * c - v[2:] * s, v[2:] * c + v[:2] * s]
            )
            np.testing.assert_allclose(np.array(got[0, t, n]), expect, rtol=1e-5)


def test_attention_causal_and_padding():
    key = jax.random.PRNGKey(0)
    b, t, n, h = 2, 8, 4, 16
    q, k, v = jax.random.normal(key, (3, b, t, n, h))
    out = mha_xla(q, k, v, causal=True)
    # position 0 attends only to itself
    expect0 = v[:, 0]
    np.testing.assert_allclose(np.array(out[:, 0]), np.array(expect0), rtol=1e-5)

    # padding mask: keys >= length contribute nothing
    lengths = jnp.array([4, 8])
    out_masked = mha_xla(q, k, v, causal=True, kv_lengths=lengths)
    v2 = v.at[0, 4:].set(1e6)  # poison padded keys of sample 0
    k2 = k.at[0, 4:].set(1e6)
    out_poisoned = mha_xla(q, k2, v2, causal=True, kv_lengths=lengths)
    np.testing.assert_allclose(
        np.array(out_masked[0, :4]), np.array(out_poisoned[0, :4]), rtol=1e-4
    )


def test_gqa_matches_repeated_heads():
    key = jax.random.PRNGKey(1)
    b, t, nq, nkv, h = 1, 6, 4, 2, 8
    q = jax.random.normal(key, (b, t, nq, h))
    k = jax.random.normal(jax.random.PRNGKey(2), (b, t, nkv, h))
    v = jax.random.normal(jax.random.PRNGKey(3), (b, t, nkv, h))
    out = mha_xla(q, k, v, causal=True)
    k_rep = jnp.repeat(k, 2, axis=2)
    v_rep = jnp.repeat(v, 2, axis=2)
    out_rep = mha_xla(q, k_rep, v_rep, causal=True)
    np.testing.assert_allclose(np.array(out), np.array(out_rep), rtol=1e-6)


def _tiny_decoder():
    return DecoderConfig(
        vocab_size=128,
        hidden_size=32,
        num_layers=4,
        num_heads=4,
        num_kv_heads=2,
        head_dim=8,
        mlp_dim=64,
        dtype="float32",
        max_seq_len=64,
    )


def test_decoder_taps_match_segmented_run():
    """Tap buffer written by the scan == block output captured by a python-loop run."""
    cfg = _tiny_decoder()
    params = decoder_lib.init_decoder(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, cfg.hidden_size))

    out = decoder_lib.decoder_forward(params, cfg, x, tap_layers=(1, 3))
    taps = out["taps"]
    assert len(taps) == 2 and taps[0].shape == (2, 10, cfg.hidden_size)

    # python-loop reference
    from visper_lm_tpu.models.decoder import _block_forward
    from visper_lm_tpu.models.rope import rope_cos_sin

    positions = jnp.arange(10)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    h = x
    captured = {}
    for i in range(cfg.num_layers):
        block = jax.tree_util.tree_map(lambda p: p[i], params["blocks"])
        h, _, _ = _block_forward(block, cfg, h, cos, sin, None, 0, None, False)
        if i in (1, 3):
            captured[i] = h
    np.testing.assert_allclose(np.array(taps[0]), np.array(captured[1]), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(taps[1]), np.array(captured[3]), rtol=2e-4, atol=1e-5)


def test_decoder_kv_cache_decode_matches_full_forward():
    """Greedy per-step decode with cache == one full forward (teacher forcing)."""
    cfg = _tiny_decoder()
    params = decoder_lib.init_decoder(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 9), 0, cfg.vocab_size)
    embeds = decoder_lib.embed_tokens(params["decoder"] if "decoder" in params else params, ids)

    full = decoder_lib.decoder_forward(params, cfg, embeds)
    full_logits = full["logits"]

    # prefill 5 tokens, then decode 4 steps
    cache = decoder_lib.init_kv_cache(cfg, 2, 16, dtype=jnp.float32)
    pre = decoder_lib.decoder_forward(
        params, cfg, embeds[:, :5], cache=cache, q_offset=0,
        kv_lengths=jnp.array([5, 5]),
    )
    cache = pre["cache"]
    np.testing.assert_allclose(
        np.array(pre["logits"]), np.array(full_logits[:, :5]), rtol=2e-4, atol=1e-4
    )
    for step in range(5, 9):
        out = decoder_lib.decoder_forward(
            params, cfg, embeds[:, step : step + 1], cache=cache,
            q_offset=step, kv_lengths=jnp.array([step + 1, step + 1]),
            positions=jnp.full((2, 1), step),
        )
        cache = out["cache"]
        np.testing.assert_allclose(
            np.array(out["logits"][:, 0]),
            np.array(full_logits[:, step]),
            rtol=2e-4,
            atol=1e-4,
        )


def test_resampler_shapes_and_tasktoken_pooling():
    cfg = ResamplerConfig(depth=2, dim_head=8, num_heads=2, num_tokens=4, output_dim=16, ff_mult=2)
    p = init_resampler(jax.random.PRNGKey(0), cfg, embedding_dim=12)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 12))
    out = resampler_forward(p, cfg, x)
    assert out.shape == (3, 4, 16)

    # task-token mode: latents repeated 2 -> 4 queries
    pt = init_resampler(jax.random.PRNGKey(0), cfg, embedding_dim=12, task_token=True)
    lat = jax.random.normal(jax.random.PRNGKey(2), (3, 2, 12))
    out_t = resampler_forward(pt, cfg, x, lat)
    assert out_t.shape == (3, 4, 16)

    # num_tokens=1 with 2 latents -> mean-pool path
    cfg1 = ResamplerConfig(depth=1, dim_head=8, num_heads=2, num_tokens=1, output_dim=16)
    p1 = init_resampler(jax.random.PRNGKey(3), cfg1, embedding_dim=12, task_token=True)
    out_1 = resampler_forward(p1, cfg1, x, lat)
    assert out_1.shape == (3, 1, 16)


def test_param_counts_are_sane():
    cfg = tiny_test_vlm()
    from visper_lm_tpu.models.vlm import init_vlm

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    assert count_params(params) > 0
    assert "lm_head" in params["decoder"]


def test_chunked_ce_matches_standard():
    from visper_lm_tpu.constants import IGNORE_INDEX
    from visper_lm_tpu.train.losses import ntp_loss, ntp_loss_chunked

    rng = jax.random.PRNGKey(0)
    b, t, d, v = 2, 37, 16, 50
    hidden = jax.random.normal(rng, (b, t, d))
    head = jax.random.normal(jax.random.PRNGKey(1), (d, v))
    labels = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0, v)
    labels = labels.at[:, :5].set(IGNORE_INDEX)

    logits = jnp.dot(hidden, head)
    ref = ntp_loss(logits, labels)
    got = ntp_loss_chunked(hidden, head, labels, chunk=8)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)

    # gradients agree too
    g1 = jax.grad(lambda h: ntp_loss(jnp.dot(h, head), labels))(hidden)
    g2 = jax.grad(lambda h: ntp_loss_chunked(h, head, labels, chunk=8))(hidden)
    np.testing.assert_allclose(np.array(g2), np.array(g1), rtol=1e-5, atol=1e-7)
