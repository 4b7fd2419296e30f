"""Fused window-attention kernel (interpret mode) vs the XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visper_lm_tpu.ops.window_attention import (
    window_attention_pallas,
    window_attention_xla,
)


@pytest.mark.parametrize("with_mask", [False, True])
def test_kernel_matches_xla_oracle(with_mask):
    rng = np.random.default_rng(0)
    w, h, n, d = 8, 3, 16, 8     # W = 2 images x nW=4 windows
    nw = 4
    q = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = None
    if with_mask:
        mask = jnp.asarray(
            rng.choice([0.0, -100.0], size=(nw, n, n)), jnp.float32
        )

    scale = d ** -0.5
    ref = window_attention_xla(q, k, v, bias, mask, scale)
    got = window_attention_pallas(
        q, k, v, bias, mask, scale, window_block=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_mask_tiles_with_window_period():
    """Mask row i applies to window (i % nW) — images see identical masks."""
    rng = np.random.default_rng(1)
    w, h, n, d, nw = 8, 2, 16, 8, 4
    q = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    bias = jnp.zeros((h, n, n), jnp.float32)
    mask = jnp.asarray(rng.choice([0.0, -100.0], size=(nw, n, n)), jnp.float32)

    got = window_attention_pallas(
        q, k, v, bias, mask, d ** -0.5, window_block=4, interpret=True
    )
    # per-window oracle with explicit mask lookup
    for wi in range(w):
        s = (q[wi].astype(jnp.float32) * d ** -0.5) @ k[wi].transpose(0, 2, 1)
        s = s + mask[wi % nw][None]
        p = jax.nn.softmax(s, axis=-1)
        ref = p @ v[wi]
        np.testing.assert_allclose(
            np.asarray(got[wi]), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_dispatch_shard_maps_over_data_axis():
    """The multi-device dispatch (dp>1 pods) partitions W over 'data' and runs
    the kernel per shard; validated on a virtual CPU mesh in interpret mode."""
    from visper_lm_tpu.parallel.mesh import make_mesh
    from visper_lm_tpu.ops.window_attention import window_attention

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    rng = np.random.default_rng(2)
    w, h, n, d, nw = 16, 2, 16, 8, 4     # dp=2: one image's window run per shard
    q = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(w, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = jnp.asarray(rng.choice([0.0, -100.0], size=(nw, n, n)), jnp.float32)

    ref = window_attention_xla(q, k, v, bias, mask, d ** -0.5)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    with mesh:
        got = window_attention(
            q, k, v, bias, mask, use_pallas=True, interpret=True
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_swin_forward_unchanged_on_cpu():
    """swin_forward still routes through the XLA path on CPU (dispatch default)."""
    from visper_lm_tpu.models.teachers.swin import SwinConfig, init_swin, swin_forward

    cfg = SwinConfig(embed_dim=8, depths=(2, 2), num_heads=(2, 4), window_size=2)
    params = init_swin(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    outs = swin_forward(params, cfg, images)
    assert outs[0].shape == (2, 4, 4, 8)
    assert outs[1].shape == (2, 2, 2, 16)
    assert np.isfinite(np.asarray(outs[1])).all()
