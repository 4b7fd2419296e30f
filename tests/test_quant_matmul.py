"""Pallas w4a16 dequant-matmul kernel: parity vs the XLA dequant formulation.

The kernel computes the SAME math as utils/param.linear's kernel_q4p branch
(group-wise dequant then bf16 dot), so agreement is bounded only by dot
rounding order. Run in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.ops.quant_matmul import w4_linear, w4_matmul, w4_supported
from visper_lm_tpu.utils import param as param_lib
from visper_lm_tpu.utils.param import linear, quantize_linear_weights_int4


def _quantized(rng, din, dout, group, bias=True):
    w = jnp.asarray(rng.normal(size=(din, dout)) * 0.05, jnp.float32)
    p = {"kernel": w}
    if bias:
        p["bias"] = jnp.asarray(rng.normal(size=(dout,)), jnp.float32)
    return quantize_linear_weights_int4(p, group=group)


@pytest.mark.parametrize(
    "din,dout,m,group",
    [
        (512, 384, 16, 128),   # multiple groups per block
        (256, 500, 8, 64),     # ragged dout (partial last tile is masked)
        (1024, 320, 1, 128),   # single decode row
        (512, 256, 384, 128),  # prefill-shaped m: exercises row tiling
    ],
)
def test_w4_kernel_matches_xla_dequant(din, dout, m, group):
    rng = np.random.default_rng(0)
    pq = _quantized(rng, din, dout, group)
    x = jnp.asarray(rng.normal(size=(m, din)), jnp.bfloat16)
    assert w4_supported(pq, x)

    ref = np.asarray(linear(pq, x), np.float32)       # XLA dequant path (CPU)
    got = np.asarray(w4_linear(pq, x, interpret=True), np.float32)
    denom = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / denom < 1e-2   # bf16 dot rounding


def test_w4_kernel_exact_vs_f32_dequant():
    """Against an exact f32 dequant matmul the error is bf16-dot-bounded."""
    rng = np.random.default_rng(1)
    din, dout, m, group = 512, 256, 4, 128
    pq = _quantized(rng, din, dout, group, bias=False)
    x32 = rng.normal(size=(m, din)).astype(np.float32)

    packed = np.asarray(pq["kernel_q4p"])
    low = (packed.astype(np.int32) << 28) >> 28
    high = packed.astype(np.int32) >> 4
    q = np.stack([low, high], axis=1).reshape(din, dout)
    s = np.asarray(pq["q4_scale"], np.float32)
    wf = (q.reshape(s.shape[0], din // s.shape[0], dout)
          * s[:, None, :]).reshape(din, dout)
    exact = x32.astype(np.float32) @ wf

    got = np.asarray(
        w4_matmul(jnp.asarray(x32, jnp.bfloat16), pq["kernel_q4p"],
                  pq["q4_scale"], group=group, interpret=True),
        np.float32,
    )
    denom = np.max(np.abs(exact)) + 1e-9
    assert np.max(np.abs(got - exact)) / denom < 2e-2   # bf16 input rounding


def test_w4_leading_dims_and_bias():
    rng = np.random.default_rng(2)
    pq = _quantized(rng, 256, 192, 128)
    x = jnp.asarray(rng.normal(size=(2, 3, 256)), jnp.bfloat16)
    ref = np.asarray(linear(pq, x), np.float32)
    got = np.asarray(w4_linear(pq, x, interpret=True), np.float32)
    assert got.shape == (2, 3, 192)
    denom = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / denom < 1e-2   # bf16 dot rounding


def test_dispatch_guard_off_tpu_and_override():
    """linear() keeps the XLA path on CPU; W4_USE_PALLAS=False forces it off."""
    rng = np.random.default_rng(3)
    pq = _quantized(rng, 256, 128, 128)
    x = jnp.asarray(rng.normal(size=(2, 256)), jnp.bfloat16)
    assert not param_lib._use_w4_kernel(pq, x)          # cpu backend -> XLA
    old = param_lib.W4_USE_PALLAS
    try:
        param_lib.W4_USE_PALLAS = False
        assert not param_lib._use_w4_kernel(pq, x)
    finally:
        param_lib.W4_USE_PALLAS = old
    # stacked (per-layer) trees are not kernel-eligible
    stacked = {
        "kernel_q4p": jnp.zeros((4, 128, 128), jnp.int8),
        "q4_scale": jnp.ones((4, 2, 128), jnp.float32),
    }
    assert not w4_supported(stacked, jnp.zeros((2, 256), jnp.bfloat16))


@pytest.mark.slow
def test_generator_decode_with_forced_pallas_dispatch():
    """Full Generator decode with the Pallas w4 branch engaged (interpret mode)
    matches the XLA q4 path token-for-token on the tiny model — proves the
    dispatch composes with jit + the decode layer scan + the lm_head shape."""
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX
    from visper_lm_tpu.data.collate import build_splice_plan
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.ops import quant_matmul
    from visper_lm_tpu.serve.generate import (
        GenerationConfig, Generator, left_pad_plans,
    )

    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    n_tasks = len(cfg.distill.task_order())
    plans = [build_splice_plan(
        [3, 4, 5, IMAGE_TOKEN_INDEX, 6], None, 64,
        num_image_tokens=cfg.num_image_tokens,
        num_task_tokens=cfg.distill.num_task_tokens, num_tasks=n_tasks)]
    batch = left_pad_plans(plans, 64)
    rng = np.random.default_rng(0)
    batch["images"] = rng.normal(
        size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)

    gcfg = GenerationConfig(max_new_tokens=4, weight_quant="int4")
    ref = Generator(params, cfg, gcfg, 1, 64).generate(dict(batch))

    old_force, old_interp = param_lib.W4_USE_PALLAS, quant_matmul.INTERPRET
    try:
        param_lib.W4_USE_PALLAS = True
        quant_matmul.INTERPRET = True
        got = Generator(params, cfg, gcfg, 1, 64).generate(dict(batch))
    finally:
        param_lib.W4_USE_PALLAS = old_force
        quant_matmul.INTERPRET = old_interp
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dispatch_guard_multidevice_mesh():
    """Under a multi-device `with mesh:` the kernel must NOT engage even when
    forced on (GSPMD cannot partition Mosaic calls); get_abstract_mesh does
    not see the legacy context manager — the guard uses the physical mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from visper_lm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(4)
    pq = _quantized(rng, 256, 128, 128)
    x = jnp.asarray(rng.normal(size=(2, 256)), jnp.bfloat16)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    old = param_lib.W4_USE_PALLAS
    try:
        param_lib.W4_USE_PALLAS = True
        assert param_lib._use_w4_kernel(pq, x)          # single-device: on
        with mesh:
            assert not param_lib._use_w4_kernel(pq, x)  # multi-device: off
    finally:
        param_lib.W4_USE_PALLAS = old
