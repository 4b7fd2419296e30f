"""GPipe pipeline parallelism: exactness vs the plain layer scan.

The pipeline only reorders when each (layer, microbatch) cell runs, so its
output must equal lax.scan over the stacked layers to float tolerance — and
BITWISE in f64, which test_schedule_exact_f64 pins (a schedule bug shows up
as O(1) error there, float reorder noise cannot hide it).

Runs on the 8-virtual-CPU-device mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.parallel.pipeline import pipeline_scan


def _toy(rng, L=8, B=8, T=16, D=32, dtype=jnp.float32):
    blocks = {
        "w": jnp.asarray(rng.normal(size=(L, D, D)) * 0.1, dtype),
        "b": jnp.asarray(rng.normal(size=(L, D)) * 0.1, dtype),
    }
    h = jnp.asarray(rng.normal(size=(B, T, D)), dtype)
    scale = jnp.asarray(rng.normal(size=(B, 1, 1)), dtype)
    return blocks, h, scale


def _block_fn(blk, hh, args):
    return hh + jnp.tanh(hh @ blk["w"] + blk["b"]) * args["scale"]


def _ref(blocks, h, scale):
    def body(hh, blk):
        return _block_fn(blk, hh, {"scale": scale}), None

    out, _ = jax.lax.scan(body, h, blocks)
    return out


@pytest.mark.parametrize("dp,pp,m", [(1, 4, 4), (2, 4, 8), (1, 8, 8), (2, 2, 2)])
def test_pipeline_matches_scan(dp, pp, m):
    if len(jax.devices()) < dp * pp:
        pytest.skip("needs more devices")
    rng = np.random.default_rng(0)
    blocks, h, scale = _toy(rng)
    ref = _ref(blocks, h, scale)
    mesh = make_mesh(dp=dp, pp=pp, tp=1, devices=jax.devices()[: dp * pp])
    with mesh:
        got = jax.jit(
            lambda hh: pipeline_scan(
                _block_fn, blocks, hh, {"scale": scale}, mesh=mesh, n_micro=m
            )
        )(h)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


_F64_CHECK = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.parallel.pipeline import pipeline_scan

rng = np.random.default_rng(1)
L, B, T, D = 8, 8, 16, 32
blocks = {
    "w": jnp.asarray(rng.normal(size=(L, D, D)) * 0.1, jnp.float64),
    "b": jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float64),
}
h = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float64)
scale = jnp.asarray(rng.normal(size=(B, 1, 1)), jnp.float64)

def block_fn(blk, hh, args):
    return hh + jnp.tanh(hh @ blk["w"] + blk["b"]) * args["scale"]

def body(hh, blk):
    return block_fn(blk, hh, {"scale": scale}), None

ref, _ = jax.lax.scan(body, h, blocks)
mesh = make_mesh(dp=1, pp=4, tp=1, devices=jax.devices()[:4])
with mesh:
    got = jax.jit(lambda hh: pipeline_scan(
        block_fn, blocks, hh, {"scale": scale}, mesh=mesh, n_micro=8))(h)
diff = float(jnp.max(jnp.abs(got - ref)))
assert diff < 1e-12, diff
print("f64 exact:", diff)
"""


def test_schedule_exact_f64():
    """In f64 the pipeline is numerically indistinguishable from the scan —
    any off-by-one in the GPipe schedule (wrong microbatch, wrong layer
    range, collected bubble garbage) would be an O(1) difference. Runs in a
    subprocess: toggling jax_enable_x64 in-process leaks into later tests."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    proc = subprocess.run(
        [sys.executable, "-c", _F64_CHECK], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "f64 exact:" in proc.stdout


def test_pipeline_gradients_match():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(2)
    blocks, h, scale = _toy(rng)
    mesh = make_mesh(dp=2, pp=4, tp=1, devices=jax.devices())

    def loss_pp(w, hh):
        blk = {"w": w, "b": blocks["b"]}
        with mesh:
            o = pipeline_scan(
                _block_fn, blk, hh, {"scale": scale}, mesh=mesh, n_micro=4
            )
        return jnp.sum(jnp.sin(o))

    def loss_ref(w, hh):
        return jnp.sum(jnp.sin(_ref({"w": w, "b": blocks["b"]}, hh, scale)))

    g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(blocks["w"], h)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(blocks["w"], h)
    for a, b_ in zip(g_pp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4
        )


def test_pp1_falls_through_to_scan():
    rng = np.random.default_rng(3)
    blocks, h, scale = _toy(rng)
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    got = pipeline_scan(_block_fn, blocks, h, {"scale": scale}, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(blocks, h, scale)), rtol=2e-5, atol=2e-5
    )


def test_layer_divisibility_guard():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(4)
    blocks, h, scale = _toy(rng, L=6)     # 6 % 4 != 0
    mesh = make_mesh(dp=1, pp=4, tp=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError):
        pipeline_scan(_block_fn, blocks, h, {"scale": scale}, mesh=mesh)


def test_decoder_forward_under_pipe_mesh_matches_single_device():
    """One knob: decoder_forward inside a make_mesh(pp=4) context pipelines
    the layer stack and reproduces single-device logits."""
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.models.decoder import decoder_forward, init_decoder

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = tiny_test_vlm(distill=False).decoder
    if cfg.num_layers % 4:
        pytest.skip("tiny config layers not divisible by 4 stages")
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    embeds = jnp.asarray(
        rng.normal(size=(8, 32, cfg.hidden_size)), jnp.float32
    )
    kv_lengths = jnp.asarray([32] * 7 + [20], jnp.int32)

    ref = decoder_forward(
        params, cfg, embeds, kv_lengths=kv_lengths, use_pallas=False
    )["logits"]
    mesh = make_mesh(dp=2, pp=4, tp=1, devices=jax.devices())
    with mesh:
        fn = jax.jit(
            lambda e: decoder_forward(
                params, cfg, e, kv_lengths=kv_lengths, use_pallas=False
            )["logits"]
        )
        # the pipeline must actually ENGAGE (a silent fallback to the plain
        # scan would still match numerically): stage hops lower to
        # collective-permutes
        assert "collective-permute" in fn.lower(embeds).compile().as_text()
        got = fn(embeds)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_decoder_pipeline_with_remat_matches():
    """remat + pipeline compose: the checkpointed block under pp matches."""
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.models.decoder import decoder_forward, init_decoder

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = tiny_test_vlm(distill=False).decoder
    if cfg.num_layers % 2:
        pytest.skip("tiny config layers not divisible by 2 stages")
    params = init_decoder(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(6)
    embeds = jnp.asarray(
        rng.normal(size=(4, 32, cfg.hidden_size)), jnp.float32
    )

    def loss(params, e, with_mesh):
        out = decoder_forward(
            params, cfg, e, remat=True, remat_policy="save_gate",
            use_pallas=False,
        )
        return jnp.mean(jnp.square(out["logits"]))

    ref = jax.grad(lambda e: loss(params, e, False))(embeds)
    mesh = make_mesh(dp=2, pp=2, tp=1, devices=jax.devices()[:4])
    with mesh:
        got = jax.jit(jax.grad(lambda e: loss(params, e, True)))(embeds)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
