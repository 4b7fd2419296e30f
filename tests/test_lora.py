"""LoRA: zero-init delta, gradient flow, merge equivalence, stage freezing."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import LoraConfig, tiny_test_vlm
from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visper_lm_tpu.data.collate import build_splice_plan, collate_plans
from visper_lm_tpu.models.lora import merge_lora_into_decoder
from visper_lm_tpu.models.vlm import init_vlm, vlm_forward


@pytest.fixture(scope="module")
def lora_setup():
    cfg = dataclasses.replace(tiny_test_vlm(), lora=LoraConfig(r=4, alpha=8))
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    plans = [
        build_splice_plan(
            [1, 2, IMAGE_TOKEN_INDEX] + list(rng.integers(3, 400, size=6)),
            None, 32, num_image_tokens=cfg.num_image_tokens,
        )
    ]
    batch = collate_plans(plans, images=rng.normal(size=(1, 28, 28, 3)).astype(np.float32))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, params, batch


def test_lora_zero_init_is_identity(lora_setup):
    cfg, params, batch = lora_setup
    base_cfg = dataclasses.replace(cfg, lora=None)
    base_params = {k: v for k, v in params.items() if k != "lora"}
    with_lora = vlm_forward(params, cfg, batch, use_pallas=False)["logits"]
    without = vlm_forward(base_params, base_cfg, batch, use_pallas=False)["logits"]
    np.testing.assert_allclose(np.array(with_lora), np.array(without), atol=1e-5)


def test_lora_changes_output_and_gets_grads(lora_setup):
    cfg, params, batch = lora_setup
    # perturb B so the delta is nonzero
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["lora"] = jax.tree_util.tree_map(
        lambda x: x + 0.05, params["lora"]
    )
    l1 = vlm_forward(params, cfg, batch, use_pallas=False)["logits"]
    l2 = vlm_forward(params2, cfg, batch, use_pallas=False)["logits"]
    assert float(jnp.max(jnp.abs(l1 - l2))) > 1e-4

    def loss(lora):
        p = dict(params)
        p["lora"] = lora
        out = vlm_forward(p, cfg, batch, use_pallas=False)
        return jnp.sum(out["logits"].astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params["lora"])
    gn = jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(float(gn)) and float(gn) > 0


def test_merge_equals_runtime_lora(lora_setup):
    """Offline merge (builder.py merge-on-load equivalent) == runtime delta."""
    cfg, params, batch = lora_setup
    params2 = dict(params)
    params2["lora"] = jax.tree_util.tree_map(lambda x: x + 0.03, params["lora"])
    runtime = vlm_forward(params2, cfg, batch, use_pallas=False)["logits"]

    merged_decoder = merge_lora_into_decoder(params2["decoder"], params2["lora"], cfg.lora)
    merged_params = {k: v for k, v in params2.items() if k != "lora"}
    merged_params["decoder"] = merged_decoder
    base_cfg = dataclasses.replace(cfg, lora=None)
    baked = vlm_forward(merged_params, base_cfg, batch, use_pallas=False)["logits"]
    np.testing.assert_allclose(np.array(runtime), np.array(baked), atol=2e-4)


def test_lora_stage_trains_only_adapters(lora_setup):
    from visper_lm_tpu.train.optimizer import trainable_mask

    cfg, params, _ = lora_setup
    mask = trainable_mask(params, "lora")
    flat = jax.tree_util.tree_leaves_with_path(mask)
    for path, v in flat:
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if p.startswith("lora/") or p.startswith("mm_projector/"):
            assert v, p
        else:
            assert not v, p
