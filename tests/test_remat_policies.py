"""Remat checkpoint policies: loss parity across save sets.

The PT-stage decoder is frozen, so the backward's dx path needs activations
only at nonlinear points; the named-save policies (models/decoder.py
_remat_policy) skip the expensive recompute matmuls. Exact policies must not
change the loss at all; save_mlp_q8 (int8 saved residuals) changes it only by
the consistent fwd+bwd rounding of gate/up.

Reference behavior anchor: the reference trains with torch gradient
checkpointing over full blocks (training arguments in
/root/reference/scripts/train/pretrain.sh) — policy-level save sets are a
TPU-side extension, so the oracle here is our own full-remat step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visper_lm_tpu.data.collate import build_splice_plan, collate_plans
from visper_lm_tpu.models.vlm import init_vlm
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.train.optimizer import OptimizerConfig
from visper_lm_tpu.train.train_step import make_train_step, shard_batch

# heavyweight (subprocess / AOT compile / oracle / e2e) — excluded from the
# fast default suite (pytest.ini addopts); run everything with: pytest -m ''
pytestmark = pytest.mark.slow


def _loss_after_step(cfg, batch, policy):
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    opt = OptimizerConfig(learning_rate=1e-3, total_steps=100, stage="pretrain")
    with mesh:
        step_fn, state, _ = make_train_step(
            cfg, opt, params, mesh, use_pallas=False, remat_policy=policy
        )
        db = shard_batch(batch, mesh)
        state, metrics = step_fn(state, db)
    return float(metrics["loss"])


@pytest.fixture(scope="module")
def tiny_batch():
    cfg = tiny_test_vlm(distill=True)
    rng = np.random.default_rng(0)
    b, t = 2, 64
    n_tasks = len(cfg.distill.task_order())
    plans = []
    for _ in range(b):
        ids = [5, 6, IMAGE_TOKEN_INDEX, 7, 8, 9]
        labels = [IGNORE_INDEX] * 3 + ids[3:]
        plans.append(
            build_splice_plan(
                ids, labels, t,
                num_image_tokens=cfg.num_image_tokens,
                num_task_tokens=cfg.distill.num_task_tokens,
                num_tasks=n_tasks,
            )
        )
    img = rng.normal(size=(b, cfg.vision.image_size, cfg.vision.image_size, 3))
    batch = collate_plans(plans, images=img.astype(np.float32))
    for tcfg in cfg.distill.tasks:
        batch[f"{tcfg.task}_mask"] = np.ones((b,), np.float32)
        batch[f"{tcfg.task}_target"] = rng.normal(
            size=(b, tcfg.target_tokens, tcfg.target_dim)
        ).astype(np.float32)
    return cfg, {k: jnp.asarray(v) for k, v in batch.items()}


def test_exact_policies_match_full_remat(tiny_batch):
    cfg, batch = tiny_batch
    base = _loss_after_step(cfg, batch, None)
    # save_qkv_mlp exercises every exact tag (qkv + mlp_gate + mlp_up); the
    # lighter sets (save_gate, save_mlp, save_flash) are subsets of its names
    got = _loss_after_step(cfg, batch, "save_qkv_mlp")
    assert abs(got - base) < 1e-5, (got, base)


def test_q8_policy_close_to_full_remat(tiny_batch):
    cfg, batch = tiny_batch
    base = _loss_after_step(cfg, batch, None)
    got = _loss_after_step(cfg, batch, "save_mlp_q8")
    # int8 saved residuals perturb the (consistent) forward slightly
    assert abs(got - base) < 5e-2, (got, base)
    assert abs(got - base) > 0 or got == base
