"""Gradient accumulation: N microbatches -> one optimizer update.

Parity target: the reference's --gradient_accumulation_steps path
(/root/reference/scripts/train/pretrain.sh:40, transformers TrainingArguments +
DeepSpeed f32 gradient accumulation). Here the jitted step lax.scans fwd+bwd
over a leading (accum, ...) microbatch axis, sums gradients in f32, and applies
one tx.update on the mean.
"""

import numpy as np
import pytest

import jax

from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.train.optimizer import OptimizerConfig
from visper_lm_tpu.train.train_step import make_train_step, shard_batch

from test_train_e2e import _batch

# heavyweight (subprocess / AOT compile / oracle / e2e) — excluded from the
# fast default suite (pytest.ini addopts); run everything with: pytest -m ''
pytestmark = pytest.mark.slow


def _targets(cfg, batch, bsz):
    rng = np.random.default_rng(7)
    for t in cfg.distill.tasks:
        batch[f"{t.task}_target"] = rng.normal(
            size=(bsz, t.target_tokens, t.target_dim)
        ).astype(np.float32)
    return batch


def test_accum_identical_microbatches_matches_single_step():
    """accum=2 over the SAME microbatch twice must land exactly where one plain
    step on that microbatch does: mean of two identical gradients is the
    gradient."""
    cfg = tiny_test_vlm(distill=True)
    mesh = make_mesh(dp=4, tp=1)
    from visper_lm_tpu.models.vlm import init_vlm

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batch = _targets(cfg, _batch(cfg, bsz=4, seq=64), 4)
    opt_cfg = OptimizerConfig(
        learning_rate=1e-2, total_steps=10, warmup_ratio=0.0, stage="pretrain"
    )

    with mesh:
        step1, state1, _ = make_train_step(
            cfg, opt_cfg, params, mesh, use_pallas=False
        )
        d1 = shard_batch(batch, mesh)
        state1, m1 = step1(state1, d1)

        stepA, stateA, _ = make_train_step(
            cfg, opt_cfg, params, mesh, use_pallas=False, accum_steps=2
        )
        stacked = {k: np.stack([v, v]) for k, v in batch.items()}
        dA = shard_batch(stacked, mesh, leading_accum=True)
        stateA, mA = stepA(stateA, dA)

    assert np.isfinite(float(mA["loss"]))
    np.testing.assert_allclose(float(mA["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(stateA.params),
        jax.tree_util.tree_leaves(state1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-3, atol=2e-5,
        )


def test_accum_distinct_microbatches_trains():
    """Distinct microbatches: loss is the mean over microbatch losses, training
    still converges, and the step counter advances once per accumulated step."""
    cfg = tiny_test_vlm(distill=True)
    mesh = make_mesh(dp=2, tp=1)
    from visper_lm_tpu.models.vlm import init_vlm

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    b0 = _targets(cfg, _batch(cfg, bsz=4, seq=64), 4)
    rng = np.random.default_rng(3)
    b1 = dict(b0)
    for t in cfg.distill.tasks:
        b1[f"{t.task}_target"] = rng.normal(
            size=(4, t.target_tokens, t.target_dim)
        ).astype(np.float32)
    opt_cfg = OptimizerConfig(
        learning_rate=5e-3, total_steps=20, warmup_ratio=0.0, stage="pretrain"
    )
    with mesh:
        step_fn, state, _ = make_train_step(
            cfg, opt_cfg, params, mesh, use_pallas=False, accum_steps=2
        )
        stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
        dbatch = shard_batch(stacked, mesh, leading_accum=True)
        losses = []
        for _ in range(6):
            state, metrics = step_fn(state, dbatch)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_trainer_loop_groups_microbatches(tmp_path):
    """train() with grad_accum_steps=2 stacks host batches and takes one
    optimizer step per group (4 host batches -> 2 steps)."""
    cfg = tiny_test_vlm(distill=True)
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.train.trainer import TrainerConfig, train

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batches = [_targets(cfg, _batch(cfg, bsz=4, seq=64), 4) for _ in range(4)]

    def data_iter(epoch):
        yield from batches

    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=2, warmup_ratio=0.0, stage="pretrain"
    )
    tcfg = TrainerConfig(
        output_dir=str(tmp_path), num_epochs=1, save_steps=100,
        grad_accum_steps=2, dp=2, tp=1, resume=False,
    )
    state = train(cfg, opt_cfg, tcfg, params, data_iter, use_pallas=False)
    assert int(state.step) == 2
    import json

    with open(tmp_path / "metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    assert [r["step"] for r in records] == [1, 2]
    assert all(np.isfinite(r["loss"]) for r in records)
