"""Probe-stage training E2E, mask-zero-bug A/B flag, and sharding-rule units."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from visper_lm_tpu.config import probe_distill_config, tiny_test_vlm
from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visper_lm_tpu.data.collate import build_splice_plan, collate_plans
from visper_lm_tpu.models.vlm import init_vlm
from visper_lm_tpu.parallel import sharding as shd
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.train.optimizer import OptimizerConfig
from visper_lm_tpu.train.train_step import make_train_step, shard_batch


def _probe_cfg():
    base = tiny_test_vlm(distill=False)
    # one probe head per decoder layer, depth mode, no task tokens/contrastive
    distill = probe_distill_config("depth", base.decoder.num_layers)
    # shrink the probe head dims for CPU
    from visper_lm_tpu.config import DistillTaskConfig, ResamplerConfig

    task = dataclasses.replace(
        distill.tasks[0],
        head=ResamplerConfig(num_tokens=4, output_dim=16, dim_head=8, num_heads=2),
        target_dim=16,
        target_tokens=4,
    )
    distill = dataclasses.replace(distill, tasks=(task,))
    return dataclasses.replace(base, distill=distill)


def _batch(cfg, bsz=4, seq=64):
    rng = np.random.default_rng(0)
    plans = []
    for b in range(bsz):
        ids = [1, 2, 3, IMAGE_TOKEN_INDEX] + list(rng.integers(3, 400, size=6 + b))
        labels = [IGNORE_INDEX] * 4 + ids[4:]
        plans.append(
            build_splice_plan(ids, labels, seq, num_image_tokens=cfg.num_image_tokens)
        )
    batch = collate_plans(plans, images=rng.normal(size=(bsz, 28, 28, 3)).astype(np.float32))
    t = cfg.distill.tasks[0]
    batch[f"{t.task}_target"] = rng.normal(size=(bsz, t.target_tokens, t.target_dim)).astype(np.float32)
    batch[f"{t.task}_mask"] = np.ones((bsz,), np.float32)
    return batch


def test_probe_stage_trains_heads_only_and_converges():
    cfg = _probe_cfg()
    assert len(cfg.distill.tasks[0].layer_indices) == cfg.decoder.num_layers
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    assert "logit_scales" not in params          # use_contrastive=False
    assert "special_tokens" not in params        # num_task_tokens=0

    mesh = make_mesh(dp=2, tp=1)
    opt_cfg = OptimizerConfig(learning_rate=5e-3, total_steps=20, warmup_ratio=0.0,
                              stage="probe")
    with mesh:
        step_fn, state, _ = make_train_step(cfg, opt_cfg, params, mesh, use_pallas=False)
        # TrainState holds ONLY probe heads
        top = set(state.params.keys()) if isinstance(state.params, dict) else None
        leaves_by_top = {
            k: len(jax.tree_util.tree_leaves(v)) for k, v in state.params.items()
        }
        assert leaves_by_top.get("heads", 0) > 0
        for k in ("decoder", "vision_tower", "mm_projector"):
            assert leaves_by_top.get(k, 0) == 0, k

        dbatch = shard_batch(_batch(cfg), mesh)
        losses = []
        for _ in range(6):
            state, m = step_fn(state, dbatch)
            losses.append(float(m["depth_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_mask_zero_bug_flag_zeroes_distill_loss():
    cfg = tiny_test_vlm(distill=True)
    cfg_bug = dataclasses.replace(
        cfg, distill=dataclasses.replace(cfg.distill, replicate_mask_zero_bug=True)
    )
    from visper_lm_tpu.train.train_step import make_loss_fn

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    plans = [
        build_splice_plan(
            [1, 2, 3, IMAGE_TOKEN_INDEX, 9, 9], None, 64,
            num_image_tokens=cfg.num_image_tokens,
            num_task_tokens=cfg.distill.num_task_tokens, num_tasks=3,
        )
    ]
    batch = collate_plans(plans, images=rng.normal(size=(1, 28, 28, 3)).astype(np.float32))
    batch["labels"] = jnp.asarray(batch["labels"])
    for t in cfg.distill.tasks:
        batch[f"{t.task}_target"] = jnp.asarray(
            rng.normal(size=(1, t.target_tokens, t.target_dim)), jnp.float32
        )
        batch[f"{t.task}_mask"] = jnp.ones((1,), jnp.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    _, m_ok = make_loss_fn(cfg, use_pallas=False)(params, batch)
    _, m_bug = make_loss_fn(cfg_bug, use_pallas=False)(params, batch)
    assert float(m_ok["gen_loss"]) > 0
    assert float(m_bug["gen_loss"]) == 0.0       # the literal reference behavior
    assert float(m_bug["depth_loss"]) == 0.0


def test_param_pspecs_tp_rules():
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    specs = shd.param_pspecs(params)
    assert specs["decoder"]["blocks"]["q_proj"]["kernel"] == P(None, None, "model")
    assert specs["decoder"]["blocks"]["o_proj"]["kernel"] == P(None, "model", None)
    assert specs["decoder"]["blocks"]["down_proj"]["kernel"] == P(None, "model", None)
    assert specs["decoder"]["embed_tokens"]["embedding"] == P("model", None)
    assert specs["decoder"]["lm_head"]["kernel"] == P(None, "model")
    # non-decoder components replicate
    assert specs["mm_projector"]["layers"][0]["kernel"] == P()


def test_zero_pspec_adds_data_axis():
    spec = shd.zero_pspec(P(None, None, "model"), (4, 512, 128), data_size=4)
    assert spec == P(None, "data", "model")
    # too small -> untouched
    assert shd.zero_pspec(P(), (64,), data_size=4) == P()
    # indivisible dims -> untouched
    assert shd.zero_pspec(P(), (7, 13), data_size=4, min_size=1) == P()
