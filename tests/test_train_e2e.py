"""End-to-end training tests on the virtual 8-device CPU mesh: full PT step with
in-jit teachers, ZeRO/TP shardings, loss decrease, checkpoint save/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import VisionConfig, tiny_test_vlm
from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visper_lm_tpu.data.collate import build_splice_plan, collate_plans
from visper_lm_tpu.models.teachers import TeacherConfigs, init_teachers, make_teacher_fn
from visper_lm_tpu.models.teachers.swin import SwinConfig
from visper_lm_tpu.models.vlm import init_vlm
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.train.optimizer import OptimizerConfig
from visper_lm_tpu.train.train_step import make_train_step, shard_batch

# heavyweight (subprocess / AOT compile / oracle / e2e) — excluded from the
# fast default suite (pytest.ini addopts); run everything with: pytest -m ''
pytestmark = pytest.mark.slow


def _tiny_teacher_cfgs(cfg):
    # teacher output dims must match the tiny distill task target dims (24/24/16)
    return TeacherConfigs(
        dinov2=VisionConfig(
            image_size=28, patch_size=14, hidden_size=24, num_layers=2, num_heads=2,
            mlp_dim=48, norm_eps=1e-6, hidden_act="gelu", use_pre_norm=False,
            dtype="float32",
        ),
        clip_h=VisionConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=2, num_heads=2,
            mlp_dim=64, hidden_act="gelu", dtype="float32",
        ),
        swin=SwinConfig(embed_dim=2, depths=(1, 1, 1, 1), num_heads=(1, 1, 1, 2),
                        window_size=2, dtype="float32"),
    )


def _batch(cfg, bsz, seq):
    rng = np.random.default_rng(0)
    plans = []
    for b in range(bsz):
        ids = (
            [1, 2, 3]
            + [IMAGE_TOKEN_INDEX]
            + list(rng.integers(3, 400, size=8 + b))
        )
        labels = [IGNORE_INDEX] * 4 + ids[4:]
        plans.append(
            build_splice_plan(
                ids, labels, seq, num_image_tokens=cfg.num_image_tokens,
                num_task_tokens=cfg.distill.num_task_tokens, num_tasks=3,
            )
        )
    img = rng.normal(size=(bsz, 28, 28, 3)).astype(np.float32)
    batch = collate_plans(plans, images=img)
    # teacher inputs (tiny sizes: dinov2/clip_h at 28px; swin at 64px -> 2x2 stage4)
    batch["depth_images"] = img
    batch["gen_images"] = img
    batch["seg_images"] = rng.normal(size=(bsz, 64, 64, 3)).astype(np.float32)
    for t in cfg.distill.tasks:
        batch[f"{t.task}_mask"] = np.ones((bsz,), np.float32)
    return batch


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = tiny_test_vlm(distill=True)
    # align distill target shapes with tiny teachers:
    #   depth: dinov2 hidden 24, 4 tokens (28px/14 -> 2x2)
    #   gen:   clip_h proj dim 24? GEN head target_dim=24, projection handled below
    #   seg:   swin stage4 dim 16, 4 tokens (64/32=2 -> 2x2=4)
    return cfg


def test_pt_train_step_with_teachers_loss_decreases(tiny_cfg):
    cfg = tiny_cfg
    tcfgs = _tiny_teacher_cfgs(cfg)
    mesh = make_mesh(dp=4, tp=2)

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    import visper_lm_tpu.models.teachers.unclip as unclip_lib

    old_dim = unclip_lib.GEN_EMBED_DIM
    unclip_lib.GEN_EMBED_DIM = 24  # tiny gen target dim
    try:
        teachers = init_teachers(jax.random.PRNGKey(1), cfg, dtype=jnp.float32, tcfgs=tcfgs)
    finally:
        unclip_lib.GEN_EMBED_DIM = old_dim
    teacher_fn = make_teacher_fn(cfg, tcfgs)

    batch = _batch(cfg, bsz=8, seq=64)
    opt_cfg = OptimizerConfig(
        learning_rate=3e-3, total_steps=30, warmup_ratio=0.0, stage="pretrain"
    )
    with mesh:
        step_fn, state, _ = make_train_step(
            cfg, opt_cfg, params, mesh,
            teacher_fn=teacher_fn, teacher_params=teachers, use_pallas=False,
        )
        dbatch = shard_batch(batch, mesh)
        losses = []
        for _ in range(8):
            state, metrics = step_fn(state, dbatch)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # distill losses present and finite
    for k in ("gen_loss", "depth_loss", "seg_loss", "text_loss"):
        assert np.isfinite(float(metrics[k]))


def test_frozen_params_do_not_change(tiny_cfg):
    cfg = tiny_cfg
    mesh = make_mesh(dp=8, tp=1)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, bsz=8, seq=64)
    for t in cfg.distill.tasks:
        batch[f"{t.task}_target"] = np.random.default_rng(1).normal(
            size=(8, t.target_tokens, t.target_dim)
        ).astype(np.float32)
    opt_cfg = OptimizerConfig(learning_rate=1e-2, total_steps=10, stage="pretrain")
    with mesh:
        step_fn, state, _ = make_train_step(cfg, opt_cfg, params, mesh, use_pallas=False)
        before = jax.tree_util.tree_map(np.asarray, state.params)
        dbatch = shard_batch(batch, mesh)
        for _ in range(3):  # step 1 is still in lr warmup (lr=0)
            state, _ = step_fn(state, dbatch)
        # trainable params moved
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))), state.params, before
        )
        total_move = max(jax.tree_util.tree_leaves(moved))
        assert total_move > 0
        # frozen decoder/vision never appear in the TrainState
        assert state.params.get("decoder") is None or not jax.tree_util.tree_leaves(
            state.params["decoder"]
        )
        assert state.params.get("vision_tower") is None or not jax.tree_util.tree_leaves(
            state.params["vision_tower"]
        )


def test_checkpoint_save_restore_roundtrip(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    mesh = make_mesh(dp=2, tp=1)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, bsz=4, seq=64)
    for t in cfg.distill.tasks:
        batch[f"{t.task}_target"] = np.zeros((4, t.target_tokens, t.target_dim), np.float32)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, stage="pretrain")

    from visper_lm_tpu.train.checkpoint import CheckpointManager

    with mesh:
        step_fn, state, _ = make_train_step(cfg, opt_cfg, params, mesh, use_pallas=False)
        dbatch = shard_batch(batch, mesh)
        state, _ = step_fn(state, dbatch)

        mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
        mgr.save(1, state, cfg)
        mgr.wait()
        assert mgr.latest_step() == 1

        restored = mgr.restore(state)
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        rcfg = mgr.restore_config()
        assert rcfg is not None and rcfg.decoder.hidden_size == cfg.decoder.hidden_size
        mgr.close()


def test_resume_consumes_exact_data_order(tiny_cfg, tmp_path):
    """VERDICT r3 #2: resume fast-forwards the data stream. A run interrupted
    at step 6 and resumed to 10 must consume exactly the batches the
    uninterrupted run would have (no head replay, no tail drop) and land on
    bitwise-identical state."""
    from visper_lm_tpu.train.trainer import TrainerConfig, train

    cfg = tiny_cfg
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    batches = []
    for _ in range(10):
        b = _batch(cfg, bsz=4, seq=64)
        # distinct per-batch targets/images so data ORDER is observable in
        # the trained params
        b["images"] = rng.normal(size=b["images"].shape).astype(np.float32)
        for t in cfg.distill.tasks:
            b[f"{t.task}_target"] = rng.normal(
                size=(4, t.target_tokens, t.target_dim)
            ).astype(np.float32)
        batches.append(b)

    def data_iter(epoch, skip_batches=0):
        yield from batches[skip_batches:]

    opt = OptimizerConfig(
        learning_rate=1e-3, total_steps=10, warmup_ratio=0.0, stage="pretrain"
    )
    kw = dict(dp=2, tp=1, save_steps=100, num_epochs=1)

    t_full = TrainerConfig(
        output_dir=str(tmp_path / "full"), max_steps=10, resume=False, **kw
    )
    s_full = train(cfg, opt, t_full, params, data_iter, use_pallas=False)

    # interrupted at step 6, then resumed to 10 in the same output dir
    t_a = TrainerConfig(
        output_dir=str(tmp_path / "res"), max_steps=6, resume=True, **kw
    )
    train(cfg, opt, t_a, params, data_iter, use_pallas=False)

    requested = []

    def data_iter2(epoch, skip_batches=0):
        requested.append((epoch, skip_batches))
        yield from batches[skip_batches:]

    t_b = TrainerConfig(
        output_dir=str(tmp_path / "res"), max_steps=10, resume=True, **kw
    )
    s_res = train(cfg, opt, t_b, params, data_iter2, use_pallas=False)

    # the resumed run asked the stream for batch 6 onward — steps 7-10 train
    # on exactly the uninterrupted run's batches
    assert requested == [(0, 6)], requested
    assert int(s_res.step) == int(s_full.step) == 10
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_res.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_skip_without_iterator_support(tiny_cfg, tmp_path):
    """Streams whose data_iter_fn lacks skip_batches are consumed-and-dropped
    to the same effect (islice fallback)."""
    from visper_lm_tpu.train.trainer import TrainerConfig, train

    cfg = tiny_cfg
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    batches = []
    for _ in range(4):
        b = _batch(cfg, bsz=4, seq=64)
        for t in cfg.distill.tasks:
            b[f"{t.task}_target"] = rng.normal(
                size=(4, t.target_tokens, t.target_dim)
            ).astype(np.float32)
        batches.append(b)

    produced = []

    def data_iter(epoch):                 # no skip_batches parameter
        for i, b in enumerate(batches):
            produced.append(i)
            yield b

    opt = OptimizerConfig(
        learning_rate=1e-3, total_steps=4, warmup_ratio=0.0, stage="pretrain"
    )
    kw = dict(dp=2, tp=1, save_steps=100, num_epochs=1)
    train(cfg, opt, TrainerConfig(
        output_dir=str(tmp_path / "o"), max_steps=2, resume=True, **kw
    ), params, data_iter, use_pallas=False)
    produced.clear()
    s = train(cfg, opt, TrainerConfig(
        output_dir=str(tmp_path / "o"), max_steps=4, resume=True, **kw
    ), params, data_iter, use_pallas=False)
    assert int(s.step) == 4
    # the islice fallback still pulled every batch from the generator (0-3),
    # but only 2-3 were trained on; the cursor made the skip exact
    assert produced[:2] == [0, 1] and produced[2:] == [2, 3]
