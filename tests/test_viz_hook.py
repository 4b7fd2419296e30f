"""Trainer viz hook: depth grids rendered from live params."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from visper_lm_tpu.data.collate import build_splice_plan, collate_plans
from visper_lm_tpu.models.teachers.dpt import init_dpt_head
from visper_lm_tpu.models.vlm import init_vlm
from visper_lm_tpu.train.optimizer import trainable_mask
from visper_lm_tpu.train.viz import DistillVizHook, save_image_grid
from visper_lm_tpu.utils.param import partition_params


def test_save_image_grid(tmp_path):
    imgs = [np.random.default_rng(i).random((8, 8)) for i in range(5)]
    path = str(tmp_path / "g.png")
    save_image_grid(imgs, path, cols=3)
    from PIL import Image

    g = Image.open(path)
    assert g.size == (24, 16)


def test_distill_viz_hook_renders(tmp_path):
    import visper_lm_tpu.models.teachers.dpt as dpt_lib

    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, "pretrain")
    trainable, frozen = partition_params(params, mask)

    class FakeState:
        pass

    state = FakeState()
    state.params = trainable

    # tiny DPT matching the depth head output dim (24)
    old_oc, old_f = dpt_lib.OUT_CHANNELS, dpt_lib.FEATURES
    dpt_lib.OUT_CHANNELS, dpt_lib.FEATURES = (8, 8, 8, 8), 8
    try:
        dpt_params = init_dpt_head(jax.random.PRNGKey(1), in_channels=24)
        rng = np.random.default_rng(0)
        plans = [
            build_splice_plan(
                [1, 2, IMAGE_TOKEN_INDEX, 5, 6], None, 32,
                num_image_tokens=cfg.num_image_tokens,
                num_task_tokens=cfg.distill.num_task_tokens, num_tasks=3,
            )
        ]
        batch = collate_plans(plans, images=rng.normal(size=(1, 28, 28, 3)).astype(np.float32))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        hook = DistillVizHook(cfg, str(tmp_path), frozen, dpt_params, every=2)
        hook(1, state, batch)            # not a multiple of `every` -> no render
        assert not os.path.exists(str(tmp_path / "viz"))
        hook(2, state, batch)
        files = os.listdir(str(tmp_path / "viz"))
        assert any(f.startswith("depth_") for f in files), files
    finally:
        dpt_lib.OUT_CHANNELS, dpt_lib.FEATURES = old_oc, old_f
