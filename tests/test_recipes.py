"""Committed per-stage launch recipes parse and reproduce the reference configs
(scripts/train/{pretrain,finetune,vpt,vpt_ift}.sh, scripts/probe/probe.sh)."""

import os

import pytest

from visper_lm_tpu.train.cli import build_argparser, build_vlm_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse(recipe):
    return build_argparser().parse_args([f"@{os.path.join(REPO, 'recipes', recipe)}"])


def test_pretrain_recipe_matches_reference():
    a = _parse("pretrain.args")
    assert a.stage == "pretrain"
    assert a.per_device_batch_size == 32      # pretrain.sh:38
    assert a.lr == pytest.approx(1e-3)        # pretrain.sh:45
    assert a.layer_indices == "d18-20_s10-18_g12-20"
    assert a.num_task_tokens == 8
    assert a.contrastive_loss_weight == pytest.approx(0.3)
    assert a.model_max_length == 4096
    assert a.warmup_ratio == pytest.approx(0.03)
    cfg = build_vlm_config(a)
    assert cfg.conv_template == "llava_llama_3" and cfg.num_sys_tokens == 38
    d = {t.task: t for t in cfg.distill.tasks}
    assert d["depth"].layer_indices == (17, 19)
    assert d["seg"].layer_indices == (9, 17)
    assert d["gen"].layer_indices == (11, 19)
    assert all(t.loss_weight == 0.5 for t in cfg.distill.tasks)


@pytest.mark.parametrize("recipe,stage,bs,lr", [
    ("finetune.args", "finetune", 16, 2e-5),
    ("vpt.args", "vpt", 16, 2e-5),
    ("vpt_ift.args", "finetune", 16, 2e-5),
])
def test_ift_family_recipes(recipe, stage, bs, lr):
    a = _parse(recipe)
    assert a.stage == stage
    assert a.per_device_batch_size == bs
    assert a.lr == pytest.approx(lr)
    assert a.image_aspect_ratio == "pad"
    assert a.group_by_modality_length
    cfg = build_vlm_config(a)
    if stage == "finetune":
        assert cfg.distill is None


def test_probe_recipe():
    a = _parse("probe.args")
    assert a.stage == "probe" and a.probe_mode == "depth"
    assert a.per_device_batch_size == 32 and a.lr == pytest.approx(1e-3)
    cfg = build_vlm_config(a)
    assert cfg.use_convnext_tower
    assert cfg.distill is not None
    # one head per decoder layer, no task tokens, no contrastive
    t = cfg.distill.tasks[0]
    assert t.task == "depth"
    assert len(t.layer_indices) == cfg.decoder.num_layers
    assert cfg.distill.num_task_tokens == 0
