"""API-level tests: VisperModel chat + visual interpretations on the tiny model."""

import numpy as np
import pytest
from PIL import Image

import jax

from visper_lm_tpu.api import VisperModel
from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.models.vlm import init_vlm

from test_data_pipeline import FakeTokenizer


class FakeTok(FakeTokenizer):
    eos_token_id = 2


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    return VisperModel(cfg=cfg, params=params, tokenizer=FakeTok(), context_len=256)


def test_build_prompt_uses_template(model):
    p = model.build_prompt("what is this?")
    assert "<image>" in p
    assert p.startswith("<|system|>")
    assert p.endswith("\n<|assistant|>\n")


def test_chat_decodes(model):
    img = Image.new("RGB", (40, 40), (255, 0, 0))
    out = model.chat(["what color?", "how many?"], [img, img], max_new_tokens=4)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)


def test_visual_interpretations_shapes(model):
    img = Image.new("RGB", (32, 48), (0, 255, 0))
    interp = model.get_visual_interpretations("describe", img)
    assert set(interp) == {"gen", "depth", "seg"}
    d = model.cfg.distill
    for tcfg in d.tasks:
        layers = interp[tcfg.task]
        assert set(layers) == set(tcfg.layer_indices)
        for emb in layers.values():
            assert emb.shape == (1, tcfg.head.num_tokens, tcfg.head.output_dim)
