"""lmms-eval adapter: generate_until / loglikelihood with harness-shaped requests."""

import numpy as np
import pytest
from PIL import Image

import jax

from visper_lm_tpu.api import VisperModel
from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.eval.lmms_adapter import VisperLmms, fix_text
from visper_lm_tpu.models.vlm import init_vlm

from test_data_pipeline import FakeTokenizer


class FakeTok(FakeTokenizer):
    eos_token_id = 2


class Instance:
    def __init__(self, args):
        self.args = args


@pytest.fixture(scope="module")
def lmms():
    cfg = tiny_test_vlm(distill=True)
    model = VisperModel(
        cfg=cfg, params=init_vlm(jax.random.PRNGKey(0), cfg),
        tokenizer=FakeTok(), context_len=256,
    )
    return VisperLmms(model, batch_size=2, max_new_tokens=4)


def test_fix_text():
    assert fix_text("hello<|end|>") == "hello"
    assert fix_text("  x  ") == "x"


def test_generate_until(lmms):
    img = Image.new("RGB", (32, 32), (5, 99, 20))

    def doc_to_visual(doc):
        return [img]

    reqs = [
        Instance(("what is this?", {"max_new_tokens": 4}, doc_to_visual, 0, "t", "val")),
        Instance(("count the objects", {"max_new_tokens": 4}, doc_to_visual, 1, "t", "val")),
        Instance(("short", {"max_new_tokens": 4}, doc_to_visual, 2, "t", "val")),
    ]
    out = lmms.generate_until(reqs)
    assert len(out) == 3
    assert all(isinstance(t, str) for t in out)


def test_loglikelihood_ranks_targets(lmms):
    img = Image.new("RGB", (32, 32), (250, 10, 10))

    def doc_to_visual(doc):
        return [img]

    reqs = [
        Instance(("is it red?", " yes", doc_to_visual, 0, "t", "val")),
        Instance(("is it red?", " absolutely positively maybe", doc_to_visual, 0, "t", "val")),
    ]
    out = lmms.loglikelihood(reqs)
    assert len(out) == 2
    for lp, greedy in out:
        assert np.isfinite(lp)
        assert isinstance(greedy, bool)
    # longer continuation accumulates more (negative) log prob
    assert out[1][0] < out[0][0]
