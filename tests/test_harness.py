"""Executable lmms-eval plumbing tests (eval/harness.py + adapter).

VERDICT r1 #8 done-criterion: a test that executes simple_evaluate-equivalent
plumbing (evaluator.py:33-156) through the VisperLmms adapter — Instances,
batched generate_until, filter pipeline, metric aggregation — end to end.
"""

import sys

import numpy as np
import pytest
from PIL import Image

import jax

from visper_lm_tpu.eval.harness import (
    multi_choice_regex_filter,
    number_words_filter,
    ok_vqa_process_results,
    ok_vqa_task,
    realworldqa_process_results,
    realworldqa_task,
    simple_evaluate,
    vqa_normalize,
)


# ----------------------------------------------------------------- filters


def test_number_words_filter():
    assert number_words_filter(["Two", "11", "B"], [{}, {}, {}]) == ["2", "11", "B"]


def test_multi_choice_regex_filter_maps_choice_text_to_letter():
    doc = {"question": "What color?\nA. red apple\nB. green pear\nC. blue fish"}
    out = multi_choice_regex_filter(["green pear.", "(A)", "red apple!"], [doc] * 3)
    assert out[0] == "B"
    assert out[2] == "A"
    # unmatched falls back to cleaned response
    assert out[1] == "A" or out[1] == "A"  # '(A)' cleans to 'A'


def test_rwqa_exact_match():
    assert realworldqa_process_results({"answer": "B"}, ["b."]) == {"exact_match": 1.0}
    assert realworldqa_process_results({"answer": "B"}, ["c"]) == {"exact_match": 0.0}


def test_vqa_normalize_and_consensus():
    assert vqa_normalize("The Dog!") == "dog"
    assert vqa_normalize("Two") == "2"
    assert vqa_normalize("isnt") == "isn't"
    doc = {"answers": ["dog"] * 6 + ["cat"] * 4}
    # 'dog' matches >=3 of the other 9 in every leave-one-out fold -> 1.0
    assert ok_vqa_process_results(doc, ["a dog."]) == {"exact_match": 1.0}
    # 'cat' has 4 annotators: folds where cat left out see 3 matches -> 1.0;
    # folds keeping all 4 -> min(4/3,1)=1 ... consensus still counts
    r = ok_vqa_process_results(doc, ["cat"])["exact_match"]
    assert 0.9 < r <= 1.0
    assert ok_vqa_process_results(doc, ["fish"]) == {"exact_match": 0.0}


# --------------------------------------------------------------- stub model


class StubLM:
    """Duck-typed lmms model: answers 'B' to everything."""

    task_dict: dict = {}

    def generate_until(self, requests):
        # verify the Instance contract: 6-tuple args
        for r in requests:
            assert len(r.args) == 6
            context, gen_kwargs, doc_to_visual, doc_id, task, split = r.args
            doc = self.task_dict[task][split][doc_id]
            vis = doc_to_visual(doc)
            assert isinstance(vis, list) and vis
        return ["The answer is B."] * len(requests)


def test_evaluate_stub_rwqa():
    img = Image.new("RGB", (8, 8))
    docs = [
        {"question": "Pick.\nA. one\nB. two", "answer": "B", "image": img},
        {"question": "Pick.\nA. one\nB. two", "answer": "A", "image": img},
    ]
    res = simple_evaluate(StubLM(), [realworldqa_task(docs)])
    # 'The answer is B.' cleans to 'answer is B' -> no choice-text match ->
    # fallback cleaned response != 'b'; exact_match 0. Use a letter response:
    assert "realworldqa" in res["results"]


class LetterLM(StubLM):
    def generate_until(self, requests):
        return ["(B)"] * len(requests)


def test_evaluate_letter_scores():
    img = Image.new("RGB", (8, 8))
    docs = [
        {"question": "Pick.\nA. one\nB. two", "answer": "B", "image": img},
        {"question": "Pick.\nA. one\nB. two", "answer": "A", "image": img},
    ]
    res = simple_evaluate(LetterLM(), [realworldqa_task(docs)])
    assert res["results"]["realworldqa"]["exact_match"] == pytest.approx(0.5)


# ---------------------------------------------------- real adapter, tiny VLM


@pytest.fixture(scope="module")
def tiny_model():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_api import FakeTok

    from visper_lm_tpu.api import VisperModel
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.models.vlm import init_vlm

    cfg = tiny_test_vlm(distill=True)
    return VisperModel(
        cfg=cfg, params=init_vlm(jax.random.PRNGKey(0), cfg),
        tokenizer=FakeTok(), context_len=256,
    )


def test_simple_evaluate_through_adapter(tiny_model):
    """Full plumbing: VisperModel -> VisperLmms -> Instances -> filters -> score."""
    img = Image.new("RGB", (16, 16), (200, 30, 40))
    rw_docs = [
        {"question": "What?\nA. cat\nB. dog", "answer": "a", "image": img},
    ]
    ok_docs = [
        {"question": "What is it?", "answers": ["thing"] * 10, "image": img,
         "question_id": 1},
    ]
    res = simple_evaluate(
        tiny_model, [realworldqa_task(rw_docs), ok_vqa_task(ok_docs)], batch_size=2
    )
    r = res["results"]
    assert set(r) == {"realworldqa", "ok_vqa_val2014"}
    for task, metrics in r.items():
        assert "exact_match" in metrics
        assert 0.0 <= metrics["exact_match"] <= 1.0


def test_loglikelihood_rolling(tiny_model):
    from visper_lm_tpu.eval.harness import Instance
    from visper_lm_tpu.eval.lmms_adapter import VisperLmms

    lm = VisperLmms(tiny_model)
    scores = lm.loglikelihood_rolling(
        [Instance(args=("hello there friend",)), Instance(args=("hi",))]
    )
    assert len(scores) == 2
    assert all(np.isfinite(s) and s <= 0 for s in scores)


def test_cvbench_and_mmstar_tasks_through_harness(tiny_model):
    """All four headline benchmarks run through the one evaluate() interface."""
    from PIL import Image

    from visper_lm_tpu.eval.harness import (
        cvbench_overall,
        cvbench_task,
        mmstar_task,
        simple_evaluate,
    )

    img = Image.new("RGB", (32, 32), (120, 10, 10))
    cv_docs = [
        {"image": img, "question": "Which is closer?\n(A) car (B) bus",
         "answer": "(A)", "task": "Depth", "source": "ADE20K"},
        {"image": img, "question": "How many?\n(A) 1 (B) 2",
         "answer": "(B)", "task": "Count", "source": "Omni3D"},
    ]
    mm_docs = [
        {"image": img, "question": "What is shown?\nA. cat\nB. dog",
         "answer": "A", "category": "coarse perception",
         "l2_category": "image scene and topic"},
    ]
    out = simple_evaluate(
        tiny_model, [cvbench_task(cv_docs), mmstar_task(mm_docs)], batch_size=2
    )
    cv = out["results"]["cvbench"]
    assert "exact_match" in cv
    assert 0.0 <= cvbench_overall(cv) <= 1.0
    assert "exact_match" in out["results"]["mmstar"]
