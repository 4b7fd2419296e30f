"""Parity for the last 6 fork task families, newly native:
refcoco/+/g (REC + REG), screenspot (REC + REG), seedbench_2, naturalbench,
cmmmu, olympiadbench (eval/grounding_tasks.py, eval/cmmmu.py,
eval/olympiad.py, eval/lmms_tasks.py additions).

Each scorer runs side-by-side with the reference fork's own module
(imported read-only via tests/_lmms_real.py) on adversarial synthetic
docs/responses; the olympiad evaluator's LaTeX-expression gates go BEYOND
the fork in this environment (its parse_latex needs the absent antlr4
runtime), so those are pinned against hand-computed truths instead.
"""

import random
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from _lmms_real import import_real_lmms_eval, load_task_utils  # noqa: E402

from visper_lm_tpu.eval import grounding_tasks as gt  # noqa: E402
from visper_lm_tpu.eval import lmms_tasks as lt  # noqa: E402
from visper_lm_tpu.eval import cmmmu as cm  # noqa: E402
from visper_lm_tpu.eval import olympiad as oly  # noqa: E402
from visper_lm_tpu.eval.harness import evaluate  # noqa: E402

lmms_eval = import_real_lmms_eval()
pytestmark = pytest.mark.skipif(
    lmms_eval is None, reason="reference lmms-eval not importable"
)


BOX_RESPONSES = [
    "[0.1, 0.2, 0.6, 0.9]",
    "The box is [0.25, 0.25, 0.75, 0.75].",
    "sure: [ 0.0, 0.0, 1.0, 1.0 ] and more [0.5,0.5,0.6,0.6]",
    "no box here",
    "[-0.1, 0.2, 0.3]",               # only three floats -> null box
    "[0.30, 0.40, 0.20, 0.10]",       # degenerate (x2<x1)
]
GT_BOXES = [
    [0.1, 0.2, 0.6, 0.9],
    [0.2, 0.2, 0.8, 0.8],
    [0.4, 0.4, 0.9, 0.9],
    [0.0, 0.0, 0.5, 0.5],
    [0.3, 0.3, 0.7, 0.7],
    [0.1, 0.1, 0.5, 0.5],
]


def test_rec_parse_and_metrics_parity():
    ref = load_task_utils("refcoco", "utils_rec")
    for s in BOX_RESPONSES:
        assert gt.parse_float_sequence_within(s) == \
            ref.parse_float_sequence_within(s), s
    results = [
        {"bbox": b, "pred": gt.parse_float_sequence_within(r)}
        for b, r in zip(GT_BOXES, BOX_RESPONSES)
    ]
    for metric in gt.REC_METRICS:
        ours = gt.rec_aggregate(results, metric)
        theirs = ref.refcoco_bbox_rec_aggregation_result(
            [dict(r) for r in results], metric
        )
        assert ours == pytest.approx(theirs), metric


def test_rec_preprocess_parity():
    from datasets import Dataset
    from PIL import Image

    ref = load_task_utils("refcoco", "utils_rec")
    docs = [
        {"image": Image.new("RGB", (200, 100)), "bbox": [20, 10, 60, 50],
         "answer": ["left thing", "the left one"], "question_id": 7},
        {"image": Image.new("RGB", (50, 400)), "bbox": [0, 40, 25, 300],
         "answer": ["tall thing"], "question_id": 8},
    ]
    theirs = ref.refcoco_bbox_rec_preprocess_dataset(
        Dataset.from_list([dict(d) for d in docs])
    )
    ours = gt.rec_preprocess_docs(docs)
    assert len(ours) == len(theirs)
    for o, t in zip(ours, theirs):
        assert o["answer"] == t["answer"]
        assert o["bbox"] == pytest.approx(t["bbox"])
    # prompt parity on an exploded row
    assert gt.REC_PROMPT + ours[0]["answer"] == \
        ref.refcoco_bbox_rec_doc_to_text(theirs[0])


def test_screenspot_rec_parity():
    ref = load_task_utils("screenspot", "utils_rec")
    sources = ["ios", "windows_screens", "web_forum", "android", "macos_x",
               "shop_site"]
    types = ["text", "icon", "text", "icon", "text", "icon"]
    results = [
        {"bbox": b, "pred": gt.parse_float_sequence_within(r),
         "data_source": s, "data_type": t}
        for b, r, s, t in zip(GT_BOXES, BOX_RESPONSES, sources, types)
    ]
    for metric in gt.REC_METRICS:
        ours = gt.screenspot_rec_aggregate([dict(r) for r in results], metric)
        theirs = ref.screenspot_rec_aggregation_result(
            [dict(r) for r in results], metric
        )
        assert ours == pytest.approx(theirs), metric
    doc = {"instruction": "click the save button"}
    assert gt.SCREENSPOT_REC_PROMPT + doc["instruction"] == \
        ref.screenspot_rec_doc_to_text(doc)


def test_seedbench2_parity():
    ref = load_task_utils("seedbench_2")
    kwargs = {"img_token": "<image>",
              "post_prompt": "Answer with the option's letter from the given "
                             "choices directly."}
    docs = [
        {"question": "What is shown?", "choice_a": "cat", "choice_b": "dog",
         "choice_c": "x.jpg", "choice_d": "bird", "answer": "A",
         "data_type": "Single Image", "data_id": ["a"], "question_id": 1},
        {"question": "Pick the image", "choice_a": "p.png", "choice_b": "q.png",
         "choice_c": "r.png", "choice_d": "s.png", "answer": "C",
         "data_type": "Image Generation",
         "data_id": ["a", "b", "c", "d", "e", "f"], "question_id": 2},
    ]
    for d in docs:
        assert lt.seedbench2_doc_to_text(d) == ref.seed_doc_to_text(d, kwargs)
    preds = ["A. cat", "b"]
    recs_ours, recs_ref = [], []
    for d, p in zip(docs, preds):
        recs_ours.append(lt.seedbench2_process_results(d, [p])["seed_all"])
        recs_ref.append(ref.seed_process_result(d, [p])["seed_all"])
    assert recs_ours == recs_ref
    assert lt.seedbench2_aggregate(recs_ours) == \
        ref.seed_aggregation_result(recs_ref)


def _install_loguru_stub():
    import logging
    import types

    if "loguru" not in sys.modules:
        mod = types.ModuleType("loguru")
        mod.logger = logging.getLogger("loguru-stub")
        sys.modules["loguru"] = mod


def test_naturalbench_parity():
    _install_loguru_stub()
    ref = load_task_utils("naturalbench")
    outs = [
        "Yes", "no.", "Yes, but also no", "nothing to see", "A", "B",
        "I would say  NO  here", "maybe yes?", "The answer is (B)",
    ]
    for o in outs:
        assert lt.naturalbench_extract_answer(o, "yes_no") == \
            ref.extract_answer(o, "yes_no"), o
        assert lt.naturalbench_extract_answer(o, "multiple_choice") == \
            ref.extract_answer(o, "multiple_choice"), o
    rng = np.random.default_rng(0)
    quartets = {
        i: {k: float(rng.integers(-1, 2))
            for k in ("q0_i0", "q0_i1", "q1_i0", "q1_i1")}
        for i in range(16)
    }
    ours = lt.naturalbench_get_scores(quartets)
    theirs = ref.get_scores({k: dict(v) for k, v in quartets.items()})
    assert ours == pytest.approx(theirs)
    # doc_to_text suffixes
    doc = {"Question": "Is the cat black?", "Question_Type": "yes_no"}
    assert (doc["Question"] + " " + lt.NATURALBENCH_SUFFIX["yes_no"]) == \
        ref.naturalbench_doc_to_text(doc)


CMMMU_DOC_MC = {
    "type": "选择", "question": '下图<img="f1.png">中的结构是什么？',
    "option1": "细胞核", "option2": "线粒体", "option3": "叶绿体",
    "option4": "核糖体", "answer": "B", "subcategory": "生物", "id": "v1",
    **{f"image_{i}_filename": (f"f{i}.png" if i == 1 else "") for i in
       range(1, 6)},
}
CMMMU_DOC_TF = {
    "type": "判断", "question": "地球是平的。", "answer": "错",
    "subcategory": "地理", "id": "v2",
    **{f"image_{i}_filename": "" for i in range(1, 6)},
}
CMMMU_DOC_FILL = {
    "type": "填空", "question": "2+2的结果是多少？", "answer": "4",
    "subcategory": "数学", "id": "v3",
    **{f"image_{i}_filename": "" for i in range(1, 6)},
}


def test_cmmmu_parity():
    ref = load_task_utils("cmmmu")
    for doc in (CMMMU_DOC_MC, CMMMU_DOC_TF, CMMMU_DOC_FILL):
        assert cm.construct_prompt(doc) == ref.construct_prompt(dict(doc))

    mc_responses = ["(B)", "答案是B", "线粒体是正确的", "A和B都对", "无法判断",
                    "正确答案：(C) 叶绿体"]
    options = [CMMMU_DOC_MC[f"option{i}"] for i in range(1, 5)]
    for resp in mc_responses:
        i2a_o, ch_o = cm.get_multi_choice_info(options)
        i2a_r, ch_r = ref.get_multi_choice_info(options)
        random.seed(13)
        ours = cm.get_multi_choice_prediction(resp, ch_o, i2a_o)
        random.seed(13)
        theirs = ref.get_multi_choice_prediction(resp, ch_r, i2a_r)
        assert ours == theirs, resp

    fill_responses = ["所以答案是4。", "计算结果为 4.0", "答案是2，000",
                      "x = 4", "没有答案"]
    for resp in fill_responses:
        assert sorted(map(str, cm.get_fill_blank_prediction(resp, "4"))) == \
            sorted(map(str, ref.get_fill_blank_prediction(resp, "4"))), resp

    tf_responses = ["这个说法是错误的。", "判断：对", "陈述正确", "无法确定"]
    for resp in tf_responses:
        assert sorted(cm.get_tf_prediction(resp)) == \
            sorted(ref.get_TF_prediction(resp)), resp

    # end-to-end scoring incl. the domain rollup (seeded: the TF tie-break
    # and unparseable-MC fallback are random.choice on both sides)
    docs = [CMMMU_DOC_MC, CMMMU_DOC_TF, CMMMU_DOC_FILL]
    responses = ["正确答案是(B)", "这个说法是错的", "所以答案是4"]
    random.seed(7)
    ours = [cm.cmmmu_process_results(d, [r])["cmmmu_acc"]
            for d, r in zip(docs, responses)]
    random.seed(7)
    theirs = [ref.cmmmu_process_results(d, [r])["cmmmu_acc"]
              for d, r in zip(docs, responses)]
    for o, t in zip(ours, theirs):
        assert sorted(map(str, o["parsed_pred"])) == \
            sorted(map(str, t["parsed_pred"]))
    random.seed(11)
    agg_ours = cm.cmmmu_aggregate_results([dict(r) for r in ours])
    random.seed(11)
    agg_theirs = ref.cmmmu_aggregate_results([dict(r) for r in theirs])
    assert agg_ours == pytest.approx(agg_theirs)
    assert agg_ours == 1.0


def _ref_olympiad_evaluator():
    """The fork's evaluator can't be CONSTRUCTED here (its __init__ calls
    parse_latex, which needs the absent antlr4 runtime) — build it uninitialized
    and set the two attributes __init__ would have set. Methods that don't
    reach parse_latex then behave exactly as shipped."""
    import sympy as sp

    mod = load_task_utils("olympiadbench", "olympiadbench_evals")
    ev = mod.OlympiadBenchEvaluator.__new__(mod.OlympiadBenchEvaluator)
    ev.special_signal_map = oly.OlympiadBenchEvaluator.SPECIAL_SIGNAL_MAP
    ev.pi = sp.Symbol("pi")
    ev.precision = 1e-8
    return ev


def test_olympiad_parity_on_fork_executable_paths():
    ref = _ref_olympiad_evaluator()
    ours = oly.OlympiadBenchEvaluator()

    for expr in ["1, 2, (3, 4), [5, 6], f(x, y), 7",
                 "a\\pm b, 3", "(1, 2]"]:
        assert ours.split_by_comma(expr) == ref.split_by_comma(expr), expr
        assert ours.trans_plus_minus_sign(ours.split_by_comma(expr)) == \
            ref.trans_plus_minus_sign(ref.split_by_comma(expr)), expr

    pairs = [
        ("So the final answer is \\boxed{42}.", "42"),
        ("text $\\frac{1}{2}$ more", "1/2"),
        ("\\boxed{1,2} and \\boxed{3}", "x"),
        ("answer \\left(1, 2\\right]$", "y"),
        ("100\\%", "100"),
    ]
    for a, b in pairs:
        assert ours.preprocess(a, b) == ref.preprocess(a, b), (a, b)

    # judge() on numerically-resolvable answers (the paths the fork can run
    # without antlr4) — incl. the x100 percentage convention and precision
    cases = [
        ("\\boxed{42}", "42", 1e-8, True),
        ("\\boxed{42}", "42.000001", 1e-3, True),
        ("\\boxed{42}", "43", 1e-3, False),
        ("\\boxed{0.5}", "50", 1e-8, True),     # percentage x100
        ("\\boxed{1,2}", "2,1", 1e-8, True),     # order-free pairing
        ("\\boxed{1,2}", "1,3", 1e-8, False),
    ]
    for a, b, prec, want in cases:
        assert ours.judge(a, b, prec) == want, (a, b)
        assert ref.judge(a, b, prec) == want, (a, b)


def test_olympiad_expression_gates_beyond_fork():
    """The LaTeX-lite translator resolves symbolic answers the fork cannot
    in this environment (no antlr4) — pinned against hand-computed truth."""
    ev = oly.OlympiadBenchEvaluator()
    assert ev.judge("\\boxed{\\frac{1}{2}}", "0.5", 1e-8)
    assert ev.judge("\\boxed{2\\pi}", "6.2832", 1e-3)
    assert ev.judge("\\boxed{\\sqrt{2}}", "1.41421", 1e-4)
    assert ev.judge("\\boxed{\\frac{\\sqrt{2}}{2}}", "0.7071", 1e-3)
    assert not ev.judge("\\boxed{\\frac{1}{3}}", "0.5", 1e-8)
    assert ev.judge("\\boxed{(0, \\frac{1}{2}]}", "(0,0.5]", 1e-8)
    assert not ev.judge("\\boxed{(0, \\frac{1}{2}]}", "(0,0.5)", 1e-8)
    assert ev.judge("\\boxed{x^{2}+1}", "1+x^2", 1e-8)
    # \pm expansion pairs through the expression gate ("1+2" needs the
    # symbolic evaluator — the fork returns False here for lack of antlr4)
    assert ev.judge("\\boxed{1\\pm 2}", "3,-1", 1e-8)


class _ScriptedLM:
    def __init__(self, responses):
        self.responses = list(responses)
        self.task_dict = {}

    def generate_until(self, instances):
        return [self.responses[inst.args[3]] for inst in instances]


def test_grounding_tasks_end_to_end():
    from PIL import Image

    docs = [
        {"image": Image.new("RGB", (100, 100)), "bbox": [10, 20, 50, 60],
         "answer": ["the left thing"], "question_id": 0},
        {"image": Image.new("RGB", (100, 100)), "bbox": [0, 0, 30, 30],
         "answer": ["top corner"], "question_id": 1},
    ]
    lm = _ScriptedLM(["[0.1, 0.2, 0.6, 0.8]", "no idea"])
    res = evaluate(lm, [gt.refcoco_rec_task(docs)])
    r = res["refcoco_bbox_rec_val"]
    assert r["refcoco_ACC@0.5"] == 0.5        # first ~exact, second null box
    assert 0 < r["refcoco_IoU"] < 1

    reg = evaluate(
        _ScriptedLM(["the left thing", "word"]),
        [gt.refcoco_reg_task(docs)],
    )["refcoco_bbox_val"]
    assert reg["refcoco_Bleu_1"] > 0
    assert "refcoco_CIDEr" in reg

    ss_docs = [
        {"image": Image.new("RGB", (64, 64)), "instruction": "tap save",
         "bbox": [0.1, 0.1, 0.4, 0.4], "file_name": "a.png",
         "data_type": "text", "data_source": "ios"},
    ]
    ss = evaluate(_ScriptedLM(["[0.1, 0.1, 0.4, 0.4]"]),
                  [gt.screenspot_rec_task(ss_docs)])["screenspot_rec_test"]
    assert ss["screenspot_ACC@0.5"] == 1.0
    assert gt.screenspot_rec_aggregate.last_buckets["mobile_text"] == 1.0


def test_registry_includes_tail_tasks():
    tb = lt.task_builders()
    for name in ["naturalbench", "seedbench-2", "cmmmu_val",
                 "olympiadbench_test_en", "refcoco_bbox_rec_val",
                 "refcoco+_bbox_rec_val", "refcocog_bbox_rec_val",
                 "screenspot_rec_test", "screenspot_reg_test"]:
        assert name in tb, name
