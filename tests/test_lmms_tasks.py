"""Task-breadth parity: eval/lmms_tasks.py vs the reference fork's own utils.

Each scorer/aggregator is run side-by-side with the reference implementation
(imported read-only from /root/reference/lmms-eval via tests/_lmms_real.py)
on adversarial synthetic docs/responses. Also drives the new tasks end-to-end
through the mini harness with a scripted model.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo/tests")
from _lmms_real import import_real_lmms_eval, load_task_utils  # noqa: E402

from visper_lm_tpu.eval import lmms_tasks as lt  # noqa: E402
from visper_lm_tpu.eval.harness import evaluate  # noqa: E402

lmms_eval = import_real_lmms_eval()
pytestmark = pytest.mark.skipif(
    lmms_eval is None, reason="reference lmms-eval not importable"
)


# --------------------------------------------------------------- EvalAI core


ADVERSARIAL_ANSWERS = [
    "Two dogs.", "a red, shiny apple", "it's 10,000", "isnt it?", "YES",
    "the answer is: left", "3.5 meters", "none", "o'clock", "don t know",
    "1,234", "an apple;a pear", "what's up\nnothing", "  spaced  out  ",
]


def test_eval_ai_processor_parity():
    from lmms_eval.tasks._task_utils.vqa_eval_metric import EvalAIAnswerProcessor

    ref = EvalAIAnswerProcessor()
    for s in ADVERSARIAL_ANSWERS:
        assert lt.eval_ai_process(s) == ref(s), s
        assert lt.process_punctuation(s) == ref.process_punctuation(s), s
        assert lt.process_digit_article(s) == ref.process_digit_article(s), s


# ---------------------------------------------------------------------- POPE


POPE_DOCS = [
    {"question_id": i, "question": f"Is there a {o} in the image?",
     "answer": a, "image": None}
    for i, (o, a) in enumerate([
        ("dog", "yes"), ("cat", "no"), ("car", "yes"), ("tree", "no"),
        ("person", "yes"), ("boat", "no"),
    ])
]
POPE_PREDS = ["yes", "yes", "no", "no", "Yes.", "maybe"]


def test_pope_parity():
    ref = load_task_utils("pope")
    mine_recs, ref_recs = {}, {}
    for doc, pred in zip(POPE_DOCS, POPE_PREDS):
        # reference asserts pred parsing implicitly via lower/strip only
        m = lt.pope_process_results(doc, [pred])
        r = ref.pope_process_results(doc, [pred])
        for k in m:
            mine_recs.setdefault(k, []).append(m[k])
            ref_recs.setdefault(k, []).append(r[k])
    assert lt.pope_aggregate_accuracy(mine_recs["pope_accuracy"]) == \
        ref.pope_aggregate_accuracy(ref_recs["pope_accuracy"])
    assert lt.pope_aggregate_precision(mine_recs["pope_precision"]) == \
        ref.pope_aggregate_precision(ref_recs["pope_precision"])
    assert lt.pope_aggregate_recall(mine_recs["pope_recall"]) == \
        ref.pope_aggregate_recall(ref_recs["pope_recall"])
    assert lt.pope_aggregate_f1(mine_recs["pope_f1_score"]) == \
        ref.pope_aggregate_f1_score(ref_recs["pope_f1_score"])
    assert lt.pope_aggregate_yes_ratio(mine_recs["pope_yes_ratio"]) == \
        ref.pope_aggregate_yes_ratio(ref_recs["pope_yes_ratio"])


# ------------------------------------------------------------------- TextVQA


TEXTVQA_DOCS = [
    {"question_id": 0, "question": "what does the sign say?",
     "answers": ["stop", "STOP", "stop.", "Stop", "stahp", "stop", "stop",
                 "stop sign", "stop", "stop"], "image": None},
    {"question_id": 1, "question": "how many items?",
     "answers": ["two", "2", "2", "two", "3", "2", "two", "2", "2", "two"],
     "image": None},
]


def test_textvqa_parity():
    ref = load_task_utils("textvqa")
    for doc, pred in zip(TEXTVQA_DOCS, ["Stop", "2 items"]):
        mine = lt.textvqa_process_results(dict(doc), [pred])["exact_match"]
        theirs = ref.textvqa_process_results(dict(doc), [pred])["exact_match"]
        assert mine == pytest.approx(theirs), (doc, pred)


# -------------------------------------------------------------------- OK-VQA


def test_ok_vqa_normalizer_parity():
    """harness.vqa_normalize was upgraded to the FULL EvalAI pipeline
    (word_tokenize + none->0); pin it against the reference's scorer."""
    from visper_lm_tpu.eval.harness import ok_vqa_process_results

    ref = load_task_utils("ok_vqa")
    docs = [
        {"question_id": 7, "answers":
         ["none", "none", "0", "zero", "none", "nothing", "none", "0",
          "none", "none"]},
        {"question_id": 8, "answers":
         ["it's a dog", "its a dog", "dog", "a dog", "dog", "dog", "dog",
          "the dog", "dog", "puppy"]},
    ]
    for doc, pred in zip(docs, ["None.", "it's a dog"]):
        mine = ok_vqa_process_results(dict(doc), [pred])["exact_match"]
        theirs = ref.ok_vqa_process_results(
            {**doc, "answers": list(doc["answers"])}, [pred]
        )["exact_match"]
        assert mine == pytest.approx(theirs), (doc, pred)


# -------------------------------------------------------------------- VQAv2


def test_vqav2_parity():
    ref = load_task_utils("vqav2")
    cases = [
        # unanimous gt (skips the second normalization stage)
        ([{"answer": "blue"}] * 10, "Blue."),
        ([{"answer": "blue"}] * 10, "blue?"),
        # split gt (engages punctuation/digit-article on both sides)
        ([{"answer": "two"}] * 5 + [{"answer": "2"}] * 5, "Two."),
        ([{"answer": "a dog"}] * 6 + [{"answer": "dog"}] * 4, "the dog"),
    ]
    for answers, pred in cases:
        doc_m = {"question_id": 0, "answers": [a["answer"] for a in answers]}
        doc_r = {"question_id": 0,
                 "answers": [dict(a) for a in answers]}
        mine = lt.vqav2_process_results(doc_m, [pred])["exact_match"]
        theirs = ref.vqav2_process_results(doc_r, [pred])["exact_match"]
        assert mine == pytest.approx(theirs), (answers[0], pred)


# ------------------------------------------------------------ DocVQA (ANLS)


def test_anls_parity():
    from lmms_eval.api.metrics import anls as ref_anls

    cases = [
        (["Total: $45.50", "45.50"], "$45.50"),
        (["monday"], "Monday"),
        (["12 March 2020", "march 12"], "12 march  2020"),
        ([""], "anything"),
        (["abc"], ""),
        (["the   quick brown fox"], "the quick brown fox"),
    ]
    for refs, pred in cases:
        mine = lt.anls_score(refs, pred)
        theirs = ref_anls(references=refs, predictions=[pred])["anls"]
        assert mine == pytest.approx(theirs), (refs, pred)


# --------------------------------------------------------- ChartQA (relaxed)


def test_chartqa_parity():
    ref = load_task_utils("chartqa")
    cases = [
        ("42", "40"),        # 5% tolerance: |42-40|/40 = 0.05 -> correct
        ("42.1", "40"),      # just over
        ("10%", "0.1"),      # percent conversion
        ("Blue", "blue"),    # non-numeric exact
        ("0", "0"),          # target 0: falsy -> string compare branch
        ("five", "5"),
    ]
    for pred, target in cases:
        assert lt.relaxed_correctness(pred, target) == \
            ref.relaxed_correctness(pred, target), (pred, target)
        doc = {"type": "human_test", "answer": target}
        assert lt.chartqa_process_results(doc, [pred]) == \
            ref.chartqa_process_results(doc, [pred])


# ---------------------------------------------------------------------- MME


MME_DOCS = [
    {"question_id": "img1", "category": "existence", "answer": "yes",
     "question": "Is there a dog? Please answer yes or no.", "image": None},
    {"question_id": "img1", "category": "existence", "answer": "no",
     "question": "Is there a cat? Please answer yes or no.", "image": None},
    {"question_id": "img2", "category": "code_reasoning", "answer": "yes",
     "question": "Does this code loop? Please answer yes or no.", "image": None},
    {"question_id": "img2", "category": "code_reasoning", "answer": "no",
     "question": "Is it python 2? Please answer yes or no.", "image": None},
]
MME_PREDS = ["Yes.", "no", "yes it does", "unclear"]


def test_mme_parity():
    ref = load_task_utils("mme")
    mine_p, mine_c, ref_p, ref_c = [], [], [], []
    for doc, pred in zip(MME_DOCS, MME_PREDS):
        m = lt.mme_process_results(doc, [pred])
        r = ref.mme_process_results(doc, [pred])
        assert set(m) == set(r)
        for k, v in m.items():
            (mine_p if "percetion" in k else mine_c).append(v)
        for k, v in r.items():
            (ref_p if "percetion" in k else ref_c).append(v)
    assert lt.mme_aggregate_results(mine_p) == ref.mme_aggregate_results(ref_p)
    assert lt.mme_aggregate_results(mine_c) == ref.mme_aggregate_results(ref_c)
    assert lt.mme_parse_pred("yess") == ref.parse_pred_ans("yess")
    assert lt.mme_parse_pred("No, it is not") == ref.parse_pred_ans("No, it is not")
    assert lt.mme_parse_pred("maybe") == ref.parse_pred_ans("maybe")


# --------------------------------------------------- harness end-to-end run


class _ScriptedLM:
    """generate_until stand-in returning canned responses by doc order."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.task_dict = {}

    def generate_until(self, instances):
        return [self.responses[inst.args[3]] for inst in instances]


def test_harness_runs_new_tasks_end_to_end():
    lm = _ScriptedLM(POPE_PREDS)
    res = evaluate(lm, [lt.pope_task(POPE_DOCS)])
    pope = res["pope"]
    assert set(pope) == {
        "pope_accuracy", "pope_precision", "pope_recall", "pope_f1_score",
        "pope_yes_ratio",
    }
    # gt: y n y n y n; preds lower/strip: yes yes no no "yes." maybe —
    # exact string match means only #0 and #3 score ("yes." != "yes",
    # reference semantics, tasks/pope/utils.py:16-18)
    assert pope["pope_accuracy"] == pytest.approx(2 / 6)

    lm = _ScriptedLM(MME_PREDS)
    res = evaluate(lm, [lt.mme_task(MME_DOCS)])
    assert "mme_percetion_score" in res["mme"]
    assert "mme_cognition_score" in res["mme"]

    lm = _ScriptedLM(["blue"])
    res = evaluate(lm, [lt.gqa_task(
        [{"question": "what color?", "answer": "Blue.", "image": None}]
    )])
    assert res["gqa"]["exact_match"] == 1.0


# -------------------------------------------------------------- ScienceQA-IMG


SQA_DOCS = [
    {"question": "Which is a solid?", "hint": "Think about states of matter.",
     "choices": ["water", "rock", "steam"], "answer": 1, "image": None},
    {"question": "Pick the rhyme.", "hint": "",
     "choices": ["cat", "dog"], "answer": 0, "image": None},
    {"question": "Largest planet?", "hint": "",
     "choices": ["Mars", "Jupiter", "Venus", "Pluto"], "answer": 1,
     "image": None},
]
SQA_PREDS = ["B", "A. cat", "Jupiter"]  # letter, 'X. ...' form, raw text (=0)


def test_scienceqa_parity():
    ref = load_task_utils("scienceqa")
    kwargs = {
        "format": "default", "pre_prompt": "",
        "post_prompt": "\nAnswer with the option's letter from the given "
                       "choices directly.",
    }
    for doc, pred in zip(SQA_DOCS, SQA_PREDS):
        assert lt.sqa_doc_to_text(doc) == ref.sqa_doc_to_text(doc, kwargs), doc
        assert lt.sqa_doc_to_target(doc) == ref.sqa_doc_to_target(doc)
        assert lt.sqa_process_results(doc, [pred]) == \
            ref.sqa_process_results(doc, [pred]), (doc, pred)
    # the 'B.' prefix quirk: lowercase prefix does NOT count
    quirk = {"question": "q", "hint": "", "choices": ["x", "y"], "answer": 1,
             "image": None}
    for pred in ["B. y", "b. y", "B", "y"]:
        assert lt.sqa_process_results(quirk, [pred]) == \
            ref.sqa_process_results(quirk, [pred]), pred


# ------------------------------------------------------------------- AI2D


def test_ai2d_parity():
    ref = load_task_utils("ai2d")
    kwargs = {
        "prompt_format": "mcq", "pre_prompt": "",
        "post_prompt": "\nAnswer with the option's letter from the given "
                       "choices directly.",
    }
    doc = {"question": "What is shown?", "options": ["root", "stem", "leaf"],
           "answer": "2", "image": None}
    assert lt.ai2d_doc_to_text(doc) == ref.ai2d_doc_to_text(doc, kwargs)
    # target parity (mcq letter)
    assert ref.ai2d_doc_to_target(doc, "mcq") == "C"
    # exact_match with ignore_case + ignore_punctuation
    assert lt.ai2d_process_results(doc, ["C"])["exact_match"] == 1.0
    assert lt.ai2d_process_results(doc, ["c."])["exact_match"] == 1.0
    assert lt.ai2d_process_results(doc, ["B"])["exact_match"] == 0.0


# -------------------------------------------------------------- SEED-Bench


SEED_DOCS = [
    {"question": "What is in the image?", "choice_a": "a cat",
     "choice_b": "a dog", "choice_c": "a car", "choice_d": "a tree",
     "answer": "B", "data_type": "image", "question_id": 1, "image": []},
    {"question": "What happens next?", "choice_a": "rain", "choice_b": "sun",
     "choice_c": "snow", "choice_d": "wind", "answer": "C",
     "data_type": "video", "question_id": 2, "image": []},
]
SEED_PREDS = ["B. a dog", "snow"]  # multi-char -> first char ('s' != 'C')


def test_seedbench_parity():
    ref = load_task_utils("seedbench")
    mine_all, ref_all = [], []
    for doc, pred in zip(SEED_DOCS, SEED_PREDS):
        m = lt.seed_process_results(doc, [pred])
        r = ref.seed_process_result(doc, [pred])
        assert set(m) == set(r), (set(m), set(r))
        for k in m:
            assert m[k] == r[k], (k, m[k], r[k])
        mine_all.append(m["seed_all"])
        ref_all.append(r["seed_all"])
    assert lt.seed_aggregate(mine_all) == \
        ref.seed_aggregation_result(ref_all)
    assert lt.seed_doc_to_text(SEED_DOCS[0]) == ref.seed_doc_to_text(SEED_DOCS[0])


# -------------------------------------------------------------- OCRBench


OCR_DOCS = [
    {"question": "What does the sign read?", "answer": "Exit",
     "dataset": "IIIT5K", "question_type": "Regular Text Recognition",
     "image": None},
    {"question": "Total amount?", "answer": ["12.50", "$12.50"],
     "dataset": "SROIE", "question_type": "Key Information Extraction",
     "image": None},
    {"question": "Expression?", "answer": "x ^ 2 + 1",
     "dataset": "HME100k",
     "question_type": "Handwritten Mathematical Expression Recognition",
     "image": None},
]
OCR_PREDS = ["the sign reads exit", "it is 12.50 dollars", "x^2+1"]


def test_ocrbench_parity():
    ref = load_task_utils("ocrbench")
    mine, theirs = [], []
    for doc, pred in zip(OCR_DOCS, OCR_PREDS):
        m = lt.ocrbench_process_results(doc, [pred])["ocrbench_accuracy"]
        r = ref.ocrbench_process_results(doc, [pred])["ocrbench_accuracy"]
        assert m["score"] == r["score"], (doc, pred)
        mine.append(m)
        theirs.append(r)
    # headline Final Score is the raw correct count (utils.py:103)
    assert lt.ocrbench_aggregate_accuracy(mine) == \
        float(sum(r["score"] for r in theirs))


# ------------------------------------------------------------ InfoVQA (val)


def test_infovqa_anls_parity():
    from lmms_eval.api.metrics import anls as ref_anls

    cases = [
        (["Infographic title", "the title"], "infographic title"),
        (["42%"], "42 %"),
        (["unanswerable"], "cannot tell"),
    ]
    for refs, pred in cases:
        mine = lt.infovqa_process_results(
            {"answers": refs, "image": None}, [pred])["anls"]
        theirs = ref_anls(references=refs, predictions=[pred])["anls"]
        assert mine == pytest.approx(theirs), (refs, pred)


def test_harness_runs_breadth_round2_tasks():
    lm = _ScriptedLM(SQA_PREDS)
    res = evaluate(lm, [lt.scienceqa_task(SQA_DOCS)])
    assert res["scienceqa_img"]["exact_match"] == pytest.approx(2 / 3)

    lm = _ScriptedLM(SEED_PREDS)
    res = evaluate(lm, [lt.seedbench_task(SEED_DOCS)])
    assert res["seedbench"]["seed_all"] == pytest.approx(1 / 2)
    assert res["seedbench"]["seed_image"] == 1.0
    assert res["seedbench"]["seed_video"] == 0.0

    lm = _ScriptedLM(OCR_PREDS)
    res = evaluate(lm, [lt.ocrbench_task(OCR_DOCS)])
    assert res["ocrbench"]["ocrbench_accuracy"] == 3.0


# ---------------------------------------------------------- VizWiz-VQA (val)


VIZWIZ_DOCS = [
    {"question_id": 0, "question": "what is this?",
     "answers": ["a red apple", "apple", "Apple.", "an apple", "apple",
                 "red apple", "apple", "fruit", "apple", "apple"],
     "image": None},
    {"question_id": 1, "question": "what does the label say?",
     "answers": ["unanswerable"] * 6 + ["can't tell", "unanswerable",
                                        "unsuitable", "unanswerable"],
     "image": None},
]
VIZWIZ_PREDS = ["an apple", "Unanswerable"]


def test_vizwiz_parity():
    ref = load_task_utils("vizwiz_vqa")
    for doc, pred in zip(VIZWIZ_DOCS, VIZWIZ_PREDS):
        mine = lt.vizwiz_process_results(dict(doc), [pred])["exact_match"]
        # the reference mutates doc['answers'] in place — give it a copy
        theirs = ref.vizwiz_vqa_process_results(
            {**doc, "answers": list(doc["answers"])}, [pred]
        )["exact_match"]
        assert mine == pytest.approx(theirs), (doc["question_id"], pred)
    kwargs = {
        "pre_prompt": "",
        "post_prompt": "\nWhen the provided information is insufficient, "
        "respond with 'Unanswerable'.\nAnswer the question using a single "
        "word or phrase.",
    }
    assert lt.vizwiz_doc_to_text(VIZWIZ_DOCS[0]) == \
        ref.vizwiz_vqa_doc_to_text(VIZWIZ_DOCS[0], kwargs)


# ------------------------------------------------------------------- MMMU


MMMU_MC_RESPONSES = [
    "B",                                   # bare letter
    "(C)",                                 # bracketed
    "The answer is A.",                    # letter + period
    "I believe the answer is B because A is wrong",  # two mentions -> last
    "the correct option is (B), not (A)",  # brackets, last occurrence
    "it's clearly the pyramid of Giza shown here",   # content match (>5 words)
    "D.",
    "A B",                                 # two space-delimited candidates
]
MMMU_OPEN_RESPONSES = [
    "The answer is 42.",
    "so the result is 3.14159 approximately",
    "x = 1,250",
    "therefore the cell is a neuron",
    "It could be mitosis. Thus the answer is meiosis",
    "7",
    "the final answer = -2.5e3",
    "no indicators here at all",
]


def test_mmmu_parsing_parity():
    import random as pyrandom

    from visper_lm_tpu.eval import mmmu as mm

    ref = load_task_utils("mmmu")
    options = ["Eiffel Tower", "Big Ben", "pyramid of Giza", "Colosseum"]
    letters = ["A", "B", "C", "D"]
    index2ans = dict(zip(letters, options))
    for resp in MMMU_MC_RESPONSES:
        mine = mm.parse_multi_choice_response(resp, letters, index2ans)
        theirs = ref.parse_multi_choice_response(resp, list(letters),
                                                 dict(index2ans))
        assert mine == theirs, resp
    # the random fallback: same global-`random` draw under the same seed
    pyrandom.seed(7)
    mine = mm.parse_multi_choice_response("xyz", letters, index2ans)
    pyrandom.seed(7)
    theirs = ref.parse_multi_choice_response("xyz", list(letters),
                                             dict(index2ans))
    assert mine == theirs

    for resp in MMMU_OPEN_RESPONSES:
        assert sorted(map(str, mm.parse_open_response(resp))) == \
            sorted(map(str, ref.parse_open_response(resp))), resp
    for s in ["1,234", "3.14", "-2e5", "0.5%", "apple", "B", " x "]:
        assert mm.normalize_str(s) == ref.normalize_str(s), s
        assert mm.extract_numbers(s) == ref.extract_numbers(s), s


def test_mmmu_scoring_and_aggregation_parity():
    from visper_lm_tpu.eval import mmmu as mm

    ref = load_task_utils("mmmu")
    docs = [
        {"id": "validation_Art_1", "question_type": "multiple-choice",
         "options": "['red', 'blue', 'green']", "answer": "B",
         "question": "What color? <image 1>"},
        {"id": "validation_Art_2", "question_type": "multiple-choice",
         "options": "['cat', 'dog']", "answer": "A",
         "question": "Which animal? <image 1>"},
        {"id": "validation_Math_3", "question_type": "open",
         "options": "[]", "answer": "42",
         "question": "Compute. <image 1>"},
        {"id": "validation_Physics_4", "question_type": "open",
         "options": "[]", "answer": ["9.8", "9.81"],
         "question": "g? <image 1>"},
    ]
    # NOTE: a short unparseable response ("dog") would hit the RANDOM
    # fallback on both sides with independent draws — use a >5-word response
    # so the content-match stage fires deterministically
    preds = ["The answer is B.", "the animal shown in the picture is a dog",
             "so we get 42", "about 3.7"]
    mine_recs, ref_recs = [], []
    for doc, pred in zip(docs, preds):
        m = mm.mmmu_process_results(doc, [pred])["mmmu_acc"]
        r = ref.mmmu_process_results(doc, [pred])["mmmu_acc"]
        assert m["subdomain"] == r["subdomain"]
        if isinstance(m["parsed_pred"], list):
            assert sorted(map(str, m["parsed_pred"])) == \
                sorted(map(str, r["parsed_pred"]))
        else:
            assert m["parsed_pred"] == r["parsed_pred"]
        mine_recs.append(m)
        ref_recs.append(r)
    mine_overall = mm.mmmu_aggregate_results(mine_recs)
    theirs_overall = ref.mmmu_aggregate_results(ref_recs)
    assert mine_overall == pytest.approx(theirs_overall)
    # doc_to_text parity (options literal-string quirk + <image i> replacement)
    for doc in docs:
        assert mm.mmmu_doc_to_text(doc) == ref.mmmu_doc_to_text(doc), doc["id"]


# ---------------------------------------------------------------- MMBench


def _ref_mmbench_evaluator():
    """Import the fork's MMBench_Evaluator read-only, stubbing the GPT-API
    deps (openai/azure/cv2) its module imports but the rule-based path never
    touches."""
    import types

    class _Anything:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return self

        def __getattr__(self, name):
            return _Anything()

    for name in ("openai", "cv2"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            if name == "openai":
                m.AzureOpenAI = _Anything
            sys.modules[name] = m
    if "azure" not in sys.modules:
        az = types.ModuleType("azure")
        ident = types.ModuleType("azure.identity")
        for attr in ("AzureCliCredential", "ChainedTokenCredential",
                     "DefaultAzureCredential", "get_bearer_token_provider"):
            setattr(ident, attr, _Anything)
        az.identity = ident
        sys.modules["azure"] = az
        sys.modules["azure.identity"] = ident
    from lmms_eval.tasks.mmbench.mmbench_evals import MMBench_Evaluator

    return MMBench_Evaluator(sys_prompt="There are several options:")


CASES = [
    ("B", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("The answer is (B).", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("A", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("A is a good day to answer", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("I would pick C: because", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("the blue one", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("blue or green", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("D.", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("(C).", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("nothing matches here", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("A B", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
    ("answer: B, final", {"A": "red", "B": "blue", "C": "green", "D": "grey"}),
]


@pytest.mark.skipif(lmms_eval is None, reason="reference lmms-eval not importable")
def test_mmbench_infer_parity():
    """Letter extraction matches the fork's can_infer rule ladder exactly."""
    ev = _ref_mmbench_evaluator()
    for answer, choices in CASES:
        ref = ev.can_infer(answer, dict(choices))
        got = lt.mmbench_infer(answer, dict(choices))
        assert got == ref, (answer, got, ref)


@pytest.mark.skipif(lmms_eval is None, reason="reference lmms-eval not importable")
def test_mmbench_circular_parity():
    """Per-question circular hits match the fork's eval_sub_data on groups
    where every rotation rule-resolves (the no-GPT regime)."""
    import numpy as np
    import pandas as pd

    ev = _ref_mmbench_evaluator()
    rng = np.random.default_rng(0)
    opts = ["red", "blue", "green", "grey"]
    records = []
    for base in range(12):
        n_rot = int(rng.integers(2, 5))
        correct = int(rng.integers(0, 4))
        for k in range(n_rot):
            rot = [opts[(j + k) % 4] for j in range(4)]
            ans_letter = "ABCD"[rot.index(opts[correct])]
            # half the questions answered consistently right, half with one
            # wrong rotation; plus affixed letter forms for variety
            right = base % 2 == 0 or k != 1
            pred_letter = ans_letter if right else "ABCD"[
                (rot.index(opts[correct]) + 1) % 4
            ]
            form = [pred_letter, f"({pred_letter}).", f"{pred_letter}."][k % 3]
            records.append({
                "index": base + k * 1_000_000,
                "question": f"q{base}",
                "prediction": form,
                "answer": ans_letter,
                "category": "cat",
                "l2_category": "l2",
                "A": rot[0], "B": rot[1], "C": rot[2], "D": rot[3],
            })

    # reference: eval_sub_data per circular group
    df = pd.DataFrame(records)
    answer_map = {r["index"]: r["answer"] for r in records}
    ref_hits = {}
    for base in sorted(set(int(r["index"]) % 1_000_000 for r in records)):
        sub = df[df["index"] % 1_000_000 == base]
        ref_hits[base] = ev.eval_sub_data(sub, answer_map)

    groups = lt._mmbench_groups(records)
    got_hits = {b: lt._mmbench_hit(rows)[0] for b, rows in groups.items()}
    assert got_hits == ref_hits, (got_hits, ref_hits)
    ref_acc = 100.0 * sum(ref_hits.values()) / len(ref_hits)
    assert abs(lt.mmbench_aggregate_circular(records) - ref_acc) < 1e-9


def test_mmbench_task_end_to_end():
    """mmbench_task through the mini harness: circular scoring + prompt shape."""
    from PIL import Image

    docs = []
    for base in range(3):
        for k in range(2):
            rot = ["x", "y"] if k == 0 else ["y", "x"]
            ans = "AB"[rot.index("x")]
            docs.append({
                "index": base + k * 1_000_000,
                "question": f"pick x ({base})",
                "hint": float("nan"),
                "answer": ans,
                "A": rot[0], "B": rot[1],
                "category": "synthetic", "L2-category": "synthetic",
                "image": Image.new("RGB", (8, 8)),
            })

    class EchoLM:
        task_dict = {}

        def generate_until(self, instances):
            # answer 'A' always: correct only for questions where x is at A
            # in EVERY rotation (never, given the rotations) -> acc 0; then
            # an oracle LM answering the right letter -> acc 100
            return ["A" for _ in instances]

    task = lt.mmbench_task(docs)
    out = evaluate(EchoLM(), [task])["mmbench_en_dev"]
    assert out["mmbench_circular_acc"] == 0.0
    assert out["mmbench_unresolved_rate"] == 0.0

    class OracleLM:
        task_dict = {}

        def generate_until(self, instances):
            return [d["answer"] for d in docs]

    out = evaluate(OracleLM(), [task])["mmbench_en_dev"]
    assert out["mmbench_circular_acc"] == 100.0
    prompt = task.doc_to_text(docs[0])
    assert "There are several options:" in prompt
    assert prompt.endswith("letter from the given choices directly.")
    assert "nan" not in prompt  # hint was nan -> omitted


@pytest.mark.skipif(lmms_eval is None, reason="reference lmms-eval not importable")
def test_multidocvqa_parity():
    """MP-DocVQA uses its own Evaluator (tasks/multidocvqa/utils.py), whose
    ANLS differs from api/metrics.anls (distance over preprocessed strings,
    'none' -> 0); pin both metrics against it."""
    ref = load_task_utils("multidocvqa")
    ev = ref.Evaluator(case_sensitive=False)
    cases = [
        (["The Answer"], "the answer"),
        (["answer", "reply"], "replyy"),
        (["long ground truth"], "short"),
        (["x"], "none"),
        (["abc"], ""),
        (["Mixed Case  "], "  mixed case"),
        (["95.6%"], "95.6"),
    ]
    for gts, pred in cases:
        theirs = ev.get_metrics([gts], [pred])
        assert lt.multidocvqa_anls(gts, pred) == pytest.approx(
            theirs["anls"][0]
        ), (gts, pred)
        assert lt.multidocvqa_accuracy(gts, pred) == pytest.approx(
            theirs["accuracy"][0]
        ), (gts, pred)

    # process_results handles the HF stringified answers column
    doc = {"answers": "['a', 'b']", "questionId": 3}
    out = lt.multidocvqa_process_results(doc, ["b"])
    assert out["accuracy"] == 1.0 and out["anls"] == 1.0


def test_stvqa_submission_task(tmp_path):
    path = str(tmp_path / "sub.json")
    docs = [
        {"question_id": 1, "question": "what?", "image": None},
        {"question_id": 2, "question": "which?", "image": None},
    ]

    class LM:
        task_dict = {}

        def generate_until(self, instances):
            return ["red", "blue"]

    task = lt.stvqa_task(docs, submission_path=path)
    out = evaluate(LM(), [task])["stvqa"]
    assert out["submission"] == 2.0
    import json

    rows = json.load(open(path))
    assert rows == [{"question_id": 1, "answer": "red"},
                    {"question_id": 2, "answer": "blue"}]
    # prompt parity: the fork's default post_prompt
    assert task.doc_to_text(docs[0]).endswith(
        "Answer the question using a single word or phrase.")


@pytest.mark.skipif(lmms_eval is None, reason="reference lmms-eval not importable")
def test_websrc_f1_parity():
    """WebSRC's squad-style F1 is SET-based over regex tokens with isolated
    punctuation; pin scorer + domain-weighted aggregation against the fork."""
    ref = load_task_utils("websrc")
    cases = [
        ("The Answer", "the answer"),
        ("JB Hi-Fi store", "jb hi-fi"),
        ("42", "42."),
        ("open 9am", "closed"),
        ("", "anything"),
        ("word word word", "word"),
    ]
    for ans, pred in cases:
        _, m = ref.evaluate_websrc(
            [{"answer": ans, "parsed_pred": pred}]
        )
        assert lt.websrc_f1(ans, pred) == pytest.approx(m["f1"]), (ans, pred)

    samples = [
        {"answer": "a b", "parsed_pred": "a b", "domain": "auto"},
        {"answer": "a b", "parsed_pred": "a", "domain": "auto"},
        {"answer": "x", "parsed_pred": "y", "domain": "book"},
    ]
    theirs = ref.websrc_aggregate_results(
        [{"answer": s["answer"], "parsed_pred": s["parsed_pred"],
          "domain": s["domain"]} for s in samples]
    )
    ours = lt.websrc_aggregate(
        [{"f1": lt.websrc_f1(s["answer"], s["parsed_pred"]),
          "domain": s["domain"]} for s in samples]
    )
    assert ours == pytest.approx(theirs)


@pytest.mark.skipif(lmms_eval is None, reason="reference lmms-eval not importable")
def test_iconqa_prompt_parity():
    """IconQA's three question-type prompts must match the fork's doc_to_text
    with the default model_specific_prompt_kwargs."""
    ref = load_task_utils("iconqa")
    kwargs = {
        "pre_prompt": "",
        "statement": "Given a set of images and a question, please provide "
        "the answer to the question.\n",
        "options_statement": "Question: {question}.\nOptions:\n{options}\n"
        "Please answer with the option letter from the given choices "
        "directly.",
        "freeform_statement": "Question: {question}.\nPlease answer the "
        "question using a single word or phrase.",
    }
    docs = [
        {"question": "which is bigger", "ques_type": "choose_img"},
        {"question": "what shape", "ques_type": "choose_txt",
         "choices": "circle,square,star"},
        {"question": "how many dots", "ques_type": "fill_in_blank"},
    ]
    for d in docs:
        assert lt.iconqa_doc_to_text(d) == ref.doc_to_text(d, kwargs), d
