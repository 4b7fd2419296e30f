"""Native caption metrics (eval/caption_metrics.py) vs independent oracles.

pycocoevalcap itself is not installable here, so parity is pinned three ways:
BLEU against NLTK's corpus_bleu (mathematically the same corpus statistic —
clipped modified precision, closest effective reference length, the same
brevity penalty — up to pycocoevalcap's tiny/small epsilon guards); ROUGE-L's
LCS core against Google's rouge_score package (then the beta=1.2 F-measure is
checked by hand); CIDEr-D against fully hand-derived closed-form fixtures
exercising idf, count clipping, the bigram-length gaussian and the x10/order
averaging. PTB tokenization is pinned on canonical PTB behaviors (clitics,
punctuation isolation, hyphen retention).
"""

import math

import numpy as np
import pytest

from visper_lm_tpu.eval.caption_metrics import (
    bleu_score,
    cider_d,
    compute_caption_metric,
    ptb_tokenize,
    ptb_tokenize_caption,
    rouge_l,
)


# ------------------------------------------------------------- tokenizer


@pytest.mark.parametrize("raw,expected", [
    ("A man's bike.", "a man 's bike"),
    ("Don't stop; it's fun!", "do n't stop it 's fun"),
    ("A well-known dog -- running...", "a well-known dog running"),
    ("Two dogs' toys, 1,000 balls.", "two dogs toys 1,000 balls"),
    ('He said "hi" loudly.', "he said hi loudly"),
    ("They'll we're I'm you've she'd", "they 'll we 're i 'm you 've she 'd"),
    ("a cat (on a mat)", "a cat on a mat"),
    ("line\nbreaks stay spaces", "line breaks stay spaces"),
])
def test_ptb_tokenize_fixtures(raw, expected):
    assert ptb_tokenize_caption(raw) == expected


def test_ptb_tokenize_dict_shape():
    out = ptb_tokenize({1: ["A cat.", "The cat!"], 2: ["Dogs run."]})
    assert out == {1: ["a cat", "the cat"], 2: ["dogs run"]}


# ------------------------------------------------------------------ BLEU


def _bleu_corpora():
    gts = {
        0: ["a cat sits on the mat", "there is a cat on a mat"],
        1: ["a man rides a red bicycle down the street",
            "the man is riding a bicycle"],
        2: ["two dogs play with a ball in the park",
            "dogs are playing with a ball"],
    }
    res = {
        0: ["a cat sits on a mat"],
        1: ["a man rides a bicycle down the street"],
        2: ["two dogs play with a ball in a park"],
    }
    return gts, res


def test_bleu_matches_nltk_corpus_bleu():
    from nltk.translate.bleu_score import corpus_bleu

    gts, res = _bleu_corpora()
    bleus, _ = bleu_score(gts, res, n=4)
    refs_list = [[r.split() for r in gts[k]] for k in gts]
    hyps = [res[k][0].split() for k in gts]
    for k in range(1, 5):
        w = tuple([1.0 / k] * k)
        ref = corpus_bleu(refs_list, hyps, weights=w)
        np.testing.assert_allclose(bleus[k - 1], ref, rtol=1e-6, atol=1e-9)


def test_bleu_perfect_match_is_one():
    gts = {0: ["a cat sits on the mat"], 1: ["dogs play in the park today"]}
    res = {0: ["a cat sits on the mat"], 1: ["dogs play in the park today"]}
    bleus, _ = bleu_score(gts, res)
    np.testing.assert_allclose(bleus, [1.0] * 4, atol=1e-6)


def test_bleu_brevity_penalty_applied_to_all_orders():
    # hyp shorter than closest ref: every order carries exp(1 - r/c)
    gts = {0: ["a b c d e f"], 1: ["g h i j k l"]}
    res = {0: ["a b c d"], 1: ["g h i j"]}
    bleus, _ = bleu_score(gts, res)
    bp = math.exp(1 - 6 / 4)
    np.testing.assert_allclose(bleus[0], bp, rtol=1e-6)
    np.testing.assert_allclose(bleus[3], bp, rtol=1e-6)


# --------------------------------------------------------------- ROUGE-L


def test_rouge_lcs_core_matches_rouge_score_package():
    from rouge_score import rouge_scorer

    scorer = rouge_scorer.RougeScorer(["rougeL"])
    hyp = "a cat sits on a mat"
    ref = "there is a cat on the mat"
    s = scorer.score(ref, hyp)["rougeL"]
    lcs = 4  # "a cat on mat"
    np.testing.assert_allclose(s.precision, lcs / 6, rtol=1e-9)
    np.testing.assert_allclose(s.recall, lcs / 7, rtol=1e-9)
    # our rouge_l with a single ref applies F_{beta=1.2} to the same p/r
    score, _ = rouge_l({0: [ref]}, {0: [hyp]})
    p, q = lcs / 6, lcs / 7
    beta = 1.2
    np.testing.assert_allclose(
        score, (1 + beta ** 2) * p * q / (q + beta ** 2 * p), rtol=1e-9
    )


def test_rouge_max_over_refs_and_mean_over_images():
    # per pycocoevalcap rouge.py: max precision and max recall are taken over
    # refs INDEPENDENTLY before the F-measure
    gts = {0: ["a b c d", "a b x"], 1: ["e f"]}
    res = {0: ["a b c"], 1: ["e f"]}
    beta = 1.2
    # img0: vs ref1 lcs=3 -> p=1, r=3/4; vs ref2 lcs=2 -> p=2/3, r=2/3
    p, q = 1.0, 0.75
    f0 = (1 + beta ** 2) * p * q / (q + beta ** 2 * p)
    score, per = rouge_l(gts, res)
    np.testing.assert_allclose(per[0], f0, rtol=1e-9)
    np.testing.assert_allclose(per[1], 1.0, rtol=1e-9)
    np.testing.assert_allclose(score, (f0 + 1.0) / 2, rtol=1e-9)


# --------------------------------------------------------------- CIDEr-D


def test_cider_d_perfect_two_gram_corpus():
    """Hand-derived: 2 images, 2-token captions, exact matches. Unigram and
    bigram cosines are 1, 3/4-gram vectors are empty (0), so each image
    scores (1+1+0+0)/4 * 10 = 5."""
    gts = {0: ["a b"], 1: ["c d"]}
    res = {0: ["a b"], 1: ["c d"]}
    score, per = cider_d(gts, res)
    np.testing.assert_allclose(per, [5.0, 5.0], rtol=1e-9)
    np.testing.assert_allclose(score, 5.0, rtol=1e-9)


def test_cider_d_clipping_and_idf_hand_computed():
    """Image 0: pred 'a a b' vs ref 'a b c' — exercises count clipping
    (pred's a:2 clips to ref's a:1) and an out-of-reference bigram ('a a',
    df=0 -> log(max(1,0))=0). All df=1 -> idf weight log(2) per count.

    unigram cosine: clipped dot = 2 log2^2, norms sqrt(5)log2 and sqrt(3)log2
      -> 2/sqrt(15)
    bigram cosine: only 'a b' overlaps -> log2^2 / (sqrt2 log2 * sqrt2 log2)
      = 1/2; bigram lengths equal -> gaussian penalty 1.
    image0 = (2/sqrt(15) + 1/2)/4*10 ; image1 (exact 3-token) = 3/4*10."""
    gts = {0: ["a b c"], 1: ["d e f"]}
    res = {0: ["a a b"], 1: ["d e f"]}
    score, per = cider_d(gts, res)
    img0 = (2 / math.sqrt(15) + 0.5) / 4 * 10
    np.testing.assert_allclose(per[0], img0, rtol=1e-9)
    np.testing.assert_allclose(per[1], 7.5, rtol=1e-9)
    np.testing.assert_allclose(score, (img0 + 7.5) / 2, rtol=1e-9)


def test_cider_d_length_gaussian():
    """A length mismatch multiplies every order by exp(-delta^2/(2*36)),
    delta in BIGRAM counts (cider_scorer.py counts length at n==1)."""
    gts = {0: ["a b c d e"], 1: ["x y"]}
    res = {0: ["a b"], 1: ["x y"]}
    _, per = cider_d(gts, res)
    # image0: delta = 1 - 4 = -3 bigram counts; unigram cosine:
    # clipped dot 2log2^2 / (sqrt2 * sqrt5 log2^2) = 2/sqrt(10);
    # bigram 'a b': log2^2/(1*2 log2^2) = 1/2 (ref norm sqrt(4) log2 = 2log2)
    pen = math.exp(-9 / 72)
    img0 = (2 / math.sqrt(10) * pen + 0.5 * pen) / 4 * 10
    np.testing.assert_allclose(per[0], img0, rtol=1e-9)


# ------------------------------------------------- task-level integration


def test_caption_task_end_to_end():
    import visper_lm_tpu.eval.lmms_tasks as lt
    from visper_lm_tpu.eval.harness import evaluate

    docs = [
        {"image": None, "image_id": 42,
         "answer": ["A cat sits on the mat.", "There is a cat on a mat."]},
        {"image": None, "image_id": 43,
         "answer": ["A man rides a red bicycle."]},
    ]
    preds = ["a cat sits on a mat", "a man rides a bicycle"]

    class LM:
        task_dict = {}

        def generate_until(self, instances):
            return [preds[inst.args[3]] for inst in instances]

    res = evaluate(LM(), [lt.coco_cap_task(docs)])["coco2017_cap_val"]
    assert set(res) == {f"coco_{m}" for m in lt.CAPTION_METRICS}
    # spot-check one metric against the module API called directly
    gts = {42: docs[0]["answer"], 43: docs[1]["answer"]}
    rr = {42: [preds[0]], 43: [preds[1]]}
    np.testing.assert_allclose(
        res["coco_CIDEr"], compute_caption_metric("CIDEr", gts, rr), rtol=1e-9
    )
    assert 0 < res["coco_Bleu_1"] <= 1
    # family prefixes for the other three tasks
    assert "flickr_Bleu_4" in [
        k for k in lt.flickr30k_task(docs).metric_aggregation
    ]
    assert any(k.startswith("nocaps_") for k in lt.nocaps_task(docs).metric_aggregation)
    assert any(k.startswith("textcaps_") for k in lt.textcaps_task(docs).metric_aggregation)
