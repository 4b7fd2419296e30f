"""Data pipeline tests: preprocessing semantics, splice plans, dataset batching."""

import json

import numpy as np
import pytest

from visper_lm_tpu import conversation as conv_lib
from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, SEG_IMAGE, SEG_PAD, SEG_TASK, SEG_TEXT
from visper_lm_tpu.data.collate import build_splice_plan
from visper_lm_tpu.data.mm_utils import (
    expand2square,
    select_best_resolution,
    tokenizer_image_token,
)
from visper_lm_tpu.data.preprocess import preprocess, preprocess_multimodal


class FakeTokenizer:
    """Whitespace+special-token tokenizer with a BOS, mimicking the HF interface.

    Additive (len(tok(a+b)) == len(tok(a)) + len(tok(b)) - 1) so the reference's
    round-length arithmetic holds; real-tokenizer parity is covered by
    test_hf_parity.py when tokenizers are available.
    """

    bos_token_id = 1
    _SPECIALS = ("<|end|>", "<|eot_id|>", "</s>", "<|system|>", "<|user|>",
                 "<|assistant|>", "<|start_header_id|>", "<|end_header_id|>")

    def _words(self, text):
        import re

        pattern = "(" + "|".join(re.escape(s) for s in self._SPECIALS) + "|\\n)"
        parts = re.split(pattern, text)
        words = []
        for p in parts:
            if p in self._SPECIALS or p == "\n":
                words.append(p)
            else:
                words.extend(w for w in p.split(" ") if w)
        return words

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [self.bos_token_id] + [
            100 + (hash(w) % 400) for w in self._words(text)
        ]
        return r

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(str(i) for i in ids)


def test_tokenizer_image_token_inserts_sentinel():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("hello <image> world", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids[0] == tok.bos_token_id
    # image token replaces the <image> chunk boundary
    idx = ids.index(IMAGE_TOKEN_INDEX)
    assert idx > 0 and idx < len(ids) - 1


def test_preprocess_multimodal_hoists_image():
    src = [[{"from": "human", "value": "what is this <image> thing"},
            {"from": "gpt", "value": "a cat"}]]
    out = preprocess_multimodal(src)
    assert out[0][0]["value"].startswith("<image>\n")
    assert "<image>" not in out[0][0]["value"][8:]


@pytest.mark.parametrize("template", ["llava_phi_3", "llava_llama_3", "vicuna_v1"])
def test_preprocess_masks_prompt_supervises_answer(template):
    tok = FakeTokenizer()
    src = [[{"from": "human", "value": "<image>\ndescribe"},
            {"from": "gpt", "value": "a small red fox"}]]
    ex = preprocess(src, tok, template, has_image=True)[0]
    assert len(ex.input_ids) == len(ex.labels)
    n_supervised = sum(1 for l in ex.labels if l != IGNORE_INDEX)
    # the answer tokens must be supervised, the system+prompt masked
    assert 0 < n_supervised < len(ex.labels)
    # supervised positions must carry the original token ids
    for t, l in zip(ex.input_ids, ex.labels):
        if l != IGNORE_INDEX:
            assert l == t


def test_preprocess_plain():
    tok = FakeTokenizer()
    src = [[{"from": "human", "value": "<image>"},
            {"from": "gpt", "value": "a photo of a dog"}]]
    ex = preprocess(src, tok, "plain", has_image=True)[0]
    assert IMAGE_TOKEN_INDEX in ex.input_ids
    n_supervised = sum(1 for l in ex.labels if l != IGNORE_INDEX)
    assert n_supervised >= 4  # the caption


def test_splice_plan_layout_and_truncation():
    ids = [1, 2, IMAGE_TOKEN_INDEX, 3, 4, 5]
    labels = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 3, 4, 5]
    plan = build_splice_plan(
        ids, labels, 20, num_image_tokens=4, num_task_tokens=2, num_tasks=3
    )
    types = plan.token_type.tolist()
    assert types[:2] == [SEG_TEXT, SEG_TEXT]
    assert types[2:6] == [SEG_IMAGE] * 4
    assert types[6:12] == [SEG_TASK] * 6
    assert types[12:15] == [SEG_TEXT] * 3
    assert types[15:] == [SEG_PAD] * 5
    assert plan.seq_length == 15
    assert plan.src_index[2:6].tolist() == [0, 1, 2, 3]
    assert plan.src_index[6:12].tolist() == [0, 1, 2, 3, 4, 5]
    # labels: only trailing text supervised
    assert plan.labels[12:15].tolist() == [3, 4, 5]
    assert all(l == IGNORE_INDEX for l in plan.labels[:12])

    # truncation
    plan2 = build_splice_plan(ids, labels, 8, num_image_tokens=4,
                              num_task_tokens=2, num_tasks=3)
    assert plan2.seq_length == 8


def test_select_best_resolution_reference_cases():
    grid = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]
    # tall image prefers tall grid
    assert select_best_resolution((300, 900), grid) == (336, 1008)
    # wide image prefers wide grid
    assert select_best_resolution((900, 300), grid) == (1008, 336)


def test_expand2square():
    from PIL import Image

    img = Image.new("RGB", (30, 10), (255, 0, 0))
    sq = expand2square(img, (0, 0, 0))
    assert sq.size == (30, 30)


def test_dataset_batching(tmp_path):
    from visper_lm_tpu.data.dataset import BatchIterator, DataConfig, SupervisedDataset
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (50, 40), (10, 200, 30)).save(img_dir / "a.jpg")

    records = []
    for i in range(6):
        rec = {
            "conversations": [
                {"from": "human", "value": f"<image>\nquestion {i}"},
                {"from": "gpt", "value": f"answer {i} with words"},
            ]
        }
        if i % 2 == 0:
            rec["image"] = "a.jpg"
        else:
            rec["conversations"][0]["value"] = f"question {i}"
        records.append(rec)
    data_path = tmp_path / "data.json"
    json.dump(records, open(data_path, "w"))

    vlm_cfg = tiny_test_vlm(distill=True)
    dcfg = DataConfig(
        data_path=str(data_path), image_folder=str(img_dir),
        image_size=vlm_cfg.vision.image_size, model_max_length=128,
    )
    ds = SupervisedDataset(dcfg, FakeTokenizer(), vlm_cfg)
    assert len(ds) == 6
    ml = ds.modality_lengths
    assert sum(1 for l in ml if l > 0) == 3

    it = BatchIterator(
        ds, batch_size=2, seq_buckets=(64, 128), seed=0,
        distill_tasks=("gen", "depth", "seg"),
    )
    batches = list(it)
    assert len(batches) == 3
    b0 = batches[0]
    assert b0["text_ids"].shape[0] == 2
    assert b0["images"].shape == (2, 28, 28, 3)
    assert set(b0).issuperset({"gen_mask", "depth_mask", "seg_mask", "labels"})


def test_batch_iterator_workers_match_inline(tmp_path):
    """num_workers > 0 must yield byte-identical batches in the same order."""
    import numpy as np

    from visper_lm_tpu.data.dataset import BatchIterator, DataConfig, SupervisedDataset
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (50, 40), (10, 200, 30)).save(img_dir / "a.jpg")
    records = []
    for i in range(8):
        rec = {
            "image": "a.jpg",
            "conversations": [
                {"from": "human", "value": f"<image>\nq {i}"},
                {"from": "gpt", "value": f"a {i}"},
            ],
        }
        records.append(rec)
    data_path = tmp_path / "d.json"
    json.dump(records, open(data_path, "w"))
    vlm_cfg = tiny_test_vlm(distill=False)
    dcfg = DataConfig(
        data_path=str(data_path), image_folder=str(img_dir),
        image_size=vlm_cfg.vision.image_size, model_max_length=128,
    )
    ds = SupervisedDataset(dcfg, FakeTokenizer(), vlm_cfg)

    def batches(workers):
        it = BatchIterator(ds, batch_size=2, seq_buckets=(64, 128), seed=3,
                           num_workers=workers)
        return [{k: v for k, v in b.items() if k != "pil_images"} for b in it]

    ref, par = batches(0), batches(3)
    assert len(ref) == len(par) == 4
    for b0, b1 in zip(ref, par):
        assert set(b0) == set(b1)
        for k in b0:
            np.testing.assert_array_equal(np.asarray(b0[k]), np.asarray(b1[k]))


def test_prefetch_iterator_order_and_errors():
    from visper_lm_tpu.data.prefetch import PrefetchIterator

    assert list(PrefetchIterator(range(100), depth=4)) == list(range(100))
    assert list(PrefetchIterator(iter([]), depth=1)) == []

    def boom():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    it = PrefetchIterator(boom(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="decode failed"):
        next(it)
    # closed after error: exhausted
    with _pytest.raises(StopIteration):
        next(it)

    # close() mid-stream terminates the producer without raising
    it = PrefetchIterator(range(10_000), depth=2)
    assert next(it) == 0
    it.close()
