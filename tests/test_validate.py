"""Turnkey checkpoint-validation dress rehearsal (VERDICT r3 #4).

Runs the EXACT `python -m visper_lm_tpu.eval.validate` command path — argv in,
scores table out — over a synthetic HF checkpoint written by
checkpoint/hf_export.save_hf_checkpoint, including the torch logit-parity
gate (transformers instantiates the exported decoder as a real
LlamaForCausalLM). The day the shi-labs weights are reachable, validation is
this one invocation with real paths.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from visper_lm_tpu.checkpoint.hf_export import save_hf_checkpoint
from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.models.vlm import init_vlm


def _tiny_tokenizer(save_dir):
    """A real saved-to-disk HF tokenizer (WordLevel) so AutoTokenizer loads it
    from the checkpoint dir like it would for a downloaded model."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    words = (
        ["<unk>", "<s>", "</s>", "<image>"]
        + ["(A)", "(B)", "(C)", "(D)", "A", "B", "C", "D"]
        + [f"w{i}" for i in range(100)]
    )
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>",
    )
    fast.save_pretrained(save_dir)
    return fast


def _write_cvbench(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(root, "test.jsonl"), "w") as f:
        for i, (task, source) in enumerate(
            [("Count", "ADE20K"), ("Depth", "Omni3D"),
             ("Relation", "COCO"), ("Distance", "Omni3D")]
        ):
            fn = f"img_{i}.png"
            Image.fromarray(
                rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
            ).save(os.path.join(root, fn))
            f.write(json.dumps({
                "filename": fn,
                "prompt": f"w{i} w{i + 1} question (A) w2 (B) w3",
                "answer": "(A)",
                "task": task,
                "source": source,
            }) + "\n")


def _write_mmstar(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(1)
    path = os.path.join(root, "records.jsonl")
    with open(path, "w") as f:
        for i in range(3):
            fn = os.path.join(root, f"m_{i}.png")
            Image.fromarray(
                rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
            ).save(fn)
            f.write(json.dumps({
                "image": fn,
                "question": f"w{i} choose (A) w4 (B) w5",
                "answer": "B",
                "category": "coarse perception",
                "l2_category": "image scene and topic",
            }) + "\n")
    return path


def test_validate_command_dress_rehearsal(tmp_path, capsys):
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)

    ckpt = str(tmp_path / "ckpt")
    save_hf_checkpoint(ckpt, params, cfg)
    _tiny_tokenizer(ckpt)
    _write_cvbench(str(tmp_path / "cvbench"))
    mmstar_jsonl = _write_mmstar(str(tmp_path / "mmstar"))

    from visper_lm_tpu.eval import validate as V

    out = str(tmp_path / "report" / "scores.json")
    rc = V.main([
        "--ckpt", ckpt,
        "--tasks", "cvbench,mmstar",
        "--cvbench-path", str(tmp_path / "cvbench"),
        "--mmstar-path", mmstar_jsonl,
        "--batch-size", "2",
        "--max-new-tokens", "4",
        "--hf-parity", "require",
        "--out", out,
    ])
    assert rc == 0
    report = json.load(open(out))
    # the torch parity gate actually ran and passed
    assert "logit_parity" in report
    assert report["logit_parity"]["max_abs_diff"] >= 0.0
    # both loaders produced BASELINE-comparable score tables
    assert set(report["cvbench"]) >= {"Overall", "2D", "3D"}
    assert "final score" in report["mmstar"]
    # answer files landed next to the report
    assert os.path.exists(tmp_path / "report" / "cvbench_answers.jsonl")


def test_save_hf_checkpoint_roundtrip_is_lossless(tmp_path):
    """from_hf_checkpoint prefers the embedded visper_config: the restored
    VLMConfig equals the exported one exactly (no lossy reference-field
    reconstruction for our own exports)."""
    from visper_lm_tpu.api import VisperModel

    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "ckpt")
    save_hf_checkpoint(ckpt, params, cfg)
    model = VisperModel.from_hf_checkpoint(ckpt)
    assert model.cfg == cfg
