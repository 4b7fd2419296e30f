"""Parity-critical semantics: template strings, head input slicing, multi-image
splice, task-token table pooling."""

import numpy as np

import jax
import jax.numpy as jnp

from visper_lm_tpu import conversation as conv_lib
from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX, SEG_IMAGE
from visper_lm_tpu.data.collate import build_splice_plan
from visper_lm_tpu.models.vlm import build_task_token_table, head_input_tokens, init_vlm


def test_template_golden_strings():
    """Rendered prompts must match the reference byte-for-byte (they determine
    tokenization). Golden strings derived from conversation.py:213-245 semantics."""
    c = conv_lib.conv_templates["llava_phi_3"].copy()
    c.append_message(c.roles[0], "<image>\nWhat is this?")
    c.append_message(c.roles[1], None)
    assert c.get_prompt() == (
        "<|system|>\nYou are a helpful AI assistant.<|end|>"
        "\n<|user|>\n<image>\nWhat is this?<|end|>"
        "\n<|assistant|>\n"
    )

    c = conv_lib.conv_templates["llava_llama_3"].copy()
    c.append_message(c.roles[0], "hi")
    c.append_message(c.roles[1], "hello")
    assert c.get_prompt() == (
        "<|start_header_id|>system<|end_header_id|>\n\nA chat between a curious user "
        "and an artificial intelligence assistant. The assistant gives helpful, "
        "detailed, and polite answers to the user's questions.<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nhello<|eot_id|>"
    )

    c = conv_lib.conv_templates["vicuna_v1"].copy()
    c.append_message(c.roles[0], "q")
    c.append_message(c.roles[1], None)
    assert c.get_prompt() == (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's "
        "questions. USER: q ASSISTANT:"
    )


def test_head_input_token_slicing():
    """forward_emb_predictor layout parity (base_ola_vlm.py:413-443): head input =
    [sys+image | this task's span | text tail]; gen latents = the gen span."""
    cfg = tiny_test_vlm(distill=True)
    ns, ni, nt = cfg.num_sys_tokens, cfg.num_image_tokens, cfg.distill.num_task_tokens
    order = cfg.distill.task_order()          # gen, depth, seg
    T = ns + ni + nt * 3 + 10
    # encode position index into the values for traceability
    state = jnp.arange(T, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 1, 4))

    for idx, task in enumerate(order):
        inp, latents = head_input_tokens(cfg, state, task)
        start = ns + ni + nt * idx
        expect = (
            list(range(ns + ni))
            + list(range(start, start + nt))
            + list(range(ns + ni + nt * 3, T))
        )
        got = [int(v) for v in np.asarray(inp[0, :, 0])]
        assert got == expect, task
        if task == "gen":
            lat = [int(v) for v in np.asarray(latents[0, :, 0])]
            assert lat == list(range(ns + ni, ns + ni + nt))
        else:
            assert latents is None


def test_head_input_no_text_tail():
    import dataclasses

    cfg = tiny_test_vlm(distill=True)
    cfg = dataclasses.replace(
        cfg, distill=dataclasses.replace(cfg.distill, pass_text_to_aux=False)
    )
    ns, ni, nt = cfg.num_sys_tokens, cfg.num_image_tokens, cfg.distill.num_task_tokens
    T = ns + ni + nt * 3 + 10
    state = jnp.arange(T, dtype=jnp.float32)[None, :, None] * jnp.ones((1, 1, 4))
    inp, _ = head_input_tokens(cfg, state, "depth")
    assert inp.shape[1] == ns + ni + nt  # no text tail


def test_task_token_table_grouped_mean():
    """append_special_tokens pooling parity (ola_arch.py:224-254): depth/seg rows
    grouped-mean to num_task_tokens; gen used directly; ordered by mode."""
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    nt = cfg.distill.num_task_tokens
    table = np.asarray(build_task_token_table(params, cfg))
    assert table.shape == (nt * 3, cfg.decoder.hidden_size)

    # gen first in "gen-depth-seg": raw rows
    np.testing.assert_allclose(
        table[:nt], np.asarray(params["special_tokens"]["gen"]), rtol=1e-6
    )
    # depth next: grouped mean over (num_tokens // nt) rows
    dtok = np.asarray(params["special_tokens"]["depth"])
    grouped = dtok.reshape(nt, -1, dtok.shape[-1]).mean(1)
    np.testing.assert_allclose(table[nt : 2 * nt], grouped, rtol=1e-5, atol=1e-6)


def test_multi_image_splice_plan():
    """Two <image> sentinels get sequential feature banks and per-image task spans."""
    ids = [1, IMAGE_TOKEN_INDEX, 2, IMAGE_TOKEN_INDEX, 3]
    plan = build_splice_plan(
        ids, None, 32, num_image_tokens=4, num_task_tokens=2, num_tasks=1
    )
    types = plan.token_type.tolist()
    # [t | img*4 | task*2 | t | img*4 | task*2 | t]
    assert types[:1] == [1]
    assert types[1:5] == [SEG_IMAGE] * 4
    assert plan.src_index[1:5].tolist() == [0, 1, 2, 3]
    assert types[5:7] == [3, 3]
    assert types[7] == 1
    assert types[8:12] == [SEG_IMAGE] * 4
    assert plan.src_index[8:12].tolist() == [4, 5, 6, 7]  # second image's bank
    assert types[12:14] == [3, 3]
    assert types[14] == 1
    assert plan.seq_length == 15
