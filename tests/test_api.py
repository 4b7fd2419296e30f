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


def test_serve_matches_chat(model):
    """Continuous-batching serve() returns chat()'s greedy answers, in order.

    chat() decodes each question alone (batch 1) so serve()'s slot scheduling
    is compared against the per-request ground truth, not batch padding."""
    img_r = Image.new("RGB", (40, 40), (255, 0, 0))
    img_b = Image.new("RGB", (64, 32), (0, 0, 255))
    questions = ["what color?", "how many objects are in this picture?",
                 "describe the scene", "is it red?"]
    images = [img_r, img_b, img_r, img_b]
    expected = [
        model.chat([q], [im], max_new_tokens=5)[0]
        for q, im in zip(questions, images)
    ]
    got = model.serve(questions, images, max_new_tokens=5, num_slots=2)
    assert got == expected


def test_chat_anyres_tiles_and_padding():
    """anyres chat: different image sizes -> different tile counts per sample;
    the zero-padded tiles and the remapped newline row must not break decode."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_test_vlm(distill=False),
        image_aspect_ratio="anyres",
        mm_patch_merge_type="spatial_unpad",
    )
    params = init_vlm(jax.random.PRNGKey(1), cfg)
    assert "image_newline" in params
    model = VisperModel(
        cfg=cfg, params=params, tokenizer=FakeTok(), context_len=256,
        grid_pinpoints=[(28, 56), (56, 28), (56, 56)],
    )
    wide = Image.new("RGB", (80, 30), (255, 0, 0))   # lands on a wide grid
    tall = Image.new("RGB", (30, 80), (0, 0, 255))   # lands on a tall grid
    out = model.chat(["what color?", "what shape?"], [wide, tall], max_new_tokens=4)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)


def test_chat_anyres_plan_matches_direct_forward():
    """The chat-path gather (padded tiles + remapped newline) must produce the
    same prefill logits as a single-sample forward with the un-padded plan."""
    import dataclasses

    import jax.numpy as jnp

    from visper_lm_tpu.data.anyres import anyres_index_plan
    from visper_lm_tpu.data.collate import build_splice_plan
    from visper_lm_tpu.data.mm_utils import process_images, tokenizer_image_token
    from visper_lm_tpu.models.vlm import vlm_forward

    cfg = dataclasses.replace(
        tiny_test_vlm(distill=False),
        image_aspect_ratio="anyres",
        mm_patch_merge_type="spatial_unpad",
    )
    params = init_vlm(jax.random.PRNGKey(2), cfg)
    pinpoints = [(28, 56), (56, 28), (56, 56)]
    img = Image.new("RGB", (80, 30), (120, 40, 200))
    tok = FakeTok()
    model = VisperModel(cfg=cfg, params=params, tokenizer=tok, grid_pinpoints=pinpoints)
    prompt = model.build_prompt("what color?")
    raw = tokenizer_image_token(prompt, tok)

    tiles = process_images(
        [img], image_aspect_ratio="anyres", image_size=cfg.vision.image_size,
        grid_pinpoints=pinpoints,
    )[0]
    idx, nl = anyres_index_plan(
        img.size, pinpoints, tile_size=cfg.vision.image_size,
        patch_side=cfg.vision.num_patches_per_side, merge_type="spatial_unpad",
    )
    assert nl in idx  # unpad mode splices the newline row

    def logits_for(pixels, indices, max_tiles):
        per_tile = cfg.vision.num_patches
        remapped = indices.copy()
        remapped[remapped == nl] = max_tiles * per_tile
        plan = build_splice_plan(
            raw, None, 128,
            num_image_tokens=cfg.num_image_tokens,
            image_feature_indices=[remapped],
        )
        batch = {
            "text_ids": jnp.asarray(plan.text_ids)[None],
            "token_type": jnp.asarray(plan.token_type)[None],
            "src_index": jnp.asarray(plan.src_index)[None],
            "seq_lengths": jnp.asarray([plan.seq_length]),
            "images": jnp.asarray(pixels, dtype=jnp.float32),
        }
        return np.asarray(vlm_forward(params, cfg, batch)["logits"][0])

    n = tiles.shape[0]
    exact = logits_for(tiles[None], idx, max_tiles=n)
    # pad with two zero tiles, as the batched chat path would
    padded = np.zeros((1, n + 2) + tiles.shape[1:], dtype=np.float32)
    padded[0, :n] = tiles
    via_pad = logits_for(padded, idx, max_tiles=n + 2)
    np.testing.assert_allclose(exact, via_pad, rtol=1e-5, atol=1e-5)


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


def test_zoo_dispatch_and_vicuna_preset():
    """builder.py:26-191 name-substring dispatch + vicuna preset (num_sys_tokens=26,
    ola_llama.py:65-68)."""
    from visper_lm_tpu.api import config_for_model_name
    from visper_lm_tpu.config import vicuna_clip_vlm

    c = config_for_model_name("ola-vlm-phi3-dsg")
    assert c.decoder.family == "phi3" and c.distill is not None

    c = config_for_model_name("llava-v1.5-vicuna-7b")
    assert c.conv_template == "vicuna_v1"
    assert c.num_sys_tokens == 26
    assert c.distill is None  # plain llava name, no dsg/ola marker

    c = config_for_model_name("ola-llama3-convnext-dsg")
    assert c.use_convnext_tower and c.projector.input_dim == 3072

    v = vicuna_clip_vlm(distill=True)
    assert v.decoder.vocab_size == 32000 and v.decoder.mlp_dim == 11008


def test_vicuna_prompt_golden():
    """The vicuna_v1 VLM prompt is byte-exact vs the reference template."""
    from visper_lm_tpu.api import VisperModel
    from visper_lm_tpu.config import tiny_test_vlm

    import dataclasses as dc

    cfg = dc.replace(tiny_test_vlm(), conv_template="vicuna_v1", num_sys_tokens=26)
    m = VisperModel(cfg=cfg, params=None, tokenizer=FakeTok())
    p = m.build_prompt("what is this?")
    assert p == (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's "
        "questions. USER: <image>\nwhat is this? ASSISTANT:"
    )
    assert m.stop_strings() == ["</s>"]


def test_fixup_tokenizer_adds_patch_token():
    from visper_lm_tpu.api import fixup_tokenizer

    class Tok:
        added = None

        def add_tokens(self, toks, special_tokens=False):
            self.added = (tuple(toks), special_tokens)

    t = Tok()
    fixup_tokenizer(t, {"mm_use_im_patch_token": True})
    assert t.added == (("<im_patch>",), True)
