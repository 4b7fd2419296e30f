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


def test_chat_session_multiturn_prefix_reuse(model):
    """ChatSession: multi-turn answers match stateless chat() on the fully
    templated history, while turns 2+ prefill only their delta tokens."""
    from visper_lm_tpu import conversation as conversation_lib

    img = Image.new("RGB", (40, 40), (0, 128, 255))
    session = model.chat_session(img)
    a1 = session.ask("what color?", max_new_tokens=4)

    # ground truth for turn 2: stateless decode over the full templated history
    conv = conversation_lib.conv_templates[model.cfg.conv_template].copy()
    conv.append_message(conv.roles[0], "<image>\nwhat color?")
    conv.append_message(conv.roles[1], a1)
    conv.append_message(conv.roles[0], "how many?")
    conv.append_message(conv.roles[1], None)
    from visper_lm_tpu.data.mm_utils import tokenizer_image_token
    from visper_lm_tpu.data.collate import build_splice_plan
    from visper_lm_tpu.serve.engine import Engine, EngineConfig, Request

    d = model.cfg.distill
    plan = build_splice_plan(
        tokenizer_image_token(conv.get_prompt(), model.tokenizer), None, 256,
        num_image_tokens=model.cfg.num_image_tokens,
        num_task_tokens=d.num_task_tokens, num_tasks=len(d.task_order()),
    )
    eng = Engine(model.params, model.cfg, EngineConfig(num_slots=1, max_len=256),
                 tokenizer=model.tokenizer)
    from visper_lm_tpu.data.mm_utils import process_images

    pixels = np.asarray(
        process_images([img], image_aspect_ratio="square",
                       image_size=model.cfg.vision.image_size),
        dtype=np.float32,
    )
    expected_req = eng.run([Request(
        plan=plan, images=pixels, max_new_tokens=4,
        eos_token_ids=tuple(model._eos_ids()),
        stop_strings=tuple(model.stop_strings()), uid=0,
    )])[0]
    expected = model.tokenizer.decode(
        expected_req.output_ids, skip_special_tokens=True
    )
    for s in model.stop_strings():
        i = expected.find(s)
        if i >= 0:
            expected = expected[:i]
    expected = expected.strip()

    before = session.engine.stats["prefills"]
    streamed = []
    a2 = session.ask("how many?", max_new_tokens=4,
                     stream_callback=streamed.append)
    assert a2 == expected, (a2, expected)
    # streaming produced the same text incrementally
    assert "".join(streamed) == a2
    # the turn reused the prefix: its request prefilled only the delta
    assert session._turns == 2
    assert session._prefix is not None


def test_chat_session_without_image(model):
    session = model.chat_session()
    a1 = session.ask("hello there", max_new_tokens=3)
    a2 = session.ask("again please", max_new_tokens=3)
    assert isinstance(a1, str) and isinstance(a2, str)
    assert session._turns == 2


class RoundTripTok(FakeTokenizer):
    """Round-trip-stable: numeric words encode to their own value, so
    decode->retokenize of generated ids reproduces them exactly (enables the
    ChatSession prefix-reuse fast path, like real BPE templates do)."""

    eos_token_id = 2

    def __call__(self, text):
        class R:
            pass

        r = R()
        ids = [self.bos_token_id]
        for w in self._words(text):
            ids.append(int(w) if w.isdigit() else 100 + (hash(w) % 400))
        r.input_ids = ids
        return r

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(str(i) for i in ids)


def test_chat_session_reuse_fast_path():
    """With a round-trip-stable tokenizer, turn 2 slices only delta tokens and
    continues from the cached prefix — and still matches the full prefill."""
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    model = VisperModel(cfg=cfg, params=params, tokenizer=RoundTripTok(),
                        context_len=512)
    img = Image.new("RGB", (40, 40), (0, 128, 255))

    # session A: prefix-cached path
    sa = model.chat_session(img)
    a1 = sa.ask("what color?", max_new_tokens=3)
    ids_t1 = list(sa._ids)
    a2 = sa.ask("how many?", max_new_tokens=3)
    # the reuse branch engaged: turn 2 ran through the suffix-continuation
    # prefill (a ("suffix", bucket) compile exists) and extended the cached ids
    assert any(
        isinstance(k, tuple) and k[0] == "suffix"
        for k in sa.engine._prefill_cache
    )
    assert sa._ids[: len(ids_t1)] == ids_t1 and len(sa._ids) > len(ids_t1)
    assert sa._turns == 2

    # session B: force the fallback (fresh session fed the same history) —
    # answers must agree because prefix caching never changes numerics
    sb = model.chat_session(img)
    b1 = sb.ask("what color?", max_new_tokens=3)
    assert b1 == a1
    sb._prefix = None          # disable reuse for turn 2
    sb._ids = []
    b2 = sb.ask("how many?", max_new_tokens=3)
    assert b2 == a2, (b2, a2)


def test_chat_session_growth_uses_harvest_not_reprefill(model):
    """ADVICE r3 (low): prefix growth lifts the slot's already-computed KV
    via Engine.harvest — no growth re-prefill (and no second image encode)
    runs after a turn."""
    img = Image.new("RGB", (40, 40), (0, 128, 255))
    session = model.chat_session(img)
    calls = []
    orig = session.engine.prefill_prefix

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    session.engine.prefill_prefix = counting
    session.ask("what color?", max_new_tokens=4)
    session.ask("how many?", max_new_tokens=4)
    assert calls == [], "growth re-prefilled instead of harvesting"
    assert session._prefix is not None and session._turns == 2
