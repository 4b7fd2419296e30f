"""Generation correctness: left-padded batched decode == unpadded full forward."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX
from visper_lm_tpu.data.collate import build_splice_plan
from visper_lm_tpu.models.vlm import init_vlm, vlm_forward
from visper_lm_tpu.serve.generate import GenerationConfig, Generator, left_pad_plans


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    d = cfg.distill
    plans = []
    raw_ids = []
    for b in range(3):
        ids = [1, 2, 3, IMAGE_TOKEN_INDEX] + list(rng.integers(4, 400, size=5 + 4 * b))
        raw_ids.append(ids)
        plans.append(
            build_splice_plan(
                ids, None, 128,
                num_image_tokens=cfg.num_image_tokens,
                num_task_tokens=d.num_task_tokens, num_tasks=3,
            )
        )
    images = rng.normal(size=(3, 28, 28, 3)).astype(np.float32)
    return cfg, params, plans, raw_ids, images


def test_first_token_matches_unpadded_forward(setup):
    """Per sample: greedy first token from the left-padded batch equals argmax of an
    unpadded single-sample forward at the last prompt position."""
    cfg, params, plans, raw_ids, images = setup
    batch = left_pad_plans(plans, 128)
    batch["images"] = images

    gen = Generator(params, cfg, GenerationConfig(max_new_tokens=1), 3, 128,
                    cache_dtype=jnp.float32)
    out = gen.generate(batch)
    first_tokens = [o[0] for o in out]

    for i, plan in enumerate(plans):
        single = {
            "text_ids": jnp.asarray(plan.text_ids)[None],
            "token_type": jnp.asarray(plan.token_type)[None],
            "src_index": jnp.asarray(plan.src_index)[None],
            "seq_lengths": jnp.asarray([plan.seq_length]),
            "images": jnp.asarray(images[i : i + 1]),
        }
        fwd = vlm_forward(params, cfg, single, tap=False, use_pallas=False)
        ref = int(jnp.argmax(fwd["logits"][0, plan.seq_length - 1]))
        assert first_tokens[i] == ref, (i, first_tokens[i], ref)


def test_multi_step_decode_consistency(setup):
    """Decoding twice with the same inputs is deterministic; eos stops early."""
    cfg, params, plans, raw_ids, images = setup
    batch = left_pad_plans(plans, 128)
    batch["images"] = images
    gen = Generator(params, cfg, GenerationConfig(max_new_tokens=6), 3, 128,
                    cache_dtype=jnp.float32)
    a = gen.generate(dict(batch))
    b = gen.generate(dict(batch))
    assert a == b
    assert all(len(x) == 6 for x in a)

    # eos handling: mark the first generated token of sample 0 as eos
    eos = a[0][0]
    gen2 = Generator(
        params, cfg, GenerationConfig(max_new_tokens=6, eos_token_ids=(eos,)),
        3, 128, cache_dtype=jnp.float32,
    )
    c = gen2.generate(dict(batch))
    assert c[0] == [eos]


def test_int8_kv_cache_matches_dense_decode(setup):
    """int8 KV cache vs dense: with the SAME forced token sequence, per-step decode
    logits stay within quantization tolerance, and the stored cache dequantizes to
    within one quantization step of the dense cache. (Token-exact greedy equality is
    not a valid oracle on a random-init model — argmax margins there are ~0.)"""
    cfg, params, plans, raw_ids, images = setup
    batch = left_pad_plans(plans, 128)
    batch["images"] = images
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    offsets = jbatch["pad_offsets"]

    from visper_lm_tpu.models import decoder as dec

    dense = Generator(params, cfg, GenerationConfig(max_new_tokens=8), 3, 128,
                      cache_dtype=jnp.float32)
    quant = Generator(params, cfg, GenerationConfig(max_new_tokens=8, kv_quant=True),
                      3, 128)
    dlog, dcache = dense._prefill(params, jbatch)
    qlog, qcache = quant._prefill(params, jbatch)
    # prefill attention runs on raw k/v (cache write only) — logits identical
    np.testing.assert_allclose(np.asarray(qlog), np.asarray(dlog), rtol=1e-5, atol=1e-5)

    # cache contents: dequantized int8 ~= dense within one quantization step
    dq = np.asarray(qcache.k, np.float32) * np.asarray(qcache.k_scale, np.float32)[..., None]
    dk = np.asarray(dcache.k, np.float32)
    span = dk[:, :, :128]  # prompt region only (rest is zeros in both)
    err = np.abs(dq[:, :, :128] - span).max()
    assert err <= np.abs(span).max() / 127.0 + 1e-6, err

    # forced-token decode: step logits track the dense path within quant tolerance
    token = jnp.argmax(dlog, axis=-1)
    for step in range(4):
        emb = dec.embed_tokens(params["decoder"], token[:, None])
        slot = 128 + step
        kw = dict(
            positions=(128 - offsets + step)[:, None],
            kv_lengths=jnp.full((3,), slot + 1, jnp.int32),
            kv_starts=offsets, q_offset=slot,
        )
        do = dec.decoder_forward(params["decoder"], cfg.decoder, emb, cache=dcache, **kw)
        qo = dec.decoder_forward(params["decoder"], cfg.decoder, emb, cache=qcache, **kw)
        dcache, qcache = do["cache"], qo["cache"]
        dl, ql = np.asarray(do["logits"][:, 0]), np.asarray(qo["logits"][:, 0])
        denom = max(1e-3, float(np.abs(dl).max()))
        assert np.abs(ql - dl).max() / denom < 0.05, (step, np.abs(ql - dl).max())
        token = jnp.argmax(do["logits"][:, 0], axis=-1)

    # end-to-end through Generator: runs and is deterministic with the quant cache
    a = quant.generate(dict(batch))
    b = quant.generate(dict(batch))
    assert a == b and all(len(x) == 8 for x in a)


def test_w8a16_weight_quant_decode_close_to_bf16():
    """Per-output-channel int8 decoder weights: greedy prefill logits stay close
    to the full-precision path (w8a16 is a serving-only representation)."""
    import jax
    import jax.numpy as jnp

    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX
    from visper_lm_tpu.data.collate import build_splice_plan
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.serve.generate import (
        GenerationConfig,
        Generator,
        left_pad_plans,
    )

    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    plans = [
        build_splice_plan(
            [1, 2, 3] + [IMAGE_TOKEN_INDEX] + list(rng.integers(3, 400, size=10 + b)),
            None, 64,
            num_image_tokens=cfg.num_image_tokens,
            num_task_tokens=cfg.distill.num_task_tokens,
            num_tasks=3,
        )
        for b in range(2)
    ]
    batch = left_pad_plans(plans, 64)
    batch["images"] = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

    full = Generator(params, cfg, GenerationConfig(max_new_tokens=4), 2, 64,
                     cache_dtype=jnp.float32)
    quant = Generator(params, cfg,
                      GenerationConfig(max_new_tokens=4, weight_quant=True), 2, 64,
                      cache_dtype=jnp.float32)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    lf, _ = full._prefill(full.params, jb)
    lq, _ = quant._prefill(quant.params, jb)
    # int8 per-channel weights: logits agree to ~1% of the logit scale
    denom = np.maximum(np.abs(np.asarray(lf)).max(), 1.0)
    rel = np.abs(np.asarray(lq) - np.asarray(lf)).max() / denom
    assert rel < 0.05, rel
    # and the argmax next token matches
    np.testing.assert_array_equal(
        np.argmax(np.asarray(lq), -1), np.argmax(np.asarray(lf), -1)
    )
