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
