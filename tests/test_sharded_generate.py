"""Generation under a ('data','model') mesh: TP-sharded params, DP-sharded batch."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from visper_lm_tpu.config import tiny_test_vlm
from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX
from visper_lm_tpu.data.collate import build_splice_plan
from visper_lm_tpu.models.vlm import init_vlm
from visper_lm_tpu.parallel import sharding as shd
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.serve.generate import GenerationConfig, Generator, left_pad_plans


def test_generate_with_tp_sharded_params_matches_single_device():
    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    plans = [
        build_splice_plan(
            [1, 2, 3, IMAGE_TOKEN_INDEX] + list(rng.integers(4, 400, size=5 + b)),
            None, 64,
            num_image_tokens=cfg.num_image_tokens,
            num_task_tokens=cfg.distill.num_task_tokens, num_tasks=3,
        )
        for b in range(4)
    ]
    images = rng.normal(size=(4, 28, 28, 3)).astype(np.float32)
    batch = left_pad_plans(plans, 64)
    batch["images"] = images

    # single-device reference
    gen = Generator(params, cfg, GenerationConfig(max_new_tokens=5), 4, 64,
                    cache_dtype=jnp.float32)
    ref = gen.generate(dict(batch))

    # TP=2 x DP=2 mesh: params sharded by the TP rules, batch over data
    mesh = make_mesh(dp=2, tp=2)
    specs = shd.param_pspecs(params)
    sharded_params = jax.device_put(params, shd.to_named(specs, mesh))
    dbatch = {
        k: jax.device_put(
            jnp.asarray(v),
            NamedSharding(mesh, P("data", *([None] * (np.asarray(v).ndim - 1)))),
        )
        for k, v in batch.items()
    }
    with mesh:
        gen2 = Generator(sharded_params, cfg, GenerationConfig(max_new_tokens=5), 4, 64,
                         cache_dtype=jnp.float32)
        got = gen2.generate(dbatch)
    assert got == ref, (got, ref)
