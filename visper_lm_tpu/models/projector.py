"""Vision->LLM projector: 'linear' | 'mlpNx_gelu' | 'identity'.

Reference: ola_vlm/model/multimodal_projector/builder.py:47-65. All shipped configs use
mlp2x_gelu (scripts/train/pretrain.sh:30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import ProjectorConfig
from visper_lm_tpu.utils.param import Params, init_linear, linear


def init_projector(key: jax.Array, cfg: ProjectorConfig, dtype=jnp.float32) -> Params:
    if cfg.projector_type == "identity":
        return {}
    depth = cfg.mlp_depth
    keys = jax.random.split(key, depth)
    layers = [init_linear(keys[0], cfg.input_dim, cfg.output_dim, use_bias=True, dtype=dtype)]
    for i in range(1, depth):
        layers.append(
            init_linear(keys[i], cfg.output_dim, cfg.output_dim, use_bias=True, dtype=dtype)
        )
    return {"layers": layers}


def projector_forward(params: Params, cfg: ProjectorConfig, x: jax.Array) -> jax.Array:
    if cfg.projector_type == "identity":
        return x
    layers = params["layers"]
    y = linear(layers[0], x)
    for layer in layers[1:]:
        y = linear(layer, jax.nn.gelu(y, approximate=False))
    return y
