"""Embedding-predictor heads (gen / depth / seg) and per-layer probe heads.

Reference:
  * GenHead / TaskTokenGenHead        — aux_heads/gen_head.py:12-65
  * DepthHead / TaskTokenDepthHead    — aux_heads/da_v2_head.py:377-456 (+ optional
    intermediate MLPs when use_intermediate_depth)
  * OneFormerSegHead / TaskToken...   — aux_heads/oneformer_head.py:188-258 (output
    reshaped (B, C, 24, 24) for the teacher decoder; we keep (B, 576, C) for the loss
    and reshape only in the viz path)
  * DepthProbeHead / probe MLPs       — da_v2_head.py:345-375

A head is a Resampler (+small MLPs); task_token=True selects the TaskTokenResampler
wiring used when num_task_tokens > 0 (all shipped PT configs).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import DistillTaskConfig, ResamplerConfig
from visper_lm_tpu.models.resampler import init_resampler, resampler_forward
from visper_lm_tpu.utils.param import Params, init_linear, linear


def _build_mlp_init(key: jax.Array, in_dim: int, out_dim: int, dtype) -> Params:
    """reference build_mlp (da_v2_head.py): Linear(in,in) -> ReLU -> Linear(in,out)."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, in_dim, in_dim, use_bias=True, dtype=dtype),
        "fc2": init_linear(k2, in_dim, out_dim, use_bias=True, dtype=dtype),
    }


def _build_mlp(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["fc2"], jax.nn.relu(linear(p["fc1"], x)))


def init_task_head(
    key: jax.Array,
    task_cfg: DistillTaskConfig,
    llm_hidden_size: int,
    *,
    num_task_tokens: int,
    use_intermediate_depth: bool = False,
    dtype=jnp.float32,
) -> Params:
    """One head instance (the engine creates one per tapped layer)."""
    task_token = num_task_tokens > 0
    keys = jax.random.split(key, 4)
    # TaskTokenDepthHead runs its resampler at width llm_hidden_size
    # (da_v2_head.py:432); every other head runs at width output_dim.
    inner_dim = None
    if task_cfg.task == "depth" and task_token:
        inner_dim = llm_hidden_size
    p: Params = {
        "resampler": init_resampler(
            keys[0],
            task_cfg.head,
            embedding_dim=llm_hidden_size,
            task_token=task_token,
            inner_dim=inner_dim,
            dtype=dtype,
        )
    }
    if task_cfg.task == "depth" and use_intermediate_depth:
        d = task_cfg.head.output_dim
        p["intermediate"] = [
            _build_mlp_init(keys[1 + i], d, d, dtype) for i in range(3)
        ]
    return p


def task_head_forward(
    p: Params,
    task_cfg: DistillTaskConfig,
    llm_feats: jax.Array,                 # (B, N, llm_hidden)
    task_tokens: Optional[jax.Array],     # (B, M, llm_hidden) or None
) -> jax.Array:
    """Returns the predicted teacher embedding (B, num_tokens, output_dim)."""
    return resampler_forward(p["resampler"], task_cfg.head, llm_feats, task_tokens)


def depth_intermediate_features(p: Params, visual_feats: jax.Array) -> List[jax.Array]:
    """DepthHead's 4-level feature pyramid for the frozen DPT decoder
    (da_v2_head.py:404-416): 3 MLP'd intermediates + the raw resampler output."""
    feats = []
    if "intermediate" in p:
        for mlp in p["intermediate"]:
            feats.append(_build_mlp(mlp, visual_feats))
    feats.append(visual_feats)
    return feats


def init_probe_head(
    key: jax.Array, llm_hidden_size: int, output_dim: int, num_levels: int = 4, dtype=jnp.float32
) -> Params:
    """DepthProbeHead-style probe: num_levels build_mlp's (da_v2_head.py:345-375)."""
    keys = jax.random.split(key, num_levels)
    return {
        "mlps": [
            _build_mlp_init(keys[i], llm_hidden_size, output_dim, dtype)
            for i in range(num_levels)
        ]
    }


def probe_head_forward(p: Params, llm_feats: jax.Array) -> List[jax.Array]:
    return [_build_mlp(mlp, llm_feats) for mlp in p["mlps"]]
