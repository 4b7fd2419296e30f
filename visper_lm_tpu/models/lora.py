"""LoRA adapters for the decoder trunk.

Reference parity: peft LoRA on the LLM linear layers with r=64, alpha=16
(train.py:983-999 lora_enable path), adapter-separate checkpoints
(non_lora_trainables.bin split, train.py:1122-1132) and merge-on-load
(builder.py:52-89).

TPU-native design: LoRA weights live as stacked per-layer (L, in, r) / (L, r, out)
factors beside the stacked decoder blocks; before the forward the deltas are merged
into the kernels with ONE batched einsum per weight kind (L·in·r·out FLOPs ≈ the cost
of a single extra token through the model — cheaper than a per-token side branch at
training sequence lengths, and it keeps the flash-attention path unchanged).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import DecoderConfig, LoraConfig
from visper_lm_tpu.utils.param import Params


def _kernel_dims(cfg: DecoderConfig, name: str) -> Tuple[int, int]:
    h, nh, nkv, hd, m = (
        cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.mlp_dim
    )
    return {
        "q_proj": (h, nh * hd),
        "k_proj": (h, nkv * hd),
        "v_proj": (h, nkv * hd),
        "o_proj": (nh * hd, h),
        "gate_proj": (h, m),
        "up_proj": (h, m),
        "down_proj": (m, h),
    }[name]


def init_lora(
    key: jax.Array, cfg: DecoderConfig, lora_cfg: LoraConfig, dtype=jnp.float32
) -> Params:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 so the initial delta is zero (peft init)."""
    params: Params = {}
    keys = jax.random.split(key, len(lora_cfg.targets))
    for k, name in zip(keys, lora_cfg.targets):
        din, dout = _kernel_dims(cfg, name)
        a = jax.random.normal(k, (cfg.num_layers, din, lora_cfg.r), jnp.float32)
        a = a / jnp.sqrt(jnp.float32(lora_cfg.r))
        params[name] = {
            "a": a.astype(dtype),
            "b": jnp.zeros((cfg.num_layers, lora_cfg.r, dout), dtype=dtype),
        }
    return params


def merge_lora_into_decoder(
    decoder_params: Params, lora_params: Params, lora_cfg: LoraConfig
) -> Params:
    """Return decoder params with kernels = W + scaling * A @ B (batched over layers).

    Used both inside the train-step forward (differentiable through A/B) and as the
    offline merge utility (builder.py merge-on-load equivalent).
    """
    blocks = dict(decoder_params["blocks"])
    for name, ab in lora_params.items():
        w = blocks[name]["kernel"]
        delta = jnp.einsum(
            "lir,lro->lio", ab["a"].astype(jnp.float32), ab["b"].astype(jnp.float32)
        ) * lora_cfg.scaling
        blocks[name] = dict(blocks[name])
        blocks[name]["kernel"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    out = dict(decoder_params)
    out["blocks"] = blocks
    return out


def apply_lora(params: Params, lora_cfg: LoraConfig) -> Params:
    """If the param tree carries a 'lora' subtree, fold it into the decoder."""
    if "lora" not in params:
        return params
    out = dict(params)
    out["decoder"] = merge_lora_into_decoder(params["decoder"], params["lora"], lora_cfg)
    return out
