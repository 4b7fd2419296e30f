"""CLIP text encoder (OpenCLIP-ViT-H flavor used by SD-2.x) in functional JAX.

The StableUnCLIPImg2ImgPipeline conditions the UNet cross-attention on
text_encoder(prompt).last_hidden_state — for the reference call sites the prompt is
always the default "" (demo.py:183, eval_probe_task.py:227: only image_embeds and
num_inference_steps are passed). SD-2.1's text encoder: vocab 49408, hidden 1024,
23 layers, 16 heads, MLP 4096, plain GELU, causal mask, final LayerNorm.

Scanned over stacked layer params (one compiled block, L iterations) — the same
TPU idiom as the main decoder.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from visper_lm_tpu.utils.param import (
    Params,
    init_embedding,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
    split_keys,
    stack_layer_params,
)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    mlp_dim: int = 4096
    max_positions: int = 77
    norm_eps: float = 1e-5
    # token ids of the tokenizer's specials (stock CLIP BPE); SD-2.x pads with
    # "!" (id 0) rather than EOS (tokenizer_config of stable-diffusion-2-1-unclip)
    bos_token_id: int = 49406
    eos_token_id: int = 49407
    pad_token_id: int = 0


def _init_block(key, cfg: CLIPTextConfig, dtype) -> Params:
    ks = split_keys(key, 6)
    d = cfg.hidden_size
    return {
        "ln1": init_layernorm(d, dtype),
        "q_proj": init_linear(ks[0], d, d, dtype=dtype),
        "k_proj": init_linear(ks[1], d, d, dtype=dtype),
        "v_proj": init_linear(ks[2], d, d, dtype=dtype),
        "o_proj": init_linear(ks[3], d, d, dtype=dtype),
        "ln2": init_layernorm(d, dtype),
        "fc1": init_linear(ks[4], d, cfg.mlp_dim, dtype=dtype),
        "fc2": init_linear(ks[5], cfg.mlp_dim, d, dtype=dtype),
    }


def init_clip_text(key: jax.Array, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    ks = split_keys(key, cfg.num_layers + 2)
    return {
        "token_embedding": init_embedding(ks[0], cfg.vocab_size, cfg.hidden_size, dtype),
        "position_embedding": jnp.zeros(
            (cfg.max_positions, cfg.hidden_size), dtype
        ),
        "blocks": stack_layer_params(
            [_init_block(ks[i + 1], cfg, dtype) for i in range(cfg.num_layers)]
        ),
        "final_ln": init_layernorm(cfg.hidden_size, dtype),
    }


def clip_text_forward(
    params: Params, cfg: CLIPTextConfig, input_ids: jax.Array
) -> jax.Array:
    """(B, T) token ids -> (B, T, hidden) final hidden states (post final LN)."""
    b, t = input_ids.shape
    x = params["token_embedding"]["embedding"][input_ids]
    x = x + params["position_embedding"][None, :t, :]

    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    h = cfg.num_heads
    hd = cfg.hidden_size // h

    def block(x, lp):
        r = layernorm(lp["ln1"], x, eps=cfg.norm_eps)
        q = linear(lp["q_proj"], r).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = linear(lp["k_proj"], r).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = linear(lp["v_proj"], r).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        scores = scores.astype(jnp.float32) + causal[None, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
        x = x + linear(lp["o_proj"], attn.reshape(b, t, -1))
        r = layernorm(lp["ln2"], x, eps=cfg.norm_eps)
        x = x + linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], r), approximate=False))
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return layernorm(params["final_ln"], x, eps=cfg.norm_eps)


def empty_prompt_ids(cfg: CLIPTextConfig) -> jnp.ndarray:
    """Token ids for the empty prompt '': [BOS, EOS, PAD x (max-2)]."""
    ids = jnp.full((1, cfg.max_positions), cfg.pad_token_id, jnp.int32)
    return ids.at[0, 0].set(cfg.bos_token_id).at[0, 1].set(cfg.eos_token_id)
