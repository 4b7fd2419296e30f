"""Perceiver resampler family (embedding-predictor heads).

Behavioral parity with the reference resampler
(/root/reference/ola_vlm/model/multimodal_projector/resampler.py:30-224):
  * PerceiverAttention: latents attend to concat([x, latents]); q/k scaled by
    d_head^-0.25 each (fp16-stable sqrt-sqrt trick, resampler.py:66-68); softmax in f32.
  * Resampler: learned latents, proj_in/out + output LayerNorm, residual attn+FF blocks.
  * TaskTokenResampler: latents supplied externally (the LLM's task tokens), repeated or
    mean-pooled to num_queries (resampler.py:203-210); NOTE it projects latents with the
    same proj_in as x, and its internal width is `dim` from config.

All heads share this module; head-specific reshapes live in models/heads.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import ResamplerConfig
from visper_lm_tpu.utils.param import (
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
)


def init_perceiver_attention(
    key: jax.Array, dim: int, dim_head: int, heads: int, dtype
) -> Params:
    ks = jax.random.split(key, 3)
    inner = dim_head * heads
    return {
        "norm1": init_layernorm(dim, dtype),
        "norm2": init_layernorm(dim, dtype),
        "to_q": init_linear(ks[0], dim, inner, use_bias=False, dtype=dtype),
        "to_kv": init_linear(ks[1], dim, 2 * inner, use_bias=False, dtype=dtype),
        "to_out": init_linear(ks[2], inner, dim, use_bias=False, dtype=dtype),
    }


def perceiver_attention(
    p: Params, x: jax.Array, latents: jax.Array, dim_head: int, heads: int
) -> jax.Array:
    """x: (B, N1, D) image/LLM features; latents: (B, N2, D). Returns (B, N2, D)."""
    x = layernorm(p["norm1"], x)
    latents = layernorm(p["norm2"], latents)
    b, l, _ = latents.shape

    q = linear(p["to_q"], latents)
    kv_input = jnp.concatenate([x, latents], axis=-2)
    kv = linear(p["to_kv"], kv_input)
    k, v = jnp.split(kv, 2, axis=-1)

    def heads_split(t):
        return t.reshape(b, t.shape[1], heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)

    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(dim_head)))
    w = jnp.einsum(
        "bhld,bhnd->bhln", (q * scale).astype(jnp.float32), (k * scale).astype(jnp.float32)
    )
    w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhln,bhnd->bhld", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, heads * dim_head)
    return linear(p["to_out"], out)


def init_feedforward(key: jax.Array, dim: int, mult: int, dtype) -> Params:
    ks = jax.random.split(key, 2)
    inner = int(dim * mult)
    return {
        "norm": init_layernorm(dim, dtype),
        "fc1": init_linear(ks[0], dim, inner, use_bias=False, dtype=dtype),
        "fc2": init_linear(ks[1], inner, dim, use_bias=False, dtype=dtype),
    }


def feedforward(p: Params, x: jax.Array) -> jax.Array:
    y = layernorm(p["norm"], x)
    y = linear(p["fc1"], y)
    y = jax.nn.gelu(y, approximate=False)
    return linear(p["fc2"], y)


def init_attention_pool2d(
    key: jax.Array, seq_len: int, embed_dim: int, output_dim: Optional[int] = None,
    dtype=jnp.float32,
) -> Params:
    """AttentionPool2d (reference resampler.py:78-116): CLS = mean token, learned
    positional embedding, single MHA block projecting to output_dim."""
    ks = jax.random.split(key, 5)
    out_dim = output_dim or embed_dim
    return {
        "pos_embed": (
            jax.random.normal(ks[0], (seq_len + 1, embed_dim), jnp.float32)
            / embed_dim ** 0.5
        ).astype(dtype),
        "q_proj": init_linear(ks[1], embed_dim, embed_dim, use_bias=True, dtype=dtype),
        "k_proj": init_linear(ks[2], embed_dim, embed_dim, use_bias=True, dtype=dtype),
        "v_proj": init_linear(ks[3], embed_dim, embed_dim, use_bias=True, dtype=dtype),
        "c_proj": init_linear(ks[4], embed_dim, out_dim, use_bias=True, dtype=dtype),
    }


def attention_pool2d(
    p: Params, x: jax.Array, num_heads: int, return_all_tokens: bool = False
) -> jax.Array:
    """x: (B, N, D) token features -> pooled (B, out) or all tokens (B, N+1, out)."""
    b, n, d = x.shape
    mean_tok = jnp.mean(x, axis=1, keepdims=True)
    h = jnp.concatenate([mean_tok, x], axis=1) + p["pos_embed"][None].astype(x.dtype)

    hd = d // num_heads
    q = linear(p["q_proj"], h).reshape(b, n + 1, num_heads, hd).transpose(0, 2, 1, 3)
    k = linear(p["k_proj"], h).reshape(b, n + 1, num_heads, hd).transpose(0, 2, 1, 3)
    v = linear(p["v_proj"], h).reshape(b, n + 1, num_heads, hd).transpose(0, 2, 1, 3)
    w = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / (hd ** 0.5), axis=-1
    ).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, n + 1, d)
    out = linear(p["c_proj"], out)
    return out if return_all_tokens else out[:, 0]


def init_resampler(
    key: jax.Array,
    cfg: ResamplerConfig,
    embedding_dim: int,
    *,
    task_token: bool = False,
    inner_dim: Optional[int] = None,
    dtype=jnp.float32,
) -> Params:
    """Resampler params. inner_dim defaults to cfg.output_dim (the reference passes
    dim=output_dim for Resampler heads; TaskTokenDepthHead passes dim=llm_hidden_size,
    da_v2_head.py:432)."""
    dim = inner_dim if inner_dim is not None else cfg.output_dim
    keys = jax.random.split(key, 3 + 2 * cfg.depth)
    p: Params = {
        "proj_in": init_linear(keys[0], embedding_dim, dim, use_bias=True, dtype=dtype),
        "proj_out": init_linear(keys[1], dim, cfg.output_dim, use_bias=True, dtype=dtype),
        "norm_out": init_layernorm(cfg.output_dim, dtype),
        "layers": [
            {
                "attn": init_perceiver_attention(
                    keys[3 + 2 * i], dim, cfg.dim_head, cfg.num_heads, dtype
                ),
                "ff": init_feedforward(keys[4 + 2 * i], dim, cfg.ff_mult, dtype),
            }
            for i in range(cfg.depth)
        ],
    }
    if not task_token:
        p["latents"] = (
            jax.random.normal(keys[2], (cfg.num_tokens, dim), dtype=jnp.float32)
            / jnp.sqrt(jnp.float32(dim))
        ).astype(dtype)
    return p


def resampler_forward(
    p: Params,
    cfg: ResamplerConfig,
    x: jax.Array,                          # (B, N, embedding_dim)
    latents: Optional[jax.Array] = None,   # (B, M, embedding_dim) for task-token mode
) -> jax.Array:
    """Returns (B, num_tokens, output_dim)."""
    b = x.shape[0]
    if latents is None:
        lat = jnp.broadcast_to(p["latents"], (b,) + p["latents"].shape)
    else:
        m = latents.shape[1]
        if m != cfg.num_tokens:
            if cfg.num_tokens > 1 and cfg.num_tokens % m == 0:
                lat = jnp.tile(latents, (1, cfg.num_tokens // m, 1))
            else:
                lat = jnp.broadcast_to(
                    jnp.mean(latents, axis=1, keepdims=True),
                    (b, cfg.num_tokens, latents.shape[-1]),
                )
        else:
            lat = latents
        lat = linear(p["proj_in"], lat)

    x = linear(p["proj_in"], x)

    for layer in p["layers"]:
        lat = perceiver_attention(layer["attn"], x, lat, cfg.dim_head, cfg.num_heads) + lat
        lat = feedforward(layer["ff"], lat) + lat

    lat = linear(p["proj_out"], lat)
    return layernorm(p["norm_out"], lat)
