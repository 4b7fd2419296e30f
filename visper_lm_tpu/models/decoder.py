"""Generic decoder-only transformer (covers Llama3-8b, Phi3-mini-4k, Vicuna-7b).

TPU-first design choices (vs the reference's HF LlamaModel/Phi3Model usage,
/root/reference/ola_vlm/model/language_model/ola_llama.py:105-119):

  * Block params are STACKED along a leading layer axis and the layer loop is a single
    `lax.scan`, so XLA compiles one block body regardless of depth and rematerializes
    cleanly under `jax.checkpoint`.
  * Layer taps: the reference materializes all 33 hidden states
    (output_hidden_states=True) to slice 2-6 of them. We carry a small
    (num_taps, B, T, D) buffer through the scan and each layer writes its output into
    its statically-assigned slot (or not) — O(num_taps) memory instead of O(L).
    Tap slot i holds the output of block `tap_layers[i]` (0-indexed), which equals the
    reference's `layer_states[idx]` (hidden_states[1:][idx], see ola_llama.py:119).
  * KV caches are scanned over alongside the params, giving a (L, B, S, Nkv, H) cache
    layout that shards naturally over the mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import DecoderConfig
from visper_lm_tpu.models.rope import apply_rope, rope_cos_sin
from visper_lm_tpu.ops.attention import mha_xla, multi_head_attention
from visper_lm_tpu.utils.param import (
    Params,
    embed,
    init_embedding,
    init_linear,
    init_rmsnorm,
    linear,
    rmsnorm,
    stack_layer_params,
)


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, S_max, Nkv, H)
    v: jax.Array  # (L, B, S_max, Nkv, H)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(
    cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype=dtype), v=jnp.zeros(shape, dtype=dtype))


def init_block(key: jax.Array, cfg: DecoderConfig, dtype) -> Params:
    ks = jax.random.split(key, 7)
    h, nh, nkv, hd, m = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.mlp_dim
    return {
        "attn_norm": init_rmsnorm(h, dtype),
        "q_proj": init_linear(ks[0], h, nh * hd, use_bias=False, dtype=dtype),
        "k_proj": init_linear(ks[1], h, nkv * hd, use_bias=False, dtype=dtype),
        "v_proj": init_linear(ks[2], h, nkv * hd, use_bias=False, dtype=dtype),
        "o_proj": init_linear(ks[3], nh * hd, h, use_bias=False, dtype=dtype),
        "mlp_norm": init_rmsnorm(h, dtype),
        "gate_proj": init_linear(ks[4], h, m, use_bias=False, dtype=dtype),
        "up_proj": init_linear(ks[5], h, m, use_bias=False, dtype=dtype),
        "down_proj": init_linear(ks[6], m, h, use_bias=False, dtype=dtype),
    }


def init_decoder(key: jax.Array, cfg: DecoderConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    keys = jax.random.split(key, cfg.num_layers + 3)
    blocks = stack_layer_params(
        [init_block(keys[i], cfg, dtype) for i in range(cfg.num_layers)]
    )
    params: Params = {
        "embed_tokens": init_embedding(keys[-3], cfg.vocab_size, cfg.hidden_size, dtype),
        "blocks": blocks,
        "final_norm": init_rmsnorm(cfg.hidden_size, dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = init_linear(
            keys[-2], cfg.hidden_size, cfg.vocab_size, use_bias=False, dtype=dtype
        )
    return params


def _block_forward(
    block: Params,
    cfg: DecoderConfig,
    h: jax.Array,                      # (B, T, D)
    cos: jax.Array,
    sin: jax.Array,
    kv_lengths: Optional[jax.Array],
    q_offset,
    cache_kv: Optional[Tuple[jax.Array, jax.Array]],  # per-layer (B, S, Nkv, H)
    use_pallas: Optional[bool],
    kv_starts: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    b, t, d = h.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    x = rmsnorm(block["attn_norm"], h, cfg.norm_eps)
    q = linear(block["q_proj"], x).reshape(b, t, nh, hd)
    k = linear(block["k_proj"], x).reshape(b, t, nkv, hd)
    v = linear(block["v_proj"], x).reshape(b, t, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv
        start = jnp.asarray(q_offset).reshape(()).astype(jnp.int32)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, start, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, start, 0, 0))
        new_cache = (ck, cv)
        attn = mha_xla(
            q, ck, cv, causal=True, q_offset=q_offset, kv_lengths=kv_lengths,
            kv_starts=kv_starts,
        )
    else:
        if kv_starts is not None:
            attn = mha_xla(
                q, k, v, causal=True, q_offset=q_offset, kv_lengths=kv_lengths,
                kv_starts=kv_starts,
            )
        else:
            attn = multi_head_attention(
                q, k, v, causal=True, q_offset=q_offset, kv_lengths=kv_lengths,
                use_pallas=use_pallas,
            )

    attn = attn.reshape(b, t, nh * hd)
    h = h + linear(block["o_proj"], attn)

    x = rmsnorm(block["mlp_norm"], h, cfg.norm_eps)
    gate = jax.nn.silu(linear(block["gate_proj"], x))
    up = linear(block["up_proj"], x)
    h = h + linear(block["down_proj"], gate * up)
    return h, new_cache


def decoder_forward(
    params: Params,
    cfg: DecoderConfig,
    inputs_embeds: jax.Array,                    # (B, T, D)
    *,
    positions: Optional[jax.Array] = None,       # (B, T) or (T,); default arange
    kv_lengths: Optional[jax.Array] = None,      # (B,) valid kv length incl. this chunk
    kv_starts: Optional[jax.Array] = None,       # (B,) first valid kv slot (left pad)
    tap_layers: Tuple[int, ...] = (),            # static 0-indexed block outputs to keep
    cache: Optional[KVCache] = None,
    q_offset: int | jax.Array = 0,
    remat: bool = False,
    use_pallas: Optional[bool] = None,
    compute_logits: bool = True,
) -> Dict[str, Any]:
    """Run the decoder trunk.

    Returns dict with:
      hidden: final-normed hidden states (B, T, D)
      logits: (B, T, vocab) in float32
      taps: (num_taps, B, T, D) raw block outputs for tap_layers (pre final norm)
      cache: updated KVCache if one was passed
    """
    b, t, d = inputs_embeds.shape
    if positions is None:
        positions = jnp.arange(t)[None, :] + jnp.asarray(q_offset).reshape((-1, 1))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]

    num_taps = len(tap_layers)
    if num_taps:
        # out-of-range taps would be silently dropped by the scatter, leaving
        # all-zero tap buffers whose downstream losses NaN in backward — fail loud
        assert max(tap_layers) < cfg.num_layers, (
            f"tap layers {tap_layers} out of range for {cfg.num_layers}-layer decoder"
        )
    # slot index per layer (-1 = not tapped); static metadata scanned as xs.
    slot_per_layer = -jnp.ones((cfg.num_layers,), dtype=jnp.int32)
    for i, layer in enumerate(tap_layers):
        slot_per_layer = slot_per_layer.at[layer].set(i)

    taps0 = jnp.zeros((max(num_taps, 1), b, t, d), dtype=inputs_embeds.dtype)

    has_cache = cache is not None

    def body(carry, xs):
        h, taps = carry
        if has_cache:
            block, slot, ck, cv = xs
        else:
            block, slot = xs
            ck = cv = None
        cache_kv = (ck, cv) if has_cache else None
        h, new_cache = _block_forward(
            block, cfg, h, cos, sin, kv_lengths, q_offset, cache_kv, use_pallas,
            kv_starts,
        )
        if num_taps > 0:
            write_slot = jnp.maximum(slot, 0)
            updated = jax.lax.dynamic_update_index_in_dim(taps, h, write_slot, axis=0)
            taps = jnp.where(slot >= 0, updated, taps)
        if has_cache:
            return (h, taps), new_cache
        return (h, taps), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    xs = (params["blocks"], slot_per_layer)
    if has_cache:
        xs = xs + (cache.k, cache.v)

    (h, taps), ys = jax.lax.scan(body, (inputs_embeds, taps0), xs)

    hidden = rmsnorm(params["final_norm"], h, cfg.norm_eps)
    out: Dict[str, Any] = {"hidden": hidden}
    if compute_logits:
        if cfg.tie_embeddings:
            logits = jnp.dot(hidden, params["embed_tokens"]["embedding"].T)
        else:
            logits = linear(params["lm_head"], hidden)
        out["logits"] = logits.astype(jnp.float32)
    out["taps"] = taps if num_taps > 0 else None
    if has_cache:
        out["cache"] = KVCache(k=ys[0], v=ys[1])
    return out


def embed_tokens(params: Params, ids: jax.Array) -> jax.Array:
    return embed(params["embed_tokens"], ids)
