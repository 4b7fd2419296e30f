"""Attention dispatch layer.

Two implementations behind one interface:
  * `mha_xla` — pure-XLA reference path (runs everywhere; used on CPU in tests and as
    the numerical oracle for the Pallas kernel).
  * `flash_attention` (ops/flash_attention.py) — Pallas TPU kernel with blockwise
    softmax (the TPU-native replacement for the reference's flash-attn 2 dependency,
    /root/reference/ola_vlm/train/train_mem.py:4-7).

Shapes follow the "BTNH" convention: q (B, T, Nq, H), k/v (B, S, Nkv, H).
GQA is expressed by Nq = G * Nkv; the kernel/XLA paths broadcast KV heads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -2.3819763e38  # close to min float32, matches XLA's mask convention


def _broadcast_kv(k: jax.Array, q_heads: int) -> jax.Array:
    """(B, S, Nkv, H) -> (B, S, Nq, H) by repeating each KV head G times."""
    b, s, nkv, h = k.shape
    if nkv == q_heads:
        return k
    g = q_heads // nkv
    k = jnp.repeat(k, g, axis=2)
    return k


def mha_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    q_offset: int | jax.Array = 0,
    kv_lengths: Optional[jax.Array] = None,
    kv_starts: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference multi-head attention in plain XLA.

    Args:
      q: (B, T, Nq, H).
      k, v: (B, S, Nkv, H) with Nq % Nkv == 0.
      causal: apply causal masking where query position = q_offset + t.
      q_offset: absolute position of q[0] within the kv sequence (decode steps).
      kv_lengths: optional (B,) number of valid kv positions (right-padding mask).
      kv_starts: optional (B,) first valid kv position (left-padding mask, decode).
      bias: optional (B, Nq, T, S) additive bias applied pre-softmax.
      scale: optional score scale; defaults to H^-0.5.

    Returns: (B, T, Nq, H).
    """
    b, t, nq, h = q.shape
    s = k.shape[1]
    if scale is None:
        scale = h ** -0.5

    k = _broadcast_kv(k, nq)
    v = _broadcast_kv(v, nq)

    qf = q.astype(jnp.float32) * scale
    logits = jnp.einsum("btnh,bsnh->bnts", qf, k.astype(jnp.float32))

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    mask = None
    if causal:
        # q_offset may be a python int, a scalar, or a per-batch (B,) array.
        off = jnp.asarray(q_offset)
        off = off.reshape((-1, 1, 1))  # (B or 1, 1, 1)
        q_pos = off + jnp.arange(t)[None, :, None]   # (B or 1, T, 1)
        kv_pos = jnp.arange(s)[None, None, :]        # (1, 1, S)
        mask = (q_pos >= kv_pos)[:, None, :, :]      # (B or 1, 1, T, S)
    if kv_lengths is not None:
        valid = jnp.arange(s)[None, :] < kv_lengths[:, None]  # (B, S)
        valid = valid[:, None, None, :]
        mask = valid if mask is None else jnp.logical_and(mask, valid)
    if kv_starts is not None:
        valid = jnp.arange(s)[None, :] >= kv_starts[:, None]  # (B, S)
        valid = valid[:, None, None, :]
        mask = valid if mask is None else jnp.logical_and(mask, valid)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnts,bsnh->btnh", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    q_offset: int | jax.Array = 0,
    kv_lengths: Optional[jax.Array] = None,
    kv_starts: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatch to the Pallas flash kernel on TPU, XLA elsewhere.

    The Pallas path covers the training/prefill hot case (self-attention, T == S,
    q_offset == 0). Decode (T == 1) and cross-offset cases use the XLA path, which XLA
    fuses well already.
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    t, s = q.shape[1], k.shape[1]
    head_dim = q.shape[-1]
    pallas_ok = (
        use_pallas
        and t == s
        and t >= 128
        and (t % 128 == 0)
        and (head_dim % 64 == 0 or head_dim in (96,))
        and isinstance(q_offset, int)
        and q_offset == 0
    )
    if pallas_ok:
        from visper_lm_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal, kv_lengths=kv_lengths, kv_starts=kv_starts,
            scale=scale,
        )
    return mha_xla(
        q, k, v, causal=causal, q_offset=q_offset, kv_lengths=kv_lengths,
        kv_starts=kv_starts, scale=scale,
    )


def mha_xla_headmajor(
    q: jax.Array,                          # (B, T, Nq, H)
    k: jax.Array,                          # (B, Nkv, S, H) bf16/f32 or int8
    v: jax.Array,                          # (B, Nkv, S, H)
    k_scale: Optional[jax.Array] = None,   # (B, Nkv, S) f32 when k is int8
    v_scale: Optional[jax.Array] = None,
    *,
    causal: bool = True,
    q_offset: "int | jax.Array" = 0,
    kv_lengths: Optional[jax.Array] = None,
    kv_starts: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention over a HEAD-MAJOR (B, Nkv, S, H) cache with no layout copies.

    The decode cache is stored head-major (models/decoder.KVCache); transposing
    it per step for `mha_xla` copies the whole cache (~100 MB/layer at 4B scale,
    measured +25% decode step time). This variant einsums directly over the
    stored layout, handles GQA by a grouped query reshape instead of
    materializing repeated K/V, and folds the int8 per-vector scales into the
    SCORES (q.(k*s) == (q.k)*s; p@(v*s) == (p*s)@v) so the quantized cache is
    read once at stored width and never dequant-materialized.
    """
    b, t, nq, h = q.shape
    nkv, s = k.shape[1], k.shape[2]
    g = nq // nkv
    if scale is None:
        scale = h ** -0.5

    # bf16 dot operands (f32 accumulate) on TPU: the MXU runs bf16 at full
    # rate, and a .astype(f32) of the cache would materialize full f32 copies
    # per layer per step; the int8->bf16 convert fuses into the dot's operand
    # load. The CPU backend lacks mixed bf16->f32 dots — keep f32 there.
    on_tpu = jax.devices()[0].platform == "tpu"
    dot_t = jnp.bfloat16 if on_tpu else jnp.float32
    qf = (q.astype(jnp.float32) * scale).reshape(b, t, nkv, g, h)
    logits = jnp.einsum(
        "btkgh,bksh->bkgts", qf.astype(dot_t), k.astype(dot_t),
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, None, :]

    mask = None
    if causal:
        off = jnp.asarray(q_offset).reshape((-1, 1, 1))
        q_pos = off + jnp.arange(t)[None, :, None]           # (B or 1, T, 1)
        kv_pos = jnp.arange(s)[None, None, :]                # (1, 1, S)
        mask = (q_pos >= kv_pos)[:, None, None, :, :]        # (B or 1,1,1,T,S)
    if kv_lengths is not None:
        valid = (jnp.arange(s)[None, :] < kv_lengths[:, None])[:, None, None, None, :]
        mask = valid if mask is None else jnp.logical_and(mask, valid)
    if kv_starts is not None:
        valid = (jnp.arange(s)[None, :] >= kv_starts[:, None])[:, None, None, None, :]
        mask = valid if mask is None else jnp.logical_and(mask, valid)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, None, :]
    out = jnp.einsum(
        "bkgts,bksh->btkgh", probs.astype(dot_t), v.astype(dot_t),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, nq, h).astype(q.dtype)
