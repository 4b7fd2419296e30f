"""Sequence parallelism: Ulysses-style all-to-all attention over a 'seq' axis.

The reference has NO sequence/context parallelism (SURVEY.md §2.9, §5.7 —
max_len 4096 with truncation, `llava_arch.py:436-439`); this module fills the
reserved seam the TPU-native way for context lengths past one chip's HBM.

Mechanics (DeepSpeed-Ulysses, arXiv:2309.14509, re-derived for shard_map):
activations flow through the decoder sharded (B, T/sp, N, H) along the 'seq'
mesh axis. Attention needs the full sequence per head, so inside shard_map an
`all_to_all` re-partitions from seq-sharded to HEAD-sharded — each device gets
(B, T, N/sp, H), runs ordinary (flash) attention with exact global causality,
and a second all_to_all restores seq sharding. Both exchanges move the same
bytes a ring pass would, but as one fused ICI collective each, and the inner
attention is the SAME single-device kernel (ops/flash_attention.py) — no
online-softmax accumulation across ring stages to re-derive or re-test.

Composes with data parallelism (batch on 'data') and ZeRO; for Megatron TP the
head dimension is already sharded on 'model', so sp and tp multiply into the
head count (nq % (sp*tp) == 0 when both are on).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from visper_lm_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS


def ulysses_attention(
    q: jax.Array,                       # (B, T, Nq, H) global
    k: jax.Array,                       # (B, T, Nkv, H)
    v: jax.Array,
    *,
    mesh: Mesh,
    causal: bool = True,
    kv_lengths: Optional[jax.Array] = None,   # (B,) valid kv length
    kv_starts: Optional[jax.Array] = None,    # (B,) first valid kv slot
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    seq_axis: str = SEQ_AXIS,
) -> jax.Array:
    """Sequence-parallel self-attention; differentiable (all_to_all has an
    exact transpose). Inputs/outputs are GLOBAL arrays; the shard_map specs
    put batch on 'data' and sequence on ``seq_axis``.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    sp = axis_sizes.get(seq_axis, 1)
    dp = axis_sizes.get(DATA_AXIS, 1)
    b, t, nq, head_dim = q.shape
    nkv = k.shape[2]
    if sp == 1:
        from visper_lm_tpu.ops.attention import multi_head_attention

        return multi_head_attention(
            q, k, v, causal=causal, kv_lengths=kv_lengths,
            kv_starts=kv_starts, scale=scale, use_pallas=use_pallas,
        )
    if nq % sp or nkv % sp:
        raise ValueError(
            f"heads ({nq} q / {nkv} kv) must divide the '{seq_axis}' axis ({sp})"
        )
    if t % sp or b % dp:
        raise ValueError(f"T ({t}) % sp ({sp}) or B ({b}) % dp ({dp}) != 0")
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if kv_lengths is None:
        kv_lengths = jnp.full((b,), t, jnp.int32)
    if kv_starts is None:
        kv_starts = jnp.zeros((b,), jnp.int32)

    qspec = P(DATA_AXIS, seq_axis, None, None)
    bspec = P(DATA_AXIS)
    fn = jax.shard_map(
        functools.partial(
            _ulysses_local, seq_axis=seq_axis, causal=causal, scale=scale,
            use_pallas=use_pallas,
        ),
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, bspec, bspec),
        out_specs=qspec,
        check_vma=False,
    )
    return fn(q, k, v, kv_lengths, kv_starts)


def _ulysses_local(q, k, v, kv_lengths, kv_starts, *, seq_axis, causal, scale,
                   use_pallas):
    # seq-sharded (b, T/sp, N, H) -> head-sharded (b, T, N/sp, H)
    a2a = functools.partial(
        jax.lax.all_to_all, axis_name=seq_axis, tiled=True
    )
    q = a2a(q, split_axis=2, concat_axis=1)
    k = a2a(k, split_axis=2, concat_axis=1)
    v = a2a(v, split_axis=2, concat_axis=1)
    # full sequence is local now: global causality and padding masks are exact
    if use_pallas:
        from visper_lm_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            q, k, v, causal=causal, kv_lengths=kv_lengths,
            kv_starts=kv_starts, scale=scale,
        )
    else:
        from visper_lm_tpu.ops.attention import mha_xla

        out = mha_xla(
            q, k, v, causal=causal, kv_lengths=kv_lengths,
            kv_starts=kv_starts, scale=scale,
        )
    # head-sharded back to seq-sharded
    return a2a(out, split_axis=1, concat_axis=2)


def ring_attention(
    q: jax.Array,                       # (B, T, Nq, H) global
    k: jax.Array,                       # (B, T, Nkv, H)
    v: jax.Array,
    *,
    mesh: Mesh,
    causal: bool = True,
    kv_lengths: Optional[jax.Array] = None,
    kv_starts: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    seq_axis: str = SEQ_AXIS,
) -> jax.Array:
    """Ring (context-parallel) self-attention: blockwise online softmax with
    the K/V shard ppermuted around the 'seq' ring (Ring Attention, arXiv:
    2310.01889, re-derived on shard_map).

    Ulysses caps sp at the head count (all_to_all splits heads); the ring has
    no such limit — every device keeps ALL heads for its sequence chunk and
    only K/V blocks travel. The per-stage accumulator is the flash-attention
    recurrence (running max m, normalizer l, weighted sum acc) in f32, so the
    result equals single-device softmax attention to float tolerance.
    Differentiable (autodiff through the unrolled ring; ppermute transposes to
    the reverse ring).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    sp = axis_sizes.get(seq_axis, 1)
    dp = axis_sizes.get(DATA_AXIS, 1)
    b, t, nq, head_dim = q.shape
    nkv = k.shape[2]
    if sp == 1:
        from visper_lm_tpu.ops.attention import multi_head_attention

        return multi_head_attention(
            q, k, v, causal=causal, kv_lengths=kv_lengths,
            kv_starts=kv_starts, scale=scale, use_pallas=False,
        )
    if t % sp or b % dp:
        raise ValueError(f"T ({t}) % sp ({sp}) or B ({b}) % dp ({dp}) != 0")
    if nq % nkv:
        raise ValueError(f"Nq ({nq}) % Nkv ({nkv}) != 0")
    if scale is None:
        scale = head_dim ** -0.5
    if kv_lengths is None:
        kv_lengths = jnp.full((b,), t, jnp.int32)
    if kv_starts is None:
        kv_starts = jnp.zeros((b,), jnp.int32)

    qspec = P(DATA_AXIS, seq_axis, None, None)
    bspec = P(DATA_AXIS)
    fn = jax.shard_map(
        functools.partial(
            _ring_local, seq_axis=seq_axis, sp=sp, causal=causal, scale=scale,
        ),
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, bspec, bspec),
        out_specs=qspec,
        check_vma=False,
    )
    return fn(q, k, v, kv_lengths, kv_starts)


def _ring_local(q, k, v, kv_lengths, kv_starts, *, seq_axis, sp, causal, scale):
    from visper_lm_tpu.ops.attention import _NEG_INF

    b, tl, nq, h = q.shape
    nkv = k.shape[2]
    g = nq // nkv
    my = jax.lax.axis_index(seq_axis)

    # f32 flash recurrence state. Masked logits use the same FINITE _NEG_INF
    # as mha_xla (not -inf), so fully-masked padding rows degrade to the same
    # uniform softmax and the recurrence needs no nan guards: everything stays
    # finite, and exp(_NEG_INF - m) underflows to exactly 0 whenever any real
    # logit is present.
    acc = jnp.zeros((b, nq, tl, h), jnp.float32)
    m = jnp.full((b, nq, tl, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((b, nq, tl, 1), jnp.float32)

    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    q_pos = (my * tl + jnp.arange(tl))[None, :]          # (1, Tl) global

    perm = [(i, (i + 1) % sp) for i in range(sp)]
    for step in range(sp):
        src = (my - step) % sp                            # owner of this K/V
        kb = jnp.repeat(k, g, axis=2) if g > 1 else k
        vb = jnp.repeat(v, g, axis=2) if g > 1 else v
        s = jnp.einsum(
            "btnh,bsnh->bnts", qf, kb, preferred_element_type=jnp.float32
        )
        kv_pos = (src * tl + jnp.arange(tl))[None, :]     # (1, Sl) global
        valid = (kv_pos[:, None, :] >= kv_starts[:, None, None]) & (
            kv_pos[:, None, :] < kv_lengths[:, None, None]
        )                                                 # (B, 1, Sl)
        mask = valid[:, None, :, :]                       # (B, 1, 1->T, Sl)
        if causal:
            cm = q_pos[0][:, None] >= kv_pos[0][None, :]  # (Tl, Sl) global
            mask = mask & cm[None, None, :, :]
        s = jnp.where(mask, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bnts,bsnh->bnth", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr + pv
        m = m_new
        if step != sp - 1:
            k, v = jax.lax.ppermute((k, v), seq_axis, perm)

    # l >= exp(m_global - m_global) = 1 after the last stage — no zero guard
    out = acc / l
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)        # (B, Tl, Nq, H)
