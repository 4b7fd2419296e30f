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

    # dot in the INPUT dtype with f32 accumulation: bf16 operands are exact
    # under the MXU's f32 accumulate, while upcasting operands to f32 runs the
    # matmul ~8x slower on TPU (measured on the in-jit teacher stack, round 3).
    # f32 inputs are unchanged. Scale is applied in f32 to avoid bf16 rounding.
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    logits = jnp.einsum(
        "btnh,bsnh->bnts", qf, k, preferred_element_type=jnp.float32
    )

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
    out = jnp.einsum(
        "bnts,bsnh->btnh", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    from jax.ad_checkpoint import checkpoint_name

    # same name as the Pallas path so the save_flash remat policy applies
    # backend-independently (CPU tests exercise the policy through here)
    return checkpoint_name(out.astype(q.dtype), "flash_out")


def _ambient_mesh():
    """The mesh installed by `with mesh:` (None outside one)."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m is not None and not m.empty:
            return m
    except Exception:
        return None
    return None


def _manual_axes():
    """Mesh axes already bound manual by an enclosing shard_map (e.g. the
    'pipe' stage bodies in parallel/pipeline.py); () outside one."""
    try:
        am = jax.sharding.get_abstract_mesh()
        return tuple(getattr(am, "manual_axes", ()) or ())
    except Exception:
        return ()


def _shard_mapped_flash(mesh, q, k, v, *, causal, kv_lengths, kv_starts, scale):
    """flash_attention wrapped in shard_map for a ('data','model') mesh.

    Returns None when the mesh axes don't divide batch/heads (caller falls
    back to the XLA path, which GSPMD partitions automatically)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from visper_lm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dp = axis_sizes.get(DATA_AXIS, 1)
    tp = axis_sizes.get(MODEL_AXIS, 1)
    b, _, nq, _ = q.shape
    nkv = k.shape[2]
    if b % dp or nq % tp or nkv % tp:
        return None

    from visper_lm_tpu.ops.flash_attention import flash_attention

    if kv_lengths is None:
        kv_lengths = jnp.full((b,), k.shape[1], jnp.int32)
    if kv_starts is None:
        kv_starts = jnp.zeros((b,), jnp.int32)

    qspec = P(DATA_AXIS, None, MODEL_AXIS, None)
    bspec = P(DATA_AXIS)
    fn = jax.shard_map(
        functools.partial(_flash_positional, causal=causal, scale=scale),
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, bspec, bspec),
        out_specs=qspec,
        check_vma=False,
    )
    return fn(q, k, v, kv_lengths, kv_starts)


def _flash_positional(q, k, v, kv_lengths, kv_starts, *, causal, scale):
    from visper_lm_tpu.ops.flash_attention import flash_attention

    return flash_attention(
        q, k, v, causal=causal, kv_lengths=kv_lengths, kv_starts=kv_starts,
        scale=scale,
    )


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

    # One-knob sequence parallelism: a mesh built with make_mesh(sp>1) carries
    # a 'seq' axis, and eligible self-attention routes through the Ulysses
    # all-to-all exchange (parallel/sequence.py) — activations stay
    # seq-sharded outside attention, heads-sharded inside it.
    mesh = _ambient_mesh()
    manual = _manual_axes()
    if mesh is not None and manual:
        # Inside a shard_map stage body (pipeline parallelism): Shardy cannot
        # nest another manual shard_map over the remaining axes, so all
        # mesh-based routing is off. A direct Mosaic call is still safe when
        # no OTHER mesh axis shards the operands; otherwise fall back to the
        # XLA path, which the auto axes partition fine.
        auto = 1
        for name, sz in zip(mesh.axis_names, mesh.devices.shape):
            if name not in manual:
                auto *= sz
        if auto > 1:
            use_pallas = False
        mesh = None
    if mesh is not None:
        from visper_lm_tpu.parallel.mesh import SEQ_AXIS

        sp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(SEQ_AXIS, 1)
        if (
            sp > 1
            and t == s
            and isinstance(q_offset, int)
            and q_offset == 0
            and t % sp == 0
        ):
            from jax.ad_checkpoint import checkpoint_name

            if q.shape[2] % sp == 0 and k.shape[2] % sp == 0:
                from visper_lm_tpu.parallel.sequence import ulysses_attention

                out = ulysses_attention(
                    q, k, v, mesh=mesh, causal=causal, kv_lengths=kv_lengths,
                    kv_starts=kv_starts, scale=scale, use_pallas=use_pallas,
                )
            else:
                # heads don't divide sp (e.g. GQA with few kv heads): the ring
                # keeps all heads local and circulates K/V blocks instead.
                from visper_lm_tpu.parallel.sequence import ring_attention

                out = ring_attention(
                    q, k, v, mesh=mesh, causal=causal, kv_lengths=kv_lengths,
                    kv_starts=kv_starts, scale=scale,
                )
            return checkpoint_name(out, "flash_out")
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

        if mesh is not None and mesh.size > 1:
            # Mosaic kernels cannot be auto-partitioned by GSPMD; under a
            # multi-chip mesh the kernel must be wrapped in shard_map over the
            # canonical layout (batch on 'data', heads on 'model'). Attention
            # is independent per (batch, head) with the full sequence local,
            # so fwd AND the custom-vjp bwd partition exactly.
            sharded = _shard_mapped_flash(
                mesh, q, k, v, causal=causal, kv_lengths=kv_lengths,
                kv_starts=kv_starts, scale=scale,
            )
            if sharded is not None:
                # named for the save_flash remat policy (models/decoder.py):
                # saving the flash output skips its recompute in backward
                from jax.ad_checkpoint import checkpoint_name

                return checkpoint_name(sharded, "flash_out")
            # fall through to XLA when the mesh doesn't divide batch/heads
        else:
            from jax.ad_checkpoint import checkpoint_name

            out = flash_attention(
                q, k, v, causal=causal, kv_lengths=kv_lengths,
                kv_starts=kv_starts, scale=scale,
            )
            return checkpoint_name(out, "flash_out")
    return mha_xla(
        q, k, v, causal=causal, q_offset=q_offset, kv_lengths=kv_lengths,
        kv_starts=kv_starts, scale=scale,
    )


def mha_xla_cache(
    q: jax.Array,                          # (B, T, Nq, H)
    k: jax.Array,                          # (S, B, Nkv, H) bf16/f32 or int8
    v: jax.Array,                          # (S, B, Nkv, H)
    k_scale: Optional[jax.Array] = None,   # (S, B, Nkv) f32 when k is int8
    v_scale: Optional[jax.Array] = None,
    *,
    extra_k: jax.Array,                    # (B, T, Nkv, H) current chunk K
    extra_v: jax.Array,                    # (B, T, Nkv, H) current chunk V
    cache_len: "int | jax.Array",          # cache holds tokens [0, cache_len)
    kv_starts: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Decode attention over the SLOT-MAJOR (S, B, Nkv, H) cache + the current
    chunk as in-register extras. The cache is READ-ONLY here.

    Design notes (all measured on v5e):
      * The slot-major layout is the one XLA's layout assignment wants for the
        decode loop; handing it any other logical order relayout-copies the
        whole cache every step (2 GiB-scale temps).
      * The current chunk attends via `extra_k/extra_v` instead of being
        written to the cache first — a write-then-read cache slice forces XLA
        to materialize a fresh copy of the whole slice; the caller writes only
        the tiny new-token slab into the cache AFTER attention.
      * int8 per-vector scales fold into the SCORES (q.(k*s) == (q.k)*s and
        p@(v*s) == (p*s)@v), so the quantized cache is read once at stored
        width and never dequant-materialized.
      * bf16 dot operands (f32 accumulate) on TPU: the MXU runs bf16 at full
        rate and f32 upcasts of the cache would double its VMEM tiles. The CPU
        backend lacks mixed bf16->f32 dots — f32 there.
    GQA is a grouped query reshape; K/V are never repeated.
    """
    b, t, nq, h = q.shape
    s_len, nkv = k.shape[0], k.shape[2]
    g = nq // nkv
    if scale is None:
        scale = h ** -0.5

    on_tpu = jax.devices()[0].platform == "tpu"
    dot_t = jnp.bfloat16 if on_tpu else jnp.float32
    qf = (q.astype(jnp.float32) * scale).reshape(b, t, nkv, g, h)
    qd = qf.astype(dot_t)

    # cache scores: (B, Nkv, G, T, S)
    logits_c = jnp.einsum(
        "btkgh,sbkh->bkgts", qd, k.astype(dot_t),
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        logits_c = logits_c * jnp.transpose(k_scale, (1, 2, 0))[:, :, None, None, :]
    pos = jnp.arange(s_len)
    valid = pos[None, :] < jnp.broadcast_to(jnp.asarray(cache_len), (b,))[:, None]
    if kv_starts is not None:
        valid = jnp.logical_and(valid, pos[None, :] >= kv_starts[:, None])
    logits_c = jnp.where(valid[:, None, None, None, :], logits_c, _NEG_INF)

    # current-chunk scores: (B, Nkv, G, T, T), causal among the chunk
    logits_e = jnp.einsum(
        "btkgh,bukh->bkgtu", qd, extra_k.astype(dot_t),
        preferred_element_type=jnp.float32,
    )
    tri = jnp.arange(t)[:, None] >= jnp.arange(t)[None, :]
    logits_e = jnp.where(tri[None, None, None, :, :], logits_e, _NEG_INF)

    logits = jnp.concatenate([logits_c, logits_e], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    pc, pe = probs[..., :s_len], probs[..., s_len:]
    if v_scale is not None:
        pc = pc * jnp.transpose(v_scale, (1, 2, 0))[:, :, None, None, :]
    out = jnp.einsum(
        "bkgts,sbkh->btkgh", pc.astype(dot_t), v.astype(dot_t),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bkgtu,bukh->btkgh", pe.astype(dot_t), extra_v.astype(dot_t),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, nq, h).astype(q.dtype)
