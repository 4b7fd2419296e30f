"""Pallas TPU flash-decode attention: single-token queries over a KV cache.

The decode step is HBM-bandwidth-bound: every generated token streams the full
model weights plus the KV cache. The XLA fallback (`ops.attention.mha_xla`)
upcasts the whole cache to f32 and — on the int8 path — materializes a
dequantized copy per layer per step, multiplying cache traffic ~4x. This kernel
reads the cache ONCE at its stored width (bf16, or int8 + per-vector scales),
dequantizes in-register, and runs an online-softmax accumulation over KV blocks,
so decode sits at the cache+weights streaming roofline.

Granularity: one program handles ALL KV heads for one (batch, S-block) tile —
per-head decode arithmetic is a (G,H)x(H,bk) matvec, far too small to amortize
program/DMA overhead per head (measured 1.4x SLOWER than the XLA path with a
head-per-program grid); with an in-program fori loop over heads the block DMA
is ~MBs and the grid stays (B, S/bk).

Layout: the cache is head-major (B, Nkv, S, H) — each (head, S-block) tile is
contiguous, so block DMAs stream at full bandwidth (a (B, S, Nkv, H) layout
would fetch 1/Nkv of every tile). Matches the (B, N, T, H) convention of
ops/flash_attention.py.

Masking: decode caches are left-padded (kv_starts) and partially filled
(kv_lengths); positions outside [start, length) are masked to -inf. The query
is the newest token so no causal triangle is needed.

Reference parity surface: replaces the eager cache attention inside the
reference's HF `generate` path (`ola_vlm` models decode through HF attention
with a dynamic cache); there is no reference analogue of this kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.3819763e38


def _largest_divisor_block(n: int, target: int) -> int:
    """Largest multiple-of-128 divisor of n that is <= target, else n itself.

    The S block is the LANE dim of the scale tiles, so it must be a multiple of
    128 (or the whole array dim); generators round max_len to a multiple of 128
    so a good block always exists."""
    if n <= target:
        return n
    for b in range(target - target % 128, 127, -128):
        if n % b == 0:
            return b
    return n


def _decode_kernel(
    kvlen_ref, kvstart_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref,
    o_ref,
    acc_ref, m_ref, l_ref,
    *, scale: float, bk: int, nkv: int, g: int, quant: bool,
):
    b = pl.program_id(0)
    kj = pl.program_id(1)
    is_last = kj == pl.num_programs(1) - 1

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    pos = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    valid = (pos >= kvstart_ref[b]) & (pos < kvlen_ref[b])

    # fori over heads (NOT a python unroll — unrolling keeps every head's
    # score temporaries live at once and blows the 16M scoped-VMEM stack):
    # each head is a (G,H)x(H,bk) matvec over the in-VMEM block; the scratch is
    # (Nkv, G, ...) so the head dim is a dynamic, untiled index.
    #
    # int8 dequant happens on the SCORES, not the cache block: q.(k*s) equals
    # (q.k)*s per position, and p@(v*s) equals (p*s)@v — a (G,bk) row multiply
    # instead of a (bk,H) block multiply, and the scale block stays (1,bk)-
    # shaped (lane-major; a (bk,1) block would be lane-padded x128 in VMEM).
    def head_body(hh, _):
        q = q_ref[0, hh]                                  # (G, H)
        k = k_ref[0, hh].astype(q.dtype)                  # (bk, H) raw int values
        v = v_ref[0, hh].astype(q.dtype)                  # (bk, H)

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (G, bk)
        if quant:
            s = s * ks_ref[0, hh]                         # (1, bk) broadcast
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[hh]                                # (G, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(s - safe_m)                           # masked -> exactly 0
        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - safe_m))
        l_ref[hh] = alpha * l_ref[hh] + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vs_ref[0, hh] if quant else p            # fold V scales into p
        acc_ref[hh] = acc_ref[hh] * alpha + jnp.dot(
            pv.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_ref[hh] = m_new
        return 0

    jax.lax.fori_loop(0, nkv, head_body, 0, unroll=False)

    @pl.when(is_last)
    def _finalize():
        l = l_ref[:]                                      # (Nkv, G, 1)
        inv = jnp.where(l > 0.0, 1.0 / jnp.maximum(l, 1e-30), 0.0)
        o_ref[0] = (acc_ref[:] * inv).astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,                      # (B, 1, Nq, H) — the newest token
    k: jax.Array,                      # (B, Nkv, S, H) bf16 or int8
    v: jax.Array,                      # (B, Nkv, S, H)
    k_scale: Optional[jax.Array] = None,   # (B, Nkv, S) f32 when int8
    v_scale: Optional[jax.Array] = None,
    *,
    kv_lengths: jax.Array,             # (B,) valid length incl. this token
    kv_starts: Optional[jax.Array] = None,  # (B,) first valid slot (left pad)
    scale: Optional[float] = None,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Single-step decode attention over a head-major cache. Returns (B,1,Nq,H)."""
    b, t, nq, h = q.shape
    assert t == 1, "decode_attention handles single-token steps"
    nkv, s = k.shape[1], k.shape[2]
    g = nq // nkv
    if scale is None:
        scale = h ** -0.5
    quant = k_scale is not None
    bk = _largest_divisor_block(s, block_k)
    if kv_starts is None:
        kv_starts = jnp.zeros((b,), dtype=jnp.int32)

    qg = q.reshape(b, nkv, g, h)

    def qo_map(b_, kj, *refs):
        return (b_, 0, 0, 0)

    def kv_map(b_, kj, *refs):
        return (b_, 0, kj, 0)

    in_specs = [
        pl.BlockSpec((1, nkv, g, h), qo_map),
        pl.BlockSpec((1, nkv, bk, h), kv_map),
        pl.BlockSpec((1, nkv, bk, h), kv_map),
    ]
    inputs = [qg, k, v]
    if quant:
        # scales as (B, Nkv, 1, S): the S block sits in the LANE dim, matching
        # the (1, bk) row shape the kernel multiplies scores by — a (bk, 1)
        # block would be lane-padded x128 in VMEM (measured: 17.6M scoped OOM)
        def sc_map(b_, kj, *refs):
            return (b_, 0, 0, kj)

        in_specs += [
            pl.BlockSpec((1, nkv, 1, bk), sc_map),
            pl.BlockSpec((1, nkv, 1, bk), sc_map),
        ]
        inputs += [k_scale[:, :, None, :], v_scale[:, :, None, :]]
    else:
        # dummy placeholders keep the kernel signature static
        in_specs += [
            pl.BlockSpec((1, 1, 1, 1), lambda b_, kj, *r: (0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda b_, kj, *r: (0, 0, 0, 0)),
        ]
        dummy = jnp.ones((1, 1, 1, 1), jnp.float32)
        inputs += [dummy, dummy]

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, scale=scale, bk=bk, nkv=nkv, g=g, quant=quant
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, s // bk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nkv, g, h), qo_map),
            scratch_shapes=[
                pltpu.VMEM((nkv, g, h), jnp.float32),
                pltpu.VMEM((nkv, g, 1), jnp.float32),
                pltpu.VMEM((nkv, g, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, g, h), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lengths.astype(jnp.int32), kv_starts.astype(jnp.int32), *inputs)

    return out.reshape(b, 1, nq, h)
