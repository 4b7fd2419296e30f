"""Pallas TPU flash-decode attention: single-token queries over a KV cache.

The decode step is HBM-bandwidth-bound: every generated token streams the full
model weights plus the KV cache. The XLA fallback (`ops.attention.mha_xla`)
upcasts the whole cache to f32 and — on the int8 path — materializes a
dequantized copy per layer per step, multiplying cache traffic ~4x. This kernel
reads the cache ONCE at its stored width (bf16, or int8 + per-vector scales),
dequantizes in-register, and runs an online-softmax accumulation over KV blocks,
so decode sits at the cache+weights streaming roofline.

Granularity: one program handles ALL KV heads for one (batch, S-block) tile,
and the scores for every head come from one broadcast-multiply + lane-reduce
over the (Nkv, bk, H) block. T=1 attention has no MXU-shaped matmul in it:
a head-per-program grid (tiny matvecs) measured 1.4x slower than the XLA
path, and an in-program loop over heads serializes the VPU — full
vectorization over heads is what makes the kernel win.

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

STATUS: standalone op with interpret-mode parity tests, NOT wired into the
decode path. Measured on v5e (B8, int8, S=1024) it lost to the XLA einsum
pipeline (44.0 vs 39.1 ms/step; T=1 attention has no MXU shape and the
kernel's cross-lane reductions serialize on the VPU), and the production
decode now keeps the cache in the scan carry with in-register "extras" for
the current token (ops/attention.mha_xla_cache) — the kernel is kept as the
documented design-space seam for future Mosaic work.
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
    valid = (pos >= kvstart_ref[b]) & (pos < kvlen_ref[b])   # (1, bk)

    # T=1 decode attention is (per q head) a (H,)x(H,bk) matvec — hopeless MXU
    # shapes, and a loop over heads serializes the VPU (measured SLOWER than the
    # XLA path). Instead every score for every head is one broadcast-multiply +
    # lane-reduce over the whole (Nkv, bk, H) block; only the small query-group
    # dim G is a python loop (G=1 for MHA, <=4 for the GQA families here).
    #
    # int8 dequant happens on the SCORES, not the cache block: q.(k*s) equals
    # (q.k)*s per position, and p@(v*s) equals (p*s)@v — an (Nkv, bk) multiply
    # instead of an (Nkv, bk, H) one, and the scale block stays lane-major
    # (a (bk, 1) tile would be lane-padded x128 in VMEM).
    k = k_ref[0].astype(jnp.float32)                      # (Nkv, bk, H)
    v = v_ref[0].astype(jnp.float32)                      # (Nkv, bk, H)
    ks = ks_ref[0][:, 0, :] if quant else None            # (Nkv, bk)
    vs = vs_ref[0][:, 0, :] if quant else None

    for gg in range(g):
        q = q_ref[0, gg].astype(jnp.float32)              # (Nkv, H)
        s = jnp.sum(q[:, None, :] * k, axis=2) * scale    # (Nkv, bk)
        if quant:
            s = s * ks
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[gg]                                # (Nkv, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(s - safe_m)                           # masked -> exactly 0
        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - safe_m))
        l_ref[gg] = alpha * l_ref[gg] + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vs if quant else p                       # fold V scales into p
        acc_ref[gg] = acc_ref[gg] * alpha + jnp.sum(pv[:, :, None] * v, axis=1)
        m_ref[gg] = m_new

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

    # (B, G, Nkv, H): the kernel vectorizes over all KV heads at once and loops
    # only the small query-group dim
    qg = jnp.swapaxes(q.reshape(b, nkv, g, h), 1, 2)

    def qo_map(b_, kj, *refs):
        return (b_, 0, 0, 0)

    def kv_map(b_, kj, *refs):
        return (b_, 0, kj, 0)

    in_specs = [
        pl.BlockSpec((1, g, nkv, h), qo_map),
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
            out_specs=pl.BlockSpec((1, g, nkv, h), qo_map),
            scratch_shapes=[
                pltpu.VMEM((g, nkv, h), jnp.float32),
                pltpu.VMEM((g, nkv, 1), jnp.float32),
                pltpu.VMEM((g, nkv, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, nkv, h), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lengths.astype(jnp.int32), kv_starts.astype(jnp.int32), *inputs)

    return jnp.swapaxes(out, 1, 2).reshape(b, 1, nq, h)
