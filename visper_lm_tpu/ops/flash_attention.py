"""Pallas TPU flash attention (causal, GQA, right-padding aware) with custom VJP.

The TPU-native replacement for the reference's flash-attn-2 CUDA dependency
(/root/reference/ola_vlm/train/train_mem.py:4-7, setup.py). Blockwise online-softmax
forward plus a two-kernel backward (dq, then dk/dv), all tiled for VMEM with f32
accumulators and bf16 I/O.

Layout: q (B, Nq, T, H), k/v (B, Nkv, S, H) internally; the public entry accepts the
framework's BTNH convention and transposes. GQA maps query head h to kv head h // G
purely in the BlockSpec index maps — no materialized repeat.

Mosaic notes:
  * the kv-block grid dimension is innermost so each (batch, head, q-block) output
    tile is revisited across kv steps and accumulated in VMEM scratch; causal
    upper-triangle blocks are predicated off with pl.when (no wasted MXU work);
  * all row statistics stay 2D (bq, 1) — 1D vectors don't lower;
  * lse/delta residuals are stored (B, Nq, T, 128) so their blocks satisfy the
    (8, 128) tiling constraint (lane dim broadcast; only column 0 is meaningful).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.3819763e38
# v5e-tuned defaults (measured: 34 TFLOP/s @ B8/T2048/H128 vs 12 for the XLA path)
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
STAT_LANES = 128


def _largest_divisor_block(n: int, target: int, align: int = 128) -> int:
    """Largest b <= target dividing n, preferring multiples of `align`."""
    b = min(target, n)
    while b > align and n % b != 0:
        b -= align
    if n % b != 0:
        b = align if n % align == 0 else n
    return b


def _block_sizes(t: int, s: int, bq: int, bk: int):
    bq = _largest_divisor_block(t, bq)
    bk = _largest_divisor_block(s, bk)
    assert t % bq == 0 and s % bk == 0, (t, s, bq, bk)
    return bq, bk


def _masked_scores(s, q_start, k_start, bq, bk, causal, use_kvlen, kvlen_ref, b,
                   use_kvstart=False, kvstart_ref=None):
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = jnp.ones((bq, bk), dtype=jnp.bool_)
    if causal:
        mask = rows >= cols
    if use_kvlen:
        mask = jnp.logical_and(mask, cols < kvlen_ref[b])
    if use_kvstart:
        mask = jnp.logical_and(mask, cols >= kvstart_ref[b])
    return jnp.where(mask, s, NEG_INF), mask


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _causal_pairs(nq_blk: int, nk_blk: int, bq: int, bk: int):
    """q-major (qi, kj) pairs covering only kv blocks at/below the causal diagonal.

    Returns (qi_of, kj_of, last_of) int32 arrays; last_of marks the final kv step of
    each q block. Grid-squashing: the skipped upper-triangle blocks never get DMA'd
    or iterated at all (vs predication, which still pays the copies).
    """
    import numpy as _np

    qi_of, kj_of, last_of = [], [], []
    for qi in range(nq_blk):
        kj_max = min((qi * bq + bq - 1) // bk, nk_blk - 1)
        for kj in range(kj_max + 1):
            qi_of.append(qi)
            kj_of.append(kj)
            last_of.append(1 if kj == kj_max else 0)
    return (
        _np.asarray(qi_of, _np.int32),
        _np.asarray(kj_of, _np.int32),
        _np.asarray(last_of, _np.int32),
    )


def _fwd_kernel(
    kvlen_ref, kvstart_ref,
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, scale: float, causal: bool, bq: int, bk: int, use_kvlen: bool,
    use_kvstart: bool = False, qi_ref=None, kj_ref=None, last_ref=None,
):
    b = pl.program_id(0)
    if qi_ref is not None:
        p_idx = pl.program_id(2)
        qi = qi_ref[p_idx]
        kj = kj_ref[p_idx]
        is_last = last_ref[p_idx] == 1
    else:
        qi = pl.program_id(2)
        kj = pl.program_id(3)
        is_last = kj == pl.num_programs(3) - 1

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_start = qi * bq
    k_start = kj * bk
    # with a squashed grid every iteration is needed; otherwise predicate causal
    needed = (k_start <= q_start + bq - 1) if (causal and qi_ref is None) else (kj >= 0)

    @pl.when(needed)
    def _compute():
        # keep matmul inputs in their native (bf16) dtype: the MXU multiplies bf16
        # at full rate with f32 accumulation; upcasting inputs to f32 forces the
        # slow f32 path. The scale folds into the f32 scores instead.
        q = q_ref[0, 0]                                  # (bq, H)
        k = k_ref[0, 0]                                  # (bk, H)
        v = v_ref[0, 0]                                  # (bk, H)

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (bq, bk)
        # NOTE: an interior-block fast path via lax.cond was measured SLOWER on
        # Mosaic (29 vs 35 TFLOP/s) — branches serialize; keep unconditional masking.
        if causal or use_kvlen or use_kvstart:
            s, _ = _masked_scores(
                s, q_start, k_start, bq, bk, causal, use_kvlen, kvlen_ref, b,
                use_kvstart, kvstart_ref,
            )

        m_prev = m_ref[:]                                # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)        # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        # masked entries carry s == NEG_INF, so exp underflows to exactly 0 — no
        # explicit select pass over the tile is needed (incl. fully-masked rows,
        # where safe_m == 0 keeps the argument at NEG_INF)
        p = jnp.exp(s - safe_m)

        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - safe_m))  # (bq,1)
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

    @pl.when(is_last)
    def _finalize():
        l = l_ref[:]                                     # (bq, 1)
        inv = jnp.where(l > 0.0, 1.0 / jnp.maximum(l, 1e-30), 0.0)
        o_ref[0, 0] = (acc_ref[:] * inv).astype(o_ref.dtype)
        lse = jnp.where(
            l > 0.0, m_ref[:] + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF
        )                                                # (bq, 1)
        lse_ref[0, 0] = jnp.broadcast_to(lse, (lse.shape[0], STAT_LANES))


def _fwd(
    q: jax.Array, k: jax.Array, v: jax.Array,
    kv_lengths: Optional[jax.Array],
    kv_starts: Optional[jax.Array] = None,
    *, causal: bool, scale: float, bq: int, bk: int, interpret: bool,
):
    b, nq, t, h = q.shape
    nkv, s = k.shape[1], k.shape[2]
    g = nq // nkv
    bq, bk = _block_sizes(t, s, bq, bk)
    use_kvlen = kv_lengths is not None
    if kv_lengths is None:
        kv_lengths = jnp.full((b,), s, dtype=jnp.int32)
    use_kvstart = kv_starts is not None
    if kv_starts is None:
        kv_starts = jnp.zeros((b,), dtype=jnp.int32)

    squash = causal and t == s and (t // bq) * (s // bk) > 1

    common = dict(scale=scale, causal=causal, bq=bq, bk=bk, use_kvlen=use_kvlen,
                  use_kvstart=use_kvstart)
    if squash:
        qi_of, kj_of, last_of = _causal_pairs(t // bq, s // bk, bq, bk)
        grid = (b, nq, len(qi_of))

        def kernel(kvlen_ref, kvstart_ref, qi_ref, kj_ref, last_ref, *args):
            return _fwd_kernel(
                kvlen_ref, kvstart_ref, *args, **common,
                qi_ref=qi_ref, kj_ref=kj_ref, last_ref=last_ref,
            )

        def q_map(b_, h_, p, kvlen, kvst, qio, kjo, lasto):
            return (b_, h_, qio[p], 0)

        def kv_map(b_, h_, p, kvlen, kvst, qio, kjo, lasto):
            return (b_, h_ // g, kjo[p], 0)

        def lse_map(b_, h_, p, kvlen, kvst, qio, kjo, lasto):
            return (b_, h_, qio[p], 0)

        scalar_args = (
            kv_lengths.astype(jnp.int32), kv_starts.astype(jnp.int32),
            jnp.asarray(qi_of), jnp.asarray(kj_of), jnp.asarray(last_of),
        )
        num_scalar = 5
    else:
        grid = (b, nq, t // bq, s // bk)
        kernel = functools.partial(_fwd_kernel, **common)

        def q_map(b_, h_, qi, kj, *refs):
            return (b_, h_, qi, 0)

        def kv_map(b_, h_, qi, kj, *refs):
            return (b_, h_ // g, kj, 0)

        def lse_map(b_, h_, qi, kj, *refs):
            return (b_, h_, qi, 0)

        scalar_args = (kv_lengths.astype(jnp.int32), kv_starts.astype(jnp.int32))
        num_scalar = 2

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=num_scalar,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, h), q_map),
                pl.BlockSpec((1, 1, bk, h), kv_map),
                pl.BlockSpec((1, 1, bk, h), kv_map),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bq, h), q_map),
                pl.BlockSpec((1, 1, bq, STAT_LANES), lse_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, h), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, nq, t, h), q.dtype),
            jax.ShapeDtypeStruct((b, nq, t, STAT_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
            if squash
            else ("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalar_args, q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _recompute_p(q, k, lse_col, scale, q_start, k_start, bq, bk, causal,
                 use_kvlen, kvlen_ref, b, use_kvstart=False, kvstart_ref=None):
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s, mask = _masked_scores(
        s, q_start, k_start, bq, bk, causal, use_kvlen, kvlen_ref, b,
        use_kvstart, kvstart_ref,
    )
    safe_lse = jnp.where(lse_col == NEG_INF, 0.0, lse_col)   # (bq, 1)
    p = jnp.exp(s - safe_lse)
    p = jnp.where(mask, p, 0.0)
    p = jnp.where(lse_col == NEG_INF, 0.0, p)
    return p


def _kv_major_group_pairs(nq_blk: int, nk_blk: int, bq: int, bk: int, g: int):
    """kv-head-major (kj, gi, qi) triples for the dk/dv kernel.

    The dk/dv accumulator lives at a kv block OF A KV HEAD: for each kv block,
    every query sub-head gi of the GQA group and every q block at/below the
    causal diagonal is visited while the accumulator stays resident in VMEM.
    This writes dk/dv once per KV head (B, Nkv, S, H) in the input dtype —
    the query-head-major alternative materializes G× that in f32 and pays an
    XLA reshape-reduce pass over it afterwards.

    Returns (qi_of, kj_of, gi_of, first_of, last_of); first/last mark each kv
    block's accumulation boundaries.
    """
    import numpy as _np

    qi_of, kj_of, gi_of, first_of, last_of = [], [], [], [], []
    for kj in range(nk_blk):
        qi_min = (kj * bk) // bq
        for gi in range(g):
            for qi in range(qi_min, nq_blk):
                qi_of.append(qi)
                kj_of.append(kj)
                gi_of.append(gi)
                first_of.append(1 if (gi == 0 and qi == qi_min) else 0)
                last_of.append(1 if (gi == g - 1 and qi == nq_blk - 1) else 0)
    return (
        _np.asarray(qi_of, _np.int32),
        _np.asarray(kj_of, _np.int32),
        _np.asarray(gi_of, _np.int32),
        _np.asarray(first_of, _np.int32),
        _np.asarray(last_of, _np.int32),
    )


def _bwd_dq_kernel(
    kvlen_ref, kvstart_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, scale: float, causal: bool, bq: int, bk: int, use_kvlen: bool,
    use_kvstart: bool = False, qi_ref=None, kj_ref=None, last_ref=None,
):
    b = pl.program_id(0)
    if qi_ref is not None:
        p_idx = pl.program_id(2)
        qi = qi_ref[p_idx]
        kj = kj_ref[p_idx]
        is_last = last_ref[p_idx] == 1
    else:
        qi = pl.program_id(2)
        kj = pl.program_id(3)
        is_last = kj == pl.num_programs(3) - 1

    @pl.when(kj == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q_start = qi * bq
    k_start = kj * bk
    # with a squashed grid every iteration is needed; otherwise predicate causal
    needed = (k_start <= q_start + bq - 1) if (causal and qi_ref is None) else (kj >= 0)

    @pl.when(needed)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_col = lse_ref[0, 0][:, :1]                   # (bq, 1)
        delta_col = delta_ref[0, 0][:, :1]               # (bq, 1)

        p = _recompute_p(
            q, k, lse_col, scale, q_start, k_start, bq, bk, causal,
            use_kvlen, kvlen_ref, b, use_kvstart, kvstart_ref,
        )
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_col)
        dq_acc[:] += scale * jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(is_last)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    kvlen_ref, kvstart_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale: float, causal: bool, bq: int, bk: int, use_kvlen: bool,
    nq_blk: int, use_kvstart: bool = False, qi_ref=None, kj_ref=None,
    first_ref=None, last_ref=None,
):
    # Grid dim 1 is the KV head; the index maps pick the query sub-head, so the
    # kernel itself never sees gi. dk/dv accumulate across ALL (gi, qi) visits
    # of a kv block in one VMEM scratch and are written once per kv head.
    b = pl.program_id(0)
    if qi_ref is not None:
        p_idx = pl.program_id(2)
        qi = qi_ref[p_idx]
        kj = kj_ref[p_idx]
        is_first = first_ref[p_idx] == 1
        is_last = last_ref[p_idx] == 1
    else:
        kj = pl.program_id(2)
        p3 = pl.program_id(3)                 # gi * nq_blk + qi
        qi = p3 % nq_blk
        is_first = p3 == 0
        is_last = p3 == pl.num_programs(3) - 1

    @pl.when(is_first)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = qi * bq
    k_start = kj * bk
    needed = (k_start <= q_start + bq - 1) if (causal and qi_ref is None) else (qi >= 0)

    @pl.when(needed)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_col = lse_ref[0, 0][:, :1]
        delta_col = delta_ref[0, 0][:, :1]

        p = _recompute_p(
            q, k, lse_col, scale, q_start, k_start, bq, bk, causal,
            use_kvlen, kvlen_ref, b, use_kvstart, kvstart_ref,
        )
        dv_acc[:] += jnp.dot(
            p.T.astype(do.dtype), do, preferred_element_type=jnp.float32
        )
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_col)
        dk_acc[:] += scale * jnp.dot(
            ds.T.astype(q.dtype), q, preferred_element_type=jnp.float32
        )

    @pl.when(is_last)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(res, grads, *, causal: bool, scale: float, bq: int, bk: int, interpret: bool):
    q, k, v, kv_lengths, kv_starts, out, lse = res
    do = grads[0]
    b, nq, t, h = q.shape
    nkv, s = k.shape[1], k.shape[2]
    g = nq // nkv
    bq_, bk_ = _block_sizes(t, s, bq, bk)
    use_kvlen = kv_lengths is not None
    kvlen = (
        kv_lengths.astype(jnp.int32)
        if kv_lengths is not None
        else jnp.full((b,), s, dtype=jnp.int32)
    )
    use_kvstart = kv_starts is not None
    kvstart = (
        kv_starts.astype(jnp.int32)
        if kv_starts is not None
        else jnp.zeros((b,), dtype=jnp.int32)
    )

    # delta = rowsum(dO * O); broadcast over STAT_LANES to match the lse layout
    delta3 = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta3[..., None], (b, nq, t, STAT_LANES))

    common = dict(scale=scale, causal=causal, bq=bq_, bk=bk_, use_kvlen=use_kvlen,
                  use_kvstart=use_kvstart)
    # grid-squash both backward kernels like the forward: skipped upper-triangle
    # blocks never get DMA'd (predication still pays the copies)
    squash = causal and t == s and (t // bq_) * (s // bk_) > 1

    if squash:
        dq_pairs = _causal_pairs(t // bq_, s // bk_, bq_, bk_)
        dq_grid = (b, nq, len(dq_pairs[0]))

        def dq_kernel(kvlen_ref, kvstart_ref, qi_ref, kj_ref, last_ref, *args):
            return _bwd_dq_kernel(
                kvlen_ref, kvstart_ref, *args, **common,
                qi_ref=qi_ref, kj_ref=kj_ref, last_ref=last_ref,
            )

        def dq_qmap(b_, h_, p, kvlen, kvst, qio, kjo, lasto):
            return (b_, h_, qio[p], 0)

        def dq_kvmap(b_, h_, p, kvlen, kvst, qio, kjo, lasto):
            return (b_, h_ // g, kjo[p], 0)

        dq_scalars = (kvlen, kvstart) + tuple(jnp.asarray(a) for a in dq_pairs)
        dq_nscalar = 5
    else:
        dq_grid = (b, nq, t // bq_, s // bk_)
        dq_kernel = functools.partial(_bwd_dq_kernel, **common)

        def dq_qmap(b_, h_, qi, kj, *refs):
            return (b_, h_, qi, 0)

        def dq_kvmap(b_, h_, qi, kj, *refs):
            return (b_, h_ // g, kj, 0)

        dq_scalars = (kvlen, kvstart)
        dq_nscalar = 2

    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=dq_nscalar,
            grid=dq_grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq_, h), dq_qmap),
                pl.BlockSpec((1, 1, bk_, h), dq_kvmap),
                pl.BlockSpec((1, 1, bk_, h), dq_kvmap),
                pl.BlockSpec((1, 1, bq_, h), dq_qmap),
                pl.BlockSpec((1, 1, bq_, STAT_LANES), dq_qmap),
                pl.BlockSpec((1, 1, bq_, STAT_LANES), dq_qmap),
            ],
            out_specs=pl.BlockSpec((1, 1, bq_, h), dq_qmap),
            scratch_shapes=[pltpu.VMEM((bq_, h), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq, t, h), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
            if squash
            else ("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_scalars, q, k, v, do, lse, delta)

    nq_blk = t // bq_
    if squash:
        dkv_pairs = _kv_major_group_pairs(nq_blk, s // bk_, bq_, bk_, g)
        dkv_grid = (b, nkv, len(dkv_pairs[0]))

        def dkv_kernel(kvlen_ref, kvstart_ref, qi_ref, kj_ref, gi_ref,
                       first_ref, last_ref, *args):
            return _bwd_dkv_kernel(
                kvlen_ref, kvstart_ref, *args, **common, nq_blk=nq_blk,
                qi_ref=qi_ref, kj_ref=kj_ref, first_ref=first_ref,
                last_ref=last_ref,
            )

        def dkv_qmap(b_, h_, p, kvlen, kvst, qio, kjo, gio, firsto, lasto):
            return (b_, h_ * g + gio[p], qio[p], 0)

        def dkv_kvmap(b_, h_, p, kvlen, kvst, qio, kjo, gio, firsto, lasto):
            return (b_, h_, kjo[p], 0)

        def dkv_outmap(b_, h_, p, kvlen, kvst, qio, kjo, gio, firsto, lasto):
            return (b_, h_, kjo[p], 0)

        dkv_scalars = (kvlen, kvstart) + tuple(jnp.asarray(a) for a in dkv_pairs)
        dkv_nscalar = 7
    else:
        dkv_grid = (b, nkv, s // bk_, g * nq_blk)
        dkv_kernel = functools.partial(_bwd_dkv_kernel, **common, nq_blk=nq_blk)

        def dkv_qmap(b_, h_, kj, p, *refs):
            return (b_, h_ * g + p // nq_blk, p % nq_blk, 0)

        def dkv_kvmap(b_, h_, kj, p, *refs):
            return (b_, h_, kj, 0)

        def dkv_outmap(b_, h_, kj, p, *refs):
            return (b_, h_, kj, 0)

        dkv_scalars = (kvlen, kvstart)
        dkv_nscalar = 2

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=dkv_nscalar,
            grid=dkv_grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq_, h), dkv_qmap),
                pl.BlockSpec((1, 1, bk_, h), dkv_kvmap),
                pl.BlockSpec((1, 1, bk_, h), dkv_kvmap),
                pl.BlockSpec((1, 1, bq_, h), dkv_qmap),
                pl.BlockSpec((1, 1, bq_, STAT_LANES), dkv_qmap),
                pl.BlockSpec((1, 1, bq_, STAT_LANES), dkv_qmap),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bk_, h), dkv_outmap),
                pl.BlockSpec((1, 1, bk_, h), dkv_outmap),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk_, h), jnp.float32),
                pltpu.VMEM((bk_, h), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, nkv, s, h), k.dtype),
            jax.ShapeDtypeStruct((b, nkv, s, h), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
            if squash
            else ("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_scalars, q, k, v, do, lse, delta)

    return dq, dk, dv, None, None


# ---------------------------------------------------------------------------
# Public entry (BTNH convention, custom VJP)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_bhtd(q, k, v, kv_lengths, kv_starts, causal, scale, bq, bk, interpret):
    out, _ = _fwd(
        q, k, v, kv_lengths, kv_starts, causal=causal, scale=scale, bq=bq, bk=bk,
        interpret=interpret,
    )
    return out


def _flash_fwd_rule(q, k, v, kv_lengths, kv_starts, causal, scale, bq, bk, interpret):
    out, lse = _fwd(
        q, k, v, kv_lengths, kv_starts, causal=causal, scale=scale, bq=bq, bk=bk,
        interpret=interpret,
    )
    return out, (q, k, v, kv_lengths, kv_starts, out, lse)


def _flash_bwd_rule(causal, scale, bq, bk, interpret, res, g):
    return _bwd(
        (*res,), (g,), causal=causal, scale=scale, bq=bq, bk=bk, interpret=interpret
    )


_flash_bhtd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,                      # (B, T, Nq, H)
    k: jax.Array,                      # (B, S, Nkv, H)
    v: jax.Array,
    *,
    causal: bool = True,
    kv_lengths: Optional[jax.Array] = None,
    kv_starts: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention in the framework's BTNH convention.

    kv_starts masks columns before a per-batch start (left padding, generation
    prefill); kv_lengths masks columns at/after a per-batch length (right padding).
    """
    h = q.shape[-1]
    if scale is None:
        scale = h ** -0.5
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash_bhtd(
        qt, kt, vt, kv_lengths, kv_starts, causal, float(scale), block_q, block_k,
        interpret,
    )
    return out.transpose(0, 2, 1, 3)
