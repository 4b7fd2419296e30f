"""Pallas TPU kernel: fused non-causal window attention (Swin teacher hot op).

Swin window attention is a batch of thousands of TINY attention problems —
(N=ws^2=144, D=32) per (window, head) — and the XLA path pays for it twice:
the f32 score tensors round-trip HBM between the two einsums and the softmax
(5+ GB per Swin-L stage-3 pass), and each (144x32)@(32x144) batched matmul
runs far below MXU rate (measured 4.7 TF/s for the stage-2 attention core on
v5e). This kernel keeps the whole per-window problem in VMEM: one program
loads a block of windows for one head, runs qk^T + rel-bias (+ shift mask) +
softmax + p@v back-to-back on the MXU/VPU, and writes only the (N, D) outputs.

Teacher-only (frozen Swin encoder: distill targets, OneFormer eval/demo), so
forward-only — no VJP. Gradients never flow into this op; the XLA reference
path (`window_attention_xla`) covers CPU/tests and any differentiable use.

Reference semantics: HF SwinSelfAttention (scores*scale + relative bias +
optional per-window shift mask, softmax, @v) — see models/teachers/swin.py
for the reference mapping (oneformer_head.py / modeling_swin.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_WINDOW_BLOCK = 8


def window_attention_xla(
    q: jax.Array,                  # (W, H, N, D)
    k: jax.Array,                  # (W, H, N, D)
    v: jax.Array,                  # (W, H, N, D)
    bias: jax.Array,               # (H, N, N) additive, pre-softmax
    mask: Optional[jax.Array],     # (nW, N, N) additive; tiles over W
    scale: float,
) -> jax.Array:
    """Reference XLA formulation (CPU path / kernel oracle)."""
    w, h, n, d = q.shape
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jnp.einsum("whnd,whmd->whnm", qf, k, preferred_element_type=jnp.float32)
    s = s + bias.astype(jnp.float32)[None]
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(w // nw, nw, h, n, n) + mask.astype(jnp.float32)[None, :, None]
        s = s.reshape(w, h, n, n)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "whnm,whmd->whnd", p.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, wb: int, scale: float):
    bias = bias_ref[0].astype(jnp.float32)          # (N, N)
    for w in range(wb):                              # static unroll: back-to-back MXU
        qw = q_ref[w, 0]                             # (N, D)
        s = jax.lax.dot_general(
            qw, k_ref[w, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        if mask_ref is not None:
            s = s + mask_ref[w].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(qw.dtype), v_ref[w, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[w, 0] = o.astype(o_ref.dtype)


def _kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, wb: int, scale: float):
    _kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref, wb=wb, scale=scale)


def window_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
    *,
    window_block: int = DEFAULT_WINDOW_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    w, h, n, d = q.shape
    nw = mask.shape[0] if mask is not None else w
    wb = min(window_block, nw, w)
    while nw % wb or w % wb:
        wb -= 1
    grid = (w // wb, h)

    qspec = pl.BlockSpec((wb, 1, n, d), lambda i, j: (i, j, 0, 0))
    bspec = pl.BlockSpec((1, n, n), lambda i, j: (j, 0, 0))
    in_specs = [qspec, qspec, qspec, bspec]
    args = [q, k, v, bias]
    if mask is not None:
        period = nw // wb
        in_specs.append(pl.BlockSpec((wb, n, n), lambda i, j: (i % period, 0, 0)))
        args.append(mask)
        kernel = functools.partial(_kernel, wb=wb, scale=scale)
    else:
        kernel = functools.partial(_kernel_nomask, wb=wb, scale=scale)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*args)


def _ambient_mesh():
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m is not None and not m.empty:
            return m
    except Exception:
        return None
    return None


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch: Pallas on TPU (shard_mapped under a multi-device mesh), XLA else.

    q/k/v (W, H, N, D) with W = batch*windows flattened batch-major; bias
    (H, N, N); mask (nW, N, N) tiling W with period nW. Forward-only on the
    Pallas path (frozen-teacher op).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if not use_pallas:
        return window_attention_xla(q, k, v, bias, mask, scale)

    mesh = _ambient_mesh()
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        from visper_lm_tpu.parallel.mesh import DATA_AXIS

        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        dp = axis_sizes.get(DATA_AXIS, 1)
        nw = mask.shape[0] if mask is not None else 1
        # shards must hold whole images' window runs so the mask period tiles
        if q.shape[0] % (dp * nw):
            return window_attention_xla(q, k, v, bias, mask, scale)
        qspec = P(DATA_AXIS)
        in_specs = (qspec, qspec, qspec, P(), P()) if mask is not None else (
            qspec, qspec, qspec, P())
        fn = jax.shard_map(
            functools.partial(
                _pallas_positional, scale=scale, with_mask=mask is not None,
                interpret=interpret,
            ),
            mesh=mesh,
            in_specs=in_specs,
            out_specs=qspec,
            check_vma=False,
        )
        return fn(q, k, v, bias, mask) if mask is not None else fn(q, k, v, bias)
    return window_attention_pallas(q, k, v, bias, mask, scale, interpret=interpret)


def _pallas_positional(q, k, v, bias, mask=None, *, scale, with_mask, interpret=False):
    return window_attention_pallas(
        q, k, v, bias, mask if with_mask else None, scale, interpret=interpret
    )
