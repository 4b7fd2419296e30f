"""Pipeline parallelism: GPipe-style layer pipelining over a 'pipe' mesh axis.

The reference delegates ALL distribution to DeepSpeed ZeRO (SURVEY.md §2.9) and
has no pipeline parallelism; this module fills the seam the TPU-native way, for
topologies where the decoder stack doesn't fit a TP×ZeRO shard (e.g. multi-pod
slices where cross-pod all-gathers ride DCN but neighbor hops stay on ICI).

Mechanics (GPipe, arXiv:1811.06965, re-derived on shard_map):
the stacked layer parameters (L, ...) are sharded along 'pipe' — stage s owns
the contiguous layer range [s·L/S, (s+1)·L/S). The batch splits into M
microbatches; a scan over M+S-1 ticks runs every stage on its current
microbatch and `ppermute`s activations one hop around the ring. Stage s
processes microbatch (t-s) at tick t, so the schedule is the classic GPipe
parallelogram with (S-1)/(M+S-1) bubble overhead. Activations cross stages
once per microbatch per boundary — point-to-point neighbor traffic, no
collectives.

The shard_map is MANUAL only over 'pipe' (jax 0.9 `axis_names`): data/model
axes stay automatic, so GSPMD still shards the batch over 'data' and the
per-layer matmuls over 'model' inside each stage. Differentiable end-to-end:
autodiff reverses the tick scan and transposes each ppermute to the reverse
ring, which is exactly the backward pipeline schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from visper_lm_tpu.parallel.mesh import PIPE_AXIS


def pipeline_scan(
    block_fn: Callable[[Any, jax.Array, Any], jax.Array],
    stacked_params: Any,               # pytree, every leaf (L, ...)
    h: jax.Array,                      # (B, ...) global activations
    micro_args: Any = (),              # pytree of (B, ...) per-sample tensors
    *,
    mesh: Mesh,
    n_micro: Optional[int] = None,
    pipe_axis: str = PIPE_AXIS,
) -> jax.Array:
    """Apply L stacked layers to h through an S-stage pipeline.

    block_fn(block, h_micro, micro_args_micro) -> h_micro applies ONE layer
    to one microbatch; `micro_args` leaves with leading dim B are split into
    microbatches alongside h (leaves whose leading dim != B are passed
    through whole — e.g. (1, T, D) rope tables shared across samples).

    Exact: produces the same values as lax.scan over the L layers (the
    pipeline only reorders when each (layer, microbatch) cell runs).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_stages = axis_sizes.get(pipe_axis, 1)
    leaves = jax.tree_util.tree_leaves(stacked_params)
    n_layers = leaves[0].shape[0]
    if s_stages == 1:
        def body(hh, blk):
            return block_fn(blk, hh, micro_args), None

        out, _ = jax.lax.scan(body, h, stacked_params)
        return out

    if n_layers % s_stages:
        raise ValueError(f"layers ({n_layers}) % pipe stages ({s_stages}) != 0")
    b = h.shape[0]
    m = n_micro if n_micro is not None else s_stages
    if b % m:
        raise ValueError(f"batch ({b}) % n_micro ({m}) != 0")

    h_m = h.reshape((m, b // m) + h.shape[1:])

    def _split(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == b:
            return x.reshape((m, b // m) + x.shape[1:])
        return x

    is_split = jax.tree_util.tree_map(
        lambda x: hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == b,
        micro_args,
    )
    args_m = jax.tree_util.tree_map(_split, micro_args)

    fn = jax.shard_map(
        functools.partial(
            _stage, block_fn=block_fn, s_stages=s_stages, m=m,
            pipe_axis=pipe_axis, is_split=is_split,
        ),
        mesh=mesh,
        in_specs=(P(pipe_axis), P(), P()),
        out_specs=P(pipe_axis),
        axis_names=frozenset({pipe_axis}),
        # partial-manual shard_map REQUIRES varying-axis typing (with
        # check_vma=False every output is typed as varying over ALL mesh axes
        # and the out_specs are rejected); _stage promotes the replicated
        # inputs to pipe-varying (lax.pcast) where they mix with varying values
        check_vma=True,
    )
    out = fn(stacked_params, h_m, args_m)          # (S, M, B/M, ...)
    return out[-1].reshape((b,) + h.shape[1:])


def _to_varying(x, axis_name):
    """Promote a replicated value's varying-axis type (pcast replaced the
    deprecated jax.lax.pvary; keep a fallback for older jax)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    return jax.lax.pvary(x, (axis_name,))


def _stage(blocks, h_m, args_m, *, block_fn, s_stages, m, pipe_axis, is_split):
    s = jax.lax.axis_index(pipe_axis)
    perm = [(i, (i + 1) % s_stages) for i in range(s_stages)]
    # replicated inputs mix with pipe-varying values below — promote their
    # vma type explicitly (check_vma=True)
    h_m = _to_varying(h_m, pipe_axis)
    args_m = jax.tree_util.tree_map(
        lambda x: _to_varying(x, pipe_axis), args_m
    )
    h0 = jnp.zeros_like(h_m[0])                     # varying (inherits from h_m)
    out0 = _to_varying(jnp.zeros(h_m.shape, h_m.dtype), pipe_axis)

    def tick(carry, t_):
        h_cur, out_buf = carry
        # stage 0 ingests microbatch t (clamped ticks past M recompute the
        # last microbatch; its output is never collected)
        h_in = jax.lax.dynamic_index_in_dim(
            h_m, jnp.clip(t_, 0, m - 1), 0, keepdims=False
        )
        h_cur = jnp.where(s == 0, h_in, h_cur)
        # stage s works on microbatch t - s; bubbles (t < s) run layer math on
        # zeros — wasted-but-harmless compute, the GPipe bubble
        midx = jnp.clip(t_ - s, 0, m - 1)
        a = jax.tree_util.tree_map(
            lambda x, split: jax.lax.dynamic_index_in_dim(
                x, midx, 0, keepdims=False
            ) if split else x,
            args_m, is_split,
        )

        def layer(hh, blk):
            return block_fn(blk, hh, a), None

        h_out, _ = jax.lax.scan(layer, h_cur, blocks)
        # collect: only the LAST stage's writes survive into the returned
        # shard; oidx is monotonic in t, so the clamped bubble writes at
        # index 0 (t < S-1) are overwritten by the valid t = S-1 write
        oidx = jnp.clip(t_ - (s_stages - 1), 0, m - 1)
        out_buf = jax.lax.dynamic_update_index_in_dim(out_buf, h_out, oidx, 0)
        h_nxt = jax.lax.ppermute(h_out, pipe_axis, perm)
        return (h_nxt, out_buf), None

    (_, out_buf), _ = jax.lax.scan(
        tick, (h0, out0), jnp.arange(m + s_stages - 1, dtype=jnp.int32)
    )
    return out_buf[None]                            # (1, M, B/M, ...) per stage
