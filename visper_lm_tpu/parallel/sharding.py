"""Parameter / optimizer-state sharding rules (GSPMD partition specs).

The reference's distribution stack (DeepSpeed ZeRO-2 grad/optimizer sharding +
DDP, scripts/zero2.json) maps onto GSPMD as:

  * Tensor parallelism ('model' axis): decoder attention + MLP matmuls are sharded
    Megatron-style — column-parallel q/k/v/gate/up, row-parallel o/down — purely by
    annotating param specs; XLA inserts the all-reduces. The reference has NO TP
    (SURVEY.md §2.9); we design it in from day 1 for 8B on v5e.
  * ZeRO-1/2 ('data' axis): optimizer state (and, with `zero_params`, the params
    themselves à la ZeRO-3) get the 'data' axis added to their largest still-
    unsharded divisible dimension. Gradients reduce-scatter automatically when the
    optimizer update is sharded this way.

Specs are assigned by parameter tree path with regex rules, so new modules get
sensible defaults (replicated) and hot decoder weights get TP.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visper_lm_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS

# (path-regex, spec) — first match wins. Paths look like
# "decoder/blocks/q_proj/kernel"; stacked block params have a leading layer axis.
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # decoder token embedding / output head: shard vocab on 'model'
    (r"decoder/embed_tokens/embedding$", P(MODEL_AXIS, None)),
    (r"decoder/lm_head/kernel$", P(None, MODEL_AXIS)),
    # stacked decoder blocks: (L, in, out) kernels
    (r"decoder/blocks(?:_chunks/\d+)?/(q_proj|k_proj|v_proj)/kernel$", P(None, None, MODEL_AXIS)),
    (r"decoder/blocks(?:_chunks/\d+)?/o_proj/kernel$", P(None, MODEL_AXIS, None)),
    (r"decoder/blocks(?:_chunks/\d+)?/(gate_proj|up_proj)/kernel$", P(None, None, MODEL_AXIS)),
    (r"decoder/blocks(?:_chunks/\d+)?/down_proj/kernel$", P(None, MODEL_AXIS, None)),
    # MoE expert banks (L, E, din, dout): experts over 'expert' (matches the
    # in-graph constraints ops/moe.py applies); router is tiny, replicated
    (
        r"decoder/blocks/(moe_gate|moe_up|moe_down)/kernel$",
        P(None, EXPERT_AXIS, None, None),
    ),
    # everything else (norms, vision tower, projector, heads, task tokens): replicated
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_pspecs(params: Any) -> Any:
    """PartitionSpec tree matching the param tree."""

    def assign(path, leaf):
        p = _path_str(path)
        for pattern, spec in _PARAM_RULES:
            if re.search(pattern, p):
                if len(spec) <= leaf.ndim:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(assign, params)


def zero_pspec(spec: P, shape: Tuple[int, ...], data_size: int, min_size: int = 2**16) -> P:
    """Add the 'data' axis to the largest unsharded divisible dim (ZeRO sharding).

    Small tensors (norm scales, biases) stay replicated — sharding them buys nothing
    and costs collective launches.
    """
    if int(np.prod(shape)) < min_size or data_size <= 1:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    if any(
        e == DATA_AXIS or (isinstance(e, tuple) and DATA_AXIS in e)
        for e in entries
    ):
        # already ZeRO-sharded (e.g. an optimizer moment inheriting a zero3
        # param spec) — a second 'data' entry is illegal and redundant
        return spec
    best_axis, best_dim = None, 0
    for i, (s, d) in enumerate(zip(entries, shape)):
        if s is None and d % data_size == 0 and d > best_dim:
            best_axis, best_dim = i, d
    if best_axis is None:
        return spec
    entries[best_axis] = DATA_AXIS
    return P(*entries)


def opt_state_pspecs(params: Any, param_specs: Any, mesh: Mesh, opt_state: Any) -> Any:
    """Partition specs for an optax optimizer state: moment tensors (same shape as a
    param) get the param's spec + ZeRO 'data' sharding; scalars/counters replicate."""
    data_size = mesh.shape[DATA_AXIS]

    shape_to_spec: Dict[Tuple[Tuple[int, ...], str], P] = {}
    flat_params = jax.tree_util.tree_leaves_with_path(params)
    flat_specs = jax.tree_util.tree_leaves(
        param_specs, is_leaf=lambda x: isinstance(x, P)
    )
    for (path, leaf), spec in zip(flat_params, flat_specs):
        shape_to_spec[(tuple(leaf.shape), _path_str(path).split("/")[-1])] = spec

    param_spec_by_shape: Dict[Tuple[int, ...], P] = {}
    for (path, leaf), spec in zip(flat_params, flat_specs):
        param_spec_by_shape.setdefault(tuple(leaf.shape), spec)

    def assign(leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        if len(shape) == 0:
            return P()
        base = param_spec_by_shape.get(shape, P())
        return zero_pspec(base, shape, data_size)

    return jax.tree_util.tree_map(assign, opt_state)


def to_named(specs: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_pspecs(batch: Dict[str, Any], leading_accum: bool = False) -> Dict[str, Any]:
    """Shard every batch array along 'data' on its leading (batch) axis.

    leading_accum: the batch carries a leading gradient-accumulation axis
    (accum_steps, batch, ...) that the train step scans over; the batch axis is
    then axis 1, and the accumulation axis stays unsharded so every microbatch
    is a complete 'data'-sharded step input."""

    def assign(leaf):
        nd = getattr(leaf, "ndim", 0)
        if leading_accum:
            if nd <= 1:
                return P()
            return P(None, DATA_AXIS, *([None] * (nd - 2)))
        if nd == 0:
            return P()
        return P(DATA_AXIS, *([None] * (nd - 1)))

    return jax.tree_util.tree_map(assign, batch)


def constrain(x: jax.Array, mesh: Mesh, spec: P) -> jax.Array:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def model_shard_pspec(shape: Tuple[int, ...], tp_size: int, min_size: int = 2 ** 16) -> P:
    """Shard the largest tp-divisible dim over 'model' (frozen teacher weights:
    read-only, all-gathered once per use; persistent HBM /= tp). Small tensors
    replicate."""
    if tp_size <= 1 or not shape or int(np.prod(shape)) < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % tp_size == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    entries = [None] * len(shape)
    entries[best] = MODEL_AXIS
    return P(*entries)
