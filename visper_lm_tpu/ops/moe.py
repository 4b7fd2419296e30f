"""Mixture-of-experts MLP with expert parallelism over an 'expert' mesh axis.

The reference has no MoE (its model zoo is dense Llama3/Phi3/Vicuna trunks,
SURVEY.md §2.1); this module fills the expert-parallel seam the TPU-native way
for future sparse trunks.

Design (GShard arXiv:2006.16668 / Switch arXiv:2101.03961 capacity dispatch,
re-derived for GSPMD):
  * top-k routing with renormalized gates (Mixtral-style);
  * STATIC-SHAPE dispatch: each expert owns a (C, D) buffer with capacity
    C = ceil(N·K/E · capacity_factor); the (token→slot) assignment is a pair
    of one-hot tensors contracted on the MXU, never a gather/scatter —
    overflowing tokens are dropped (their combine weight is 0, the residual
    stream carries them unchanged, standard GShard semantics);
  * expert weights (E, D, F) and the dispatched (E, C, D) buffer carry
    `with_sharding_constraint(P('expert', ...))` when the ambient mesh has an
    'expert' axis, so XLA inserts the token↔expert all_to_alls and runs each
    expert's FFN on its own shard — no manual collectives;
  * auxiliary losses returned, never hidden: Switch load-balance loss
    E·Σ_e f_e·p_e and the router z-loss mean(logsumexp(logits)²).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from visper_lm_tpu.parallel.mesh import EXPERT_AXIS

Params = Dict[str, Any]


def init_moe_mlp(
    key: jax.Array, d_model: int, mlp_dim: int, num_experts: int,
    dtype=jnp.bfloat16,
) -> Params:
    ks = jax.random.split(key, 4)
    s_in = 1.0 / math.sqrt(d_model)
    s_mid = 1.0 / math.sqrt(mlp_dim)

    def u(k, shape, s):
        return jax.random.uniform(k, shape, dtype=dtype, minval=-s, maxval=s)

    return {
        # router stays f32: tiny, and bf16 logits visibly perturb top-k ties
        "router": jax.random.normal(ks[0], (d_model, num_experts),
                                    jnp.float32) * 0.02,
        "gate": u(ks[1], (num_experts, d_model, mlp_dim), s_in),
        "up": u(ks[2], (num_experts, d_model, mlp_dim), s_in),
        "down": u(ks[3], (num_experts, mlp_dim, d_model), s_mid),
    }


def _expert_sharding_active() -> bool:
    from visper_lm_tpu.ops.attention import _ambient_mesh, _manual_axes

    mesh = _ambient_mesh()
    if mesh is None or EXPERT_AXIS in _manual_axes():
        return False
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(EXPERT_AXIS, 1) > 1


def moe_mlp(
    params: Params,
    x: jax.Array,                       # (B, T, D)
    *,
    top_k: int = 2,
    capacity_factor: float = 1.25,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (out (B,T,D), aux {lb_loss, z_loss, dropped_frac}).

    Exact invariant: with num_experts == 1 (or top_k == E and ample capacity,
    uniform router) this reproduces the dense silu-MLP on the same weights to
    float tolerance — pinned in tests/test_moe.py.
    """
    b, t, d = x.shape
    e = params["router"].shape[-1]
    k = min(top_k, e)
    n = b * t
    xf = x.reshape(n, d)

    logits = jnp.einsum(
        "nd,de->ne", xf.astype(jnp.float32), params["router"]
    )                                                        # (N, E) f32
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, k)            # (N, K)
    gate_vals = gate_vals / jnp.maximum(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
    )

    capacity = max(1, int(math.ceil(n * k / e * capacity_factor)))

    onehot_e = jax.nn.one_hot(gate_idx, e, dtype=jnp.float32)  # (N, K, E)
    # slot of each (token, k) inside its expert's buffer: running count over
    # the flattened (N·K) priority order (earlier tokens win capacity)
    flat = onehot_e.reshape(n * k, e)
    pos = jnp.cumsum(flat, axis=0) - flat                      # (N·K, E)
    pos = jnp.sum(pos * flat, axis=-1).reshape(n, k)           # (N, K)
    keep = (pos < capacity).astype(jnp.float32)                # (N, K)
    onehot_c = jax.nn.one_hot(
        pos.astype(jnp.int32), capacity, dtype=jnp.float32
    ) * keep[..., None]                                        # (N, K, C)

    dispatch = jnp.einsum("nke,nkc->nec", onehot_e, onehot_c)  # 0/1 (N,E,C)
    combine = jnp.einsum(
        "nk,nke,nkc->nec", gate_vals, onehot_e, onehot_c
    )                                                          # (N, E, C)

    shard = _expert_sharding_active()

    def _ec_sharded(v):
        if shard:
            return jax.lax.with_sharding_constraint(
                v, P(None, EXPERT_AXIS, None)
            )
        return v

    def _e_sharded(w):
        if shard:
            return jax.lax.with_sharding_constraint(
                w, P(EXPERT_AXIS, None, None)
            )
        return w

    dispatch = _ec_sharded(dispatch)
    combine = _ec_sharded(combine)

    # token -> expert buffers: a matmul, not a scatter (MXU + GSPMD all_to_all)
    xin = jnp.einsum(
        "nec,nd->ecd", dispatch.astype(x.dtype), xf,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if shard:
        xin = jax.lax.with_sharding_constraint(xin, P(EXPERT_AXIS, None, None))

    g = jnp.einsum(
        "ecd,edf->ecf", xin, _e_sharded(params["gate"]),
        preferred_element_type=jnp.float32,
    )
    u = jnp.einsum(
        "ecd,edf->ecf", xin, _e_sharded(params["up"]),
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum(
        "ecf,efd->ecd", (jax.nn.silu(g) * u).astype(x.dtype),
        _e_sharded(params["down"]), preferred_element_type=jnp.float32,
    )                                                          # (E, C, D) f32
    out = jnp.einsum(
        "nec,ecd->nd", combine, y, preferred_element_type=jnp.float32
    )

    # Switch load-balance loss: E * Σ_e (fraction of kept top-1 tokens on e)
    # * (mean router prob on e); z-loss regularizes logit magnitude
    top1 = onehot_e[:, 0, :] * keep[:, :1]                     # (N, E)
    f_e = jnp.mean(top1, axis=0)
    p_e = jnp.mean(probs, axis=0)
    lb_loss = e * jnp.sum(f_e * p_e)
    z_loss = jnp.mean(jnp.square(jax.nn.logsumexp(logits, axis=-1)))
    dropped = 1.0 - jnp.sum(keep) / (n * k)

    aux = {"lb_loss": lb_loss, "z_loss": z_loss, "dropped_frac": dropped}
    return out.reshape(b, t, d).astype(x.dtype), aux
