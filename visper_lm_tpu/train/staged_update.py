"""Blockwise-staged optimizer update for pinned-host-offloaded moments.

`tx.update` over a whole offloaded optimizer state forces XLA to stage the
ENTIRE moment tree into HBM before the first update op runs (measured:
9.5 GiB of per-chip temps for 7.6 GiB of moments in the 8B IFT AOT fit,
docs/Scale8B.md). This module makes the update a SEQUENCED stream:

  * Offloaded moment leaves bigger than `block_bytes` are stored PRE-CHUNKED
    along their leading (layer) axis as `ChunkedHostArray` pytrees — each
    chunk is an ordinary pinned-host array, so staging one chunk is a plain
    in-jit `jax.device_put` (the natively supported host<->HBM copy; slicing
    a host buffer in-graph is NOT well supported and materializes the whole
    leaf in HBM via HostExecute temps — measured, see git history).
  * The update math re-implements train.optimizer.make_optimizer exactly
    (optax.multi_transform over per-LR-group chains of clip_by_global_norm ->
    adamw(cosine schedule) -> [f32 master weights]); parity is pinned by
    tests/test_staged_update.py.
  * `lax.optimization_barrier` threads a token between blocks so block k+1's
    stage-in cannot be hoisted above block k's completion: peak HBM held by
    optimizer state drops from the whole tree to ~2 blocks.
  * Only leaves whose sharding covers every >1-sized mesh axis offload —
    XLA cannot partition side-effecting memory-space annotations with
    (partially) replicated shardings. Small/replicated moments (norm scales,
    schedule counts) stay in HBM; they are KiB-scale.

The reference gets the equivalent behavior from DeepSpeed's zero-offload
CPUAdam (scripts/zero3_offload.json); here the update math stays on the TPU
and only the state streams.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visper_lm_tpu.train.optimizer import (
    OptimizerConfig,
    _decay_mask,
    cosine_schedule,
    lr_group_labels,
)

_PEAK_LR = {
    "base": lambda c: c.learning_rate,
    "projector": lambda c: c.mm_projector_lr or c.learning_rate,
    "vision": lambda c: c.mm_vision_lr or c.learning_rate,
}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ChunkedHostArray:
    """A logically-whole array stored as chunks along axis 0 (each chunk an
    independent pinned-host array, so it stages to HBM as one plain copy).
    Also used, with NamedSharding/ShapeDtypeStruct chunks, as the matching
    node in sharding/shape trees."""

    chunks: Tuple[Any, ...]

    def tree_flatten(self):
        return tuple(self.chunks), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(chunks=tuple(children))

    @property
    def row_ranges(self) -> List[Tuple[int, int]]:
        out, s = [], 0
        for c in self.chunks:
            n = c.shape[0]
            out.append((s, s + n))
            s += n
        return out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StackedHostArray:
    """A logically-(K*r, ...) array stored as ONE pinned-host array of shape
    (K, r, ...). The blockwise update lax.scans over the leading axis, so the
    per-block staging HLO compiles ONCE per leaf shape instead of once per
    block (the unrolled ChunkedHostArray path's compile time is linear in
    chunk count — 661 s for the 8B IFT step, docs/Scale8B.md). XLA's memories
    pass keeps the scan xs/ys in host space and double-buffers one block
    through HBM (measured: 0.41 GiB temps for 16 x 256 MiB blocks vs 1.32
    unrolled). Requires uniform blocks: rows % K == 0."""

    data: Any

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(data=children[0])


def _is_chunked(x) -> bool:
    return isinstance(x, (ChunkedHostArray, StackedHostArray))


def _flat_with_keys(tree) -> Dict[str, Any]:
    """Flatten to {keystr: leaf}, treating ChunkedHostArray as a leaf so keys
    line up across params / grads / moments / shardings trees."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=_is_chunked
    )[0]:
        out[jax.tree_util.keystr(path)] = leaf
    return out


def _rebuild_tree(template, key_to_leaf: Dict[str, Any]):
    flat = jax.tree_util.tree_flatten_with_path(template, is_leaf=_is_chunked)[0]
    leaves = [key_to_leaf[jax.tree_util.keystr(p)] for p, _ in flat]
    structure = jax.tree_util.tree_structure(template, is_leaf=_is_chunked)
    return jax.tree_util.tree_unflatten(structure, leaves)


def _nbytes(s) -> int:
    return int(np.prod(s.shape)) * np.dtype(s.dtype).itemsize if s.shape else np.dtype(s.dtype).itemsize


def _covers_mesh(ns, mesh) -> bool:
    """True if the sharding shards over every mesh axis of size > 1 (fully
    sharded — no replication). Side-effecting memory-space annotations cannot
    be SPMD-partitioned when (partially) replicated."""
    axis_sizes = dict(zip(mesh.axis_names, np.shape(mesh.devices)))
    needed = {a for a, s in axis_sizes.items() if s > 1}
    spec = getattr(ns, "spec", None) or ()
    used = set()
    for entry in spec:
        for ax in entry if isinstance(entry, tuple) else (entry,):
            if ax is not None:
                used.add(ax)
    return needed <= used


def _axis0_unsharded(ns, mesh) -> bool:
    axis_sizes = dict(zip(mesh.axis_names, np.shape(mesh.devices)))
    spec = getattr(ns, "spec", None) or ()
    if not spec:
        return True
    entry = spec[0]
    for ax in entry if isinstance(entry, tuple) else (entry,):
        if ax is not None and axis_sizes.get(ax, 1) > 1:
            return False
    return True


def plan_offload_layout(
    opt_shape, opt_shardings, mesh, *,
    block_bytes: int = 256 << 20, min_bytes: int = 1 << 20,
    chunk: bool = True, scan_chunks: bool = False,
):
    """Transform (shape tree, sharding tree) for pinned-host offload:
    offloadable leaves get pinned_host memory kind; leaves larger than
    block_bytes with a free leading axis become blockwise-streamed nodes —
    ChunkedHostArray (per-chunk host arrays, unrolled update; the DEFAULT:
    the only formulation the current real TPU compiler handles at 8B scale,
    docs/Scale8B.md "Scanned staging vs the real TPU compiler").
    scan_chunks=True opts into StackedHostArray (one (K, rows/K, ...) host
    array the update lax.scans over — compile time O(1) in chunk count,
    CPU-parity-tested, but ICEs or compiles pathologically slowly on TPU
    today). chunk=False keeps every offloaded leaf a whole pinned-host
    array (the whole-tree-staging A/B path, whose update is a plain
    device_put + tx.update — chunked leaves would break optax tree math
    there). Returns (opt_shape, opt_shardings)."""

    def leaf(s, ns):
        if s is None or isinstance(s, optax.MaskedNode):
            return s, ns
        # schedule counts and other small leaves stay in HBM: offloading a
        # scalar would put the count arithmetic in host space (mixed-space
        # math error) for no memory win
        if _nbytes(s) < min_bytes or not _covers_mesh(ns, mesh):
            return s, ns  # stays in HBM (tiny/replicated)
        host_ns = ns.with_memory_kind("pinned_host")
        # chunk boundaries must be IDENTICAL across a param's mu/nu/master
        # leaves (their blocks are updated together against the same p/g
        # slices), so the decision uses shape only — f32-equivalent bytes —
        # never the leaf dtype (nu is often bf16 while mu is f32)
        nbytes = int(np.prod(s.shape)) * 4 if s.shape else 4
        n_rows = s.shape[0] if len(s.shape) > 1 else 1
        if (not chunk or nbytes <= block_bytes or n_rows <= 1
                or not _axis0_unsharded(ns, mesh)):
            return jax.ShapeDtypeStruct(s.shape, s.dtype), host_ns
        n_chunks = min(n_rows, math.ceil(nbytes / block_bytes))
        if scan_chunks:
            # smallest divisor of n_rows >= n_chunks: uniform blocks for the
            # scanned update. Overshooting the chunk COUNT is free (scan
            # compile time is O(1) in K); block size never exceeds
            # block_bytes since K >= n_chunks.
            K = next(k for k in range(n_chunks, n_rows + 1) if n_rows % k == 0)
            from jax.sharding import NamedSharding, PartitionSpec

            spec = tuple(getattr(host_ns, "spec", None) or ())
            stacked_ns = NamedSharding(
                host_ns.mesh, PartitionSpec(None, *spec),
                memory_kind="pinned_host",
            )
            shape = jax.ShapeDtypeStruct(
                (K, n_rows // K) + tuple(s.shape[1:]), s.dtype
            )
            return StackedHostArray(shape), StackedHostArray(stacked_ns)
        rows = [
            (i * n_rows // n_chunks, (i + 1) * n_rows // n_chunks)
            for i in range(n_chunks)
        ]
        shapes = ChunkedHostArray(tuple(
            jax.ShapeDtypeStruct((e - b,) + tuple(s.shape[1:]), s.dtype)
            for b, e in rows
        ))
        shardings = ChunkedHostArray(tuple(host_ns for _ in rows))
        return shapes, shardings

    flat_s = jax.tree_util.tree_flatten_with_path(opt_shape)[0]
    flat_n = _flat_with_keys(opt_shardings)
    new_s: Dict[str, Any] = {}
    new_n: Dict[str, Any] = {}
    for path, s in flat_s:
        k = jax.tree_util.keystr(path)
        ns = flat_n[k]
        new_s[k], new_n[k] = leaf(s, ns)
    return _rebuild_tree(opt_shape, new_s), _rebuild_tree(opt_shardings, new_n)


def init_opt_state_offloaded(tx, trainable, opt_shape, opt_shardings):
    """Materialize the (possibly chunked) offloaded optimizer state without
    ever holding the full moment tree in HBM: zeros are built on host per
    chunk and device_put straight into their pinned-host shardings; master
    chunks are per-chunk f32 casts of the param slices. A plain
    `jit(tx.init, out_shardings=...)` would allocate the full f32 tree on
    device first — 28+ GiB for a 3.8B full-trainable model on one chip."""
    p_flat = _flat_with_keys(trainable)

    def param_for(key: str):
        pk = max((k for k in p_flat if key.endswith(k)), key=len, default=None)
        return p_flat.get(pk) if pk is not None else None

    def build_one(key, s, ns):
        if "master" in key:
            src = param_for(key)
            if src is not None:
                return jax.jit(
                    lambda x: x.astype(s.dtype), out_shardings=ns
                )(src)
        return jax.device_put(np.zeros(s.shape, s.dtype), ns)

    def build(path_key, s, ns):
        if isinstance(s, StackedHostArray):
            shp, sns = s.data, ns.data
            K, r = shp.shape[0], shp.shape[1]
            if "master" in path_key:
                src = param_for(path_key)
                if src is not None:
                    # per-chunk jitted slice+cast keeps device temps at one
                    # block; the stack happens in host RAM. The block start
                    # is a TRACED operand (dynamic_slice), so all K blocks
                    # share one executable instead of compiling K variants
                    # with baked-in bounds.
                    cast = jax.jit(
                        lambda x, start, n=r, dt=shp.dtype:
                        jax.lax.dynamic_slice_in_dim(
                            x, start, n, axis=0
                        ).astype(dt)
                    )
                    pieces = [np.asarray(cast(src, i * r)) for i in range(K)]
                    return StackedHostArray(
                        jax.device_put(np.stack(pieces), sns)
                    )
            return StackedHostArray(
                jax.device_put(np.zeros(shp.shape, shp.dtype), sns)
            )
        if isinstance(s, ChunkedHostArray):
            chunks = []
            if "master" in path_key:
                src = param_for(path_key)
                start = 0
                # one jitted slice+cast per distinct (rows, sharding) — the
                # start is traced, so uniform chunks share an executable
                # (only a differing tail chunk compiles a second one)
                casts = {}
                for cs, cns in zip(s.chunks, ns.chunks):
                    n = cs.shape[0]
                    key = (n, cns)
                    if key not in casts:
                        casts[key] = jax.jit(
                            lambda x, a, n=n, dt=cs.dtype:
                            jax.lax.dynamic_slice_in_dim(
                                x, a, n, axis=0
                            ).astype(dt),
                            out_shardings=cns,
                        )
                    chunks.append(casts[key](src, start))
                    start += n
            else:
                for cs, cns in zip(s.chunks, ns.chunks):
                    chunks.append(jax.device_put(np.zeros(cs.shape, cs.dtype), cns))
            return ChunkedHostArray(tuple(chunks))
        if s is None or isinstance(s, optax.MaskedNode):
            return s
        return build_one(path_key, s, ns)

    sh_flat = _flat_with_keys(opt_shape)
    ns_flat = _flat_with_keys(opt_shardings)
    out = {k: build(k, s, ns_flat[k]) for k, s in sh_flat.items()}
    return _rebuild_tree(opt_shape, out)


def _barrier(token, arrs: List[Any]) -> Tuple[Any, List[Any]]:
    if not arrs:
        return token, arrs
    out = jax.lax.optimization_barrier(tuple([token] + list(arrs)))
    return out[0], list(out[1:])


def _leaf_update(
    p, g, mu, nu, master, cfg: OptimizerConfig, *,
    clip_scale, lr, c_inc, decay: bool,
):
    """One block's chain(clip -> scale_by_adam -> add_decayed_weights ->
    scale(-lr) -> [master]) update, computed in f32. Returns
    (new_p, new_mu, new_nu, new_master)."""
    f32 = jnp.float32
    g = g.astype(f32) * clip_scale
    new_mu = (cfg.b1 * mu.astype(f32) + (1.0 - cfg.b1) * g).astype(mu.dtype)
    new_nu = (cfg.b2 * nu.astype(f32) + (1.0 - cfg.b2) * jnp.square(g)).astype(
        nu.dtype
    )
    mu_hat = new_mu.astype(f32) / (1.0 - cfg.b1 ** c_inc)
    nu_hat = new_nu.astype(f32) / (1.0 - cfg.b2 ** c_inc)
    u = mu_hat / (jnp.sqrt(nu_hat) + cfg.eps)
    if decay and cfg.weight_decay:
        u = u + cfg.weight_decay * p.astype(f32)
    u = -lr * u
    if master is not None:
        new_master = master + u
        new_p = new_master.astype(p.dtype)
        return new_p, new_mu, new_nu, new_master
    new_p = (p.astype(f32) + u).astype(p.dtype)
    return new_p, new_mu, new_nu, None


def _label_state(mstate):
    """Unpack one label's MaskedState(chain state) -> (adam, sched, master)
    or None for stateless labels (set_to_zero / empty)."""
    inner = mstate.inner_state
    if isinstance(inner, optax.EmptyState) or not isinstance(inner, tuple) or len(inner) < 2:
        return None
    adam_chain = inner[1]
    adam, _, sched = adam_chain
    master = inner[2]["master"] if len(inner) > 2 else None
    return adam, sched, master


def _rebuild_label(mstate, new_adam, new_sched, new_master):
    inner = mstate.inner_state
    adam_chain = (new_adam, inner[1][1], new_sched)
    parts: Tuple[Any, ...] = (inner[0], adam_chain)
    if len(inner) > 2:
        parts = parts + ({"master": new_master},)
    return optax.MaskedState(inner_state=parts)


def _stage_in(x, host_ns, dev_ns):
    if host_ns is not None and getattr(host_ns, "memory_kind", None) == "pinned_host":
        # explicit sharding constraint first: the SPMD partitioner requires
        # the memory-space annotate op to carry a concrete sharding
        x = jax.lax.with_sharding_constraint(x, host_ns)
        return jax.device_put(x, dev_ns)
    return x


def _stage_out(x, host_ns, dev_ns):
    if host_ns is not None and getattr(host_ns, "memory_kind", None) == "pinned_host":
        x = jax.lax.with_sharding_constraint(x, dev_ns)
        return jax.device_put(x, host_ns)
    return x


def blockwise_staged_update(
    grads,
    opt_state,
    params,
    cfg: OptimizerConfig,
    *,
    opt_shardings=None,
    opt_to_device=None,
    grads_on_host: bool = False,
    grad_cache_bytes: int = 256 << 20,
):
    """Drop-in replacement for `tx.update(...) + optax.apply_updates(...)`
    (tx = train.optimizer.make_optimizer(params, cfg)) that streams offloaded
    moments through HBM one block at a time. Handles plain, pinned-host, and
    ChunkedHostArray moment leaves. grads_on_host: grad leaves live in
    pinned host memory (the gradient-streaming backward,
    models/decoder.host_grad_segment - single-chip only) and are staged to
    device behind the same token chain as the moments; the per-label norm
    pass keeps its staged device copies alive up to `grad_cache_bytes` so
    those leaves cross the host link once per step, not twice (the rest
    re-stage in the update loop — bounded extra HBM, halved PCIe for the
    cached prefix). Returns (new_params, new_opt, grad_norm)."""
    labels = lr_group_labels(params, cfg, cfg.stage)
    decay = _decay_mask(params)
    p_flat = _flat_with_keys(params)
    g_flat = _flat_with_keys(grads)
    decay_flat = _flat_with_keys(decay)

    new_params_flat: Dict[str, Any] = dict(p_flat)  # frozen leaves unchanged
    new_inner: Dict[str, Any] = {}
    token = jnp.zeros((), jnp.int32)
    total_gsq = jnp.float32(0.0)

    for label, mstate in opt_state.inner_states.items():
        unpacked = _label_state(mstate)
        if unpacked is None:
            new_inner[label] = mstate
            continue
        adam, sched, master = unpacked
        mu_flat = _flat_with_keys(adam.mu)
        nu_flat = _flat_with_keys(adam.nu)
        ms_flat = _flat_with_keys(master) if master is not None else {}
        keys = list(mu_flat.keys())

        dev_any = None
        if grads_on_host:
            # memory-SPACE transfer: stages the host grad leaf back into HBM
            # while preserving whatever partitioning it carries — replicated
            # single-chip leaves and ZeRO/TP-sharded multi-chip leaves alike
            # (an explicit NamedSharding target would have to reproduce each
            # leaf's spec).
            from jax import memory as _jax_memory

            dev_any = _jax_memory.Space.Device

        def _g_to_dev(g, tok):
            # stage one host grad leaf to device behind the token chain
            if dev_any is None:
                return g, tok
            tok, staged = _barrier(tok, [g])
            return jax.device_put(staged[0], dev_any), tok

        # per-label global-norm clip (multi_transform masks each label's
        # chain, so clip_by_global_norm sees only that label's grads).
        # computed up front from the full grads — by dataflow this runs
        # before any update block, so grad leaves can free as blocks consume
        # them. Host-resident grads stage in one leaf at a time (token chain)
        # so the norm pass never holds more than one leaf in HBM.
        # norm-pass staging reuse: the update loop consumes leaves in the same
        # key order, so keep the staged device copy of the first leaves (the
        # ones freed soonest) within the byte budget instead of discarding and
        # re-staging every leaf
        staged_cache: Dict[str, Any] = {}
        if keys:
            gsq = jnp.float32(0.0)
            cached_bytes = 0
            for k in keys:
                gd, token = _g_to_dev(g_flat[k], token)
                if dev_any is not None:
                    nb = int(np.prod(gd.shape) if gd.shape else 1) * np.dtype(
                        gd.dtype
                    ).itemsize
                    if cached_bytes + nb <= grad_cache_bytes:
                        staged_cache[k] = gd
                        cached_bytes += nb
                gsq = gsq + jnp.sum(jnp.square(gd.astype(jnp.float32)))
            gn = jnp.sqrt(gsq)
            clip_scale = jnp.minimum(
                1.0, cfg.max_grad_norm / jnp.maximum(gn, 1e-16)
            )
        else:
            gn = jnp.float32(0.0)
            clip_scale = jnp.float32(1.0)

        c_inc = adam.count + 1
        lr = cosine_schedule(cfg, _PEAK_LR[label](cfg))(sched.count)

        def _sub(tree, attr):
            if tree is None:
                return {}
            st = _label_state(tree.inner_states[label])
            if st is None:
                return {}
            a, _, m = st
            src = {"mu": a.mu, "nu": a.nu, "master": m}[attr]
            return _flat_with_keys(src) if src is not None else {}

        host_sh = {a: _sub(opt_shardings, a) for a in ("mu", "nu", "master")}
        dev_sh = {a: _sub(opt_to_device, a) for a in ("mu", "nu", "master")}

        new_mu_flat: Dict[str, Any] = {}
        new_nu_flat: Dict[str, Any] = {}
        new_ms_flat: Dict[str, Any] = {}

        for k in keys:
            p, g = p_flat[k], g_flat[k]
            mu, nu = mu_flat[k], nu_flat[k]
            ms = ms_flat.get(k)
            dec = bool(decay_flat[k])
            kw = dict(cfg=cfg, clip_scale=clip_scale, lr=lr, c_inc=c_inc,
                      decay=dec)

            if grads_on_host:
                cached = staged_cache.pop(k, None)
                if cached is not None:
                    g = cached
                else:
                    g, token = _g_to_dev(g, token)

            if isinstance(mu, StackedHostArray):
                # scanned streaming: ONE staged-update body compiled per leaf
                # shape; the scan slices the (K, r, ...) host moments block by
                # block (XLA memories keeps xs/ys host-resident and
                # double-buffers one block through HBM — measured vs the
                # unrolled path in docs/Scale8B.md)
                from jax.sharding import NamedSharding, PartitionSpec

                def _blk_ns(table, attr, kind):
                    entry = table[attr].get(k)
                    if entry is None:
                        return None
                    ns_st = entry.data
                    spec = tuple(getattr(ns_st, "spec", None) or ())
                    ns_blk = NamedSharding(ns_st.mesh, PartitionSpec(*spec[1:]))
                    return ns_blk.with_memory_kind(kind) if kind else ns_blk

                _ent = host_sh["mu"].get(k)
                offl = (
                    _ent is not None
                    and getattr(_ent.data, "memory_kind", None) == "pinned_host"
                )

                def _in(x, attr):
                    return (
                        jax.device_put(x, _blk_ns(dev_sh, attr, None))
                        if offl else x
                    )

                def _out(x, attr):
                    return (
                        jax.device_put(x, _blk_ns(host_sh, attr, "pinned_host"))
                        if offl else x
                    )

                Kc = mu.data.shape[0]
                r = mu.data.shape[1]
                p_st = p.reshape((Kc, r) + p.shape[1:])
                g_st = g.reshape((Kc, r) + g.shape[1:])
                xs = [p_st, g_st, mu.data, nu.data]
                if ms is not None:
                    xs.append(ms.data)

                def body(tok, xs_i):
                    pc, gc = xs_i[0], xs_i[1]
                    ins = list(xs_i[2:])
                    tok, ins = _barrier(tok, ins)
                    muc = _in(ins[0], "mu")
                    nuc = _in(ins[1], "nu")
                    msc = _in(ins[2], "master") if ms is not None else None
                    np_, nmu, nnu, nms = _leaf_update(pc, gc, muc, nuc, msc, **kw)
                    nmu = _out(nmu, "mu")
                    nnu = _out(nnu, "nu")
                    outs = [np_, nmu, nnu]
                    if nms is not None:
                        outs.append(_out(nms, "master"))
                    tok, outs = _barrier(tok, outs)
                    return tok, tuple(outs)

                token, ys = jax.lax.scan(body, token, tuple(xs))
                new_params_flat[k] = ys[0].reshape(p.shape)
                new_mu_flat[k] = StackedHostArray(ys[1])
                new_nu_flat[k] = StackedHostArray(ys[2])
                if ms is not None:
                    new_ms_flat[k] = StackedHostArray(ys[3])
                continue

            if _is_chunked(mu):
                def _chunk_ns(table, attr, idx):
                    entry = table[attr].get(k)
                    return entry.chunks[idx] if entry is not None else None

                out_p, out_mu, out_nu, out_ms = [], [], [], []
                for i, (s, e) in enumerate(mu.row_ranges):
                    pc = jax.lax.slice_in_dim(p, s, e, axis=0)
                    gc = jax.lax.slice_in_dim(g, s, e, axis=0)
                    ins = [mu.chunks[i], nu.chunks[i]] + (
                        [ms.chunks[i]] if ms is not None else []
                    )
                    token, ins = _barrier(token, ins)
                    muc = _stage_in(ins[0], _chunk_ns(host_sh, "mu", i),
                                    _chunk_ns(dev_sh, "mu", i))
                    nuc = _stage_in(ins[1], _chunk_ns(host_sh, "nu", i),
                                    _chunk_ns(dev_sh, "nu", i))
                    msc = None
                    if ms is not None:
                        msc = _stage_in(ins[2], _chunk_ns(host_sh, "master", i),
                                        _chunk_ns(dev_sh, "master", i))
                    np_, nmu, nnu, nms = _leaf_update(pc, gc, muc, nuc, msc, **kw)
                    nmu = _stage_out(nmu, _chunk_ns(host_sh, "mu", i),
                                     _chunk_ns(dev_sh, "mu", i))
                    nnu = _stage_out(nnu, _chunk_ns(host_sh, "nu", i),
                                     _chunk_ns(dev_sh, "nu", i))
                    if nms is not None:
                        nms = _stage_out(nms, _chunk_ns(host_sh, "master", i),
                                         _chunk_ns(dev_sh, "master", i))
                    outs = [np_, nmu, nnu] + ([nms] if nms is not None else [])
                    token, outs = _barrier(token, outs)
                    out_p.append(outs[0])
                    out_mu.append(outs[1])
                    out_nu.append(outs[2])
                    if ms is not None:
                        out_ms.append(outs[3])
                new_params_flat[k] = jnp.concatenate(out_p, axis=0)
                new_mu_flat[k] = ChunkedHostArray(tuple(out_mu))
                new_nu_flat[k] = ChunkedHostArray(tuple(out_nu))
                if ms is not None:
                    new_ms_flat[k] = ChunkedHostArray(tuple(out_ms))
                continue

            host_mu = host_sh["mu"].get(k)
            offloaded = getattr(host_mu, "memory_kind", None) == "pinned_host"
            ins = [mu, nu] + ([ms] if ms is not None else [])
            if offloaded:
                token, ins = _barrier(token, ins)
                muc = _stage_in(ins[0], host_mu, dev_sh["mu"][k])
                nuc = _stage_in(ins[1], host_sh["nu"][k], dev_sh["nu"][k])
                msc = (
                    _stage_in(ins[2], host_sh["master"][k], dev_sh["master"][k])
                    if ms is not None else None
                )
            else:
                muc, nuc = ins[0], ins[1]
                msc = ins[2] if ms is not None else None
            np_, nmu, nnu, nms = _leaf_update(p, g, muc, nuc, msc, **kw)
            if offloaded:
                nmu = _stage_out(nmu, host_mu, dev_sh["mu"][k])
                nnu = _stage_out(nnu, host_sh["nu"][k], dev_sh["nu"][k])
                if nms is not None:
                    nms = _stage_out(nms, host_sh["master"][k], dev_sh["master"][k])
                outs = [np_, nmu, nnu] + ([nms] if nms is not None else [])
                token, outs = _barrier(token, outs)
                np_, nmu, nnu = outs[0], outs[1], outs[2]
                if nms is not None:
                    nms = outs[3]
            new_params_flat[k] = np_
            new_mu_flat[k] = nmu
            new_nu_flat[k] = nnu
            if ms is not None:
                new_ms_flat[k] = nms

        new_adam = adam._replace(
            count=c_inc,
            mu=_rebuild_tree(adam.mu, new_mu_flat),
            nu=_rebuild_tree(adam.nu, new_nu_flat),
        )
        new_sched = sched._replace(count=sched.count + 1)
        new_master = (
            _rebuild_tree(master, new_ms_flat) if master is not None else None
        )
        new_inner[label] = _rebuild_label(mstate, new_adam, new_sched, new_master)
        total_gsq = total_gsq + jnp.square(gn)

    new_opt = type(opt_state)(inner_states=new_inner)
    new_params = _rebuild_tree(params, new_params_flat)
    return new_params, new_opt, jnp.sqrt(total_gsq)


def chunk_state_like(opt_state, opt_shape):
    """Re-layout a tx.init-shaped optimizer state into the chunked layout of
    `opt_shape` (host-side, test/checkpoint-restore helper)."""
    flat = _flat_with_keys(opt_state)
    shapes = _flat_with_keys(opt_shape)
    out = {}
    for k, s in shapes.items():
        v = flat[k]
        if isinstance(s, ChunkedHostArray) and not _is_chunked(v):
            chunks, start = [], 0
            for cs in s.chunks:
                chunks.append(jnp.asarray(v[start:start + cs.shape[0]]))
                start += cs.shape[0]
            out[k] = ChunkedHostArray(tuple(chunks))
        elif isinstance(s, StackedHostArray) and not _is_chunked(v):
            out[k] = StackedHostArray(jnp.reshape(jnp.asarray(v), s.data.shape))
        else:
            out[k] = v
    return _rebuild_tree(opt_shape, out)


def unchunk_state(opt_state):
    """Inverse of chunk_state_like: concatenate ChunkedHostArray leaves back
    into whole arrays (host-side helper for checkpoint export/inspection)."""

    def fix(x):
        if isinstance(x, StackedHostArray):
            d = jnp.asarray(x.data)
            return jnp.reshape(d, (d.shape[0] * d.shape[1],) + d.shape[2:])
        if _is_chunked(x):
            return jnp.concatenate([jnp.asarray(c) for c in x.chunks], axis=0)
        return x

    return jax.tree_util.tree_map(fix, opt_state, is_leaf=_is_chunked)
