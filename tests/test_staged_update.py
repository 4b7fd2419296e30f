"""Blockwise staged optimizer update == optax (train/staged_update.py).

The blockwise path re-implements make_optimizer's update math (multi_transform
over chain(clip_by_global_norm, adamw(cosine), [master])) so offloaded moments
can stream through HBM; these tests pin its semantics to tx.update +
optax.apply_updates leaf-for-leaf, including the per-label clip norms,
schedule counts, decay mask, and the chunked (split-stacked-leaf) path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from visper_lm_tpu.train.optimizer import OptimizerConfig, make_optimizer, trainable_mask
from visper_lm_tpu.train.staged_update import (
    blockwise_staged_update,
    init_opt_state_offloaded,
)
from visper_lm_tpu.utils.param import partition_params


def _params(dtype):
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dtype)

    return {
        "decoder": {
            # stacked (L, in, out) like the real decoder blocks
            "blocks": {"q_proj": {"kernel": arr(4, 8, 8)},
                       "norm": {"scale": arr(4, 8)}},
            "w": arr(8, 8),
            "norm": {"scale": arr(8)},
        },
        "mm_projector": {"w": arr(8, 8), "bias": arr(8)},
        "vision_tower": {"w": arr(8, 8)},
    }


def _grads(params, seed=1):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)).astype(
            p.dtype
        ),
        params,
    )


def _trainable(params, cfg):
    mask = trainable_mask(params, cfg.stage)
    trainable, _ = partition_params(params, mask)
    return trainable


def _run_both(cfg, dtype, steps=3, chunk=False, scan=True):
    full = _params(dtype)
    trainable = _trainable(full, cfg)
    tx = make_optimizer(trainable, cfg)

    p_ref = trainable
    p_blk = trainable
    st_ref = tx.init(trainable)
    st_blk = tx.init(trainable)
    if chunk:
        from visper_lm_tpu.train.staged_update import (
            chunk_state_like,
            plan_offload_layout,
        )
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices("cpu")[:1]).reshape(1, 1),
                    ("data", "model"))
        opt_shape = jax.eval_shape(tx.init, trainable)
        ns = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), opt_shape
        )
        chunked_shape, _ = plan_offload_layout(
            opt_shape, ns, mesh, block_bytes=256, min_bytes=0, scan_chunks=scan
        )
        st_blk = chunk_state_like(st_blk, chunked_shape)
    for i in range(steps):
        g = _grads(trainable, seed=10 + i)
        updates, st_ref = tx.update(g, st_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_blk, st_blk, _ = blockwise_staged_update(g, st_blk, p_blk, cfg)
    if chunk:
        from visper_lm_tpu.train.staged_update import unchunk_state

        st_blk = unchunk_state(st_blk)
    return (p_ref, st_ref), (p_blk, st_blk)


def _assert_tree_close(a, b, rtol, atol):
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert la.dtype == lb.dtype, (la.dtype, lb.dtype)
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=rtol, atol=atol,
        )


@pytest.mark.parametrize("stage", ["finetune", "pretrain"])
def test_blockwise_matches_optax_f32(stage):
    cfg = OptimizerConfig(
        learning_rate=1e-3, stage=stage, weight_decay=0.01, total_steps=50
    )
    (p_ref, st_ref), (p_blk, st_blk) = _run_both(cfg, jnp.float32)
    _assert_tree_close(p_ref, p_blk, rtol=2e-5, atol=1e-7)
    _assert_tree_close(st_ref, st_blk, rtol=2e-5, atol=1e-7)


def test_blockwise_matches_optax_groups_and_master_bf16():
    # per-group LRs + f32 master weights over bf16 params: the master copies
    # must track optax's f32 trajectory (bf16 params may differ by 1 ulp from
    # optax's p+(m-p) rounding; the master comparison is the strict one)
    cfg = OptimizerConfig(
        learning_rate=1e-3, mm_projector_lr=2e-4, stage="finetune",
        master_weights=True, total_steps=50,
    )
    (p_ref, st_ref), (p_blk, st_blk) = _run_both(cfg, jnp.bfloat16)
    _assert_tree_close(p_ref, p_blk, rtol=1e-2, atol=1e-2)
    _assert_tree_close(st_ref, st_blk, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("scan", [True, False])
def test_blockwise_chunked_leaves_match_unchunked(scan):
    # a tiny block budget forces stacked (L, in, out) leaves into the
    # blockwise-streamed layout — StackedHostArray (lax.scan over uniform
    # blocks, scan=True) or ChunkedHostArray (unrolled per-block HLO,
    # scan=False); after unchunking, results must match both the whole-leaf
    # blockwise path and optax itself
    cfg = OptimizerConfig(learning_rate=1e-3, stage="finetune",
                          master_weights=True, total_steps=50)
    (p_ref, st_ref), (p_chk, st_chk) = _run_both(
        cfg, jnp.float32, chunk=True, scan=scan
    )
    _assert_tree_close(p_ref, p_chk, rtol=2e-5, atol=1e-7)
    _assert_tree_close(st_ref, st_chk, rtol=2e-5, atol=1e-7)


def test_blockwise_under_jit_with_donation():
    cfg = OptimizerConfig(learning_rate=1e-3, stage="finetune", total_steps=50)
    full = _params(jnp.float32)
    trainable = _trainable(full, cfg)
    tx = make_optimizer(trainable, cfg)
    st = tx.init(trainable)
    g = _grads(trainable)

    fn = jax.jit(
        lambda gr, s, p: blockwise_staged_update(gr, s, p, cfg),
        donate_argnums=(1, 2),
    )
    p2, st2, gnorm = fn(g, st, trainable)
    assert float(gnorm) > 0

    updates, st_ref = tx.update(g, tx.init(_trainable(_params(jnp.float32), cfg)),
                                _trainable(_params(jnp.float32), cfg))
    p_ref = optax.apply_updates(_trainable(_params(jnp.float32), cfg), updates)
    _assert_tree_close(p_ref, p2, rtol=2e-5, atol=1e-7)


def test_init_opt_state_offloaded_matches_tx_init():
    cfg = OptimizerConfig(
        learning_rate=1e-3, stage="finetune", master_weights=True, total_steps=50
    )
    full = _params(jnp.bfloat16)
    trainable = _trainable(full, cfg)
    tx = make_optimizer(trainable, cfg)
    ref = tx.init(trainable)

    # CPU shardings (no pinned_host): placement is a no-op, structure + values
    # must match tx.init exactly (zeros + f32 master copies of params)
    dev = jax.devices("cpu")[0]
    from jax.sharding import SingleDeviceSharding

    shape = jax.eval_shape(tx.init, trainable)
    sh = jax.tree_util.tree_map(lambda _: SingleDeviceSharding(dev), shape)
    out = init_opt_state_offloaded(tx, trainable, shape, sh)
    _assert_tree_close(ref, out, rtol=0, atol=0)


@pytest.mark.parametrize("scan", [True, False])
def test_init_offloaded_chunked_layout(scan):
    """Chunked init: zeros per chunk, master chunks = param slices cast to
    f32, and unchunk_state round-trips to tx.init exactly (both the stacked
    scan layout and the unrolled ChunkedHostArray layout)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from visper_lm_tpu.train.staged_update import (
        ChunkedHostArray,
        StackedHostArray,
        plan_offload_layout,
        unchunk_state,
    )

    node_cls = StackedHostArray if scan else ChunkedHostArray
    cfg = OptimizerConfig(
        learning_rate=1e-3, stage="finetune", master_weights=True, total_steps=50
    )
    full = _params(jnp.bfloat16)
    trainable = _trainable(full, cfg)
    tx = make_optimizer(trainable, cfg)
    shape = jax.eval_shape(tx.init, trainable)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:1]).reshape(1, 1),
                ("data", "model"))
    ns = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), shape)
    cshape, cns = plan_offload_layout(
        shape, ns, mesh, block_bytes=256, min_bytes=0, scan_chunks=scan
    )
    # chunk boundaries must be dtype-independent: a param's f32 mu and bf16 nu
    # update against the same p/g slices (regression: 8B AOT broadcast error)
    adam = cshape.inner_states["base"].inner_state[1][0]
    from visper_lm_tpu.train.staged_update import _flat_with_keys

    mu_f, nu_f = _flat_with_keys(adam.mu), _flat_with_keys(adam.nu)
    for k, v in mu_f.items():
        if isinstance(v, ChunkedHostArray):
            assert isinstance(nu_f[k], ChunkedHostArray)
            assert [c.shape for c in v.chunks] == [
                c.shape for c in nu_f[k].chunks
            ], k
        elif isinstance(v, StackedHostArray):
            assert isinstance(nu_f[k], StackedHostArray)
            assert v.data.shape == nu_f[k].data.shape, k
    # pinned_host placement doesn't exist on CPU: strip memory kinds but keep
    # the chunked structure
    cns = jax.tree_util.tree_map(lambda n: NamedSharding(mesh, P()), cns)
    out = init_opt_state_offloaded(tx, trainable, cshape, cns)
    assert any(
        isinstance(x, node_cls)
        for x in jax.tree_util.tree_leaves(
            out, is_leaf=lambda x: isinstance(x, node_cls)
        )
    )
    _assert_tree_close(tx.init(trainable), unchunk_state(out), rtol=0, atol=0)


def test_whole_tree_staging_layout_is_unchunked():
    """blockwise_staging=False (aot.py --whole-tree-staging) must plan WHOLE
    pinned-host moment leaves: the fallback step branch runs plain
    tx.update(grads, device_put(state), params), and optax tree math breaks on
    ChunkedHostArray leaves (regression: the A/B flag crashed whenever
    --offload-opt was set)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from visper_lm_tpu.train.staged_update import (
        ChunkedHostArray,
        plan_offload_layout,
    )

    cfg = OptimizerConfig(
        learning_rate=1e-3, stage="finetune", master_weights=True, total_steps=50
    )
    full = _params(jnp.bfloat16)
    trainable = _trainable(full, cfg)
    tx = make_optimizer(trainable, cfg)
    shape = jax.eval_shape(tx.init, trainable)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:1]).reshape(1, 1),
                ("data", "model"))
    ns = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), shape)
    cshape, cns = plan_offload_layout(
        shape, ns, mesh, block_bytes=256, min_bytes=0, chunk=False
    )
    assert not any(
        isinstance(x, ChunkedHostArray)
        for x in jax.tree_util.tree_leaves(
            cshape, is_leaf=lambda x: isinstance(x, ChunkedHostArray)
        )
    )
    # shapes unchanged leaf-for-leaf -> tx.update remains structurally valid
    assert jax.tree_util.tree_structure(cshape) == jax.tree_util.tree_structure(shape)
    # leaves still offloaded (memory kind set) where eligible
    assert any(
        getattr(n, "memory_kind", None) == "pinned_host"
        for n in jax.tree_util.tree_leaves(cns)
    )
    # the fallback update path itself (tx.update + apply_updates) runs on a
    # state with this layout
    st = tx.init(trainable)
    updates, _ = tx.update(_grads(trainable), st, trainable)
    optax.apply_updates(trainable, updates)


@pytest.mark.parametrize("scan", [True, False])
def test_chunked_state_orbax_roundtrip(tmp_path, scan):
    """A blockwise-layout TrainState (StackedHostArray or ChunkedHostArray
    leaves) must survive checkpoint save/restore (preemption + resume of an
    offloaded full-model run)."""
    from visper_lm_tpu.train.checkpoint import CheckpointManager
    from visper_lm_tpu.train.staged_update import (
        chunk_state_like,
        plan_offload_layout,
        unchunk_state,
    )
    from visper_lm_tpu.train.train_step import TrainState
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = OptimizerConfig(learning_rate=1e-3, stage="finetune",
                          master_weights=True, total_steps=50)
    trainable = _trainable(_params(jnp.float32), cfg)
    tx = make_optimizer(trainable, cfg)
    shape = jax.eval_shape(tx.init, trainable)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:1]).reshape(1, 1),
                ("data", "model"))
    ns = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), shape)
    cshape, _ = plan_offload_layout(
        shape, ns, mesh, block_bytes=256, min_bytes=0, scan_chunks=scan
    )
    opt = chunk_state_like(tx.init(trainable), cshape)
    state = TrainState(params=trainable, opt_state=opt,
                       step=jnp.zeros((), jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state)
    mgr.wait()
    like = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = mgr.restore(like)
    _assert_tree_close(unchunk_state(state.opt_state),
                       unchunk_state(restored.opt_state), rtol=0, atol=0)
    _assert_tree_close(state.params, restored.params, rtol=0, atol=0)


def test_stream_grads_step_matches_plain():
    """Gradient-streaming layout (decoder blocks as layer sub-stacks +
    host_grad_segment backward): the full train step must produce the SAME
    loss trajectory and parameters as the plain stacked layout. On CPU the
    host-put is a no-op, so this pins the segmentation/custom_vjp math."""
    import numpy as np

    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from visper_lm_tpu.data.collate import build_splice_plan, collate_plans
    from visper_lm_tpu.models.decoder import unchunk_blocks
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.parallel.mesh import make_mesh
    from visper_lm_tpu.train.train_step import make_train_step, shard_batch

    cfg = tiny_test_vlm(distill=False)
    rng = np.random.default_rng(0)
    plans = []
    for _ in range(2):
        ids = list(rng.integers(3, cfg.decoder.vocab_size - 10, size=8)) + [
            IMAGE_TOKEN_INDEX
        ] + list(rng.integers(3, cfg.decoder.vocab_size - 10, size=20))
        labels = [IGNORE_INDEX] * 9 + ids[9:]
        plans.append(build_splice_plan(
            ids, labels, 48, num_image_tokens=cfg.num_image_tokens,
            num_task_tokens=0, num_tasks=0,
        ))
    batch = collate_plans(
        plans,
        images=rng.normal(
            size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32),
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    ocfg = OptimizerConfig(learning_rate=1e-3, total_steps=100, stage="finetune")

    results = {}
    for sg in (0, 3):
        p = jax.tree_util.tree_map(lambda x: x.copy(), params)
        with mesh:
            step, state, _ = make_train_step(
                cfg, ocfg, p, mesh, use_pallas=False, stream_grads=sg,
            )
            db = shard_batch(batch, mesh)
            losses = []
            for _ in range(3):
                state, m = step(state, db)
                losses.append(float(m["loss"]))
        dec = state.params["decoder"]
        blocks = (
            unchunk_blocks([dec["blocks_chunks"][str(i)] for i in range(sg)])
            if sg else dec["blocks"]
        )
        results[sg] = (losses, blocks)

    l0, b0 = results[0]
    l3, b3 = results[3]
    np.testing.assert_allclose(l0, l3, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(b0), jax.tree_util.tree_leaves(b3)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-6,
        )


def test_stream_grads_with_taps_matches_plain_multichip():
    """Gradient streaming UNDER DISTILLATION TAPS on a multi-chip mesh (the
    beyond-parity pretrain_full regime): the tap-aligned chunked layout
    (models/decoder.stream_chunk_ranges) + host_grad_segment backward must
    reproduce the plain stacked layout's loss trajectory and parameters
    exactly. Runs on the dp4xtp2 virtual CPU mesh, so it also pins the
    multi-chip code path (on CPU the host memory-space put is a no-op; the
    segmentation, custom_vjp, and staged-update math are what's under test)."""
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from visper_lm_tpu.data.collate import build_splice_plan, collate_plans
    from visper_lm_tpu.models.decoder import stream_chunk_ranges, unchunk_blocks
    from visper_lm_tpu.models.vlm import init_vlm, tap_layer_union
    from visper_lm_tpu.parallel.mesh import make_mesh
    from visper_lm_tpu.train.train_step import make_train_step, shard_batch

    cfg = tiny_test_vlm(distill=True)
    rng = np.random.default_rng(0)
    plans = []
    for b in range(8):
        ids = [1, 2, 3, IMAGE_TOKEN_INDEX] + list(
            rng.integers(3, 400, size=8 + b)
        )
        labels = [IGNORE_INDEX] * 4 + ids[4:]
        plans.append(build_splice_plan(
            ids, labels, 64, num_image_tokens=cfg.num_image_tokens,
            num_task_tokens=cfg.distill.num_task_tokens, num_tasks=3,
        ))
    batch = collate_plans(
        plans, images=rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    )
    for t in cfg.distill.tasks:
        batch[f"{t.task}_mask"] = np.ones((8,), np.float32)
        batch[f"{t.task}_target"] = rng.normal(
            size=(8, t.target_tokens, t.target_dim)
        ).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    ocfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=100, stage="full"
    )

    taps = tap_layer_union(cfg)
    ranges = stream_chunk_ranges(cfg.decoder.num_layers, 2, taps)
    # the tiny config's taps {1,2,3} + a 2-chunk grid must actually segment
    assert len(ranges) == 3 and all(
        l + 1 in {e for _, e in ranges} for l in taps
    ), ranges

    results = {}
    for sg in (0, 2):
        p = jax.tree_util.tree_map(lambda x: x.copy(), params)
        mesh = make_mesh(dp=4, tp=2)
        with mesh:
            step, state, _ = make_train_step(
                cfg, ocfg, p, mesh, use_pallas=False, stream_grads=sg,
                zero_params=True,
            )
            db = shard_batch(batch, mesh)
            losses = []
            for _ in range(3):
                state, m = step(state, db)
                losses.append(float(m["loss"]))
        dec = state.params["decoder"]
        blocks = (
            unchunk_blocks(
                [dec["blocks_chunks"][str(i)] for i in range(len(ranges))]
            )
            if sg else dec["blocks"]
        )
        results[sg] = (losses, blocks)

    l0, b0 = results[0]
    l2, b2 = results[2]
    np.testing.assert_allclose(l0, l2, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(b0), jax.tree_util.tree_leaves(b2)
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-6,
        )
