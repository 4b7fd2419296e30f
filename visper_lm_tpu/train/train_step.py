"""The single jitted train step.

TPU-first core design (SURVEY.md §7): the reference runs teacher featurization,
token splicing and logging in Python inside forward (call stack §3.1); here the whole
loss — NTP + distillation heads + global-batch contrastive — is ONE compiled graph
over the ('data', 'model') mesh. Teacher targets are computed by batched jitted
functions (models/teachers) or supplied precomputed in the batch; the collator did the
splice planning on host.

ZeRO-2-equivalent behavior falls out of sharding the optimizer state along 'data'
(parallel/sharding.zero_pspec): XLA reduce-scatters gradients into the sharded update
and all-gathers params where needed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visper_lm_tpu.config import VLMConfig
from visper_lm_tpu.models.vlm import (
    predict_task_embeddings,
    vlm_forward,
)
from visper_lm_tpu.parallel import sharding as shd
from visper_lm_tpu.parallel.mesh import DATA_AXIS
from visper_lm_tpu.train.losses import distill_losses, ntp_loss, ntp_loss_chunked
from visper_lm_tpu.train.optimizer import OptimizerConfig, make_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def make_loss_fn(
    cfg: VLMConfig,
    *,
    teacher_fn: Optional[Callable[[Any, Dict[str, jax.Array]], Dict[str, jax.Array]]] = None,
    remat: bool = True,
    remat_policy: Optional[str] = None,
    use_pallas: Optional[bool] = None,
):
    """Loss over one (global) batch.

    batch: splice plan arrays + images (+ per-task masks `{task}_mask` (B,)) and
    either precomputed `{task}_target` arrays or teacher inputs for teacher_fn.

    teacher_params is an ARGUMENT of the returned loss_fn, never a closure: arrays
    captured by closure can be inlined into the serialized HLO, which explodes
    compile payloads/times (observed: remote-compile HTTP 413 at GB-scale consts).
    """

    def loss_fn(params, batch, teacher_params=None):
        # chunked CE when the full (B, T, vocab) f32 logits tensor would be huge
        # (8B flagship: 128k vocab x 4k tokens ~8 GB materialized twice by the
        # standard path; phi3 at B8xT1024 it's ~2 GB of the peak). Shapes are
        # static at trace time, so this resolves per compiled batch shape.
        b, t = batch["labels"].shape
        use_chunked_ce = b * t * cfg.decoder.vocab_size >= 2 ** 27
        out = vlm_forward(
            params, cfg, batch, remat=remat, remat_policy=remat_policy,
            use_pallas=use_pallas, compute_logits=not use_chunked_ce,
        )
        if use_chunked_ce:
            head = (
                params["decoder"]["embed_tokens"]["embedding"].T
                if cfg.decoder.tie_embeddings
                else params["decoder"]["lm_head"]["kernel"]
            )
            text_loss = ntp_loss_chunked(out["hidden"], head, batch["labels"])
        else:
            text_loss = ntp_loss(out["logits"], batch["labels"])
        metrics: Dict[str, jax.Array] = {"text_loss": text_loss}
        total = text_loss

        moe_aux = out.get("moe_aux")
        if moe_aux is not None:
            # Switch-style auxiliaries (per-layer means, ops/moe.py): the
            # load-balance loss keeps routing uniform, the z-loss keeps router
            # logits bounded (stabilizes bf16 softmax). Standard coefficients:
            # moe_aux_weight (0.01) for balance, 1e-3 for z.
            total = total + (
                cfg.decoder.moe_aux_weight * moe_aux["lb_loss"]
                + 1e-3 * moe_aux["z_loss"]
            )
            metrics["moe_lb_loss"] = moe_aux["lb_loss"]
            metrics["moe_z_loss"] = moe_aux["z_loss"]
            metrics["moe_dropped_frac"] = moe_aux["dropped_frac"]

        if cfg.distill is not None and out["taps"] is not None:
            preds = predict_task_embeddings(params, cfg, out["taps"], out["tap_layers"])

            targets: Dict[str, jax.Array] = {}
            for tcfg in cfg.distill.tasks:
                key = f"{tcfg.task}_target"
                if key in batch:
                    targets[tcfg.task] = batch[key]
            if teacher_fn is not None:
                # frozen teachers run inside the same compiled step, batched
                computed = teacher_fn(teacher_params, batch)
                targets.update(
                    {k: jax.lax.stop_gradient(v) for k, v in computed.items()}
                )

            task_masks = {
                tcfg.task: batch.get(
                    f"{tcfg.task}_mask",
                    jnp.ones((batch["labels"].shape[0],), dtype=jnp.float32),
                )
                for tcfg in cfg.distill.tasks
            }
            dloss, dmetrics = distill_losses(
                cfg, preds, targets, task_masks, params.get("logit_scales")
            )
            total = total + dloss
            metrics.update(dmetrics)

        metrics["loss"] = total
        return total, metrics

    return loss_fn


def plan_train_shardings(
    cfg: VLMConfig,
    opt_cfg: OptimizerConfig,
    params: Any,
    mesh: Mesh,
    *,
    zero_params: bool = False,
    zero_frozen: bool = False,
    zero_min_size: int = 2 ** 16,
    offload_opt_state: bool = False,
    force_offload: bool = False,
    blockwise_staging: bool = True,
    block_bytes: int = 256 << 20,
    scan_chunks: bool = False,
):
    """Sharding plan for the train state. `params` may be real arrays OR
    ShapeDtypeStructs (the AOT compile-only path, train/aot.py) — only .shape
    is inspected. blockwise_staging=False keeps offloaded moments as WHOLE
    pinned-host arrays (no ChunkedHostArray pre-chunking) so the plain
    tx.update fallback in make_step_fn stays an ordinary optax tree op.
    scan_chunks=False unrolls the streamed update per block (ChunkedHostArray)
    instead of lax.scanning a stacked layout — compile-time A/B.
    Returns (mask, tx, opt_shape, train/frozen/opt/state shardings)."""
    from visper_lm_tpu.train.optimizer import trainable_mask
    from visper_lm_tpu.utils.param import partition_params

    mask = trainable_mask(params, opt_cfg.stage)
    trainable, frozen = partition_params(params, mask)
    tx = make_optimizer(trainable, opt_cfg)

    all_specs = shd.param_pspecs(params)
    train_specs, frozen_specs = partition_params(all_specs, mask)
    if zero_params:
        # ZeRO-3 equivalent (scripts/zero3.json:16-27): fully shard trainable params
        # along 'data' on top of any TP axes; XLA all-gathers per-layer on use and
        # keeps the persistent copy sharded.
        data_size = mesh.shape[DATA_AXIS]
        train_specs = jax.tree_util.tree_map(
            lambda x, s: shd.zero_pspec(
                s, tuple(x.shape), data_size, min_size=zero_min_size
            ),
            trainable,
            train_specs,
        )
    if zero_frozen:
        # frozen params (e.g. the 8B decoder in the PT stage, which trains only
        # projector+heads+tokens per pretrain.sh:31) are read-only; sharding
        # them over 'data' on top of TP costs one all-gather per use and cuts
        # their persistent HBM by the data size.
        data_size = mesh.shape[DATA_AXIS]
        frozen_specs = jax.tree_util.tree_map(
            lambda x, s: shd.zero_pspec(
                s, tuple(x.shape), data_size, min_size=zero_min_size
            ),
            frozen,
            frozen_specs,
        )
    train_shardings = shd.to_named(train_specs, mesh)
    frozen_shardings = shd.to_named(frozen_specs, mesh)

    opt_shape = jax.eval_shape(tx.init, trainable)
    opt_specs = shd.opt_state_pspecs(trainable, train_specs, mesh, opt_shape)
    opt_shardings = shd.to_named(opt_specs, mesh)
    if offload_opt_state:
        # zero3_offload.json-equivalent seam: persist optimizer moments in host
        # memory; the step streams them through HBM blockwise
        # (train/staged_update.py — big leaves pre-chunked along the layer
        # axis, small/replicated leaves stay in HBM). TPU-only memory kind —
        # fall back (with the flag ignored) where unsupported, e.g. CPU tests.
        # force_offload skips the device probe (AOT topologies have no devices).
        try:
            if not force_offload:
                dev = mesh.devices.flat[0]
                # CPU registers a pinned_host memory space but can't execute
                # the in-jit placement custom-call — require a real TPU
                if dev.platform != "tpu":
                    raise RuntimeError(f"no pinned_host on {dev.platform}")
                dev.memory("pinned_host")  # raises if unsupported
            from visper_lm_tpu.train.staged_update import plan_offload_layout

            # block_bytes trades HBM peak against per-block host-link
            # latency; with the scanned layout (scan_chunks=True) the
            # update's HLO compiles once per leaf shape, so chunk count no
            # longer costs compile time (the unrolled A/B path is linear in
            # it). docs/Scale8B.md carries the measured A/B.
            opt_shape, opt_shardings = plan_offload_layout(
                opt_shape, opt_shardings, mesh, chunk=blockwise_staging,
                block_bytes=block_bytes, scan_chunks=scan_chunks,
            )
        except Exception:
            pass

    state_shardings = TrainState(
        params=train_shardings,
        opt_state=opt_shardings,
        step=NamedSharding(mesh, P()),
    )
    return (
        mask, tx, trainable, frozen, opt_shape,
        train_shardings, frozen_shardings, opt_shardings, state_shardings,
    )


def make_step_fn(
    tx, base_loss_fn, opt_shardings, accum_steps: int = 1,
    opt_cfg: Optional[OptimizerConfig] = None,
    blockwise_staging: bool = True,
    grads_on_host: bool = False,
):
    """The pure train-step body: grads -> (pinned-host moment staging) ->
    tx.update -> new TrainState. Shared by make_train_step (live training) and
    train/aot.lower_flagship_step (the 8B fit proof) so the compiled memory
    numbers in docs/Scale8B.md can never drift from what training actually
    runs. Signature: step_fn(state, frozen_params, teacher_params, batch).

    accum_steps > 1 (the reference's --gradient_accumulation_steps,
    pretrain.sh:40 / transformers TrainingArguments): batch leaves carry a
    leading (accum_steps, ...) microbatch axis; the step lax.scans the
    fwd+bwd over it, accumulating gradients in f32 (DeepSpeed's accumulation
    dtype), and applies ONE optimizer update on the mean gradient — so the
    effective global batch is accum_steps x the per-step batch at the HBM
    cost of a single microbatch's activations plus one f32 gradient buffer."""
    import optax

    from visper_lm_tpu.utils.param import merge_params

    def loss_fn(trainable_params, frozen_params, tp, batch):
        full = merge_params(trainable_params, frozen_params)
        return base_loss_fn(full, batch, tp)

    # pinned-host offloaded moments must be staged to device memory inside the
    # step before tx.update touches them (XLA memories forbids mixed-space
    # math); the jit's out_shardings move the updated moments back to host.
    opt_to_device = None
    if any(
        getattr(ns, "memory_kind", None) == "pinned_host"
        for ns in jax.tree_util.tree_leaves(opt_shardings)
    ):
        opt_to_device = jax.tree_util.tree_map(
            lambda ns: ns.with_memory_kind("device"), opt_shardings
        )

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def accum_grads(params, frozen_params, tp, batch):
        def body(gsum, microbatch):
            (_, metrics), g = grad_fn(params, frozen_params, tp, microbatch)
            gsum = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), gsum, g
            )
            return gsum, metrics
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        gsum, metrics_stack = jax.lax.scan(body, zeros, batch)
        grads = jax.tree_util.tree_map(
            lambda g, p: (g / accum_steps).astype(p.dtype), gsum, params
        )
        metrics = jax.tree_util.tree_map(
            lambda m: jnp.mean(m, axis=0), metrics_stack
        )
        return metrics, grads

    # offloaded moments: stream blockwise (stage one block host->HBM->host at
    # a time, sequenced with optimization barriers) instead of staging the
    # whole tree — cuts peak HBM from O(moment tree) to O(one block).
    # docs/Scale8B.md quantifies both paths; blockwise is the default.
    use_blockwise = (
        opt_to_device is not None and opt_cfg is not None and blockwise_staging
    )

    def step_fn(state: TrainState, frozen_params, tp, batch):
        if accum_steps > 1:
            metrics, grads = accum_grads(state.params, frozen_params, tp, batch)
        else:
            (_, metrics), grads = grad_fn(state.params, frozen_params, tp, batch)
        if use_blockwise:
            from visper_lm_tpu.train.staged_update import blockwise_staged_update

            # the blockwise update computes the norm itself (host-resident
            # grads must stage in behind the token chain; a naive
            # global_norm over host arrays is mixed-space math)
            new_params, new_opt, gnorm = blockwise_staged_update(
                grads, state.opt_state, state.params, opt_cfg,
                opt_shardings=opt_shardings, opt_to_device=opt_to_device,
                grads_on_host=grads_on_host,
            )
            metrics["grad_norm"] = gnorm
        else:
            metrics["grad_norm"] = optax.global_norm(grads)
            opt_state = state.opt_state
            if opt_to_device is not None:
                opt_state = jax.device_put(opt_state, opt_to_device)
            updates, new_opt = tx.update(grads, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1
        ), metrics

    return step_fn


def make_train_step(
    cfg: VLMConfig,
    opt_cfg: OptimizerConfig,
    params: Any,
    mesh: Mesh,
    *,
    teacher_fn=None,
    teacher_params=None,
    remat: bool = True,
    remat_policy: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    zero_params: bool = False,
    zero_frozen: bool = False,
    zero_min_size: int = 2 ** 16,
    offload_opt_state: bool = False,
    shard_teachers: bool = False,
    accum_steps: int = 1,
    blockwise_staging: bool = True,
    block_bytes: int = 256 << 20,
    scan_chunks: bool = False,
    stream_grads: int = 0,
    donate_params: bool = False,
) -> Tuple[Callable, TrainState, Any]:
    """Build (jitted_step, initial sharded TrainState, state shardings).

    Only STAGE-TRAINABLE params live in the TrainState; frozen params (teachers,
    frozen trunk in PT/probe stages) are a separate jit input that never gets grads,
    optimizer state, or donated buffers — the memory shape the reference gets from
    requires_grad_(False) under ZeRO. The returned step signature is
    step(state, frozen_params, batch) -> (state, metrics); state is donated.
    """
    if stream_grads and "blocks_chunks" not in params.get("decoder", {}):
        # gradient-streaming layout: decoder blocks become stream_grads layer
        # sub-stacks whose per-segment dW is host-offloaded by the backward
        # (models/decoder.chunk_blocks_at + host_grad_segment). Full-model
        # stages only — a frozen decoder has no dW to stream. Chunk ends are
        # unioned with the distillation tap boundaries (pretrain_full) so
        # tapped block outputs stay segment carries. NOTE: at single-chip
        # 3.8B scale the caller should pre-chunk and DROP the stacked tree
        # itself (both layouts coexist transiently here).
        from visper_lm_tpu.models.decoder import (
            chunk_blocks_at, stream_chunk_ranges,
        )
        from visper_lm_tpu.models.vlm import tap_layer_union

        ranges = stream_chunk_ranges(
            cfg.decoder.num_layers, stream_grads, tap_layer_union(cfg)
        )
        dec_params = dict(params["decoder"])
        dec_params["blocks_chunks"] = {
            str(i): c for i, c in enumerate(
                chunk_blocks_at(dec_params.pop("blocks"), ranges)
            )
        }
        params = dict(params)
        params["decoder"] = dec_params

    (
        mask, tx, trainable, frozen, opt_shape,
        train_shardings, frozen_shardings, opt_shardings, state_shardings,
    ) = plan_train_shardings(
        cfg, opt_cfg, params, mesh,
        zero_params=zero_params, zero_frozen=zero_frozen,
        zero_min_size=zero_min_size,
        offload_opt_state=offload_opt_state,
        blockwise_staging=blockwise_staging,
        block_bytes=block_bytes,
        scan_chunks=scan_chunks,
    )

    base_loss_fn = make_loss_fn(
        cfg,
        teacher_fn=teacher_fn,
        remat=remat,
        remat_policy=remat_policy,
        use_pallas=use_pallas,
    )

    trainable = jax.device_put(trainable, train_shardings)
    # device_put aliases arrays that are already correctly placed; copy so the
    # donated TrainState buffers never invalidate caller-owned params (resume /
    # repeated make_train_step calls). donate_params=True skips the copy —
    # the caller hands ownership over (at single-chip 3.8B full-trainable
    # scale the extra tree is the difference between fitting and not).
    if not donate_params:
        trainable = jax.tree_util.tree_map(lambda x: x.copy(), trainable)
    frozen = jax.device_put(frozen, frozen_shardings)
    if shard_teachers and teacher_params is not None:
        from visper_lm_tpu.parallel.mesh import MODEL_AXIS

        tp_size = mesh.shape.get(MODEL_AXIS, 1)
        teacher_params = jax.device_put(
            teacher_params,
            jax.tree_util.tree_map(
                lambda x: NamedSharding(
                    mesh, shd.model_shard_pspec(tuple(x.shape), tp_size)
                ),
                teacher_params,
            ),
        )
    offloaded = any(
        getattr(ns, "memory_kind", None) == "pinned_host"
        for ns in jax.tree_util.tree_leaves(opt_shardings)
    )
    if offloaded:
        # jit(tx.init) would allocate the full f32 moment tree in HBM before
        # copying it out; build zeros on host and place them leaf-by-leaf.
        from visper_lm_tpu.train.staged_update import init_opt_state_offloaded

        opt_state = init_opt_state_offloaded(
            tx, trainable, opt_shape, opt_shardings
        )
    else:
        opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(trainable)
    state = TrainState(
        params=trainable,
        opt_state=opt_state,
        step=jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P())),
    )

    # teacher params are explicit jit args (NOT closures): closed-over arrays can be
    # inlined into the serialized HLO, which explodes compile payloads/times.
    assert not (stream_grads and accum_steps > 1), (
        "gradient streaming composes with single-microbatch steps only "
        "(the f32 accumulator would re-materialize the full grad tree)"
    )
    grads_on_host = bool(stream_grads) and all(
        getattr(d, "platform", None) == "tpu" for d in mesh.devices.flat
    )
    # host-resident grads can only be consumed by the blockwise staged update
    # (the plain path's global_norm/tx.update over pinned-host leaves is
    # mixed-memory-space math — see make_step_fn). On CPU meshes the
    # pinned-host put is a no-op so the combination is harmless there.
    assert not grads_on_host or (offload_opt_state and blockwise_staging), (
        "--stream-grads on TPU requires offload_opt_state=True and "
        "blockwise_staging=True: the streamed dW lands in pinned host and "
        "only the blockwise staged update can stage it back"
    )
    step_fn = make_step_fn(
        tx, base_loss_fn, opt_shardings, accum_steps=accum_steps,
        opt_cfg=opt_cfg, blockwise_staging=blockwise_staging,
        grads_on_host=grads_on_host,
    )

    jitted = jax.jit(
        step_fn,
        donate_argnums=(0,),
        out_shardings=(state_shardings, None),
    )

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        return jitted(state, frozen, teacher_params, batch)

    def lower(state: TrainState, batch: Dict[str, jax.Array]):
        """Lowered (pre-execution) step for memory/cost introspection
        (bench.py --cost-analysis). Shares jit's executable cache with
        step(), so .compile() after a step() call is a cache hit."""
        return jitted.lower(state, frozen, teacher_params, batch)

    step.lower = lower
    return step, state, state_shardings


def shard_batch(
    batch: Dict[str, Any], mesh: Mesh, leading_accum: bool = False
) -> Dict[str, jax.Array]:
    """Host numpy batch -> device arrays sharded along 'data'.

    Multi-process aware: under jax.distributed each process passes its LOCAL shard
    of the global batch (parallel/distributed.shard_batch_multihost).
    leading_accum: leaves carry a leading (accum_steps, ...) microbatch axis
    (gradient accumulation); 'data' then shards axis 1."""
    from visper_lm_tpu.parallel.distributed import shard_batch_multihost

    return shard_batch_multihost(batch, mesh, leading_accum=leading_accum)
