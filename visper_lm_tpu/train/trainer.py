"""Training loop: data -> sharded step -> metrics/checkpoints.

The loop half of the reference's `LLaVATrainer` + HF Trainer stack (SURVEY.md §2.6),
redesigned TPU-first:
  * the model step is the single compiled train step (train_step.py); the loop only
    feeds batches, logs metrics, and rotates checkpoints — no logic inside forward
    (the reference logs from inside model.forward, ola_llama.py:146-172; §5.5 flags
    pulling that out);
  * host->device transfer is overlapped by double-buffering the next batch;
  * auto-resume: restores the latest checkpoint if one exists (train.py:1114-1117);
  * metrics go to a JSONL file (and stdout) — wandb/TensorBoard are optional sinks.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time
from queue import Queue
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from visper_lm_tpu.config import VLMConfig
from visper_lm_tpu.parallel.mesh import make_mesh
from visper_lm_tpu.train.checkpoint import CheckpointManager
from visper_lm_tpu.train.optimizer import OptimizerConfig
from visper_lm_tpu.train.train_step import make_train_step, shard_batch


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str
    num_epochs: int = 1
    max_steps: Optional[int] = None
    save_steps: int = 200
    save_total_limit: int = 3
    logging_steps: int = 1
    seed: int = 0
    dp: Optional[int] = None
    tp: int = 1
    # ZeRO-3-equivalent full param sharding along 'data' (scripts/zero3.json)
    zero_params: bool = False
    # zero3_offload.json-equivalent: optimizer moments live in host memory (TPU only)
    offload_opt_state: bool = False
    # ZeRO-shard FROZEN params over 'data' (the 8B decoder in the PT stage) and
    # frozen teacher weights over 'model' — the docs/Scale8B.md fit levers
    zero_frozen: bool = False
    shard_teachers: bool = False
    # remat policy: None = full per-block remat; 'save_flash' keeps the flash
    # attention outputs (skips their backward recompute; costs HBM)
    remat_policy: Optional[str] = None
    # gradient accumulation (reference --gradient_accumulation_steps,
    # pretrain.sh:40): N host batches are stacked into one device step that
    # scans fwd+bwd over them and applies a single optimizer update
    grad_accum_steps: int = 1
    # gradient-streaming layout (models/decoder.host_grad_segment): decoder
    # blocks as N tap-aligned chunks, per-segment dW emitted to pinned host.
    # Full-model stages on TPU only; excludes grad_accum_steps > 1.
    stream_grads: int = 0
    resume: bool = True
    # device batches buffered ahead; 1 still overlaps transfer with compute while
    # keeping only one extra batch resident (matters at HBM-edge model sizes)
    prefetch_depth: int = 1


class MetricsLogger:
    def __init__(self, output_dir: str, sinks: Iterable[Callable] = ()):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.sinks = list(sinks)
        # rank-0 gating (the reference gates with dist.get_rank()==0 throughout)
        self.enabled = jax.process_index() == 0

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        record = {"step": step}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                continue
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        for sink in self.sinks:
            sink(step, record)


class _Prefetcher:
    """One-batch-deep background prefetch + device transfer."""

    def __init__(self, iterator, transfer, depth: int = 2):
        self.queue: Queue = Queue(maxsize=depth)
        self._done = object()

        def worker():
            for item in iterator:
                self.queue.put(transfer(item))
            self.queue.put(self._done)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.queue.get()
            if item is self._done:
                return
            yield item


def train(
    cfg: VLMConfig,
    opt_cfg: OptimizerConfig,
    trainer_cfg: TrainerConfig,
    params: Any,
    data_iter_fn: Callable[[int], Iterable[Dict[str, np.ndarray]]],
    *,
    teacher_fn=None,
    teacher_params=None,
    use_pallas: Optional[bool] = None,
    log_sinks: Iterable[Callable] = (),
    step_hooks: Iterable[Callable] = (),
) -> Any:
    """Run the training loop; returns the final TrainState.

    data_iter_fn(epoch) yields host batches (splice plans + images + targets/masks).
    """
    from visper_lm_tpu.parallel.distributed import init_distributed

    init_distributed()  # no-op unless VISPER_* env configures multi-process
    mesh = make_mesh(dp=trainer_cfg.dp, tp=trainer_cfg.tp)
    logger = MetricsLogger(trainer_cfg.output_dir, log_sinks)
    ckpt = CheckpointManager(
        os.path.join(trainer_cfg.output_dir, "checkpoints"),
        save_total_limit=trainer_cfg.save_total_limit,
    )

    # Preemption safety (SURVEY.md §5.3 gap in the reference): SIGTERM requests a
    # checkpoint at the next step boundary instead of dying mid-save.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # non-main thread
        prev_handler = None

    with mesh:
        step_fn, state, state_shardings = make_train_step(
            cfg, opt_cfg, params, mesh,
            teacher_fn=teacher_fn, teacher_params=teacher_params,
            use_pallas=use_pallas,
            zero_params=trainer_cfg.zero_params,
            zero_frozen=trainer_cfg.zero_frozen,
            offload_opt_state=trainer_cfg.offload_opt_state,
            shard_teachers=trainer_cfg.shard_teachers,
            remat_policy=trainer_cfg.remat_policy,
            accum_steps=trainer_cfg.grad_accum_steps,
            stream_grads=trainer_cfg.stream_grads,
        )

        start_step = 0
        start_epoch, skip_in_epoch = 0, 0
        if trainer_cfg.resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            start_step = int(ckpt.latest_step())
            # data-order-correct resume: fast-forward the stream to the first
            # unseen batch instead of replaying the epoch head / dropping the
            # tail (HF Trainer skip-to-batch parity, train.py:1114-1117 +
            # ignore_data_skip=False)
            cursor = ckpt.restore_data_state()
            if cursor is not None:
                start_epoch = int(cursor.get("epoch", 0))
                skip_in_epoch = int(cursor.get("steps_in_epoch", 0))
                saved_seed = cursor.get("seed")
                if saved_seed is not None and saved_seed != trainer_cfg.seed:
                    print(
                        f"resume: checkpoint data seed {saved_seed} != "
                        f"configured seed {trainer_cfg.seed}; the skipped "
                        "batches will not match the original run's order"
                    )

        step = start_step
        t_last = time.perf_counter()
        accum = max(1, trainer_cfg.grad_accum_steps)
        epoch, epoch_step = start_epoch, skip_in_epoch

        def _cursor() -> Dict[str, Any]:
            return {
                "epoch": epoch,
                "steps_in_epoch": epoch_step,
                "seed": trainer_cfg.seed,
            }

        for epoch in range(start_epoch, trainer_cfg.num_epochs):
            def transfer(batch):
                batch = {k: v for k, v in batch.items() if k != "pil_images"}
                return shard_batch(batch, mesh, leading_accum=accum > 1)

            def grouped(it):
                # stack accum consecutive host batches into a leading
                # microbatch axis; an incomplete trailing group is dropped
                # (matches HF Trainer, which floors steps per epoch)
                if accum == 1:
                    yield from it
                    return
                group = []
                for b in it:
                    group.append({k: v for k, v in b.items() if k != "pil_images"})
                    if len(group) == accum:
                        yield {
                            k: np.stack([g[k] for g in group]) for k in group[0]
                        }
                        group = []

            skip = skip_in_epoch * accum if epoch == start_epoch else 0
            if skip:
                # fast-forward past the host batches the interrupted run
                # already trained on; data_iter_fn(epoch) is seeded by epoch,
                # so the stream order is reproducible. Iterators that accept
                # skip_batches (BatchIterator) skip without decoding images;
                # otherwise consume-and-drop.
                import inspect

                try:
                    takes_skip = "skip_batches" in inspect.signature(
                        data_iter_fn
                    ).parameters
                except (TypeError, ValueError):
                    takes_skip = False
                if takes_skip:
                    host_iter = data_iter_fn(epoch, skip_batches=skip)
                else:
                    import itertools

                    host_iter = itertools.islice(
                        data_iter_fn(epoch), skip, None
                    )
                epoch_step = skip_in_epoch
            else:
                host_iter = data_iter_fn(epoch)
                epoch_step = 0

            for dbatch in _Prefetcher(
                grouped(host_iter), transfer,
                depth=trainer_cfg.prefetch_depth,
            ):
                if trainer_cfg.max_steps and step >= trainer_cfg.max_steps:
                    break
                state, metrics = step_fn(state, dbatch)
                step += 1
                epoch_step += 1

                if step % trainer_cfg.logging_steps == 0:
                    now = time.perf_counter()
                    metrics = dict(metrics)
                    metrics["steps_per_sec"] = trainer_cfg.logging_steps / (now - t_last)
                    t_last = now
                    logger.log(step, metrics)

                if step % trainer_cfg.save_steps == 0:
                    ckpt.save(step, state, cfg, data_state=_cursor())

                for hook in step_hooks:
                    try:
                        hook(step, state, dbatch)
                    except Exception as e:  # viz must never kill training
                        print(f"step hook failed at {step}: {e}")

                if preempted["flag"]:
                    ckpt.save(step, state, cfg, data_state=_cursor())
                    ckpt.wait()
                    break
                if trainer_cfg.max_steps and step >= trainer_cfg.max_steps:
                    break
            if preempted["flag"] or (trainer_cfg.max_steps and step >= trainer_cfg.max_steps):
                break

        ckpt.save(step, state, cfg, data_state=_cursor())
        ckpt.wait()
        ckpt.close()
    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    return state
