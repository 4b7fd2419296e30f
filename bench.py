"""Benchmark: PT-stage (distillation) train-step throughput, examples/sec/chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes NO throughput numbers (BASELINE.md: BASELINE.json.published={})
and its MI300X recipe cannot run here, so vs_baseline is measured against the value
recorded in bench_baseline.json (committed at the first real-TPU measurement); later
rounds show progress as a ratio >= 1.0.

Workload: one COMPLETE PT-stage training step on the real flagship config #1 —
Phi3-mini-4k (3.8B) decoder + CLIP-ViT-L/14-336 tower + mlp2x projector + task
tokens + all three distillation heads + the three FROZEN TEACHERS (DINOv2-L,
Swin-L@768, CLIP-H) computing targets batched INSIDE the same compiled graph
(the reference featurizes teachers per-image in Python) + NTP + smooth-L1 +
contrastive losses + AdamW on the trainable subset. bf16, Pallas flash
attention, remat; batch 4 x 1024 tokens per chip (5.4B total params on one v5e).

Usage: python bench.py [--smoke] [--steps N] [--batch B] [--seq T] [--no-teachers]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_bench_cfg(smoke: bool, stage: str = "pretrain", tower: str = "clip"):
    from visper_lm_tpu.config import tiny_test_vlm

    if smoke:
        return tiny_test_vlm(distill=stage == "pretrain")

    # the real flagship: Phi3-mini-4k + CLIP-ViT-L. PT carries the reference's
    # shipped distillation recipe (pretrain.sh: d18-20_s10-18_g12-20, 8 task
    # tokens); IFT (--stage finetune) is plain LLaVA NTP with the FULL model
    # trainable (finetune.sh:15-48) — the dw-backward regime every headline
    # checkpoint ships through. --tower convnext benches config #3's
    # ConvNeXt-XXL trunk at 768 px (clip_convnext_encoder.py:150-174).
    from visper_lm_tpu.config import LoraConfig, phi3_clip_vlm, with_convnext_tower

    cfg = phi3_clip_vlm(distill=stage == "pretrain")
    if stage == "lora":
        # reference lora_enable IFT (train.py:983-999, r=64 alpha=16):
        # adapters + projector train, base decoder frozen
        import dataclasses

        cfg = dataclasses.replace(cfg, lora=LoraConfig())
    if tower == "convnext":
        cfg = with_convnext_tower(cfg)
    return cfg


def build_batch(cfg, batch_size: int, seq_len: int, anyres_tiles: int = 0):
    import jax.numpy as jnp

    from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from visper_lm_tpu.data.collate import build_splice_plan, collate_plans

    rng = np.random.default_rng(0)
    n_tasks = len(cfg.distill.task_order()) if cfg.distill else 0
    ntt = cfg.distill.num_task_tokens if cfg.distill else 0
    img_size = cfg.convnext.image_size if cfg.use_convnext_tower else cfg.vision.image_size
    num_image_tokens = cfg.num_image_tokens
    feature_indices = None
    if anyres_tiles:
        # anyres fan-out: base + N tiles through the tower, flat gather plan
        # over all tile rows (+ trailing image_newline row when configured)
        num_image_tokens = (1 + anyres_tiles) * cfg.num_image_tokens
        feature_indices = [
            np.arange(num_image_tokens, dtype=np.int32)
        ] * batch_size
    plans = []
    for b in range(batch_size):
        text_len = int(rng.integers(24, 48))
        ids = (
            list(rng.integers(3, cfg.decoder.vocab_size - 10, size=cfg.num_sys_tokens))
            + [IMAGE_TOKEN_INDEX]
            + list(rng.integers(3, cfg.decoder.vocab_size - 10, size=text_len))
        )
        labels = [IGNORE_INDEX] * (cfg.num_sys_tokens + 1) + ids[cfg.num_sys_tokens + 1 :]
        plans.append(
            build_splice_plan(
                ids, labels, seq_len,
                num_image_tokens=num_image_tokens,
                num_task_tokens=ntt,
                num_tasks=n_tasks,
                image_feature_indices=(
                    [feature_indices[b]] if feature_indices else None
                ),
            )
        )
    if anyres_tiles:
        img = rng.normal(
            size=(batch_size, 1 + anyres_tiles, img_size, img_size, 3)
        )
    else:
        img = rng.normal(size=(batch_size, img_size, img_size, 3))
    batch = collate_plans(plans, images=img.astype(np.float32))
    if cfg.distill:
        for tcfg in cfg.distill.tasks:
            batch[f"{tcfg.task}_mask"] = np.ones((batch_size,), np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def add_teacher_inputs(cfg, batch, batch_size: int):
    """Per-teacher pixel tensors (each teacher has its own preprocessing pipeline)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    sizes = {"depth_images": 336, "gen_images": 224, "seg_images": 768}
    for key, size in sizes.items():
        batch[key] = jnp.asarray(
            rng.normal(size=(batch_size, size, size, 3)).astype(np.float32)
        )
    return batch


def add_random_targets(cfg, batch, batch_size: int):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    for tcfg in cfg.distill.tasks:
        batch[f"{tcfg.task}_target"] = jnp.asarray(
            rng.normal(size=(batch_size, tcfg.target_tokens, tcfg.target_dim))
            .astype(np.float32)
        )
    return batch


def measure(args, batch_size: int):
    """One measured configuration -> (examples/s, metrics dict)."""
    import jax

    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.parallel.mesh import make_mesh
    from visper_lm_tpu.train.optimizer import OptimizerConfig
    from visper_lm_tpu.train.train_step import make_train_step, shard_batch
    from visper_lm_tpu.utils.diagnostics import train_step_flops

    cfg = build_bench_cfg(args.smoke, stage=args.stage, tower=args.tower)
    seq_len = 64 if args.smoke else args.seq
    with_teachers = cfg.distill is not None and not (args.smoke or args.no_teachers)

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    if args.stream_grads:
        # pre-chunk here and DROP the stacked blocks: at 3.8B on one chip the
        # two layouts cannot coexist with everything else. Chunk ends align
        # with any distillation tap boundaries (required by decoder_forward).
        from visper_lm_tpu.models.decoder import (
            chunk_blocks_at, stream_chunk_ranges,
        )
        from visper_lm_tpu.models.vlm import tap_layer_union

        ranges = stream_chunk_ranges(
            cfg.decoder.num_layers, args.stream_grads, tap_layer_union(cfg)
        )
        dec = dict(params["decoder"])
        dec["blocks_chunks"] = {
            str(i): c
            for i, c in enumerate(chunk_blocks_at(dec.pop("blocks"), ranges))
        }
        params = dict(params, decoder=dec)
        del dec
    batch = build_batch(cfg, batch_size, seq_len, anyres_tiles=args.anyres_tiles)
    teacher_fn = teacher_params = None
    if with_teachers:
        from visper_lm_tpu.models.teachers import init_teachers, make_teacher_fn

        teacher_params = init_teachers(jax.random.PRNGKey(7), cfg)
        teacher_fn = make_teacher_fn(cfg, microbatch=args.teacher_microbatch)
        batch = add_teacher_inputs(cfg, batch, batch_size)
    elif cfg.distill is not None:
        batch = add_random_targets(cfg, batch, batch_size)

    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3 if args.stage == "pretrain" else 2e-5,
        total_steps=1000, stage=args.stage,
        master_weights=args.master_weights,
    )
    on_tpu = jax.devices()[0].platform == "tpu"

    with mesh:
        step_fn, state, _ = make_train_step(
            cfg, opt_cfg, params, mesh,
            use_pallas=on_tpu and not args.xla_attention,
            remat_policy=args.remat_policy,
            teacher_fn=teacher_fn, teacher_params=teacher_params,
            offload_opt_state=args.offload_opt,
            stream_grads=args.stream_grads,
            donate_params=bool(args.stream_grads),
        )
        # the TrainState holds its own copy of the trainables; drop the
        # caller copy — at IFT scale (3.8B full-trainable on one 16 GB chip)
        # keeping both trees alive is the difference between fitting and not
        del params
        dbatch = shard_batch(batch, mesh)
        lowered = (
            step_fn.lower(state, dbatch)
            if getattr(args, "cost_analysis", False) else None
        )
        state, metrics = step_fn(state, dbatch)  # warmup / compile
        loss = float(metrics["loss"])            # host sync

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step_fn(state, dbatch)
        loss = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.steps

        cost = None
        if lowered is not None:
            # hits the executable cache populated by the warmup step
            ca = lowered.compile().cost_analysis() or {}
            cost = {
                "bytes_accessed_gib": round(
                    float(ca.get("bytes accessed", 0.0)) / 1024 ** 3, 2
                ),
                "compiled_flops_per_step": float(ca.get("flops", 0.0)),
            }

    assert np.isfinite(loss), f"non-finite loss {loss}"
    value = batch_size / dt
    flops = train_step_flops(cfg, batch_size, seq_len)
    if args.anyres_tiles:
        from visper_lm_tpu.utils.diagnostics import vision_flops

        flops += args.anyres_tiles * batch_size * vision_flops(cfg)
    from visper_lm_tpu.utils.diagnostics import teacher_flops

    total_flops = flops + (teacher_flops(batch_size) if with_teachers else 0.0)
    # v5e peak: 197 TFLOP/s bf16 (velocity of light for the MFU denominator)
    peak = 197e12 if on_tpu else float("nan")
    extras = {
        "step_time_s": round(dt, 4),
        "tokens_per_sec": round(batch_size * seq_len / dt, 1),
        "model_tflops_per_step": round(total_flops / 1e12, 2),
        "achieved_tflops_per_sec": round(total_flops / dt / 1e12, 2),
        # student-math MFU (excl. teachers) and all-executed-math MFU
        "mfu_student": round(flops / dt / peak, 4) if on_tpu else None,
        "mfu": round(total_flops / dt / peak, 4) if on_tpu else None,
        "batch": batch_size,
        "seq": seq_len,
    }
    if cost is not None:
        extras.update(cost)
        if cost["bytes_accessed_gib"]:
            # achieved HBM bandwidth vs the v5e ceiling (~819 GB/s): the
            # evidence for whether a shape is bandwidth- or compute-bound
            extras["achieved_hbm_gbps"] = round(
                cost["bytes_accessed_gib"] * 1.073741824 / dt, 1
            )
    return value, extras


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="tiny CPU-safe run")
    parser.add_argument("--stage", default="pretrain",
                        choices=["pretrain", "finetune", "lora", "vision_tower"],
                        help="pretrain = PT distill step (the tracked metric); "
                        "finetune = IFT full-model dw-backward step "
                        "(finetune.sh:15-48, lr 2e-5, no distill heads); "
                        "lora = the reference lora_enable IFT regime "
                        "(train.py:983-999, r=64 alpha=16); vision_tower = "
                        "the --unfreeze_mm_vision_tower regime "
                        "(train.py:1059-1063: ONLY tower+projector train)")
    parser.add_argument("--tower", default="clip", choices=["clip", "convnext"],
                        help="convnext = config #3's ConvNeXt-XXL trunk @768px")
    parser.add_argument("--anyres-tiles", type=int, default=0,
                        help="N>0: base image + N anyres tiles per sample "
                        "through the tower (the config-#3 tile fan-out)")
    parser.add_argument("--master-weights", action="store_true",
                        help="f32 master weights in the optimizer")
    parser.add_argument("--stream-grads", type=int, default=0,
                        help="N>0: gradient-streaming layout — decoder blocks "
                        "split into N layer sub-stacks whose dW is emitted to "
                        "pinned host by the backward (single-chip full-model "
                        "IFT: params+grads never coexist in HBM); requires "
                        "--offload-opt")
    parser.add_argument("--offload-opt", action="store_true",
                        help="pinned-host AdamW moments with the blockwise "
                        "streamed update (train/staged_update.py) — required "
                        "for --stage finetune on one 16 GB chip, where f32 "
                        "moments for 3.8B trainables (~14 GiB) can't live in "
                        "HBM next to params+grads")
    parser.add_argument("--cost-analysis", action="store_true",
                        help="report the compiled step's bytes-accessed and "
                        "achieved HBM bandwidth (compiler cost model / "
                        "measured step time) — the batch-sweep evidence for "
                        "bandwidth- vs compute-bound shapes")
    parser.add_argument("--steps", type=int, default=8)
    # default = the measured per-chip sweet spot (B4 saturates the MXU at
    # T1024; B8 fits since round 2 but adds HBM pressure for no gain)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--seq", type=int, default=1024)
    parser.add_argument("--sweep", default=None,
                        help="comma-separated batch sizes; reports the best")
    parser.add_argument("--no-teachers", action="store_true",
                        help="precomputed random targets instead of in-jit teachers")
    parser.add_argument("--teacher-microbatch", type=int, default=2,
                        help="teacher lax.map chunk size (0 disables chunking)")
    # save_gate measured best on v5e at the flagship shape (4.83 vs 4.65
    # save_flash vs 4.63 full-remat; exact numerics). save_mlp/save_qkv_mlp/
    # save_gate_flash OOM at B4 (16.76G / 19.54G / ResourceExhausted of
    # 15.75G); save_mlp_q8 fits but the per-token int8 round-trips cost more
    # than the skipped matmuls (4.49 ex/s, measured). At B8 even save_gate
    # OOMs the compile — full remat is B8's only fitting policy (4.39 ex/s).
    parser.add_argument("--remat-policy", default="save_gate",
                        help="remat save set (models/decoder.py _remat_policy); "
                        "'none' for full per-block remat")
    parser.add_argument("--xla-attention", action="store_true",
                        help="disable the Pallas flash kernel and run XLA "
                        "attention — measures what the PP fallback costs "
                        "(parallel/pipeline.py runs XLA attention inside "
                        "shard_map stages until Shardy supports nested "
                        "manual sharding)")
    args = parser.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    batch_sizes = (
        [int(b) for b in args.sweep.split(",")] if args.sweep
        else [4 if args.smoke else args.batch]
    )
    best_value, best_extras = -1.0, {}
    for bs in batch_sizes:
        try:
            value, extras = measure(args, bs)
        except Exception as e:  # OOM/compile failure at an aggressive batch
            print(f"# batch {bs} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        print(f"# batch {bs}: {value:.3f} ex/s | {extras}", file=sys.stderr)
        if value > best_value:
            best_value, best_extras = value, extras
    assert best_value > 0, "no benchmark configuration succeeded"
    value, extras = best_value, best_extras

    stage_tag = {"pretrain": "pt", "finetune": "ift", "lora": "lora_ift",
                 "vision_tower": "vt"}[args.stage]
    tower_tag = "" if args.tower == "clip" else "_convnext"
    metric = f"{stage_tag}{tower_tag}_train_step_examples_per_sec_per_chip"

    # vs_baseline compares against this framework's OWN round-1 number for
    # the flagship PT row (bench_baseline.json) — it measures self-progress,
    # NOT the reference (which publishes no throughput numbers; BASELINE.md
    # keeps the bounded >=2x-reference argument). baseline_kind says which.
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    vs_baseline = 1.0
    baseline_kind = "none"
    is_flagship = (
        args.stage == "pretrain" and args.tower == "clip"
        and not args.anyres_tiles
    )
    if not args.smoke and is_flagship:
        if os.path.exists(baseline_path):
            base = json.load(open(baseline_path))
            if base.get("value", 0) > 0:
                vs_baseline = value / base["value"]
                baseline_kind = "self_round1"
        else:
            json.dump(
                {"metric": metric, "value": value},
                open(baseline_path, "w"),
            )

    record = {
        "metric": metric,
        "value": round(value, 3),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "baseline_kind": baseline_kind,
    }
    record.update(extras)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
