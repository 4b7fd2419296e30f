"""Training CLI — the framework's `deepspeed ola_vlm/train/*_train_mem.py` equivalent.

One entry point covers the reference's four launch scripts (SURVEY.md §2.6):
  pretrain (PT, distillation)   scripts/train/pretrain.sh
  finetune (IFT)                scripts/train/finetune.sh
  vpt                           scripts/train/vpt.sh
  probe                         scripts/probe/probe.sh

Reference flag surface is preserved (layer-indices/loss-weights DSLs, task tokens,
teacher paths, lrs, schedule) but distribution is mesh-native: --dp/--tp replace the
deepspeed launcher + ZeRO JSON.

Example (PT stage):
  python -m visper_lm_tpu.train.cli \
      --stage pretrain --model llama3 --version llava_llama_3 \
      --layer-indices d18-20_s10-18_g12-20 --num-task-tokens 8 \
      --loss-weights d0.5_s0.5_g0.5 --contrastive-loss-weight 0.3 \
      --data-path data/blip_laion_cc_sbu_558k.json --image-folder data/images \
      --tokenizer meta-llama/Meta-Llama-3-8B-Instruct \
      --per-device-batch-size 32 --lr 1e-3 --epochs 1 --output-dir outputs/pt
"""

from __future__ import annotations

import argparse
import os
from typing import Any

import numpy as np


class _RecipeArgumentParser(argparse.ArgumentParser):
    """Supports @recipes/<stage>.args files with '--flag value' per line and
    '#' comments (the committed per-stage launch recipes, scripts/train/*.sh
    flag-for-flag)."""

    def convert_arg_line_to_args(self, arg_line: str):
        line = arg_line.split("#", 1)[0].strip()
        return line.split() if line else []


def build_argparser() -> argparse.ArgumentParser:
    p = _RecipeArgumentParser(description=__doc__, fromfile_prefix_chars="@")
    p.add_argument("--stage", required=True,
                   choices=["pretrain", "finetune", "vpt", "probe",
                            "pretrain_full"],
                   help="pretrain_full = BEYOND PARITY: the PT distillation "
                        "losses with a FULL-model backward (continuing "
                        "distillation through IFT), inexpressible in the "
                        "reference")
    p.add_argument("--model", default="llama3", choices=["llama3", "phi3", "vicuna"])
    p.add_argument("--version", default=None, help="conversation template")
    p.add_argument("--vision-tower", default="clip", choices=["clip", "convnext"])
    p.add_argument("--mm-projector-type", default="mlp2x_gelu")
    p.add_argument("--image-aspect-ratio", default="square",
                   choices=["square", "pad", "anyres"])
    # distillation
    p.add_argument("--mode", default="gen-depth-seg")
    p.add_argument("--layer-indices", default="d18-20_s10-18_g12-20")
    p.add_argument("--loss-weights", default="d0.5_s0.5_g0.5")
    p.add_argument("--num-task-tokens", type=int, default=8)
    p.add_argument("--contrastive-loss-weight", type=float, default=0.3)
    p.add_argument("--probe-mode", default="depth", choices=["gen", "seg", "depth"])
    # teachers (checkpoint paths; random-init with a warning when absent)
    p.add_argument("--depth-estimator", default="depth_anything_v2_vitl.pth")
    p.add_argument("--image-segmentor", default="shi-labs/oneformer_coco_swin_large")
    p.add_argument("--image-generator", default="stabilityai/stable-diffusion-2-1-unclip")
    # data
    p.add_argument("--data-path", required=True)
    p.add_argument("--image-folder", default=None)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--model-max-length", type=int, default=4096)
    p.add_argument("--group-by-modality-length", action="store_true")
    # init
    p.add_argument("--init-from", default=None,
                   help="HF checkpoint dir to initialize trunk+tower from")
    # optimization (reference defaults: pretrain.sh:38-52 / finetune.sh:26-38)
    p.add_argument("--per-device-batch-size", type=int, default=32)
    p.add_argument("--gradient-accumulation-steps", type=int, default=1,
                   help="microbatches per optimizer update (pretrain.sh:40); "
                        "the step scans over them with one f32 grad buffer")
    # input pipeline (torch DataLoader(num_workers, prefetch_factor) equiv.)
    p.add_argument("--dataloader-num-workers", type=int, default=4,
                   help="threads for per-sample image decode (0 = inline)")
    p.add_argument("--prefetch-depth", type=int, default=2,
                   help="batches assembled ahead on a background thread "
                        "(0 = synchronous)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--mm-projector-lr", type=float, default=None)
    p.add_argument("--mm-vision-lr", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    # checkpointing / logging
    p.add_argument("--output-dir", required=True)
    p.add_argument("--save-steps", type=int, default=200)
    p.add_argument("--save-total-limit", type=int, default=3)
    p.add_argument("--logging-steps", type=int, default=1)
    # mesh / multi-process runtime (the deepspeed-launcher equivalent)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--zero-params", action="store_true",
                   help="ZeRO-3-equivalent full param sharding (zero3.json)")
    p.add_argument("--offload-opt-state", action="store_true",
                   help="optimizer moments in host memory (zero3_offload.json)")
    p.add_argument("--zero-frozen", action="store_true",
                   help="ZeRO-shard frozen params over data (8B PT fit lever)")
    p.add_argument("--shard-teachers", action="store_true",
                   help="shard frozen teacher weights over the model axis")
    p.add_argument("--stream-grads", type=int, default=0,
                   help="gradient-streaming layout: decoder blocks become N "
                        "tap-aligned layer chunks whose per-segment dW the "
                        "backward emits to pinned host (full-model stages "
                        "on TPU; incompatible with gradient accumulation)")
    p.add_argument("--remat-policy", default=None,
                   help="remat save set: 'save_flash' | 'save_mlp' (gate+up, "
                        "skips the 8x-wide MLP recompute matmuls) | "
                        "'save_qkv_mlp' (+ post-rope q/k/v)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multi-host; TPU pods autodetect)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--seq-buckets", default="1024,2048,4096")
    p.add_argument("--smoke", action="store_true",
                   help="tiny model + random distill targets (CI/CPU smoke)")
    return p


def build_vlm_config(args) -> Any:
    import dataclasses

    from visper_lm_tpu import config as C

    decoder = {"llama3": C.LLAMA3_8B, "phi3": C.PHI3_MINI_4K, "vicuna": C.VICUNA_7B}[
        args.model
    ]
    template = args.version or {
        "llama3": "llava_llama_3", "phi3": "llava_phi_3", "vicuna": "vicuna_v1"
    }[args.model]
    num_sys = {"llama3": 38, "phi3": 13, "vicuna": 26}[args.model]

    use_convnext = args.vision_tower == "convnext"
    vision = C.CLIP_VIT_L_336
    proj_in = 3072 if use_convnext else vision.hidden_size

    distill = None
    # distillation heads/teachers exist ONLY in the PT stage: vpt.sh runs the
    # plain IFT trainer (train_mem.py) with NTP-only loss on ALLaVA-Caption —
    # the PT checkpoint's heads are dropped at load (train.py instantiates
    # LlavaLlamaForCausalLM, not the Ola class)
    if args.stage in ("pretrain", "pretrain_full"):
        distill = C.make_distill_config(
            mode=args.mode,
            layer_indices=args.layer_indices,
            loss_weights=args.loss_weights,
            num_task_tokens=args.num_task_tokens,
            contrastive_loss_weight=args.contrastive_loss_weight,
        )
    elif args.stage == "probe":
        distill = C.probe_distill_config(args.probe_mode, decoder.num_layers)

    return C.VLMConfig(
        decoder=decoder,
        vision=vision,
        projector=C.ProjectorConfig(
            projector_type=args.mm_projector_type,
            input_dim=proj_in,
            output_dim=decoder.hidden_size,
        ),
        distill=distill,
        conv_template=template,
        num_sys_tokens=num_sys,
        image_aspect_ratio=args.image_aspect_ratio,
        use_convnext_tower=use_convnext,
        convnext=C.CONVNEXT_XXL_768 if use_convnext else None,
    )


def load_teachers(args, cfg) -> tuple:
    """Import teacher weights where files exist; random-init (warn) otherwise."""
    import jax
    import jax.numpy as jnp

    from visper_lm_tpu.models import teachers as T

    if cfg.distill is None:
        return None, None
    teacher_params = T.init_teachers(jax.random.PRNGKey(7), cfg)
    loaded = []
    if os.path.exists(args.depth_estimator) and "depth" in cfg.distill.mode:
        import torch

        from visper_lm_tpu.checkpoint.hf_import import torch_state_dict_to_numpy
        from visper_lm_tpu.models.teachers.dinov2 import import_dav2_dinov2
        from visper_lm_tpu.models.teachers.dpt import import_dpt_head
        from visper_lm_tpu.utils.param import tree_cast

        sd = torch_state_dict_to_numpy(
            torch.load(args.depth_estimator, map_location="cpu")
        )
        teacher_params["dinov2"] = tree_cast(import_dav2_dinov2(sd), jnp.bfloat16)
        teacher_params["dpt"] = tree_cast(import_dpt_head(sd), jnp.bfloat16)
        loaded.append("depth")
    if os.path.isdir(str(args.image_segmentor)) and "seg" in cfg.distill.mode:
        from visper_lm_tpu.checkpoint.hf_import import load_sharded_safetensors
        from visper_lm_tpu.models.teachers.swin import SWIN_L, import_swin_backbone
        from visper_lm_tpu.utils.param import tree_cast

        sd = load_sharded_safetensors(args.image_segmentor)
        teacher_params["swin"] = tree_cast(
            import_swin_backbone(sd, SWIN_L, prefix="pixel_level_module.encoder."),
            jnp.bfloat16,
        )
        loaded.append("seg")
    if os.path.isdir(str(args.image_generator)) and "gen" in cfg.distill.mode:
        from visper_lm_tpu.checkpoint.hf_import import load_sharded_safetensors
        from visper_lm_tpu.models.teachers.unclip import import_clip_h
        from visper_lm_tpu.utils.param import tree_cast

        enc_dir = os.path.join(args.image_generator, "image_encoder")
        sd = load_sharded_safetensors(enc_dir if os.path.isdir(enc_dir) else args.image_generator)
        teacher_params["clip_h"] = tree_cast(import_clip_h(sd), jnp.bfloat16)
        loaded.append("gen")
    missing = set(cfg.distill.task_order()) - set(loaded)
    if missing:
        print(f"WARNING: teachers randomly initialized (no weights found): {sorted(missing)}")
    dp = args.dp or max(1, jax.device_count() // args.tp)
    return T.make_teacher_fn(cfg, data_shards=dp), teacher_params


def main() -> None:
    args = build_argparser().parse_args()

    from visper_lm_tpu.parallel.distributed import init_distributed

    # must run before any jax backend use (multi-host device visibility)
    init_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax

    from transformers import AutoTokenizer

    from visper_lm_tpu.data.dataset import BatchIterator, DataConfig, SupervisedDataset
    from visper_lm_tpu.models.teachers import teacher_batch_from_pil
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.train.optimizer import OptimizerConfig
    from visper_lm_tpu.train.trainer import TrainerConfig, train

    if args.smoke:
        from visper_lm_tpu.config import tiny_test_vlm

        cfg = tiny_test_vlm(
            distill=args.stage in ("pretrain", "pretrain_full", "probe")
        )
    else:
        cfg = build_vlm_config(args)
    if args.tokenizer == "fake-whitespace":
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))
        from test_data_pipeline import FakeTokenizer

        tokenizer = FakeTokenizer()
    else:
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    dcfg = DataConfig(
        data_path=args.data_path,
        image_folder=args.image_folder,
        image_aspect_ratio=args.image_aspect_ratio,
        image_size=cfg.convnext.image_size if cfg.use_convnext_tower else cfg.vision.image_size,
        model_max_length=args.model_max_length,
        group_by_modality_length=args.group_by_modality_length,
    )
    ds = SupervisedDataset(dcfg, tokenizer, cfg)
    n_batches_per_epoch = len(ds) // (
        args.per_device_batch_size * args.gradient_accumulation_steps
    )
    total_steps = args.max_steps or n_batches_per_epoch * args.epochs

    distill_tasks = tuple(t.task for t in cfg.distill.tasks) if cfg.distill else ()

    def data_iter(epoch: int, skip_batches: int = 0):
        it = BatchIterator(
            ds, args.per_device_batch_size,
            seq_buckets=tuple(int(x) for x in args.seq_buckets.split(",")),
            seed=epoch, distill_tasks=distill_tasks,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            num_workers=args.dataloader_num_workers,
            skip_batches=skip_batches,
        )
        from PIL import Image

        size = dcfg.image_size
        for batch in it:
            pil = batch.pop("pil_images")
            if cfg.distill is not None:
                if args.smoke:
                    rng = np.random.default_rng(0)
                    b = batch["labels"].shape[0]
                    for t in cfg.distill.tasks:
                        batch[f"{t.task}_target"] = rng.normal(
                            size=(b, t.target_tokens, t.target_dim)
                        ).astype(np.float32)
                else:
                    # text-only samples get a black placeholder; their task masks
                    # are already 0 so the targets never contribute to the loss
                    pil = [
                        im if im is not None else Image.new("RGB", (size, size))
                        for im in pil
                    ]
                    batch.update(teacher_batch_from_pil(
                        cfg, pil, workers=args.dataloader_num_workers,
                    ))
            yield batch

    def prefetched_iter(epoch: int, skip_batches: int = 0):
        if args.prefetch_depth <= 0:
            return data_iter(epoch, skip_batches)
        from visper_lm_tpu.data.prefetch import PrefetchIterator

        # batch assembly + teacher featurization overlap the device step
        return PrefetchIterator(
            data_iter(epoch, skip_batches), depth=args.prefetch_depth
        )

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    if args.init_from:
        from visper_lm_tpu.checkpoint.hf_import import import_vlm, load_sharded_safetensors, to_jax
        import jax.numpy as jnp

        sd = load_sharded_safetensors(args.init_from)
        imported = to_jax(import_vlm(sd, cfg), dtype=jnp.bfloat16)

        def overlay(init, new):
            if new is None:
                return init
            return new

        import jax as _jax

        params = _jax.tree_util.tree_map(
            overlay, params, imported, is_leaf=lambda x: x is None
        )

    teacher_fn, teacher_params = (None, None) if args.smoke else load_teachers(args, cfg)

    opt_cfg = OptimizerConfig(
        learning_rate=args.lr,
        mm_projector_lr=args.mm_projector_lr,
        mm_vision_lr=args.mm_vision_lr,
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        total_steps=total_steps,
        stage={"pretrain": "pretrain", "finetune": "finetune", "vpt": "vpt",
               "probe": "probe", "pretrain_full": "full"}[args.stage],
    )
    trainer_cfg = TrainerConfig(
        output_dir=args.output_dir,
        num_epochs=args.epochs,
        max_steps=args.max_steps,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        logging_steps=args.logging_steps,
        dp=args.dp,
        tp=args.tp,
        zero_params=args.zero_params,
        zero_frozen=args.zero_frozen,
        shard_teachers=args.shard_teachers,
        remat_policy=args.remat_policy,
        offload_opt_state=args.offload_opt_state,
        grad_accum_steps=args.gradient_accumulation_steps,
        stream_grads=args.stream_grads,
    )
    train(
        cfg, opt_cfg, trainer_cfg, params, prefetched_iter,
        teacher_fn=teacher_fn, teacher_params=teacher_params,
    )


if __name__ == "__main__":
    main()
