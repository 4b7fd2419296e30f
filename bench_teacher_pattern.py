"""Microbench: the reference's per-image teacher featurization vs batched.

The reference computes distillation targets INSIDE the training step with
synchronous per-image Python loops that interleave host-side PIL preprocessing
and batch-1 model calls (SHI-Labs/VisPer-LM `base_ola_vlm.py`):

  * gen:   per-image CLIP feature_extractor + CLIP-H encoder   (:322-330)
  * depth: per-image PIL resize + DINOv2-L infer_image          (:346-363)
  * seg:   per-image OneFormer processor + Swin-L features      (:385-404)

This framework instead preprocesses batched on the host (overlapped with the
device step via the trainer's prefetching iterator) and runs all three teachers
batched INSIDE the compiled train step (models/teachers/__init__.py).

The reference's CUDA/ROCm stack cannot run on a TPU host, and comparing torch
against XLA-CPU would measure backend quality, not design. This bench therefore
measures two things on one backend (torch, this machine's CPU):

  * host_prep_s — the host-side image preprocessing (resize+normalize for the
    three teacher resolutions) the reference performs PER IMAGE inside its
    forward loop. This is pure host work, serialized with device compute in the
    reference (the dataloader cannot overlap it: it happens inside
    model.forward), and it is hardware-independent — on an accelerator it is
    dead time on the critical path of every step. This framework does the same
    work batched in the input pipeline, overlapped with the device step by the
    trainer's prefetching iterator.
  * per_image_s vs batched_s — the same three networks run per-image vs batched.
    NOTE: on CPU batch-1 compute is already efficient, so this ratio does NOT
    show the batch-1 underutilization an accelerator suffers; treat the compute
    ratio as uninformative for accelerators and host_prep_s as the transferable
    measurement.

Prints one JSON line:
  {"host_prep_s": ..., "per_image_s": ..., "batched_s": ...}

Usage: python bench_teacher_pattern.py [--batch 8] [--iters 2] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_teachers(smoke: bool):
    import torch
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModelWithProjection,
        Dinov2Config,
        Dinov2Model,
        SwinConfig,
        SwinModel,
    )

    torch.manual_seed(0)
    if smoke:
        dinov2 = Dinov2Model(Dinov2Config(hidden_size=32, num_hidden_layers=2,
                                          num_attention_heads=2, patch_size=14))
        clip_h = CLIPVisionModelWithProjection(CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, projection_dim=24, image_size=28,
            patch_size=14))
        swin = SwinModel(SwinConfig(image_size=64, embed_dim=24, depths=[1, 1],
                                    num_heads=[2, 2]))
        sizes = (28, 28, 64)
    else:
        # flagship teacher sizes (facebook/dinov2-large, laion CLIP-H/14,
        # openmmlab swin-large @768 as used by OneFormer)
        dinov2 = Dinov2Model(Dinov2Config(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, patch_size=14, image_size=518))
        clip_h = CLIPVisionModelWithProjection(CLIPVisionConfig(
            hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
            num_attention_heads=16, image_size=224, patch_size=14,
            projection_dim=1024))
        swin = SwinModel(SwinConfig(
            image_size=768, patch_size=4, embed_dim=192, depths=[2, 2, 18, 2],
            num_heads=[6, 12, 24, 48], window_size=12))
        sizes = (336, 224, 768)
    for m in (dinov2, clip_h, swin):
        m.eval()
    return (dinov2, clip_h, swin), sizes


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    import torch
    from PIL import Image

    (dinov2, clip_h, swin), (d_size, g_size, s_size) = build_teachers(args.smoke)

    rng = np.random.default_rng(0)
    pils = [
        Image.fromarray(rng.integers(0, 255, size=(640, 480, 3), dtype=np.uint8))
        for _ in range(args.batch)
    ]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def prep(img: Image.Image, size: int) -> np.ndarray:
        arr = np.asarray(img.resize((size, size))).astype(np.float32) / 255.0
        return (arr - mean) / std

    def per_image_pass():
        """The reference pattern: host preprocessing inside the loop, batch-1
        forwards, stack at the end (base_ola_vlm.py:322-404)."""
        feats = []
        with torch.no_grad():
            for model, size in ((dinov2, d_size), (clip_h, g_size), (swin, s_size)):
                outs = []
                for img in pils:
                    px = torch.from_numpy(prep(img, size).transpose(2, 0, 1))[None]
                    out = model(px)
                    outs.append(out.image_embeds if hasattr(out, "image_embeds")
                                else out.last_hidden_state)
                feats.append(torch.cat(outs))
        return feats

    def batched_pass():
        """This framework's pattern: batched host preprocessing, one batched
        forward per teacher (models/teachers/__init__.py)."""
        feats = []
        with torch.no_grad():
            for model, size in ((dinov2, d_size), (clip_h, g_size), (swin, s_size)):
                px = np.stack([prep(img, size) for img in pils])
                px = torch.from_numpy(px.transpose(0, 3, 1, 2))
                out = model(px)
                feats.append(out.image_embeds if hasattr(out, "image_embeds")
                             else out.last_hidden_state)
        return feats

    # host preprocessing alone (the serialized-in-forward share of the loop)
    for img in pils:
        for s in (d_size, g_size, s_size):
            prep(img, s)
    t0 = time.perf_counter()
    for _ in range(max(args.iters, 3)):
        for img in pils:
            for s in (d_size, g_size, s_size):
                prep(img, s)
    t_prep = (time.perf_counter() - t0) / max(args.iters, 3)

    per_image_pass(); batched_pass()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        per_image_pass()
    t_loop = (time.perf_counter() - t0) / args.iters
    t0 = time.perf_counter()
    for _ in range(args.iters):
        batched_pass()
    t_batched = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "host_prep_s": round(t_prep, 3),
        "per_image_s": round(t_loop, 3),
        "batched_s": round(t_batched, 3),
        "batch": args.batch,
        "backend": "torch-cpu",
    }))


if __name__ == "__main__":
    main()
