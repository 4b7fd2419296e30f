"""Frozen teacher stack: batched, jitted target computation.

The reference featurizes teachers per-image in Python inside model.forward
(_get_gen_feats / _get_dav2_feats / _get_seg_targets, base_ola_vlm.py:323-397 — the #1
hot spot in SURVEY.md §3.1). Here each teacher is a batched JAX function and
`make_teacher_fn` bundles them into one callable that runs INSIDE the compiled train
step; the host collator only supplies the three preprocessed image tensors.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.config import CLIP_VIT_H_224, DINOV2_VIT_L, VLMConfig
from visper_lm_tpu.models.teachers import dinov2 as dinov2_lib
from visper_lm_tpu.models.teachers import dpt as dpt_lib
from visper_lm_tpu.models.teachers import swin as swin_lib
from visper_lm_tpu.models.teachers import unclip as unclip_lib
from visper_lm_tpu.utils.param import tree_cast


class TeacherConfigs:
    """Teacher architecture configs (defaults = the reference teacher zoo).
    Static/hashable — closed over by teacher_fn, never traced."""

    def __init__(self, dinov2=None, clip_h=None, swin=None):
        self.dinov2 = dinov2 or DINOV2_VIT_L
        self.clip_h = clip_h or CLIP_VIT_H_224
        self.swin = swin or swin_lib.SWIN_L


def init_teachers(
    key: jax.Array,
    cfg: VLMConfig,
    dtype=jnp.bfloat16,
    tcfgs: Optional[TeacherConfigs] = None,
) -> Dict[str, Any]:
    """Random-init teacher params (real use imports pretrained weights)."""
    d = cfg.distill
    assert d is not None
    tcfgs = tcfgs or TeacherConfigs()
    ks = jax.random.split(key, 4)
    teachers: Dict[str, Any] = {}
    tasks = {t.task for t in d.tasks}
    if "depth" in tasks:
        teachers["dinov2"] = tree_cast(dinov2_lib.init_dinov2(ks[0], tcfgs.dinov2), dtype)
        teachers["dpt"] = tree_cast(dpt_lib.init_dpt_head(ks[1], tcfgs.dinov2.hidden_size), dtype)
    if "gen" in tasks:
        teachers["clip_h"] = tree_cast(unclip_lib.init_clip_h(ks[2], tcfgs.clip_h), dtype)
    if "seg" in tasks:
        teachers["swin"] = tree_cast(swin_lib.init_swin(ks[3], tcfgs.swin), dtype)
    return teachers


def make_teacher_fn(
    cfg: VLMConfig,
    tcfgs: Optional[TeacherConfigs] = None,
    microbatch: Optional[int] = 2,
    data_shards: int = 1,
) -> Callable[[Any, Dict[str, jax.Array]], Dict[str, jax.Array]]:
    """Returns teacher_fn(teacher_params, batch) -> {task: target} for the train step.

    Expects batch keys: depth_images (B,336,336,3), gen_images (B,224,224,3),
    seg_images (B,768,768,3) — produced by data/dataset.py via the per-teacher
    preprocessing (each teacher has its own pixel pipeline, SURVEY.md §7 hard part 3).

    microbatch: teacher activations (esp. Swin-L at 768^2) dominate the train-step
    peak-HBM at per-chip batch >= 8; lax.map over micro-batches bounds the teacher
    temp memory at `microbatch` images PER DATA SHARD while the (frozen, no-grad)
    FLOPs are unchanged. None/0 disables chunking.

    data_shards: the mesh's 'data'-axis size. Each lax.map step processes
    microbatch * data_shards images, constrained to stay sharded along 'data' so
    dp>1 meshes keep every device busy inside the sequential chunk loop (a naive
    reshape would shard the CHUNK axis, serializing the whole teacher pass).
    """
    d = cfg.distill
    assert d is not None
    tcfgs = tcfgs or TeacherConfigs()
    tasks = {t.task for t in d.tasks}
    keys = {"depth": "depth_images", "gen": "gen_images", "seg": "seg_images"}

    def compute(tp: Dict[str, Any], imgs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        targets: Dict[str, jax.Array] = {}
        if "depth_images" in imgs:
            targets["depth"] = dinov2_lib.dav2_depth_target(
                tp["dinov2"], tcfgs.dinov2, imgs["depth_images"]
            )
        if "gen_images" in imgs:
            targets["gen"] = unclip_lib.gen_target(
                tp["clip_h"], tcfgs.clip_h, imgs["gen_images"]
            )
        if "seg_images" in imgs:
            targets["seg"] = swin_lib.seg_target(
                tp["swin"], tcfgs.swin, imgs["seg_images"]
            )
        return targets

    def teacher_fn(tp: Dict[str, Any], batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        imgs = {
            keys[t]: batch[keys[t]] for t in tasks if keys[t] in batch
        }
        if not imgs:
            return {}
        # run teachers at their PARAM dtype: f32 pixels promote every teacher
        # matmul to f32 (~8x slower on the v5e MXU; Swin-L@768 measured at
        # 13 TF/s before this cast). Targets are cast back to f32 by the
        # per-teacher target fns.
        leaves = jax.tree_util.tree_leaves(tp)
        if leaves:
            tdtype = leaves[0].dtype
            imgs = {k: v.astype(tdtype) for k, v in imgs.items()}
        b = next(iter(imgs.values())).shape[0]
        mb = (microbatch or 0) * max(1, data_shards)
        if mb <= 0 or mb >= b or b % mb != 0:
            return compute(tp, imgs)
        chunked = {k: v.reshape(b // mb, mb, *v.shape[1:]) for k, v in imgs.items()}
        if data_shards > 1:
            from jax.sharding import PartitionSpec as P

            from visper_lm_tpu.parallel.mesh import DATA_AXIS

            chunked = {
                k: jax.lax.with_sharding_constraint(v, P(None, DATA_AXIS))
                for k, v in chunked.items()
            }
        outs = jax.lax.map(lambda c: compute(tp, c), chunked)
        return {k: v.reshape(b, *v.shape[2:]) for k, v in outs.items()}

    return teacher_fn


def teacher_batch_from_pil(
    cfg: VLMConfig, pil_images, workers: int = 0
) -> Dict[str, np.ndarray]:
    """Host-side: per-teacher preprocessed pixel tensors for a list of PIL images.

    Uses the native (C++/OpenMP) fused resize+normalize when built — three pixel
    pipelines per sample at 336/224/768 px are the dominant host cost of a PT
    step (~42 ms/image in PIL; the trainer's prefetch overlaps it, but the host
    must still keep up with the chip). Teacher targets are soft distillation
    targets, so the native resampler's sub-1% deviation from PIL's fixed-point
    kernels is immaterial here; EVAL pixel paths (tower inputs in eval/, serve/)
    stay PIL-exact for score parity with the reference (SURVEY §7 hard part 3).
    """
    from visper_lm_tpu import native
    from visper_lm_tpu.data.mm_utils import (
        CLIP_IMAGE_MEAN,
        CLIP_IMAGE_STD,
        IMAGENET_MEAN,
        IMAGENET_STD,
        normalize_image,
    )

    d = cfg.distill
    assert d is not None
    tasks = {t.task for t in d.tasks}
    fast = native.available()

    def depth_native(arr) -> np.ndarray:
        # dav2_preprocess_np = resize(336) -> BGR swap -> ImageNet normalize;
        # normalize-with-reversed-stats then channel-flip is the same function
        out = native.resize_normalize(
            arr, 336, IMAGENET_MEAN[::-1], IMAGENET_STD[::-1], native.BICUBIC,
        )
        return out[..., ::-1]

    def gen_native(arr) -> np.ndarray:
        # CLIPImageProcessor @224: shortest-edge bicubic resize -> center crop
        # -> normalize (crop commutes with the fused normalize)
        h, w = arr.shape[:2]
        size = 224
        if min(w, h) == size:
            nw, nh = w, h
        elif w <= h:
            nw, nh = size, int(size * h / w)
        else:
            nw, nh = int(size * w / h), size
        out = native.resize_normalize(
            arr, (nh, nw), CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, native.BICUBIC,
        )
        top, left = (nh - size) // 2, (nw - size) // 2
        return out[top:top + size, left:left + size]

    def seg_native(arr, out=None) -> np.ndarray:
        return native.resize_normalize(
            arr, 768, IMAGENET_MEAN, IMAGENET_STD, native.BICUBIC, out=out,
        )

    out: Dict[str, np.ndarray] = {}
    if fast:
        # PIL -> RGB ndarray ONCE per image; the three pipelines share it
        # (each .convert/.asarray is a full-frame copy — 3x per image was
        # ~10% of the whole host path, bench_input_pipeline.py)
        arrays = [
            np.asarray(im if im.mode == "RGB" else im.convert("RGB"))
            for im in pil_images
        ]

        def run(fn):
            # the native kernel releases the GIL (ctypes), so a thread pool
            # scales across host cores; inline on single-core / workers<=1
            if workers > 1 and len(arrays) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(min(workers, len(arrays))) as pool:
                    return np.stack(list(pool.map(fn, arrays)))
            return np.stack([fn(a) for a in arrays])

        if "depth" in tasks:
            out["depth_images"] = run(depth_native)
        if "gen" in tasks:
            out["gen_images"] = run(gen_native)
        if "seg" in tasks:
            # 768^2 is the heavy plane (7 MB/image f32): write each resize
            # straight into the batch slab instead of alloc + np.stack copy
            slab = np.empty((len(arrays), 768, 768, 3), np.float32)
            def seg_row(i):
                seg_native(arrays[i], out=slab[i])
            if workers > 1 and len(arrays) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(min(workers, len(arrays))) as pool:
                    list(pool.map(seg_row, range(len(arrays))))
            else:
                for i in range(len(arrays)):
                    seg_row(i)
            out["seg_images"] = slab
        return out
    if "depth" in tasks:
        out["depth_images"] = np.stack(
            [dinov2_lib.dav2_preprocess_np(im) for im in pil_images]
        )
    if "gen" in tasks:
        out["gen_images"] = np.stack(
            [unclip_lib.unclip_preprocess_np(im) for im in pil_images]
        )
    if "seg" in tasks:
        out["seg_images"] = np.stack(
            [
                normalize_image(im.resize((768, 768)), IMAGENET_MEAN, IMAGENET_STD)
                for im in pil_images
            ]
        )
    return out
