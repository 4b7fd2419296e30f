"""Optimizer: AdamW with per-group learning rates and stage freeze policies.

Parity surface:
  * separate mm_projector_lr / mm_vision_lr param groups
    (reference LLaVATrainer.create_optimizer, llava_trainer.py:890-995)
  * stage freeze policies (ola_vlm_train.py / train.py):
      - PT ("pretrain"): only mm_projector + task tokens + distill heads +
        logit scales train (tune_mm_mlp_adapter=True, pretrain.sh:31; teachers and
        trunk frozen, ola_vlm_train.py:1247-1266)
      - IFT ("finetune"): everything except the vision tower trains
      - VPT: vision tower unfrozen too (unfreeze_mm_vision_tower)
      - probe: only probe heads train (probe_dsg_train.py:1021)
  * cosine schedule with linear warmup_ratio 0.03, weight_decay 0 (pretrain.sh:45-48)
  * no weight decay on norms/biases (HF Trainer default decay exclusions)
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-3
    mm_projector_lr: Optional[float] = None
    mm_vision_lr: Optional[float] = None
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    stage: str = "pretrain"  # pretrain | finetune | vpt | probe | lora
    # Adam moments dtype: f32 by default even for bf16 params (the reference's
    # DeepSpeed bf16 mode keeps fp32 optimizer state; bf16 moments lose small
    # gradient accumulations over long runs)
    mu_dtype: str = "float32"
    # f32 master weights for bf16 params (DeepSpeed bf16-mode fp32_weights
    # equivalent): updates accumulate in an f32 copy so per-step deltas below
    # bf16 resolution (~lr 2e-5 late in a cosine decay) aren't rounded away.
    # Costs 4 bytes/trainable-param of optimizer state (ZeRO-sharded over 'data').
    master_weights: bool = False


# path-regex -> group; first match wins
_STAGE_TRAINABLE: Dict[str, Tuple[str, ...]] = {
    # PT: adapter + task tokens + heads (+ contrastive scales)
    "pretrain": (
        r"^mm_projector/",
        r"^special_tokens/",
        r"^heads/",
        r"^logit_scales/",
    ),
    # IFT: everything except the vision tower (train.py:1064-1065 freezes the
    # tower unless unfreeze_mm_vision_tower is passed)
    "finetune": (r"^(?!vision_tower/).*",),
    # VPT: the reference's vpt.sh runs the PLAIN IFT trainer with no unfreeze
    # flags (scripts/train/vpt.sh:15 -> train_mem.py), so its freeze policy is
    # IDENTICAL to finetune — tower frozen, everything else trains. Kept as a
    # separate stage name for recipe clarity only.
    "vpt": (r"^(?!vision_tower/).*",),
    # reference --unfreeze_mm_vision_tower (train.py:1059-1063): ONLY the
    # vision tower + projector train, everything else freezes
    "vision_tower": (r"^vision_tower/", r"^mm_projector/"),
    # reference --unfreeze_whole_model (train.py:1067-1068)
    "full": (r".*",),
    # probing: heads only, whole trunk frozen
    "probe": (r"^heads/", r"^probes/", r"^logit_scales/"),
    # LoRA IFT: adapters + projector (reference lora_enable path, train.py:983-999)
    "lora": (r"^lora/", r"^mm_projector/"),
}


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


def trainable_mask(params: Any, stage: str) -> Any:
    patterns = _STAGE_TRAINABLE[stage]

    def assign(path, leaf):
        p = _path_str(path)
        return any(re.search(pat, p) for pat in patterns)

    return jax.tree_util.tree_map_with_path(assign, params)


def lr_group_labels(params: Any, cfg: OptimizerConfig, stage: str) -> Any:
    """Label tree: frozen | projector | vision | base."""
    mask = trainable_mask(params, stage)

    def assign(path, leaf, trainable):
        if not trainable:
            return "frozen"
        p = _path_str(path)
        if cfg.mm_projector_lr is not None and p.startswith("mm_projector/"):
            return "projector"
        if cfg.mm_vision_lr is not None and p.startswith("vision_tower/"):
            return "vision"
        return "base"

    return jax.tree_util.tree_map_with_path(assign, params, mask)


def _decay_mask(params: Any) -> Any:
    """No weight decay on 1-D params (norm scales, biases) and scalars."""

    def assign(path, leaf):
        p = _path_str(path)
        if getattr(leaf, "ndim", 0) <= 1:
            return False
        if "norm" in p or p.endswith("/bias"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(assign, params)


def cosine_schedule(cfg: OptimizerConfig, peak_lr: float) -> optax.Schedule:
    warmup = max(int(cfg.warmup_ratio * cfg.total_steps), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup,
        decay_steps=max(cfg.total_steps, warmup + 1),
        end_value=0.0,
    )


def with_master_weights() -> optax.GradientTransformation:
    """Apply updates to an f32 copy of the params; the emitted update is the
    param-dtype delta that snaps params to the rounded master copy."""

    def init_fn(params):
        return {
            "master": jax.tree_util.tree_map(
                lambda p: p.astype(jnp.float32), params
            )
        }

    def update_fn(updates, state, params=None):
        assert params is not None, "with_master_weights needs params at update"
        new_master = jax.tree_util.tree_map(
            lambda m, u: m + u.astype(jnp.float32), state["master"], updates
        )
        out = jax.tree_util.tree_map(
            lambda p, m: m.astype(p.dtype) - p, params, new_master
        )
        return out, {"master": new_master}

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(params: Any, cfg: OptimizerConfig) -> optax.GradientTransformation:
    def adamw(lr: float) -> optax.GradientTransformation:
        steps = [
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                learning_rate=cosine_schedule(cfg, lr),
                b1=cfg.b1,
                b2=cfg.b2,
                eps=cfg.eps,
                mu_dtype=jnp.dtype(cfg.mu_dtype),
                weight_decay=cfg.weight_decay,
                mask=_decay_mask,  # callable: evaluated on the (possibly masked) tree
            ),
        ]
        if cfg.master_weights:
            steps.append(with_master_weights())
        return optax.chain(*steps)

    labels = lr_group_labels(params, cfg, cfg.stage)
    transforms = {
        "base": adamw(cfg.learning_rate),
        "projector": adamw(cfg.mm_projector_lr or cfg.learning_rate),
        "vision": adamw(cfg.mm_vision_lr or cfg.learning_rate),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, labels)
