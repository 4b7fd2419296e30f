"""Training losses: next-token prediction + distillation (smooth-L1 + contrastive).

Distillation parity targets:
  * smooth-L1 (huber beta=1) elementwise, masked by the per-sample has-image flag,
    mean over ALL elements (reference _emb_loss, base_ola_vlm.py:289-320 — the mask
    zeroes masked samples but the denominator stays full).
  * batch-contrastive with global negatives: the reference gathers targets across
    ranks with a differentiable all_gather and offsets labels by rank
    (ola_utils.py:96-125). Under GSPMD the batch inside jit IS the global batch, so the
    mathematically identical formulation is simply `preds @ targets.T` with
    labels=arange(B): XLA inserts the (differentiable) collectives when the batch axis
    is sharded over the 'data' mesh axis. No hand-written comm.

Conscious non-replications (flagged in SURVEY.md §7):
  * the in-place `mask.zero_()` bug (base_ola_vlm.py:472-526) — gated behind
    DistillConfig.replicate_mask_zero_bug;
  * the accidental (B,1,1)x(B,) outer-product broadcast when combining mask and
    per-sample contrastive loss — we use the intended per-sample product.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from visper_lm_tpu import constants
from visper_lm_tpu.config import DistillConfig, DistillTaskConfig, VLMConfig


def ntp_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted cross-entropy; labels == IGNORE_INDEX are excluded (mean over valid)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != constants.IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    gold = jnp.take_along_axis(shift_logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = logz - gold
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def ntp_loss_chunked(
    hidden: jax.Array,           # (B, T, D) final-normed decoder states
    lm_head_kernel: jax.Array,   # (D, V)
    labels: jax.Array,           # (B, T)
    chunk: int = 256,
) -> jax.Array:
    """Shifted CE WITHOUT materializing the full (B, T, V) logits tensor.

    Needed for the 8B flagship: vocab 128256 x 4096 tokens in f32 is ~8.4 GB that
    the standard path would materialize twice (fwd + bwd). Scans over sequence
    chunks; each chunk's logits live only inside its (rematerialized) scan step.
    """
    b, t, d = hidden.shape
    shift_h = hidden[:, :-1]
    shift_labels = labels[:, 1:]
    n = t - 1
    pad = (-n) % chunk
    if pad:
        shift_h = jnp.pad(shift_h, ((0, 0), (0, pad), (0, 0)))
        shift_labels = jnp.pad(
            shift_labels, ((0, 0), (0, pad)), constant_values=constants.IGNORE_INDEX
        )
    n_chunks = (n + pad) // chunk
    h_chunks = shift_h.reshape(b, n_chunks, chunk, d).transpose(1, 0, 2, 3)
    l_chunks = shift_labels.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_nll(carry, xs):
        h, lab = xs
        logits = jnp.dot(h, lm_head_kernel).astype(jnp.float32)   # (B, chunk, V)
        valid = lab != constants.IGNORE_INDEX
        safe = jnp.where(valid, lab, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, logz - gold, 0.0)
        tot, cnt = carry
        return (tot + jnp.sum(nll), cnt + jnp.sum(valid)), None

    (total, count), _ = jax.lax.scan(
        chunk_nll, (jnp.float32(0.0), jnp.int32(0)), (h_chunks, l_chunks)
    )
    return total / jnp.maximum(count, 1)


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """Elementwise smooth-L1 (torch F.smooth_l1_loss reduction='none')."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def contrastive_loss(
    preds: jax.Array,      # (B, ...) flattened per sample
    targets: jax.Array,    # (B, ...)
    logit_scale: jax.Array,
) -> jax.Array:
    """Per-sample InfoNCE over the (global) batch (ola_utils.py:108-125).

    Returns (B,) per-sample losses.
    """
    b = preds.shape[0]
    p = preds.reshape(b, -1).astype(jnp.float32)
    t = targets.reshape(b, -1).astype(jnp.float32)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    logits = p @ t.T
    scale = jnp.minimum(jnp.exp(logit_scale.astype(jnp.float32)), 100.0)
    logits = logits * scale
    labels = jnp.arange(b)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - gold


def emb_loss(
    preds: jax.Array,                 # (B, N, D)
    targets: jax.Array,               # (B, N, D)
    mask: jax.Array,                  # (B,) 1.0 = real image sample
    logit_scale: Optional[jax.Array],
    contrastive_weight: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (total, smooth_l1_term, contrastive_term)."""
    mask = mask.astype(jnp.float32)
    sl1 = smooth_l1(preds.astype(jnp.float32), targets.astype(jnp.float32))
    mask_e = mask.reshape((-1,) + (1,) * (sl1.ndim - 1))
    sl1_term = jnp.mean(sl1 * mask_e)

    if logit_scale is not None:
        cont = contrastive_loss(preds, targets, logit_scale)
        cont_term = jnp.mean(contrastive_weight * cont * mask)
    else:
        cont_term = jnp.asarray(0.0, dtype=jnp.float32)

    return sl1_term + cont_term, sl1_term, cont_term


def distill_losses(
    cfg: VLMConfig,
    preds: Dict[str, List[jax.Array]],
    targets: Dict[str, jax.Array],          # {task: (B, N, D)}
    task_masks: Dict[str, jax.Array],       # {task: (B,)}
    logit_scales: Optional[Dict[str, jax.Array]],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum per-task, per-tapped-layer embedding losses.

    Per-layer losses are weighted by the task loss weight and summed (reference
    depth/seg/gen_emb_forward accumulation, base_ola_vlm.py:445-534).
    """
    d = cfg.distill
    assert d is not None
    total = jnp.asarray(0.0, dtype=jnp.float32)
    metrics: Dict[str, jax.Array] = {}
    for tcfg in d.tasks:
        task = tcfg.task
        if task not in preds or task not in targets:
            continue
        mask = task_masks[task]
        if d.replicate_mask_zero_bug:
            mask = jnp.zeros_like(mask)
        scale = logit_scales.get(task) if (logit_scales and d.use_contrastive) else None
        task_total = jnp.asarray(0.0, dtype=jnp.float32)
        task_sl1 = jnp.asarray(0.0, dtype=jnp.float32)
        task_cont = jnp.asarray(0.0, dtype=jnp.float32)
        for layer_pred in preds[task]:
            loss, sl1_term, cont_term = emb_loss(
                layer_pred, targets[task], mask, scale, d.contrastive_loss_weight
            )
            task_total += loss * tcfg.loss_weight
            task_sl1 += sl1_term * tcfg.loss_weight
            task_cont += cont_term * tcfg.loss_weight
        metrics[f"{task}_loss"] = task_total
        metrics[f"{task}_l1_loss"] = task_sl1
        metrics[f"{task}_contrastive_loss"] = task_cont
        total += task_total
    return total, metrics


def silog_loss(
    depth_est: jax.Array, depth_gt: jax.Array, variance_focus: float = 0.5
) -> jax.Array:
    """Scale-invariant log depth loss (reference ola_utils.py:127-134; unused by the
    shipped recipes but part of the public loss surface)."""
    mask = depth_gt > 0
    count = jnp.maximum(jnp.sum(mask), 1)
    d = jnp.where(
        mask,
        jnp.log(jnp.maximum(depth_est, 1e-12)) - jnp.log(jnp.maximum(depth_gt, 1e-12)),
        0.0,
    )
    mean_sq = jnp.sum(d * d) / count
    mean = jnp.sum(d) / count
    loss = jnp.sqrt(jnp.maximum(mean_sq - variance_focus * mean * mean, 0.0))
    return jnp.where(jnp.sum(mask) == 0, 0.0, loss)
