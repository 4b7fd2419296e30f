"""Static-shape splice plans + batch collation.

This is the host-side half of the TPU-native replacement for the reference's
per-sample splice loop (prepare_inputs_labels_for_multimodal,
/root/reference/ola_vlm/model/ola_arch.py:256-444): for every example we lower the
token stream (text ids with IMAGE_TOKEN_INDEX sentinels) into fixed-length arrays

    text_ids   (T,) int32 — token id at TEXT positions, 0 elsewhere
    token_type (T,) int32 — SEG_PAD / SEG_TEXT / SEG_IMAGE / SEG_TASK
    src_index  (T,) int32 — image-feature row (flattened across tiles) or
                             task-token-table row
    labels     (T,) int32 — NTP labels, IGNORE_INDEX on non-text and prompt spans
    seq_length ()   int32 — number of non-pad positions

The device then builds inputs_embeds with one gather-select
(models/vlm.py:splice_embeddings). Semantics parity: image spans and task-token spans
get IGNORE labels (ola_arch.py:375-429); sequences are truncated to max_len
(llava_arch.py:436-439) and right-padded.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

from visper_lm_tpu.constants import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    SEG_IMAGE,
    SEG_PAD,
    SEG_TASK,
    SEG_TEXT,
)


@dataclasses.dataclass
class SplicePlan:
    text_ids: np.ndarray
    token_type: np.ndarray
    src_index: np.ndarray
    labels: np.ndarray
    seq_length: int


def build_splice_plan(
    input_ids: Sequence[int],
    labels: Optional[Sequence[int]],
    max_len: int,
    *,
    num_image_tokens: int = 576,
    tokens_per_image: Optional[int] = None,
    num_task_tokens: int = 0,
    num_tasks: int = 0,
    image_feature_indices: Optional[Sequence[np.ndarray]] = None,
) -> SplicePlan:
    """Lower one example to a fixed-length splice plan.

    Args:
      input_ids: token ids, IMAGE_TOKEN_INDEX (-200) marks each image.
      labels: per-token labels aligned with input_ids (IGNORE for prompt), or None
        (inference) — all-IGNORE then.
      max_len: static sequence length (pad/truncate target).
      num_image_tokens: image feature tokens spliced per image (576 base; more for
        anyres: pass the per-example total via tokens_per_image).
      num_task_tokens/num_tasks: OLA task tokens appended after EACH image span
        (append_special_tokens is called per image, ola_arch.py:377-392).
      image_feature_indices: per-image explicit feature-buffer indices (anyres merged
        layouts from data/anyres.anyres_index_plan); overrides the sequential layout.
    """
    if labels is None:
        labels = [IGNORE_INDEX] * len(input_ids)
    tokens_per_image = tokens_per_image or num_image_tokens
    task_total = num_task_tokens * num_tasks

    text_ids = np.zeros((max_len,), dtype=np.int32)
    token_type = np.full((max_len,), SEG_PAD, dtype=np.int32)
    src_index = np.zeros((max_len,), dtype=np.int32)
    out_labels = np.full((max_len,), IGNORE_INDEX, dtype=np.int32)

    pos = 0
    image_ordinal = 0

    def emit_text(tok: int, lab: int) -> None:
        nonlocal pos
        if pos >= max_len:
            return
        text_ids[pos] = tok
        token_type[pos] = SEG_TEXT
        out_labels[pos] = lab
        pos += 1

    def emit_image() -> None:
        nonlocal pos, image_ordinal
        if image_feature_indices is not None:
            indices = np.asarray(image_feature_indices[image_ordinal], dtype=np.int32)
        else:
            base = image_ordinal * tokens_per_image
            indices = base + np.arange(tokens_per_image, dtype=np.int32)
        for j in indices:
            if pos >= max_len:
                break
            token_type[pos] = SEG_IMAGE
            src_index[pos] = j
            pos += 1
        image_ordinal += 1
        for j in range(task_total):
            if pos >= max_len:
                break
            token_type[pos] = SEG_TASK
            src_index[pos] = j
            pos += 1

    for tok, lab in zip(input_ids, labels):
        if tok == IMAGE_TOKEN_INDEX:
            emit_image()
        else:
            emit_text(int(tok), int(lab))
        if pos >= max_len:
            break

    return SplicePlan(
        text_ids=text_ids,
        token_type=token_type,
        src_index=src_index,
        labels=out_labels,
        seq_length=pos,
    )


def collate_plans(
    plans: Sequence[SplicePlan],
    images: Optional[np.ndarray] = None,
    extra: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Stack per-example plans into a device-ready batch dict."""
    batch = {
        "text_ids": np.stack([p.text_ids for p in plans]),
        "token_type": np.stack([p.token_type for p in plans]),
        "src_index": np.stack([p.src_index for p in plans]),
        "labels": np.stack([p.labels for p in plans]),
        "seq_lengths": np.asarray([p.seq_length for p in plans], dtype=np.int32),
    }
    if images is not None:
        batch["images"] = images
    if extra:
        batch.update(extra)
    return batch


def pad_to_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length (static-shape bucketing for variable text)."""
    for b in sorted(buckets):
        if length <= b:
            return b
    return max(buckets)
