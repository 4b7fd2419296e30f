"""Supervised datasets + modality-grouped batching.

Host-side replacement for the reference's LazySupervisedDataset /
DataCollatorForSupervisedDataset / LengthGroupedSampler stack
(train.py:736-900, ola_vlm_train.py:860-925, llava_trainer.py:122-232):

  * lazy JSON/JSONL conversations with optional image;
  * image preprocessing per aspect-ratio mode ('square' | 'pad' | 'anyres');
  * OLA variant emits per-task masks (1 = real image, 0 = text-only; the teacher
    targets of masked samples are zeros) and the raw image resized for teachers;
  * modality-grouped length bucketing (group_by_modality_length) re-designed as a
    deterministic shuffled-megabatch sampler;
  * batches are lowered to static-shape splice plans (data/collate.py) with bucketed
    sequence lengths so XLA sees a small, fixed set of shapes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

from visper_lm_tpu.config import VLMConfig
from visper_lm_tpu.constants import DEFAULT_IMAGE_TOKEN, IGNORE_INDEX
from visper_lm_tpu.data import mm_utils
from visper_lm_tpu.data.collate import SplicePlan, build_splice_plan, collate_plans, pad_to_bucket
from visper_lm_tpu.data.preprocess import preprocess, preprocess_multimodal


def prepare_coco_probe_records(coco_caption_json: str, image_prefix: str = "train2017/") -> List[dict]:
    """Synthesize probe-training conversations from COCO captions
    (probe_dsg_train.py:696-724): one 'Describe the image in two lines.' turn per
    image with a placeholder answer (NTP is unused in probe training)."""
    data = json.load(open(coco_caption_json))
    id_to_file = {im["id"]: im["file_name"] for im in data["images"]}
    seen = set()
    out = []
    for ann in data["annotations"]:
        image_id = ann["image_id"]
        if image_id in seen:
            continue
        seen.add(image_id)
        out.append(
            {
                "conversations": [
                    {"from": "human", "value": "Describe the image in two lines.\n<image>"},
                    {"from": "gpt", "value": "n"},
                ],
                "image": image_prefix + id_to_file[image_id],
            }
        )
    return out


def read_jsonl(path: str) -> List[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


@dataclasses.dataclass
class DataConfig:
    data_path: str
    image_folder: Optional[str] = None
    image_aspect_ratio: str = "square"       # square | pad | anyres
    image_size: int = 336
    model_max_length: int = 4096
    grid_pinpoints: Optional[str] = None     # for anyres, e.g. "[[336,672],...]"
    group_by_modality_length: bool = False


class SupervisedDataset:
    """Lazy conversations+image dataset (LazySupervisedDataset equivalent)."""

    def __init__(self, cfg: DataConfig, tokenizer, vlm_cfg: VLMConfig):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.vlm_cfg = vlm_cfg
        if cfg.data_path.endswith(".jsonl"):
            self.records = read_jsonl(cfg.data_path)
        else:
            self.records = json.load(open(cfg.data_path))

    def __len__(self) -> int:
        return len(self.records)

    @property
    def modality_lengths(self) -> List[int]:
        """Signed whitespace lengths: positive = has image (llava_trainer.py:219-232)."""
        out = []
        for sample in self.records:
            n = sum(len(c["value"].split()) for c in sample["conversations"])
            out.append(n if "image" in sample else -n)
        return out

    def _load_image(self, rec: dict) -> Optional[Image.Image]:
        if "image" not in rec:
            return None
        path = rec["image"]
        if self.cfg.image_folder:
            path = os.path.join(self.cfg.image_folder, path)
        return Image.open(path).convert("RGB")

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.records[i]
        has_image = "image" in rec
        image = self._load_image(rec)

        import copy

        sources = copy.deepcopy([rec["conversations"]])
        if has_image:
            sources = preprocess_multimodal(sources)

        ex = preprocess(
            sources,
            self.tokenizer,
            self.vlm_cfg.conv_template,
            has_image=has_image,
            model_max_length=self.cfg.model_max_length,
        )[0]

        out: Dict[str, Any] = {
            "input_ids": ex.input_ids,
            "labels": ex.labels,
            "has_image": has_image,
            "pil_image": image,
        }
        if image is not None:
            pixels = mm_utils.process_images(
                [image],
                image_aspect_ratio=self.cfg.image_aspect_ratio,
                image_size=self.cfg.image_size,
                grid_pinpoints=self.cfg.grid_pinpoints,
            )
            out["pixels"] = pixels[0] if isinstance(pixels, list) else pixels[0]
        else:
            out["pixels"] = np.zeros(
                (self.cfg.image_size, self.cfg.image_size, 3), dtype=np.float32
            )
            # text-only sample still carries an <image> placeholder? No: reference
            # splices a zero-image only in OLA PT data where every sample has one.
        return out


def modality_grouped_order(
    modality_lengths: Sequence[int], batch_size: int, seed: int
) -> List[int]:
    """Deterministic re-design of LengthGroupedSampler(group_by_modality):
    shuffle within modality, slice into megabatches of similar length, interleave."""
    rng = np.random.default_rng(seed)
    mm = [i for i, l in enumerate(modality_lengths) if l > 0]
    txt = [i for i, l in enumerate(modality_lengths) if l <= 0]

    def megabatches(indices: List[int]) -> List[List[int]]:
        if not indices:
            return []
        idx = np.array(indices)
        rng.shuffle(idx)
        mega = batch_size * 50
        chunks = [idx[k : k + mega] for k in range(0, len(idx), mega)]
        out = []
        for chunk in chunks:
            lens = np.abs(np.array([modality_lengths[i] for i in chunk]))
            order = np.argsort(-lens)
            out.extend(
                list(chunk[order][k : k + batch_size])
                for k in range(0, len(chunk), batch_size)
            )
        return out

    batches = megabatches(mm) + megabatches(txt)
    rng.shuffle(batches)
    return [int(i) for b in batches for i in b]


class BatchIterator:
    """Yields device-ready splice-plan batches with bucketed static lengths."""

    def __init__(
        self,
        dataset: SupervisedDataset,
        batch_size: int,
        *,
        seq_buckets: Sequence[int] = (512, 1024, 2048, 4096),
        seed: int = 0,
        drop_last: bool = True,
        distill_tasks: Sequence[str] = (),
        process_index: int = 0,
        process_count: int = 1,
        num_workers: int = 0,
        skip_batches: int = 0,
    ):
        """batch_size is PER PROCESS; with process_count > 1 every process computes
        the same global example order from the shared seed, then takes a disjoint
        strided slice (DistributedSampler semantics — the reference relies on
        HF Trainer + the deepspeed launcher for the same contract).

        num_workers > 0 fans the per-sample decode (image load + PIL/native
        resize) over a thread pool — the torch-DataLoader-workers equivalent;
        order is preserved (pool.map). 0 = inline.

        skip_batches > 0 skips that many leading batches of this epoch's
        order WITHOUT decoding their images — the cheap fast-forward used by
        data-order-correct resume (train/trainer.py)."""
        self.ds = dataset
        self.batch_size = batch_size
        self.seq_buckets = seq_buckets
        self.seed = seed
        self.drop_last = drop_last
        self.distill_tasks = tuple(distill_tasks)
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = num_workers
        self.skip_batches = skip_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        if self.ds.cfg.group_by_modality_length:
            order = modality_grouped_order(
                self.ds.modality_lengths, self.batch_size, self.seed
            )
        else:
            rng = np.random.default_rng(self.seed)
            order = list(rng.permutation(n))
        if self.process_count > 1:
            # keep whole per-process batches contiguous in the shared order so the
            # modality-grouped batching above survives the split, then stride by
            # process. Truncate so every process yields the same number of batches
            # (collectives would deadlock otherwise).
            bs = self.batch_size
            n_global = (len(order) // (bs * self.process_count)) * self.process_count
            batches = [order[k * bs : (k + 1) * bs] for k in range(n_global)]
            order = [i for b in batches[self.process_index :: self.process_count] for i in b]
            n = len(order)

        vlm = self.ds.vlm_cfg
        d = vlm.distill
        ntt = d.num_task_tokens if d else 0
        n_tasks = len(d.task_order()) if d else 0

        pool = None
        if self.num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            yield from self._batches(order, n, vlm, ntt, n_tasks, pool)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    def _batches(self, order, n, vlm, ntt, n_tasks, pool):
        first = self.skip_batches * self.batch_size
        for start in range(first, n - (self.batch_size - 1 if self.drop_last else 0), self.batch_size):
            idxs = order[start : start + self.batch_size]
            if len(idxs) < self.batch_size and self.drop_last:
                break
            if pool is not None:
                examples = list(pool.map(self.ds.__getitem__, idxs))
            else:
                examples = [self.ds[i] for i in idxs]

            # static bucket: longest spliced length in batch
            spliced_lens = []
            for ex in examples:
                n_img = sum(1 for t in ex["input_ids"] if t == -200)
                spliced = (
                    len(ex["input_ids"])
                    + n_img * (vlm.num_image_tokens + ntt * n_tasks - 1)
                )
                spliced_lens.append(spliced)
            if self.process_count > 1:
                # all processes must agree on the static sequence length for a
                # global step without communicating; pin to the top bucket.
                max_len = self.seq_buckets[-1]
            else:
                max_len = pad_to_bucket(max(spliced_lens), self.seq_buckets)

            plans = [
                build_splice_plan(
                    ex["input_ids"],
                    ex["labels"],
                    max_len,
                    num_image_tokens=vlm.num_image_tokens,
                    num_task_tokens=ntt,
                    num_tasks=n_tasks,
                )
                for ex in examples
            ]
            images = np.stack([ex["pixels"] for ex in examples]).astype(np.float32)
            extra: Dict[str, np.ndarray] = {}
            has_img = np.array(
                [1.0 if ex["has_image"] else 0.0 for ex in examples], np.float32
            )
            for task in self.distill_tasks:
                extra[f"{task}_mask"] = has_img
            batch = collate_plans(plans, images=images, extra=extra)
            batch["pil_images"] = [ex["pil_image"] for ex in examples]  # host-only
            yield batch
