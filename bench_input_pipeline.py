"""Host input-pipeline sustained-throughput proof (VERDICT r4 #9).

The PT step's teachers run batched inside the jit, so the only way to give
that win back is the HOST: per step it must decode images, build the CLIP-336
pixels, tokenize + label-mask, build splice plans, collate, and run THREE
teacher pixel pipelines (DAv2@336 BGR, unCLIP@224 resize+crop, OneFormer@768)
— the exact composition train/cli.py feeds the trainer through its prefetch
iterator. This bench measures that composition end-to-end on synthetic
640x480 JPEGs and reports sustained images/s against the chip demand rates:

  * single-chip flagship PT (BENCH r4): 4.83 ex/s -> the host must beat that
    per chip it feeds;
  * 8-chip 8B projection (docs/Scale8B.md): global batch 8 / ~0.27 s/step
    = ~29.6 ex/s for the whole host.

It also runs a paced-consumer phase: a fake device step of --step-ms consumes
batches through the SAME PrefetchIterator the trainer uses, and the bench
reports the consumer's achieved step time — proving the prefetch actually
hides the host work at the target rate (stall == achieved > simulated).

Tokenization uses the whitespace FakeTokenizer-style stand-in (real BPE on
~600-char conversations is tens of microseconds — image work dominates at
~42 ms/image in PIL, less with the native resampler).

Run: python bench_input_pipeline.py [--n 192] [--batch 8] [--workers 8]
     [--step-ms 270]   # one JSON line on stdout
"""

from __future__ import annotations

import argparse
import json
import os
import re
import tempfile
import time

import numpy as np


class _WordTokenizer:
    bos_token_id = 1
    _SPECIALS = ("<|end|>", "<|eot_id|>", "</s>", "<|system|>", "<|user|>",
                 "<|assistant|>", "<|start_header_id|>", "<|end_header_id|>")

    def _words(self, text):
        pattern = "(" + "|".join(re.escape(s) for s in self._SPECIALS) + "|\\n)"
        words = []
        for p in re.split(pattern, text):
            if p in self._SPECIALS or p == "\n":
                words.append(p)
            else:
                words.extend(w for w in p.split(" ") if w)
        return words

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [self.bos_token_id] + [
            100 + (hash(w) % 400) for w in self._words(text)
        ]
        return r

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(str(i) for i in ids)


def _make_dataset(root: str, n: int, rng) -> str:
    """n synthetic 640x480 JPEGs + LLaVA-558K-shaped caption conversations."""
    from PIL import Image

    words = ["a", "photo", "of", "the", "scene", "with", "objects", "people",
             "standing", "near", "buildings", "trees", "under", "sky", "and"]
    records = []
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 255, (480, 640, 3), np.uint8)
        name = f"images/{i:05d}.jpg"
        Image.fromarray(arr).save(os.path.join(root, name), quality=85)
        caption = " ".join(rng.choice(words, size=40))
        records.append({
            "id": str(i),
            "image": name,
            "conversations": [
                {"from": "human", "value": "<image>\nDescribe the image."},
                {"from": "gpt", "value": caption},
            ],
        })
    path = os.path.join(root, "data.json")
    with open(path, "w") as f:
        json.dump(records, f)
    return path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=192, help="dataset images")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--step-ms", type=float, default=270.0,
                   help="simulated device step for the paced-consumer phase")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host bench — never grab the TPU

    from visper_lm_tpu import native
    from visper_lm_tpu.config import phi3_clip_vlm, tiny_test_vlm
    from visper_lm_tpu.data.dataset import BatchIterator, DataConfig, SupervisedDataset
    from visper_lm_tpu.data.prefetch import PrefetchIterator
    from visper_lm_tpu.models.teachers import teacher_batch_from_pil

    if args.smoke:
        args.n, args.batch, args.workers = 24, 4, 2

    cfg = tiny_test_vlm(distill=True) if args.smoke else phi3_clip_vlm(distill=True)
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        data_path = _make_dataset(root, args.n, rng)
        ds = SupervisedDataset(
            DataConfig(data_path=data_path, image_folder=root,
                       image_size=cfg.vision.image_size),
            _WordTokenizer(), cfg,
        )
        tasks = [t.task for t in cfg.distill.tasks]

        def batches(epoch: int):
            it = BatchIterator(
                ds, args.batch, seed=epoch, distill_tasks=tasks,
                num_workers=args.workers,
            )
            for batch in it:
                pil = batch.pop("pil_images")
                batch.update(
                    teacher_batch_from_pil(cfg, pil, workers=args.workers)
                )
                yield batch

        # phase 1: raw sustained rate (no consumer pacing) — one warm batch,
        # then time the rest of the epoch
        it = batches(0)
        first = next(it)
        assert {"depth_images", "gen_images", "seg_images"} <= set(first)
        t0 = time.perf_counter()
        n_batches = 0
        for _ in it:
            n_batches += 1
        raw_s = time.perf_counter() - t0
        raw_img_per_s = n_batches * args.batch / raw_s

        # phase 2: paced consumer through the SAME prefetch the trainer uses —
        # the achieved step time tells whether the host hides under the chip
        step_s = args.step_ms / 1000.0
        pf = PrefetchIterator(batches(1), depth=2)
        times = []
        t_prev = time.perf_counter()
        for i, _batch in enumerate(pf):
            time.sleep(step_s)             # the simulated device step
            now = time.perf_counter()
            times.append(now - t_prev)
            t_prev = now
        achieved = float(np.mean(times[1:])) if len(times) > 1 else float("nan")
        stall_ms = max(0.0, (achieved - step_s) * 1000)

        cores = os.cpu_count() or 1
        print(json.dumps({
            "metric": "input_pipeline_images_per_sec",
            "value": round(raw_img_per_s, 2),
            "unit": "images/s",
            "vs_baseline": None,
            "native_preprocess": bool(native.available()),
            "host_cores": cores,
            "host_ms_per_image_per_core": round(
                1000 * cores / raw_img_per_s, 1
            ),
            "batch": args.batch,
            "workers": args.workers,
            "n_images": args.n,
            "image_px": "640x480 jpeg",
            "paced_step_ms": args.step_ms,
            "paced_achieved_ms": round(achieved * 1000, 1),
            "paced_stall_ms_per_step": round(stall_ms, 1),
            "demand_single_chip_ex_per_s": 4.83,
            "demand_8chip_8b_ex_per_s": 29.6,
            "sustains_single_chip": raw_img_per_s >= 4.83,
            "sustains_8chip_8b": raw_img_per_s >= 29.6,
        }))


if __name__ == "__main__":
    main()
