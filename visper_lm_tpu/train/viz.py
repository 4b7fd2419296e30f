"""Offline training visualizations — the reference's wandb image logging re-homed.

The reference logs teacher-decoded prediction grids from INSIDE model.forward every
1000 (depth/seg) / 4000 (gen) steps (base_ola_vlm.py:171-286,337-408). Here the same
artifacts are produced by a trainer-side hook that runs OUTSIDE the compiled step on
the current params, writing PNG grids under <output_dir>/viz/ — async-friendly and
zero cost when disabled (SURVEY.md §5.5 recommends exactly this split).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence

import numpy as np


def save_image_grid(images: Sequence[np.ndarray], path: str, cols: int = 8) -> None:
    """Tile (H, W, 3) uint8/float arrays into one PNG (make_grid equivalent,
    ola_utils.py:136-176 minus the caption text)."""
    from PIL import Image

    imgs = []
    for im in images:
        arr = np.asarray(im)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        imgs.append(arr)
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    cols = min(cols, len(imgs))
    rows = -(-len(imgs) // cols)
    canvas = np.full((rows * h, cols * w, 3), 255, np.uint8)
    for idx, im in enumerate(imgs):
        r, c = divmod(idx, cols)
        canvas[r * h : r * h + im.shape[0], c * w : c * w + im.shape[1]] = im
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(canvas).save(path)


class DistillVizHook:
    """Periodic depth-map grids from the current depth-head predictions.

    Call hook(step, state, frozen_params, batch) from the training loop; renders at
    most every `every` steps (reference: depth/seg every 1000, base_ola_vlm.py:372).
    """

    def __init__(self, cfg, output_dir: str, frozen_params, dpt_params=None,
                 every: int = 1000):
        self.cfg = cfg
        self.dir = os.path.join(output_dir, "viz")
        self.frozen_params = frozen_params
        self.dpt_params = dpt_params
        self.every = every
        self._fn = None

    def __call__(self, step: int, state, batch: Dict[str, Any]) -> None:
        frozen_params = self.frozen_params
        if self.every <= 0 or step % self.every != 0:
            return
        if self.cfg.distill is None or self.dpt_params is None:
            return
        if self.cfg.distill.get_task("depth") is None:
            return
        import jax
        import jax.numpy as jnp

        from visper_lm_tpu.models.teachers.dpt import normalized_depth
        from visper_lm_tpu.models.vlm import predict_task_embeddings, vlm_forward
        from visper_lm_tpu.utils.param import merge_params

        if self._fn is None:
            cfg = self.cfg

            @jax.jit
            def render(trainable, frozen, dpt, batch):
                params = merge_params(trainable, frozen)
                out = vlm_forward(params, cfg, batch, tap=True, compute_logits=False)
                preds = predict_task_embeddings(params, cfg, out["taps"], out["tap_layers"])
                maps = [
                    normalized_depth(dpt, [p] * 4) for p in preds["depth"]
                ]
                return jnp.stack(maps, axis=0)     # (layers, B, H, W)

            self._fn = render

        device_batch = {
            k: v for k, v in batch.items()
            if k in ("images", "text_ids", "token_type", "src_index", "seq_lengths")
        }
        maps = np.asarray(
            self._fn(state.params, frozen_params, self.dpt_params, device_batch)
        )
        for li in range(maps.shape[0]):
            save_image_grid(
                list(maps[li]),
                os.path.join(self.dir, f"depth_l{li}_step{step}.png"),
            )
