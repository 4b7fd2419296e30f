"""anyres high-res tiling: host-side feature index plans.

The reference merges anyres tile features with per-sample ragged torch ops
(spatial grid view -> unpad -> image_newline -> flatten, llava_arch.py:318-354).
TPU-native redesign: the merge is a GATHER with indices computable on the host from
(image_size, grid shape) alone — the device just encodes all tiles batched and
gathers. The collator emits these indices straight into the splice plan's src_index,
so the merged layout costs nothing at runtime.

Flat buffer layout per sample: encode(tiles) -> (n_tiles, 576, D) flattened row-major,
with the learnable image_newline embedding appended as the LAST row (index
n_tiles*576). Index plans reference that layout.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from visper_lm_tpu.data.mm_utils import get_anyres_image_grid_shape, select_best_resolution


def unpadded_hw(
    original_size: Tuple[int, int], grid_h_patches: int, grid_w_patches: int,
    patch_side: int,
) -> Tuple[int, int, int, int]:
    """Feature-space crop of the center padding (unpad_image, llava_arch.py:147-175).

    Returns (h', w', pad_top, pad_left) in feature cells.
    """
    ow, oh = original_size
    cur_h = grid_h_patches * patch_side
    cur_w = grid_w_patches * patch_side
    original_ar = ow / oh
    current_ar = cur_w / cur_h
    if original_ar > current_ar:
        scale = cur_w / ow
        new_h = int(oh * scale)
        pad = (cur_h - new_h) // 2
        return cur_h - 2 * pad, cur_w, pad, 0
    scale = cur_h / oh
    new_w = int(ow * scale)
    pad = (cur_w - new_w) // 2
    return cur_h, cur_w - 2 * pad, 0, pad


def anyres_index_plan(
    image_size: Tuple[int, int],        # (width, height) original
    grid_pinpoints,
    *,
    tile_size: int = 336,
    patch_side: int = 24,
    merge_type: str = "spatial_unpad",
) -> Tuple[np.ndarray, int]:
    """Indices into the per-sample flat feature buffer realizing the merged layout.

    Returns (indices (N,), newline_index) where newline_index = n_tiles*576 marks
    the image_newline row (already included in `indices` for unpad mode).
    """
    npw, nph = get_anyres_image_grid_shape(image_size, grid_pinpoints, tile_size)
    n_tiles = 1 + npw * nph                     # base + grid tiles
    tokens_per_tile = patch_side * patch_side
    newline_index = n_tiles * tokens_per_tile

    base = np.arange(tokens_per_tile, dtype=np.int32)  # tile 0 = base image

    if merge_type == "flat":
        rest = np.arange(tokens_per_tile, n_tiles * tokens_per_tile, dtype=np.int32)
        return np.concatenate([base, rest]), newline_index

    assert merge_type.startswith("spatial")
    h_cells = nph * patch_side
    w_cells = npw * patch_side
    if "unpad" in merge_type:
        hp, wp, pad_top, pad_left = unpadded_hw(image_size, nph, npw, patch_side)
        rows = []
        for y in range(hp):
            gy = y + pad_top
            for x in range(wp):
                gx = x + pad_left
                tile = 1 + (gy // patch_side) * npw + (gx // patch_side)
                r, c = gy % patch_side, gx % patch_side
                rows.append(tile * tokens_per_tile + r * patch_side + c)
            rows.append(newline_index)          # newline column at each row end
        return np.concatenate([base, np.asarray(rows, np.int32)]), newline_index

    # 'spatial' (no unpad): row-major over the full grid, no newline
    rows = []
    for gy in range(h_cells):
        for gx in range(w_cells):
            tile = 1 + (gy // patch_side) * npw + (gx // patch_side)
            r, c = gy % patch_side, gx % patch_side
            rows.append(tile * tokens_per_tile + r * patch_side + c)
    return np.concatenate([base, np.asarray(rows, np.int32)]), newline_index


def anyres_token_count(
    image_size: Tuple[int, int], grid_pinpoints, *, tile_size: int = 336,
    patch_side: int = 24, merge_type: str = "spatial_unpad",
) -> int:
    idx, _ = anyres_index_plan(
        image_size, grid_pinpoints, tile_size=tile_size, patch_side=patch_side,
        merge_type=merge_type,
    )
    return int(idx.shape[0])
