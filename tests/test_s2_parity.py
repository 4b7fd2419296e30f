"""S2 multiscale tower NUMERIC parity vs the s2wrapper algorithm.

The reference's CLIPVisionTowerS2 (clip_encoder.py:94-149) delegates to
s2wrapper.forward (bfshi/scaling_on_scales): per scale, BICUBIC-interpolate the
largest-scale input, split into base-size tiles along the batch dim
(chessboard), run the tower, merge the feature grids, AREA-interpolate every
scale's grid to the smallest scale's grid, concat channel-wise. The package is
not installable here, so the oracle below restates that algorithm in torch ops
(F.interpolate bicubic/area, split/merge_chessboard) verbatim and drives OUR
jax tower through it; clip_tower_features_s2 must match to float tolerance.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import VisionConfig
from visper_lm_tpu.models.vit import (
    clip_tower_features,
    clip_tower_features_s2,
    init_vit,
)
from visper_lm_tpu.utils.image import resize_area, resize_bicubic


def test_resize_bicubic_matches_torch():
    rng = np.random.default_rng(0)
    for (h, w), (oh, ow) in [((56, 56), (28, 28)), ((13, 17), (7, 9)),
                             ((14, 14), (30, 22))]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(oh, ow),
            mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bicubic(jnp.asarray(x), (oh, ow)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_resize_area_matches_torch():
    rng = np.random.default_rng(1)
    for (h, w), (oh, ow) in [((72, 72), (24, 24)), ((13, 17), (5, 6))]:
        x = rng.normal(size=(2, h, w, 4)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(oh, ow), mode="area"
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_area(jnp.asarray(x), (oh, ow)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def _split_chessboard(x, num_split):
    # s2wrapper.utils.split_chessboard: tiles stacked along batch, row-major
    B, C, H, W = x.shape
    h, w = H // num_split, W // num_split
    return torch.cat(
        [x[:, :, i * h:(i + 1) * h, j * w:(j + 1) * w]
         for i in range(num_split) for j in range(num_split)], dim=0
    )


def _merge_chessboard(x, num_split):
    B, C, H, W = x.shape
    b = B // (num_split ** 2)
    return torch.cat(
        [torch.cat([x[(i * num_split + j) * b:(i * num_split + j + 1) * b]
                    for j in range(num_split)], dim=-1)
         for i in range(num_split)], dim=-2,
    )


def _s2wrapper_forward_oracle(feature_fn, x_bchw, img_sizes, max_split_size):
    """s2wrapper.forward restated (resize_output_to_idx=0, num_prefix_token=0,
    output_shape='bnc' — the arguments CLIPVisionTowerS2 uses)."""
    num_splits = [math.ceil(s / max_split_size) for s in img_sizes]
    outs = []
    for size, n in zip(img_sizes, num_splits):
        xs = F.interpolate(
            x_bchw.float(), size=(size, size), mode="bicubic"
        ).to(x_bchw.dtype)
        xs = _split_chessboard(xs, n)
        feats = feature_fn(xs)                              # (B*n*n, T, D)
        side = int(feats.shape[1] ** 0.5)
        grid = feats.transpose(1, 2).reshape(feats.shape[0], -1, side, side)
        outs.append(_merge_chessboard(grid, n))
    out_size = outs[0].shape[-1]
    out = torch.cat(
        [F.interpolate(o.float(), size=out_size, mode="area").to(o.dtype)
         for o in outs], dim=1,
    )
    return out.flatten(2).transpose(1, 2)                   # b (h w) c


def test_s2_tower_matches_s2wrapper_algorithm():
    cfg = VisionConfig(
        image_size=28, patch_size=14, hidden_size=16, num_layers=3, num_heads=2,
        mlp_dim=32, select_layer=-2, dtype="float32",
    )
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    scales = (28, 84)  # base + 3x, like the reference's 336/1008
    img = rng.normal(size=(2, 84, 84, 3)).astype(np.float32)

    def feature_fn(x_bchw):
        x = jnp.asarray(x_bchw.permute(0, 2, 3, 1).numpy())
        return torch.from_numpy(np.asarray(clip_tower_features(params, cfg, x)))

    ref = _s2wrapper_forward_oracle(
        feature_fn, torch.from_numpy(img).permute(0, 3, 1, 2),
        img_sizes=list(scales), max_split_size=min(scales),
    ).numpy()
    got = np.asarray(clip_tower_features_s2(params, cfg, jnp.asarray(img),
                                            scales=scales))
    assert got.shape == ref.shape == (2, cfg.num_patches,
                                      len(scales) * cfg.hidden_size)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
