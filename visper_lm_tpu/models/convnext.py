"""ConvNeXt trunk — the CLIP-ConvNeXt-XXL high-res vision tower.

Parity surface (reference clip_convnext_encoder.py:150-174): stem -> 4 stages ->
norm_pre on the final (B, 3072, 24, 24) map at res 768, flattened to (B, 576, 3072).
Stage structure follows timm/OpenCLIP ConvNeXt: blocks are
dwconv7x7 -> LN -> Linear(4x) -> GELU -> Linear -> layerscale gamma -> residual, and
inter-stage downsamples are LN -> conv2x2/s2. The tower hidden size is 3072
(single-stage mode; multi-stage sum 5760 is a config variant, reference :92-101).

NHWC layout throughout — TPU conv-friendly; channels-last matches the block's
LayerNorm/Linear structure with zero transposes (the torch code permutes twice per
block).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.config import ConvNeXtConfig
from visper_lm_tpu.utils.image import conv2d, depthwise_conv2d, init_conv, resize_bilinear
from visper_lm_tpu.utils.param import (
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
)


def init_convnext_block(key: jax.Array, dim: int, dtype) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "dwconv": {
            "kernel": jax.random.normal(ks[0], (7, 7, 1, dim), jnp.float32).astype(dtype)
            * 0.02,
            "bias": jnp.zeros((dim,), dtype),
        },
        "norm": init_layernorm(dim, dtype),
        "fc1": init_linear(ks[1], dim, 4 * dim, use_bias=True, dtype=dtype),
        "fc2": init_linear(ks[2], 4 * dim, dim, use_bias=True, dtype=dtype),
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def init_convnext(key: jax.Array, cfg: ConvNeXtConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    ki = iter(jax.random.split(key, 128))
    params: Params = {
        "stem_conv": init_conv(next(ki), 4, 4, 3, cfg.dims[0], dtype=dtype),
        "stem_norm": init_layernorm(cfg.dims[0], dtype),
        "stages": [],
        "norm_pre": init_layernorm(cfg.dims[-1], dtype),
    }
    for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        # blocks are STACKED (leading depth axis) and scanned — keeps the compiled
        # program size O(1) in depth (stage 3 of XXL has 30 blocks)
        from visper_lm_tpu.utils.param import stack_layer_params

        stage: Params = {
            "blocks": stack_layer_params(
                [init_convnext_block(next(ki), dim, dtype) for _ in range(depth)]
            )
        }
        if s > 0:
            stage["downsample"] = {
                "norm": init_layernorm(cfg.dims[s - 1], dtype),
                "conv": init_conv(next(ki), 2, 2, cfg.dims[s - 1], dim, dtype=dtype),
            }
        params["stages"].append(stage)
    return params


def _block(p: Params, x: jax.Array, eps: float) -> jax.Array:
    y = depthwise_conv2d(p["dwconv"], x, padding=3)
    y = layernorm(p["norm"], y, eps)
    y = linear(p["fc1"], y)
    y = jax.nn.gelu(y, approximate=False)
    y = linear(p["fc2"], y)
    y = y * p["gamma"]
    return x + y


def convnext_forward(
    params: Params,
    cfg: ConvNeXtConfig,
    images: jax.Array,                  # (B, H, W, 3) normalized
    *,
    return_stages: bool = False,
) -> Any:
    """Returns norm_pre'd final map (B, H/32, W/32, C) [+ per-stage maps]."""
    x = conv2d(params["stem_conv"], images, stride=4, padding="VALID")
    x = layernorm(params["stem_norm"], x, cfg.norm_eps)
    stages: List[jax.Array] = []
    for stage in params["stages"]:
        if "downsample" in stage:
            x = layernorm(stage["downsample"]["norm"], x, cfg.norm_eps)
            x = conv2d(stage["downsample"]["conv"], x, stride=2, padding="VALID")

        def body(h, block):
            return _block(block, h, cfg.norm_eps), None

        x, _ = jax.lax.scan(body, x, stage["blocks"])
        stages.append(x)
    out = layernorm(params["norm_pre"], x, cfg.norm_eps)
    if return_stages:
        return out, stages
    return out


def convnext_tower_features(
    params: Params, cfg: ConvNeXtConfig, images: jax.Array,
    interp_tokens: int | None = None,
) -> jax.Array:
    """Tower feature output: (B, N, C) with N = (H/32)^2 (576 @768), optionally
    bilinearly resampled to interp_tokens (reference interpolate, :128-148)."""
    fmap = convnext_forward(params, cfg, images)
    b, h, w, c = fmap.shape
    if interp_tokens is not None and interp_tokens != h * w:
        side = int(round(interp_tokens ** 0.5))
        fmap = resize_bilinear(fmap, (side, side), align_corners=False)
        h = w = side
    return fmap.reshape(b, h * w, c)


def import_openclip_convnext(
    sd: Dict[str, np.ndarray], cfg: ConvNeXtConfig, prefix: str = "visual.trunk."
) -> Params:
    """Import an OpenCLIP ConvNeXt trunk state dict (timm key layout).

    Also accepts the reference's post-hoc tower reload from model safetensors where
    keys are nested under model.vision_tower.vision_tower. (builder.py:194-222).
    """
    from visper_lm_tpu.checkpoint.hf_import import _ln, _lin

    def conv_p(key: str) -> Params:
        p = {"kernel": np.ascontiguousarray(np.transpose(sd[key + ".weight"], (2, 3, 1, 0)))}
        if key + ".bias" in sd:
            p["bias"] = sd[key + ".bias"]
        return p

    def dwconv_p(key: str) -> Params:
        w = sd[key + ".weight"]                      # (C, 1, 7, 7)
        return {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": sd[key + ".bias"],
        }

    from visper_lm_tpu.checkpoint.hf_import import _stack

    params: Params = {
        "stem_conv": conv_p(prefix + "stem.0"),
        "stem_norm": _ln(sd, prefix + "stem.1"),
        "stages": [],
        "norm_pre": _ln(sd, prefix + "norm_pre"),
    }
    for s in range(len(cfg.depths)):
        sp = f"{prefix}stages.{s}."
        blocks = []
        stage: Params = {}
        if f"{sp}downsample.1.weight" in sd:
            stage["downsample"] = {
                "norm": _ln(sd, sp + "downsample.0"),
                "conv": conv_p(sp + "downsample.1"),
            }
        for i in range(cfg.depths[s]):
            bp = f"{sp}blocks.{i}."
            blocks.append(
                {
                    "dwconv": dwconv_p(bp + "conv_dw"),
                    "norm": _ln(sd, bp + "norm"),
                    "fc1": _lin(sd, bp + "mlp.fc1"),
                    "fc2": _lin(sd, bp + "mlp.fc2"),
                    "gamma": sd[bp + "gamma"],
                }
            )
        stage["blocks"] = _stack(blocks)
        params["stages"].append(stage)
    return params


def export_openclip_convnext(
    params: Params, cfg: ConvNeXtConfig, prefix: str = "visual.trunk."
) -> Dict[str, np.ndarray]:
    """Inverse of import_openclip_convnext: params -> timm-layout state dict.

    Round-trips the reference checkpoint format (tower weights inside the model
    safetensors under model.vision_tower.vision_tower.*, builder.py:194-222)."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(key: str, p: Params) -> None:
        sd[key + ".weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
        )
        if "bias" in p:
            sd[key + ".bias"] = np.asarray(p["bias"])

    def put_ln(key: str, p: Params) -> None:
        sd[key + ".weight"] = np.asarray(p["scale"])
        sd[key + ".bias"] = np.asarray(p["bias"])

    def put_lin(key: str, p: Params) -> None:
        sd[key + ".weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
        if "bias" in p:
            sd[key + ".bias"] = np.asarray(p["bias"])

    put_conv(prefix + "stem.0", params["stem_conv"])
    put_ln(prefix + "stem.1", params["stem_norm"])
    put_ln(prefix + "norm_pre", params["norm_pre"])
    for s, stage in enumerate(params["stages"]):
        sp = f"{prefix}stages.{s}."
        if "downsample" in stage:
            put_ln(sp + "downsample.0", stage["downsample"]["norm"])
            put_conv(sp + "downsample.1", stage["downsample"]["conv"])
        blocks = stage["blocks"]
        n = np.asarray(blocks["gamma"]).shape[0]
        for i in range(n):
            bp = f"{sp}blocks.{i}."
            blk = {k: jax.tree_util.tree_map(lambda x: np.asarray(x)[i], v)
                   for k, v in blocks.items()}
            put_conv(bp + "conv_dw", blk["dwconv"])
            put_ln(bp + "norm", blk["norm"])
            put_lin(bp + "mlp.fc1", blk["fc1"])
            put_lin(bp + "mlp.fc2", blk["fc2"])
            sd[bp + "gamma"] = np.asarray(blk["gamma"])
    return sd
