"""DPT fusion decoder (frozen 'DAv2_Head') — renders depth maps from ViT features.

Spec: /root/reference/ola_vlm/model/aux_heads/da_v2_head.py:160-329 (DPTHead with
features=256, out_channels=[256,512,1024,1024], no BN, no cls readout; DAv2_Head wraps
it at 24x24 patches / 336px). Used frozen for training-time depth visualizations
(base_ola_vlm.py:462-470), probe-task eval renders, and the demo.

Layout is NHWC; all interpolations are torch-bilinear with align_corners=True
(utils/image.resize_bilinear).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.utils.image import conv2d, conv_transpose2d, init_conv, resize_bilinear
from visper_lm_tpu.utils.param import Params

OUT_CHANNELS = (256, 512, 1024, 1024)
FEATURES = 256


def init_dpt_head(key: jax.Array, in_channels: int = 1024, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 40))
    p: Params = {
        "projects": [
            init_conv(next(ks), 1, 1, in_channels, oc, dtype=dtype) for oc in OUT_CHANNELS
        ],
        "resize0": init_conv(next(ks), 4, 4, OUT_CHANNELS[0], OUT_CHANNELS[0], dtype=dtype),
        "resize1": init_conv(next(ks), 2, 2, OUT_CHANNELS[1], OUT_CHANNELS[1], dtype=dtype),
        "resize3": init_conv(next(ks), 3, 3, OUT_CHANNELS[3], OUT_CHANNELS[3], dtype=dtype),
        "layer_rn": [
            init_conv(next(ks), 3, 3, oc, FEATURES, use_bias=False, dtype=dtype)
            for oc in OUT_CHANNELS
        ],
        "refinenets": [
            {
                "rcu1": [
                    init_conv(next(ks), 3, 3, FEATURES, FEATURES, dtype=dtype),
                    init_conv(next(ks), 3, 3, FEATURES, FEATURES, dtype=dtype),
                ],
                "rcu2": [
                    init_conv(next(ks), 3, 3, FEATURES, FEATURES, dtype=dtype),
                    init_conv(next(ks), 3, 3, FEATURES, FEATURES, dtype=dtype),
                ],
                "out_conv": init_conv(next(ks), 1, 1, FEATURES, FEATURES, dtype=dtype),
            }
            for _ in range(4)
        ],
        "output_conv1": init_conv(next(ks), 3, 3, FEATURES, FEATURES // 2, dtype=dtype),
        "output_conv2a": init_conv(next(ks), 3, 3, FEATURES // 2, 32, dtype=dtype),
        "output_conv2b": init_conv(next(ks), 1, 1, 32, 1, dtype=dtype),
    }
    return p


def _residual_conv_unit(convs: List[Params], x: jax.Array) -> jax.Array:
    out = jax.nn.relu(x)
    out = conv2d(convs[0], out, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(convs[1], out, padding=1)
    return out + x


def _fusion(block: Params, x: jax.Array, skip: jax.Array = None, size=None) -> jax.Array:
    out = x
    if skip is not None:
        out = out + _residual_conv_unit(block["rcu1"], skip)
    out = _residual_conv_unit(block["rcu2"], out)
    if size is None:
        size = (out.shape[1] * 2, out.shape[2] * 2)
    out = resize_bilinear(out, size, align_corners=True)
    return conv2d(block["out_conv"], out, padding=0)


def dpt_forward(
    params: Params,
    features: Sequence[jax.Array],   # 4 x (B, N, D) patch tokens, shallow->deep
    patch_h: int = 24,
    patch_w: int = 24,
) -> jax.Array:
    """Returns the relative depth map (B, patch_h*14, patch_w*14), ReLU'd."""
    outs = []
    for i, tokens in enumerate(features):
        b, n, d = tokens.shape
        x = tokens.reshape(b, patch_h, patch_w, d)
        x = conv2d(params["projects"][i], x, padding=0)
        if i == 0:
            x = conv_transpose2d(params["resize0"], x, stride=4)
        elif i == 1:
            x = conv_transpose2d(params["resize1"], x, stride=2)
        elif i == 3:
            x = conv2d(params["resize3"], x, stride=2, padding=1)
        outs.append(x)

    rn = [conv2d(params["layer_rn"][i], outs[i], padding=1) for i in range(4)]

    refs = params["refinenets"]
    path4 = _fusion(refs[3], rn[3], None, size=rn[2].shape[1:3])
    path3 = _fusion(refs[2], path4, rn[2], size=rn[1].shape[1:3])
    path2 = _fusion(refs[1], path3, rn[1], size=rn[0].shape[1:3])
    path1 = _fusion(refs[0], path2, rn[0])

    out = conv2d(params["output_conv1"], path1, padding=1)
    out = resize_bilinear(out, (patch_h * 14, patch_w * 14), align_corners=True)
    out = jax.nn.relu(conv2d(params["output_conv2a"], out, padding=1))
    out = jax.nn.relu(conv2d(params["output_conv2b"], out, padding=0))
    out = jax.nn.relu(out)  # DAv2_Head applies a final relu (da_v2_head.py:319)
    return out[..., 0]


def normalized_depth(params: Params, features: Sequence[jax.Array]) -> jax.Array:
    """Min-max normalized depth map, as logged/visualized by the reference
    (base_ola_vlm.py:354-358, 461-470). Patch grid inferred from the token count."""
    side = int(round(features[0].shape[1] ** 0.5))
    depth = dpt_forward(params, features, patch_h=side, patch_w=side)
    mn = jnp.min(depth, axis=(1, 2), keepdims=True)
    mx = jnp.max(depth, axis=(1, 2), keepdims=True)
    return (depth - mn) / jnp.maximum(mx - mn, 1e-8)


def _conv_from_torch(sd, key) -> Params:
    p = {"kernel": np.ascontiguousarray(np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0)))}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _deconv_from_torch(sd, key) -> Params:
    # torch ConvTranspose2d weight is (in, out, kh, kw)
    p = {"kernel": np.ascontiguousarray(np.transpose(sd[f"{key}.weight"], (2, 3, 0, 1)))}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def import_dpt_head(sd: Dict[str, np.ndarray], prefix: str = "depth_head.") -> Params:
    """Import DPTHead weights (DAv2 ckpt 'depth_head.*' or OLA 'da_v2_head.depth_head.*')."""
    p: Params = {
        "projects": [_conv_from_torch(sd, f"{prefix}projects.{i}") for i in range(4)],
        "resize0": _deconv_from_torch(sd, f"{prefix}resize_layers.0"),
        "resize1": _deconv_from_torch(sd, f"{prefix}resize_layers.1"),
        "resize3": _conv_from_torch(sd, f"{prefix}resize_layers.3"),
        "layer_rn": [
            _conv_from_torch(sd, f"{prefix}scratch.layer{i+1}_rn") for i in range(4)
        ],
        "refinenets": [],
        "output_conv1": _conv_from_torch(sd, f"{prefix}scratch.output_conv1"),
        "output_conv2a": _conv_from_torch(sd, f"{prefix}scratch.output_conv2.0"),
        "output_conv2b": _conv_from_torch(sd, f"{prefix}scratch.output_conv2.2"),
    }
    for i in range(1, 5):
        rp = f"{prefix}scratch.refinenet{i}."
        p["refinenets"].append(
            {
                "rcu1": [
                    _conv_from_torch(sd, rp + "resConfUnit1.conv1"),
                    _conv_from_torch(sd, rp + "resConfUnit1.conv2"),
                ],
                "rcu2": [
                    _conv_from_torch(sd, rp + "resConfUnit2.conv1"),
                    _conv_from_torch(sd, rp + "resConfUnit2.conv2"),
                ],
                "out_conv": _conv_from_torch(sd, rp + "out_conv"),
            }
        )
    return p
