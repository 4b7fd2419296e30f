"""DINOv2 ViT-L/14 backbone — the Depth-Anything-V2 depth teacher.

The reference vendors the full DINOv2 implementation
(/root/reference/ola_vlm/model/aux_heads/depth_anything_v2/dinov2.py); here it is the
generic ViT (models/vit.py) with layerscale, no CLIP pre-norm, and eps 1e-6.

Distillation target (base_ola_vlm.py:347-365): the MEAN of the normed patch tokens of
intermediate layers [4, 11, 17, 23] (get_intermediate_layers(..., norm=True),
dinov2.py:297-321) on a 336x336 input -> (576, 1024). The reference feeds np.array(PIL)
through cv2.cvtColor(BGR2RGB) which actually CHANNEL-SWAPS an already-RGB image
(dpt.py:211) — replicated here as flip_channels for checkpoint parity.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.config import DINOV2_VIT_L, VisionConfig
from visper_lm_tpu.models.vit import init_vit, vit_forward
from visper_lm_tpu.utils.param import Params, layernorm

DAV2_INTERMEDIATE_LAYERS = (4, 11, 17, 23)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init_dinov2(key: jax.Array, cfg: VisionConfig = DINOV2_VIT_L) -> Params:
    return init_vit(key, cfg, use_layerscale=True)


def dinov2_intermediate_features(
    params: Params,
    cfg: VisionConfig,
    images: jax.Array,                              # (B, H, W, 3) normalized
    layers: Sequence[int] = None,
) -> List[Tuple[jax.Array, jax.Array]]:
    """Per layer: (patch_tokens (B, N, D), cls (B, D)), final-norm applied."""
    if layers is None:
        # [4, 11, 17, 23] for ViT-L (dpt.py:164-169); evenly-spaced 4 taps for
        # smaller test towers
        if cfg.num_layers >= 24:
            layers = DAV2_INTERMEDIATE_LAYERS
        else:
            n = min(4, cfg.num_layers)
            layers = sorted(
                {round((i + 1) * cfg.num_layers / n) - 1 for i in range(n)}
            )
    out = vit_forward(params, cfg, images, output_layers=tuple(layers), final_norm=False)
    results = []
    for layer in layers:
        h = layernorm(params["final_norm"], out["taps"][layer], cfg.norm_eps)
        results.append((h[:, 1:], h[:, 0]))
    return results


def dav2_depth_target(
    params: Params, cfg: VisionConfig, images: jax.Array
) -> jax.Array:
    """The (B, 576, 1024) distillation target: mean of the 4 intermediate layers."""
    feats = dinov2_intermediate_features(params, cfg, images)
    stacked = jnp.stack([f[0] for f in feats], axis=0)
    return jnp.mean(stacked.astype(jnp.float32), axis=0)


def dav2_preprocess_np(pil_image, flip_channels: bool = True) -> np.ndarray:
    """Host preprocessing for the DAv2 teacher (dpt.py image2tensor @ input_size=336):
    PIL -> 336x336 -> [optional reference BGR-swap quirk] -> ImageNet normalize, NHWC."""
    img = pil_image.resize((336, 336))
    arr = np.asarray(img.convert("RGB"), dtype=np.float32)
    if flip_channels:
        arr = arr[..., ::-1]
    arr = arr / 255.0
    arr = (arr - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(IMAGENET_STD, np.float32)
    return arr


def import_dav2_dinov2(sd: Dict[str, np.ndarray], cfg: VisionConfig = DINOV2_VIT_L) -> Params:
    """Import the DAv2 checkpoint's `pretrained.*` DINOv2 weights.

    Pre-interpolates the 37x37 (518px) positional grid to the config grid since the
    teacher always runs at a fixed size (DINOv2 interpolates at runtime instead).
    """
    from visper_lm_tpu.checkpoint.hf_import import _ln, _lin, _stack
    from visper_lm_tpu.utils.image import resize_bicubic_pos_embed

    p = "pretrained."
    d = cfg.hidden_size
    patch_w = sd[p + "patch_embed.proj.weight"]     # (D, 3, P, P)
    pos = jnp.asarray(sd[p + "pos_embed"][0])        # (1+N, D)
    src_grid = int(round((pos.shape[0] - 1) ** 0.5))
    pos = resize_bicubic_pos_embed(pos, src_grid, cfg.num_patches_per_side)

    params: Params = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(patch_w.reshape(d, -1).T),
            "bias": sd[p + "patch_embed.proj.bias"],
        },
        "cls_token": sd[p + "cls_token"].reshape(-1),
        "pos_embed": np.asarray(pos),
        "final_norm": _ln(sd, p + "norm"),
    }

    layers = []
    i = 0
    while f"{p}blocks.{i}.norm1.weight" in sd:
        lp = f"{p}blocks.{i}."
        layers.append(
            {
                "norm1": _ln(sd, lp + "norm1"),
                "qkv": _lin(sd, lp + "attn.qkv"),
                "proj": _lin(sd, lp + "attn.proj"),
                "ls1": {"gamma": sd[lp + "ls1.gamma"]},
                "norm2": _ln(sd, lp + "norm2"),
                "fc1": _lin(sd, lp + "mlp.fc1"),
                "fc2": _lin(sd, lp + "mlp.fc2"),
                "ls2": {"gamma": sd[lp + "ls2.gamma"]},
            }
        )
        i += 1
    params["blocks"] = _stack(layers)
    return params
