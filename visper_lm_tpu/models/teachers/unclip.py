"""unCLIP generation teacher: CLIP-ViT-H/14 image encoder -> 1024-d image_embeds.

The reference loads the full StableUnCLIPImg2ImgPipeline but only its image_encoder
produces the training target (base_ola_vlm.py:323-332): CLIP-H pooled CLS through the
visual projection. The diffusion pipe itself is used only for offline visualization /
FID, which stays an eval-side concern (eval/viz.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.config import CLIP_VIT_H_224, VisionConfig
from visper_lm_tpu.data.mm_utils import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD, clip_preprocess
from visper_lm_tpu.models.vit import init_vit, vit_forward
from visper_lm_tpu.utils.param import Params

GEN_EMBED_DIM = 1024


def init_clip_h(key: jax.Array, cfg: VisionConfig = CLIP_VIT_H_224) -> Params:
    return init_vit(key, cfg, projection_dim=GEN_EMBED_DIM)


def gen_target(params: Params, cfg: VisionConfig, images: jax.Array) -> jax.Array:
    """(B, 1, 1024) image_embeds target (unsqueezed to match head output rank)."""
    out = vit_forward(params, cfg, images, final_norm=True)
    return out["cls"][:, None, :].astype(jnp.float32)


def unclip_preprocess_np(pil_image) -> np.ndarray:
    """The pipe's feature_extractor is a stock CLIPImageProcessor @224."""
    return clip_preprocess(pil_image, size=224)


def import_clip_h(sd: Dict[str, np.ndarray], cfg: VisionConfig = CLIP_VIT_H_224) -> Params:
    """Import diffusers' pipe.image_encoder (CLIPVisionModelWithProjection) weights."""
    from visper_lm_tpu.checkpoint.hf_import import import_clip_vision

    return import_clip_vision(sd, cfg, prefix="vision_model.")
