"""Generic ViT image encoder.

One implementation covers the three ViT families the reference uses:
  * CLIP-ViT-L/14-336 base vision tower (reference clip_encoder.py — wraps HF
    CLIPVisionModel; selects hidden layer -2, drops CLS: clip_encoder.py:37-45).
  * CLIP-ViT-H/14-224, the unCLIP generation teacher's image encoder
    (base_ola_vlm.py:323-332) — adds the post-norm + visual projection to image_embeds.
  * DINOv2 ViT-L/14, the Depth-Anything-V2 backbone (vendored dinov2.py) — no CLS-drop,
    layerscale, and intermediate-layer outputs [4, 11, 17, 23].

Differences are config/flags, not separate implementations. Patchify is a single
reshaped matmul (MXU-friendly) instead of a conv.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import VisionConfig
from visper_lm_tpu.utils.param import (
    ACTIVATIONS,
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
    stack_layer_params,
)
from visper_lm_tpu.ops.attention import mha_xla


def init_vit_block(key: jax.Array, cfg: VisionConfig, dtype, use_layerscale: bool) -> Params:
    ks = jax.random.split(key, 6)
    h, m = cfg.hidden_size, cfg.mlp_dim
    p = {
        "norm1": init_layernorm(h, dtype),
        "qkv": init_linear(ks[0], h, 3 * h, use_bias=True, dtype=dtype),
        "proj": init_linear(ks[1], h, h, use_bias=True, dtype=dtype),
        "norm2": init_layernorm(h, dtype),
        "fc1": init_linear(ks[2], h, m, use_bias=True, dtype=dtype),
        "fc2": init_linear(ks[3], m, h, use_bias=True, dtype=dtype),
    }
    if use_layerscale:
        p["ls1"] = {"gamma": jnp.full((h,), 1e-5, dtype=dtype)}
        p["ls2"] = {"gamma": jnp.full((h,), 1e-5, dtype=dtype)}
    return p


def init_vit(
    key: jax.Array,
    cfg: VisionConfig,
    *,
    use_layerscale: bool = False,
    num_registers: int = 0,
    projection_dim: Optional[int] = None,
) -> Params:
    """Initialize a ViT. projection_dim adds CLIP's visual_projection (for CLIP-H)."""
    dtype = jnp.dtype(cfg.dtype)
    keys = jax.random.split(key, cfg.num_layers + 5)
    h = cfg.hidden_size
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    n_pos = cfg.num_patches + (1 if cfg.use_class_token else 0)

    params: Params = {
        "patch_embed": init_linear(keys[0], patch_dim, h, use_bias=True, dtype=dtype),
        "pos_embed": jnp.zeros((n_pos, h), dtype=dtype),
        "blocks": stack_layer_params(
            [
                init_vit_block(keys[2 + i], cfg, dtype, use_layerscale)
                for i in range(cfg.num_layers)
            ]
        ),
        "final_norm": init_layernorm(h, dtype),
    }
    if cfg.use_class_token:
        params["cls_token"] = jnp.zeros((h,), dtype=dtype)
    if cfg.use_pre_norm:
        params["pre_norm"] = init_layernorm(h, dtype)
    if num_registers > 0:
        params["register_tokens"] = jnp.zeros((num_registers, h), dtype=dtype)
    if projection_dim is not None:
        params["visual_projection"] = init_linear(
            keys[1], h, projection_dim, use_bias=False, dtype=dtype
        )
    return params


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, 3) -> (B, N, patch*patch*3) matching conv-with-stride semantics.

    The flattened patch layout matches a torch Conv2d(3, D, k, k).flatten: channel-major
    within the patch (c, ph, pw) so imported conv kernels reshape directly.
    """
    b, h, w, c = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, gh, gw, C, ph, pw)
    return x.reshape(b, gh * gw, c * patch_size * patch_size)


def _vit_block_forward(
    block: Params, cfg: VisionConfig, h: jax.Array, act
) -> jax.Array:
    b, n, d = h.shape
    nh = cfg.num_heads
    hd = d // nh

    x = layernorm(block["norm1"], h, cfg.norm_eps)
    qkv = linear(block["qkv"], x).reshape(b, n, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = mha_xla(q, k, v, causal=False)
    attn = linear(block["proj"], attn.reshape(b, n, d))
    if "ls1" in block:
        attn = attn * block["ls1"]["gamma"]
    h = h + attn

    x = layernorm(block["norm2"], h, cfg.norm_eps)
    y = linear(block["fc2"], act(linear(block["fc1"], x)))
    if "ls2" in block:
        y = y * block["ls2"]["gamma"]
    return h + y


def vit_forward(
    params: Params,
    cfg: VisionConfig,
    images: jax.Array,                    # (B, H, W, 3), already normalized
    *,
    output_layers: Optional[Sequence[int]] = None,  # 0-indexed block outputs to return
    final_norm: bool = True,
) -> Dict[str, Any]:
    """Run the ViT. Returns dict with 'last' (post-norm), 'taps' {layer: states}, 'cls'.

    Block outputs are indexed like HF hidden_states[1:]: taps[i] = output of block i.
    """
    act = ACTIVATIONS[cfg.hidden_act]
    x = patchify(images.astype(params["patch_embed"]["kernel"].dtype), cfg.patch_size)
    h = linear(params["patch_embed"], x)

    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["cls_token"], (h.shape[0], 1, h.shape[-1])
        )
        h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_embed"][None]
    if "register_tokens" in params:
        regs = jnp.broadcast_to(
            params["register_tokens"],
            (h.shape[0],) + params["register_tokens"].shape,
        )
        h = jnp.concatenate([h[:, :1], regs, h[:, 1:]], axis=1)
    if cfg.use_pre_norm:
        h = layernorm(params["pre_norm"], h, cfg.norm_eps)

    want = sorted(set(output_layers or ()))
    if want:
        assert max(want) < cfg.num_layers, (
            f"tap layer {max(want)} out of range for {cfg.num_layers}-layer tower"
        )
    # Truncated towers (select_layer=-2) skip the unneeded suffix layers entirely.
    max_layer = cfg.num_layers
    if output_layers is not None and not final_norm:
        max_layer = max(want) + 1
    # lax.scan over (sliced) stacked blocks: one compiled block body regardless of
    # depth. (An unrolled python loop here produced HLO large enough to exceed the
    # remote-compile request limit on the target environment.)
    blocks = jax.tree_util.tree_map(lambda x: x[:max_layer], params["blocks"])
    num_taps = len(want)
    slot_per_layer = -jnp.ones((max_layer,), dtype=jnp.int32)
    for i, layer in enumerate(want):
        slot_per_layer = slot_per_layer.at[layer].set(i)
    taps0 = jnp.zeros((max(num_taps, 1),) + h.shape, dtype=h.dtype)

    def body(carry, xs):
        h, taps_buf = carry
        block, slot = xs
        h = _vit_block_forward(block, cfg, h, act)
        if num_taps > 0:
            write_slot = jnp.maximum(slot, 0)
            updated = jax.lax.dynamic_update_index_in_dim(taps_buf, h, write_slot, axis=0)
            taps_buf = jnp.where(slot >= 0, updated, taps_buf)
        return (h, taps_buf), None

    (h, taps_buf), _ = jax.lax.scan(body, (h, taps0), (blocks, slot_per_layer))
    taps = {layer: taps_buf[i] for i, layer in enumerate(want)}

    out: Dict[str, Any] = {"taps": taps, "pre_norm_last": h}
    if final_norm:
        h = layernorm(params["final_norm"], h, cfg.norm_eps)
        out["last"] = h
        if cfg.use_class_token:
            cls_tok = h[:, 0]
            if "visual_projection" in params:
                cls_tok = linear(params["visual_projection"], cls_tok)
            out["cls"] = cls_tok
    return out


def clip_tower_features_s2(
    params: Params,
    cfg: VisionConfig,
    images: jax.Array,              # (B, S_max, S_max, 3) at the LARGEST scale
    scales: Sequence[int] = (336, 1008),
) -> jax.Array:
    """CLIPVisionTowerS2 multiscale features (reference clip_encoder.py:94-149,
    s2wrapper semantics): per scale, BICUBIC-resize the largest-scale input ->
    split into base-size tiles (chessboard) -> forward -> reassemble the
    feature grid -> AREA-downscale to the base grid; concat channel-wise.
    The resize modes match s2wrapper.forward exactly (F.interpolate bicubic
    in, area out) — numeric parity is pinned by tests/test_s2_parity.py.
    Output (B, 576, hidden * len(scales))."""
    from visper_lm_tpu.utils.image import resize_area, resize_bicubic

    base = min(scales)
    side = cfg.num_patches_per_side
    b = images.shape[0]
    outs = []
    for scale in sorted(scales):
        imgs = resize_bicubic(images, (scale, scale))
        n_tiles = scale // base
        if n_tiles == 1:
            feats = clip_tower_features(params, cfg, imgs)
            grid = feats.reshape(b, side, side, -1)
        else:
            tiles = imgs.reshape(b, n_tiles, base, n_tiles, base, 3)
            tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(-1, base, base, 3)
            feats = clip_tower_features(params, cfg, tiles)     # (B*t*t, 576, D)
            d = feats.shape[-1]
            grid = feats.reshape(b, n_tiles, n_tiles, side, side, d)
            grid = grid.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, n_tiles * side, n_tiles * side, d
            )
        grid = resize_area(grid, (side, side))
        outs.append(grid.reshape(b, side * side, -1))
    return jnp.concatenate(outs, axis=-1)


def clip_tower_features(params: Params, cfg: VisionConfig, images: jax.Array) -> jax.Array:
    """CLIPVisionTower-equivalent: select hidden layer, drop/keep CLS.

    Reference: clip_encoder.py:37-58 — select_layer -2 => output of block
    num_layers-2 (hidden_states[-2] over a 25-element list), then feature_select
    drops CLS for 'patch'.
    """
    layer = cfg.select_layer if cfg.select_layer >= 0 else cfg.num_layers + cfg.select_layer
    out = vit_forward(params, cfg, images, output_layers=(layer,), final_norm=False)
    feats = out["taps"][layer]
    if cfg.select_feature == "patch":
        feats = feats[:, 1:] if cfg.use_class_token else feats
    elif cfg.select_feature == "cls_patch":
        pass
    else:
        raise ValueError(f"Unexpected select_feature: {cfg.select_feature}")
    return feats
