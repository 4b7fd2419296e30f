"""Swin Transformer backbone — the OneFormer segmentation teacher's encoder.

The seg distillation target is ONLY the Swin-L stage-4 feature map at 24x24
(AuxOneFormerPixelLevelModule.forward_features, oneformer_head.py:30,43-69; at 768px
input 768/32 = 24 so the reference's bilinear interp to (24,24) is the identity).
The OneFormer pixel/mask decoders are eval/viz-only and live separately.

Swin-L: embed_dim 192, depths (2,2,18,2), heads (6,12,24,48), window 12 — matching
shi-labs/oneformer_coco_swin_large's backbone config. Shifted windows are realized
with jnp.roll + a precomputed additive attention mask; relative position biases are
gathered from the (2w-1)^2 table with a static index. All shapes static => one XLA
program per input size.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.ops.window_attention import window_attention
from visper_lm_tpu.utils.image import conv2d, init_conv
from visper_lm_tpu.utils.param import (
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
    stack_layer_params,
)


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    patch_size: int = 4
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    dtype: str = "float32"

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)


SWIN_L = SwinConfig()


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2ws-1)^2 relative bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)                                     # (2, ws*ws)
    rel = coords[:, :, None] - coords[:, None, :]        # (2, N, N)
    rel = rel.transpose(1, 2, 0)                          # (N, N, 2)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                    # (N, N)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (0 / -100) preventing cross-window attention after roll."""
    img_mask = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wslice] = cnt
            cnt += 1
    windows = (
        img_mask.reshape(h // ws, ws, w // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def init_swin_block(key: jax.Array, dim: int, heads: int, cfg: SwinConfig, dtype) -> Params:
    ks = jax.random.split(key, 5)
    ws = cfg.window_size
    hidden = int(dim * cfg.mlp_ratio)
    return {
        "norm1": init_layernorm(dim, dtype),
        "qkv": init_linear(ks[0], dim, 3 * dim, use_bias=True, dtype=dtype),
        "proj": init_linear(ks[1], dim, dim, use_bias=True, dtype=dtype),
        "rel_bias": jnp.zeros(((2 * ws - 1) ** 2, heads), dtype=dtype),
        "norm2": init_layernorm(dim, dtype),
        "fc1": init_linear(ks[2], dim, hidden, use_bias=True, dtype=dtype),
        "fc2": init_linear(ks[3], hidden, dim, use_bias=True, dtype=dtype),
    }


def init_swin(key: jax.Array, cfg: SwinConfig = SWIN_L) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    n_stages = len(cfg.depths)
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params: Params = {
        "patch_embed": init_conv(
            next(ki), cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim, dtype=dtype
        ),
        "patch_norm": init_layernorm(cfg.embed_dim, dtype),
        "stages": [],
        "out_norms": [
            init_layernorm(cfg.stage_dim(i), dtype) for i in range(n_stages)
        ],
    }
    for s, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        dim = cfg.stage_dim(s)
        # stacked + scanned (Swin-L stage 3 has 18 blocks; unrolled HLO is too big
        # for the target's remote-compile path)
        stage: Params = {
            "blocks": stack_layer_params(
                [init_swin_block(next(ki), dim, heads, cfg, dtype) for _ in range(depth)]
            )
        }
        if s < n_stages - 1:
            stage["downsample"] = {
                "norm": init_layernorm(4 * dim, dtype),
                "reduction": init_linear(next(ki), 4 * dim, 2 * dim, use_bias=False, dtype=dtype),
            }
        params["stages"].append(stage)
    return params


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_merge(x: jax.Array, ws: int, b: int, h: int, w: int) -> jax.Array:
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _swin_block(
    block: Params,
    x: jax.Array,            # (B, H, W, C)
    heads: int,
    ws: int,
    shift: int,              # STATIC python int (0 for even blocks)
    rel_index: jax.Array,    # (N, N) static
    shift_mask: Optional[jax.Array],   # (nW, N, N) additive; applied iff shift > 0
    eps: float,
) -> jax.Array:
    """shift is STATIC: a traced shift forced every block (including the
    un-shifted half) through a dynamic-roll GATHER over the full (B,H,W,C)
    feature map — pure HBM traffic the un-shifted blocks never needed, and a
    gather where the shifted blocks only need slice+concat. The stage loop
    scans PAIRS of blocks so both shift values stay compile-time constants."""
    b, h, w, c = x.shape
    hd = c // heads
    n = ws * ws

    shortcut = x
    y = layernorm(block["norm1"], x, eps)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    win = _window_partition(y, ws)                       # (B*nW, N, C)
    qkv = linear(block["qkv"], win).reshape(-1, n, 3, heads, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)               # (W, heads, N, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    bias = jnp.take(block["rel_bias"].astype(jnp.float32), rel_index.reshape(-1), axis=0)
    bias = bias.reshape(n, n, heads).transpose(2, 0, 1)   # (heads, N, N)

    # fused kernel on TPU (ops/window_attention.py): the batched tiny
    # (144x32)@(32x144) einsums + f32 score round-trips run at ~5 TF/s in
    # XLA; the kernel keeps each window's scores/softmax in VMEM
    out = window_attention(
        q, k, v, bias, shift_mask if shift else None, scale=hd ** -0.5
    )
    out = out.transpose(0, 2, 1, 3).reshape(-1, n, c).astype(x.dtype)
    out = linear(block["proj"], out)
    out = _window_merge(out, ws, b, h, w)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    x = shortcut + out

    y = layernorm(block["norm2"], x, eps)
    y = linear(block["fc2"], jax.nn.gelu(linear(block["fc1"], y), approximate=False))
    return x + y


def _patch_merge(p: Params, x: jax.Array, eps: float) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # HF Swin concat order: [x0, x1, x2, x3] = [(0,0), (1,0), (0,1), (1,1)]
    x = jnp.concatenate(
        [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
        axis=-1,
    )
    x = layernorm(p["norm"], x, eps)
    return linear(p["reduction"], x)


def swin_forward(
    params: Params,
    cfg: SwinConfig,
    images: jax.Array,          # (B, H, W, 3) normalized
    *,
    out_stages: Sequence[int] = (0, 1, 2, 3),
) -> List[jax.Array]:
    """Returns per-stage NORMED feature maps (B, H_s, W_s, C_s) — HF SwinBackbone
    hidden_states_norms semantics (the OneFormer encoder's .feature_maps)."""
    x = conv2d(params["patch_embed"], images, stride=cfg.patch_size, padding="VALID")
    x = layernorm(params["patch_norm"], x, cfg.norm_eps)

    ws = cfg.window_size
    rel_index = jnp.asarray(_rel_pos_index(ws))
    outputs: List[jax.Array] = []
    for s, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[s]
        h, w = x.shape[1], x.shape[2]
        shift = ws // 2 if min(h, w) > ws else 0
        shift_mask = (
            jnp.asarray(_shift_attn_mask(h, w, ws, shift)) if shift > 0 else None
        )
        depth = cfg.depths[s]
        if depth % 2 == 0 and depth >= 4:
            # scan over (regular, shifted) PAIRS so both shift values are
            # static: the regular half loses its rolls entirely and the
            # shifted half gets slice+concat rolls instead of gathers
            paired = jax.tree_util.tree_map(
                lambda a: a.reshape((depth // 2, 2) + a.shape[1:]),
                stage["blocks"],
            )

            def body(h_, pair, heads=heads, shift_mask=shift_mask, shift=shift):
                blk_a = jax.tree_util.tree_map(lambda a: a[0], pair)
                blk_b = jax.tree_util.tree_map(lambda a: a[1], pair)
                h_ = _swin_block(
                    blk_a, h_, heads, ws, 0, rel_index, None, cfg.norm_eps
                )
                h_ = _swin_block(
                    blk_b, h_, heads, ws, shift, rel_index, shift_mask,
                    cfg.norm_eps,
                )
                return h_, None

            x, _ = jax.lax.scan(body, x, paired)
        else:
            # short stages (Swin-L: depth 2): unrolled with static shifts
            for i in range(depth):
                blk = jax.tree_util.tree_map(lambda a: a[i], stage["blocks"])
                x = _swin_block(
                    blk, x, heads, ws, shift if i % 2 == 1 else 0,
                    rel_index, shift_mask, cfg.norm_eps,
                )
        if s in out_stages:
            outputs.append(layernorm(params["out_norms"][s], x, cfg.norm_eps))
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, cfg.norm_eps)
    return outputs


def seg_target(params: Params, cfg: SwinConfig, images: jax.Array) -> jax.Array:
    """The (B, 576, 1536) distillation target: stage-4 map flattened row-major
    (matches the seg head's (B,1536,24,24) reshape of its 576 tokens)."""
    feats = swin_forward(params, cfg, images, out_stages=(3,))[0]   # (B, 24, 24, C)
    b, h, w, c = feats.shape
    return feats.reshape(b, h * w, c).astype(jnp.float32)


def import_swin_backbone(sd: Dict[str, np.ndarray], cfg: SwinConfig, prefix: str) -> Params:
    """Import an HF OneFormer/Swin backbone state dict (pixel_level_module.encoder.*)."""
    from visper_lm_tpu.checkpoint.hf_import import _ln, _lin, _stack

    params: Params = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                np.transpose(sd[prefix + "embeddings.patch_embeddings.projection.weight"], (2, 3, 1, 0))
            ),
            "bias": sd[prefix + "embeddings.patch_embeddings.projection.bias"],
        },
        "patch_norm": _ln(sd, prefix + "embeddings.norm"),
        "stages": [],
        "out_norms": [],
    }
    for s in range(len(cfg.depths)):
        sp = f"{prefix}encoder.layers.{s}."
        stage: Params = {"blocks": []}
        blocks: list = stage["blocks"]
        for i in range(cfg.depths[s]):
            bp = f"{sp}blocks.{i}."
            att = bp + "attention."
            q = _lin(sd, att + "self.query")
            k = _lin(sd, att + "self.key")
            v = _lin(sd, att + "self.value")
            stage["blocks"].append(
                {
                    "norm1": _ln(sd, bp + "layernorm_before"),
                    "qkv": {
                        "kernel": np.concatenate([q["kernel"], k["kernel"], v["kernel"]], axis=1),
                        "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
                    },
                    "proj": _lin(sd, att + "output.dense"),
                    "rel_bias": sd[att + "self.relative_position_bias_table"],
                    "norm2": _ln(sd, bp + "layernorm_after"),
                    "fc1": _lin(sd, bp + "intermediate.dense"),
                    "fc2": _lin(sd, bp + "output.dense"),
                }
            )
        stage["blocks"] = _stack(blocks)
        if f"{sp}downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": _ln(sd, sp + "downsample.norm"),
                "reduction": _lin(sd, sp + "downsample.reduction"),
            }
        params["stages"].append(stage)

    i = 0
    while f"{prefix}hidden_states_norms.stage{i+1}.weight" in sd:
        params["out_norms"].append(_ln(sd, f"{prefix}hidden_states_norms.stage{i+1}"))
        i += 1
    return params
