"""UNet2DConditionModel (SD-2.1-unclip flavor) in functional JAX, NHWC.

Architecture spec: diffusers UNet2DConditionModel with the
stabilityai/stable-diffusion-2-1-unclip `unet/config.json`:
  in/out channels 4, block_out_channels (320, 640, 1280, 1280),
  down = 3x CrossAttnDownBlock2D + DownBlock2D, mid = UNetMidBlock2DCrossAttn,
  up = UpBlock2D + 3x CrossAttnUpBlock2D, layers_per_block 2,
  cross_attention_dim 1024, attention_head_dim (5, 10, 20, 20),
  use_linear_projection, class_embed_type='projection' with
  projection_class_embeddings_input_dim 2048 (= [CLIP image embed 1024 | sinusoidal
  noise-level embedding 1024]), GroupNorm(32), SiLU, eps 1e-5.

The conditioning contract matches base_ola_vlm.py:323-332 / demo.py:177-188:
encoder_hidden_states = CLIP-H text states (empty prompt), class_labels = the
noise-augmented image embedding the OLA gen heads are trained to predict.

TPU notes: everything is shape-static; attention is jnp.einsum (MXU); convs are
NHWC so XLA's TPU conv emitter tiles them natively; params can be bf16 while
GroupNorm statistics stay f32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from visper_lm_tpu.utils.image import conv2d, init_conv
from visper_lm_tpu.utils.param import (
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
    split_keys,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)
    # which resolution levels have cross-attention transformers
    # (SD2.1: all but the innermost)
    cross_attn_levels: Tuple[bool, ...] = (True, True, True, False)
    norm_groups: int = 32
    norm_eps: float = 1e-5
    time_embed_mult: int = 4  # time_embed_dim = block_out[0] * 4
    projection_class_embeddings_input_dim: int = 2048
    sample_size: int = 96

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * self.time_embed_mult


# ---------------------------------------------------------------- primitives


def group_norm(p: Params, x: jax.Array, groups: int, eps: float) -> jax.Array:
    """GroupNorm over channel-last x (B, ..., C); statistics in f32."""
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    xg = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(b, *spatial, c)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def init_group_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def timestep_embedding(
    t: jax.Array, dim: int, *, max_period: float = 10000.0,
    flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0,
) -> jax.Array:
    """diffusers get_timestep_embedding semantics. t: (B,) -> (B, dim)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _attention(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    """(B, Nq, C) x (B, Nk, C) -> (B, Nq, C); C = heads * hd."""
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // heads
    q = q.reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, nk, heads, k.shape[-1] // heads).transpose(0, 2, 1, 3)
    v = v.reshape(b, nk, heads, v.shape[-1] // heads).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, c)


# ------------------------------------------------------------------- resnet


def init_resnet_block(key, cin: int, cout: int, temb_dim: int, dtype) -> Params:
    ks = split_keys(key, 4)
    p: Params = {
        "norm1": init_group_norm(cin, dtype),
        "conv1": init_conv(ks[0], 3, 3, cin, cout, dtype=dtype),
        "time_emb_proj": init_linear(ks[1], temb_dim, cout, dtype=dtype),
        "norm2": init_group_norm(cout, dtype),
        "conv2": init_conv(ks[2], 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = init_conv(ks[3], 1, 1, cin, cout, dtype=dtype)
    return p


def resnet_block(p: Params, cfg: UNetConfig, x: jax.Array, temb: jax.Array) -> jax.Array:
    h = group_norm(p["norm1"], x, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(p["conv1"], jax.nn.silu(h), padding=1)
    h = h + linear(p["time_emb_proj"], jax.nn.silu(temb))[:, None, None, :]
    h = group_norm(p["norm2"], h, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(p["conv2"], jax.nn.silu(h), padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


# -------------------------------------------------------------- transformer


def init_transformer_block(key, dim: int, cross_dim: int, dtype) -> Params:
    ks = split_keys(key, 12)
    return {
        "norm1": init_layernorm(dim, dtype),
        "attn1": {
            "q": init_linear(ks[0], dim, dim, use_bias=False, dtype=dtype),
            "k": init_linear(ks[1], dim, dim, use_bias=False, dtype=dtype),
            "v": init_linear(ks[2], dim, dim, use_bias=False, dtype=dtype),
            "o": init_linear(ks[3], dim, dim, dtype=dtype),
        },
        "norm2": init_layernorm(dim, dtype),
        "attn2": {
            "q": init_linear(ks[4], dim, dim, use_bias=False, dtype=dtype),
            "k": init_linear(ks[5], cross_dim, dim, use_bias=False, dtype=dtype),
            "v": init_linear(ks[6], cross_dim, dim, use_bias=False, dtype=dtype),
            "o": init_linear(ks[7], dim, dim, dtype=dtype),
        },
        "norm3": init_layernorm(dim, dtype),
        "ff_in": init_linear(ks[8], dim, dim * 8, dtype=dtype),  # GEGLU: 2*4*dim
        "ff_out": init_linear(ks[9], dim * 4, dim, dtype=dtype),
    }


def transformer_block(
    p: Params, x: jax.Array, ctx: jax.Array, heads: int
) -> jax.Array:
    """BasicTransformerBlock: self-attn, cross-attn, GEGLU FF (all pre-LN)."""
    h = layernorm(p["norm1"], x)
    x = x + linear(
        p["attn1"]["o"],
        _attention(
            linear(p["attn1"]["q"], h),
            linear(p["attn1"]["k"], h),
            linear(p["attn1"]["v"], h),
            heads,
        ),
    )
    h = layernorm(p["norm2"], x)
    x = x + linear(
        p["attn2"]["o"],
        _attention(
            linear(p["attn2"]["q"], h),
            linear(p["attn2"]["k"], ctx),
            linear(p["attn2"]["v"], ctx),
            heads,
        ),
    )
    h = layernorm(p["norm3"], x)
    h = linear(p["ff_in"], h)
    a, gate = jnp.split(h, 2, axis=-1)
    x = x + linear(p["ff_out"], a * jax.nn.gelu(gate, approximate=False))
    return x


def init_spatial_transformer(key, dim: int, cross_dim: int, dtype) -> Params:
    ks = split_keys(key, 3)
    return {
        "norm": init_group_norm(dim, dtype),
        "proj_in": init_linear(ks[0], dim, dim, dtype=dtype),
        "block": init_transformer_block(ks[1], dim, cross_dim, dtype),
        "proj_out": init_linear(ks[2], dim, dim, dtype=dtype),
    }


def spatial_transformer(
    p: Params, cfg: UNetConfig, x: jax.Array, ctx: jax.Array, heads: int
) -> jax.Array:
    """Transformer2DModel with use_linear_projection=True (SD2.x)."""
    b, hgt, wid, c = x.shape
    res = x
    h = group_norm(p["norm"], x, cfg.norm_groups, cfg.norm_eps)
    h = h.reshape(b, hgt * wid, c)
    h = linear(p["proj_in"], h)
    h = transformer_block(p["block"], h, ctx, heads)
    h = linear(p["proj_out"], h)
    return res + h.reshape(b, hgt, wid, c)


# ------------------------------------------------------------------- blocks


def _init_level_down(key, cfg: UNetConfig, level: int, cin: int, dtype) -> Params:
    cout = cfg.block_out_channels[level]
    temb = cfg.time_embed_dim
    heads = cfg.attention_head_dim[level]
    ks = split_keys(key, cfg.layers_per_block * 2 + 1)
    resnets, attns = [], []
    for i in range(cfg.layers_per_block):
        resnets.append(
            init_resnet_block(ks[2 * i], cin if i == 0 else cout, cout, temb, dtype)
        )
        if cfg.cross_attn_levels[level]:
            attns.append(
                init_spatial_transformer(
                    ks[2 * i + 1], cout, cfg.cross_attention_dim, dtype
                )
            )
    p: Params = {"resnets": resnets, "attentions": attns}
    if level < len(cfg.block_out_channels) - 1:
        p["downsample"] = init_conv(ks[-1], 3, 3, cout, cout, dtype=dtype)
    return p


def _init_level_up(key, cfg: UNetConfig, level: int, dtype) -> Params:
    """Up level i consumes skips from down level i (reversed order overall)."""
    n_blocks = cfg.layers_per_block + 1
    cout = cfg.block_out_channels[level]
    prev = cfg.block_out_channels[min(level + 1, len(cfg.block_out_channels) - 1)]
    skip_in = cfg.block_out_channels[max(level - 1, 0)]
    temb = cfg.time_embed_dim
    ks = split_keys(key, n_blocks * 2 + 1)
    resnets, attns = [], []
    for i in range(n_blocks):
        res_skip = cout if i < n_blocks - 1 else skip_in
        res_in = prev if i == 0 else cout
        resnets.append(
            init_resnet_block(ks[2 * i], res_in + res_skip, cout, temb, dtype)
        )
        if cfg.cross_attn_levels[level]:
            attns.append(
                init_spatial_transformer(
                    ks[2 * i + 1], cout, cfg.cross_attention_dim, dtype
                )
            )
    p: Params = {"resnets": resnets, "attentions": attns}
    if level > 0:
        p["upsample"] = init_conv(ks[-1], 3, 3, cout, cout, dtype=dtype)
    return p


def init_unet(key: jax.Array, cfg: UNetConfig, dtype=jnp.float32) -> Params:
    ks = split_keys(key, 16)
    c0 = cfg.block_out_channels[0]
    temb = cfg.time_embed_dim
    cmid = cfg.block_out_channels[-1]
    n_levels = len(cfg.block_out_channels)
    p: Params = {
        "conv_in": init_conv(ks[0], 3, 3, cfg.in_channels, c0, dtype=dtype),
        "time_embedding": {
            "linear_1": init_linear(ks[1], c0, temb, dtype=dtype),
            "linear_2": init_linear(ks[2], temb, temb, dtype=dtype),
        },
        "class_embedding": {
            "linear_1": init_linear(
                ks[3], cfg.projection_class_embeddings_input_dim, temb, dtype=dtype
            ),
            "linear_2": init_linear(ks[4], temb, temb, dtype=dtype),
        },
        "down": [
            _init_level_down(
                ks[5 + i],
                cfg,
                i,
                c0 if i == 0 else cfg.block_out_channels[i - 1],
                dtype,
            )
            for i in range(n_levels)
        ],
        "mid": {
            "resnet1": init_resnet_block(ks[10], cmid, cmid, temb, dtype),
            "attn": init_spatial_transformer(
                ks[11], cmid, cfg.cross_attention_dim, dtype
            ),
            "resnet2": init_resnet_block(ks[12], cmid, cmid, temb, dtype),
        },
        "up": [
            _init_level_up(jax.random.fold_in(ks[13], i), cfg, i, dtype)
            for i in range(n_levels)
        ][::-1],  # stored in execution order (deepest level first)
        "conv_norm_out": init_group_norm(c0, dtype),
        "conv_out": init_conv(ks[14], 3, 3, c0, cfg.out_channels, dtype=dtype),
    }
    return p


def unet_forward(
    params: Params,
    cfg: UNetConfig,
    sample: jax.Array,       # (B, H, W, 4) noisy latents, NHWC
    timestep: jax.Array,     # () or (B,)
    encoder_hidden_states: jax.Array,  # (B, 77, cross_dim) text states
    class_labels: jax.Array,           # (B, proj_dim) image-embed conditioning
) -> jax.Array:
    """epsilon/v prediction, same shape as sample."""
    b = sample.shape[0]
    t = jnp.broadcast_to(jnp.asarray(timestep), (b,))
    temb = timestep_embedding(t, cfg.block_out_channels[0])
    te = params["time_embedding"]
    temb = linear(te["linear_2"], jax.nn.silu(linear(te["linear_1"], temb)))
    ce = params["class_embedding"]
    cemb = linear(ce["linear_2"], jax.nn.silu(linear(ce["linear_1"], class_labels)))
    emb = temb + cemb

    ctx = encoder_hidden_states
    h = conv2d(params["conv_in"], sample, padding=1)

    skips: List[jax.Array] = [h]
    n_levels = len(cfg.block_out_channels)
    for level in range(n_levels):
        blk = params["down"][level]
        heads = cfg.attention_head_dim[level]
        for i in range(cfg.layers_per_block):
            h = resnet_block(blk["resnets"][i], cfg, h, emb)
            if cfg.cross_attn_levels[level]:
                h = spatial_transformer(blk["attentions"][i], cfg, h, ctx, heads)
            skips.append(h)
        if "downsample" in blk:
            h = conv2d(blk["downsample"], h, stride=2, padding=1)
            skips.append(h)

    mid = params["mid"]
    h = resnet_block(mid["resnet1"], cfg, h, emb)
    h = spatial_transformer(
        mid["attn"], cfg, h, ctx, cfg.attention_head_dim[-1]
    )
    h = resnet_block(mid["resnet2"], cfg, h, emb)

    for up_idx, level in enumerate(reversed(range(n_levels))):
        blk = params["up"][up_idx]
        heads = cfg.attention_head_dim[level]
        for i in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = resnet_block(blk["resnets"][i], cfg, h, emb)
            if cfg.cross_attn_levels[level]:
                h = spatial_transformer(blk["attentions"][i], cfg, h, ctx, heads)
        if "upsample" in blk:
            bh, hh, wh, ch = h.shape
            h = jax.image.resize(h, (bh, hh * 2, wh * 2, ch), method="nearest")
            h = conv2d(blk["upsample"], h, padding=1)

    h = group_norm(params["conv_norm_out"], h, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(params["conv_out"], jax.nn.silu(h), padding=1)
    return h
