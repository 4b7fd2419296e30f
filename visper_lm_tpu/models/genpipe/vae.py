"""AutoencoderKL decoder (SD-2.1) — latents (B, h, w, 4) -> RGB (B, 8h, 8w, 3).

Spec: diffusers AutoencoderKL `vae/config.json` of stable-diffusion-2-1-unclip:
block_out_channels (128, 256, 512, 512), layers_per_block 2 (decoder uses
layers+1 = 3 resnets per up block), GroupNorm(32, eps 1e-6), SiLU, mid block with
one single-head self-attention, scaling_factor 0.18215. Only the decoder half is
needed (the pipeline never encodes pixels): post_quant_conv -> conv_in -> mid ->
3x upsampling levels -> norm/act -> conv_out.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from visper_lm_tpu.models.genpipe.unet import group_norm, init_group_norm
from visper_lm_tpu.utils.image import conv2d, init_conv
from visper_lm_tpu.utils.param import Params, init_linear, linear, split_keys


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2  # decoder up blocks run layers_per_block + 1 resnets
    norm_groups: int = 32
    norm_eps: float = 1e-6
    out_channels: int = 3
    scaling_factor: float = 0.18215


def _init_resnet(key, cin: int, cout: int, dtype) -> Params:
    ks = split_keys(key, 3)
    p: Params = {
        "norm1": init_group_norm(cin, dtype),
        "conv1": init_conv(ks[0], 3, 3, cin, cout, dtype=dtype),
        "norm2": init_group_norm(cout, dtype),
        "conv2": init_conv(ks[1], 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = init_conv(ks[2], 1, 1, cin, cout, dtype=dtype)
    return p


def _resnet(p: Params, cfg: VAEConfig, x: jax.Array) -> jax.Array:
    h = group_norm(p["norm1"], x, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(p["conv1"], jax.nn.silu(h), padding=1)
    h = group_norm(p["norm2"], h, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(p["conv2"], jax.nn.silu(h), padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def init_vae_decoder(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    ks = split_keys(key, 12)
    cdeep = cfg.block_out_channels[-1]
    n_levels = len(cfg.block_out_channels)
    up = []
    # decoder runs levels deepest-first; up_blocks[j] maps to reversed(block_out)[j]
    rev = list(reversed(cfg.block_out_channels))
    cin = cdeep
    for j in range(n_levels):
        cout = rev[j]
        kj = jax.random.fold_in(ks[4], j)
        resnets = []
        for i in range(cfg.layers_per_block + 1):
            resnets.append(_init_resnet(jax.random.fold_in(kj, i), cin if i == 0 else cout, cout, dtype))
        blk: Params = {"resnets": resnets}
        if j < n_levels - 1:
            blk["upsample"] = init_conv(jax.random.fold_in(kj, 99), 3, 3, cout, cout, dtype=dtype)
        up.append(blk)
        cin = cout
    return {
        "post_quant_conv": init_conv(
            ks[0], 1, 1, cfg.latent_channels, cfg.latent_channels, dtype=dtype
        ),
        "conv_in": init_conv(ks[1], 3, 3, cfg.latent_channels, cdeep, dtype=dtype),
        "mid": {
            "resnet1": _init_resnet(ks[2], cdeep, cdeep, dtype),
            "attn": {
                "norm": init_group_norm(cdeep, dtype),
                "q": init_linear(jax.random.fold_in(ks[3], 0), cdeep, cdeep, dtype=dtype),
                "k": init_linear(jax.random.fold_in(ks[3], 1), cdeep, cdeep, dtype=dtype),
                "v": init_linear(jax.random.fold_in(ks[3], 2), cdeep, cdeep, dtype=dtype),
                "o": init_linear(jax.random.fold_in(ks[3], 3), cdeep, cdeep, dtype=dtype),
            },
            "resnet2": _init_resnet(ks[5], cdeep, cdeep, dtype),
        },
        "up": up,
        "conv_norm_out": init_group_norm(cfg.block_out_channels[0], dtype),
        "conv_out": init_conv(
            ks[6], 3, 3, cfg.block_out_channels[0], cfg.out_channels, dtype=dtype
        ),
    }


def _mid_attention(p: Params, cfg: VAEConfig, x: jax.Array) -> jax.Array:
    """Single-head spatial self-attention (diffusers VAE AttnBlock)."""
    b, h, w, c = x.shape
    res = x
    n = group_norm(p["norm"], x, cfg.norm_groups, cfg.norm_eps).reshape(b, h * w, c)
    q, k, v = linear(p["q"], n), linear(p["k"], n), linear(p["v"], n)
    scores = jnp.einsum("bqc,bkc->bqk", q, k) / math.sqrt(c)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v)
    out = linear(p["o"], out).reshape(b, h, w, c)
    return res + out


def vae_decode(params: Params, cfg: VAEConfig, latents: jax.Array) -> jax.Array:
    """Scaled latents -> RGB in [0, 1]. latents: (B, h, w, 4) NHWC."""
    z = latents / cfg.scaling_factor
    z = conv2d(params["post_quant_conv"], z, padding=0)
    h = conv2d(params["conv_in"], z, padding=1)
    mid = params["mid"]
    h = _resnet(mid["resnet1"], cfg, h)
    h = _mid_attention(mid["attn"], cfg, h)
    h = _resnet(mid["resnet2"], cfg, h)
    for blk in params["up"]:
        for rp in blk["resnets"]:
            h = _resnet(rp, cfg, h)
        if "upsample" in blk:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
            h = conv2d(blk["upsample"], h, padding=1)
    h = group_norm(params["conv_norm_out"], h, cfg.norm_groups, cfg.norm_eps)
    h = conv2d(params["conv_out"], jax.nn.silu(h), padding=1)
    return jnp.clip(h * 0.5 + 0.5, 0.0, 1.0)
