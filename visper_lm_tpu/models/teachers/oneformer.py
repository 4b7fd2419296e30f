"""OneFormer pixel decoder + transformer decoder (mask decoding, inference path).

The seg TRAINING target needs only the Swin backbone (teachers/swin.py); this module
provides the rest of OneFormer so the framework can decode real segmentation masks —
the reference's `OneFormerHead.get_masks` path used by the demo's "visualize" feature
(demo.py:209-229) and the probe-task mIoU eval (eval_probe_task.py:203-219),
including the backbone-last-feature SUBSTITUTION that re-renders a predicted
(B,1536,24,24) embedding into masks (oneformer_head.py:22-28).

Structure mirrors HF's modeling_oneformer inference graph:
  * sine position embeddings;
  * multi-scale deformable-attention encoder over the 3 deepest scales (sampling via
    utils/image.grid_sample_bilinear) + FPN fusion with the shallowest scale ->
    mask_features + multi_scale_features;
  * query transformer (2 layers) seeding 150 object queries (last query replaced by
    the task token), then 9 masked-cross-attention decoder layers with per-level
    rotation and prediction heads;
  * task MLP on the tokenized task text; semantic post-processing.

Inference-only: no dropout, no padding masks (valid_ratios == 1).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.models.teachers.swin import SwinConfig, swin_forward
from visper_lm_tpu.utils.image import grid_sample_bilinear, resize_bilinear
from visper_lm_tpu.utils.param import (
    Params,
    init_layernorm,
    init_linear,
    layernorm,
    linear,
)


@dataclasses.dataclass(frozen=True)
class OneFormerDecoderConfig:
    d_model: int = 256
    encoder_layers: int = 6
    encoder_ffn_dim: int = 1024
    decoder_layers: int = 10          # 1 initial prediction + (decoder_layers-1) blocks
    query_dec_layers: int = 2
    dim_feedforward: int = 2048
    num_heads: int = 8
    num_queries: int = 150
    num_classes: int = 133            # COCO panoptic
    num_feature_levels: int = 3
    num_points: int = 4
    task_seq_len: int = 77
    backbone_dims: Tuple[int, ...] = (192, 384, 768, 1536)  # Swin-L stages
    norm_eps: float = 1e-5


ONEFORMER_COCO = OneFormerDecoderConfig()


# ---------------------------------------------------------------------------
# Sine position embeddings (OneFormerSinePositionEmbedding, normalize=True)
# ---------------------------------------------------------------------------


def sine_pos_embed(h: int, w: int, num_pos_feats: int) -> jnp.ndarray:
    """(H*W, 2*num_pos_feats) normalized sine embedding, flattened row-major."""
    scale = 2 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = pos_y.reshape(h, w, -1)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)     # (H, W, 2*feats)
    return pos.reshape(h * w, -1)


# ---------------------------------------------------------------------------
# Multi-scale deformable attention
# ---------------------------------------------------------------------------


def ms_deform_attn(
    p: Params,
    hidden: jax.Array,                  # (B, Nq, D) query features (pos added)
    value_feats: jax.Array,             # (B, S, D) flattened multi-level values
    reference_points: jax.Array,        # (B, Nq, L, 2) in [0,1]
    spatial_shapes: Sequence[Tuple[int, int]],
    num_heads: int,
    num_points: int,
) -> jax.Array:
    b, nq, d = hidden.shape
    n_levels = len(spatial_shapes)
    hd = d // num_heads

    value = linear(p["value_proj"], value_feats).reshape(b, -1, num_heads, hd)
    offsets = linear(p["sampling_offsets"], hidden).reshape(
        b, nq, num_heads, n_levels, num_points, 2
    )
    weights = linear(p["attention_weights"], hidden).reshape(
        b, nq, num_heads, n_levels * num_points
    )
    weights = jax.nn.softmax(weights, axis=-1).reshape(
        b, nq, num_heads, n_levels, num_points
    )

    normalizer = jnp.asarray(
        [[wdt, hgt] for hgt, wdt in spatial_shapes], dtype=jnp.float32
    )  # (L, 2) as (w, h)
    locations = (
        reference_points[:, :, None, :, None, :]
        + offsets / normalizer[None, None, None, :, None, :]
    )  # (B, Nq, H, L, P, 2) in [0,1]

    level_sizes = [h_ * w_ for h_, w_ in spatial_shapes]
    starts = np.concatenate([[0], np.cumsum(level_sizes)[:-1]])

    out_per_level = []
    for lvl, (hgt, wdt) in enumerate(spatial_shapes):
        v = value[:, starts[lvl] : starts[lvl] + level_sizes[lvl]]     # (B, hw, H, hd)
        v = v.transpose(0, 2, 1, 3).reshape(b * num_heads, hgt, wdt, hd)
        grid = 2 * locations[:, :, :, lvl] - 1                          # (B,Nq,H,P,2)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(b * num_heads, nq, num_points, 2)
        sampled = grid_sample_bilinear(v, grid)                         # (BH,Nq,P,hd)
        out_per_level.append(sampled)
    stacked = jnp.stack(out_per_level, axis=2)      # (BH, Nq, L, P, hd)
    w = weights.transpose(0, 2, 1, 3, 4).reshape(b * num_heads, nq, n_levels, num_points)
    out = jnp.sum(stacked * w[..., None], axis=(2, 3))                  # (BH, Nq, hd)
    out = out.reshape(b, num_heads, nq, hd).transpose(0, 2, 1, 3).reshape(b, nq, d)
    return linear(p["output_proj"], out)


# ---------------------------------------------------------------------------
# Standard MHA (torch nn.MultiheadAttention semantics, batch (B, N, D))
# ---------------------------------------------------------------------------


def mha(
    p: Params,
    q: jax.Array, k: jax.Array, v: jax.Array,
    num_heads: int,
    attn_mask: Optional[jax.Array] = None,   # (B*H, Nq, Nk) bool, True = BLOCK
) -> jax.Array:
    b, nq, d = q.shape
    hd = d // num_heads
    qp = linear(p["q"], q).reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kp = linear(p["k"], k).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    vp = linear(p["v"], v).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qp, kp).astype(jnp.float32) / math.sqrt(hd)
    if attn_mask is not None:
        mask = attn_mask.reshape(b, num_heads, nq, -1)
        logits = jnp.where(mask, -1e9, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(vp.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vp)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, d)
    return linear(p["out"], out)


def _mlp(p: Params, x: jax.Array) -> jax.Array:
    """OneFormerMLPPredictionHead: Linear->ReLU (xN-1) -> Linear."""
    n = len(p["layers"])
    for i, layer in enumerate(p["layers"]):
        x = linear(layer, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# Pixel decoder
# ---------------------------------------------------------------------------


def pixel_decoder_forward(
    p: Params,
    cfg: OneFormerDecoderConfig,
    features: Sequence[jax.Array],     # 4 backbone maps (B, H, W, C), shallow->deep
) -> Tuple[jax.Array, List[jax.Array]]:
    """Returns (mask_features (B, H1, W1, D), multi_scale_features deep->shallow)."""
    d = cfg.d_model
    # deepest num_feature_levels scales, deepest first
    deep = list(features[::-1][: cfg.num_feature_levels])
    sources, pos_list, shapes = [], [], []
    for lvl, feat in enumerate(deep):
        b, h, w, _ = feat.shape
        src = linear(p["input_projections"][lvl]["proj"], feat)
        src = _groupnorm(p["input_projections"][lvl]["norm"], src.reshape(b, h, w, d))
        sources.append(src.reshape(b, h * w, d))
        pos = sine_pos_embed(h, w, d // 2)
        pos_list.append(pos[None] + p["level_embed"][lvl][None, None, :])
        shapes.append((h, w))

    src_flat = jnp.concatenate(sources, axis=1)
    pos_flat = jnp.concatenate(
        [jnp.broadcast_to(x, (src_flat.shape[0],) + x.shape[1:]) for x in pos_list],
        axis=1,
    )

    # reference points: per level, normalized cell centers replicated for all levels
    refs = []
    for (h, w) in shapes:
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(rx, ry, indexing="xy"), axis=-1).reshape(-1, 2)
        refs.append(grid)
    ref_points = jnp.concatenate(refs, axis=0)[None, :, None, :]
    ref_points = jnp.broadcast_to(
        ref_points,
        (src_flat.shape[0], ref_points.shape[1], cfg.num_feature_levels, 2),
    )

    h_states = src_flat
    for layer in p["encoder_layers"]:
        attn_in = h_states + pos_flat
        attn_out = ms_deform_attn(
            layer["self_attn"], attn_in, h_states, ref_points, shapes,
            cfg.num_heads, cfg.num_points,
        )
        h_states = layernorm(layer["norm1"], h_states + attn_out, 1e-5)
        ff = linear(layer["fc2"], jax.nn.relu(linear(layer["fc1"], h_states)))
        h_states = layernorm(layer["norm2"], h_states + ff, 1e-5)

    # split back to maps (deepest first)
    outs = []
    start = 0
    for (h, w) in shapes:
        outs.append(h_states[:, start : start + h * w].reshape(-1, h, w, d))
        start += h * w

    # FPN with the remaining shallow level(s)
    for idx, feat in enumerate(features[: len(features) - cfg.num_feature_levels][::-1]):
        lateral = linear(p["lateral_convs"][idx]["conv"], feat)
        lateral = _groupnorm(p["lateral_convs"][idx]["norm"], lateral)
        up = resize_bilinear(outs[-1], lateral.shape[1:3], align_corners=False)
        y = lateral + up
        y = _conv3x3(p["output_convs"][idx]["conv"], y)
        y = jax.nn.relu(_groupnorm(p["output_convs"][idx]["norm"], y))
        outs.append(y)

    mask_features = linear(p["mask_projection"], outs[-1])
    multi_scale = outs[: cfg.num_feature_levels]
    return mask_features, multi_scale


def _conv3x3(p: Params, x: jax.Array) -> jax.Array:
    from visper_lm_tpu.utils.image import conv2d

    return conv2d(p, x, stride=1, padding=1)


def _groupnorm(p: Params, x: jax.Array, groups: int = 32, eps: float = 1e-5) -> jax.Array:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Transformer decoder
# ---------------------------------------------------------------------------


def _prediction_heads(
    p: Params, cfg: OneFormerDecoderConfig, output: jax.Array, mask_features: jax.Array,
    target_hw: Tuple[int, int],
):
    """output (B, Q, D); mask_features (B, H, W, D)."""
    dec = layernorm(p["decoder_norm"], output, cfg.norm_eps)
    outputs_class = linear(p["class_embed"], dec)
    mask_embed = _mlp(p["mask_embed"], dec)
    outputs_mask = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)

    am = resize_bilinear(
        outputs_mask.transpose(0, 2, 3, 1), target_hw, align_corners=False
    ).transpose(0, 3, 1, 2)
    attention_mask = jax.nn.sigmoid(am).reshape(am.shape[0], am.shape[1], -1) < 0.5
    # (B, Q, S) -> broadcast per head later; fully-masked rows unblocked:
    all_blocked = jnp.all(attention_mask, axis=-1, keepdims=True)
    attention_mask = jnp.where(all_blocked, False, attention_mask)
    return outputs_class, outputs_mask, attention_mask


def transformer_decoder_forward(
    p: Params,
    cfg: OneFormerDecoderConfig,
    multi_scale: Sequence[jax.Array],    # deep->shallow (B, H, W, D)
    mask_features: jax.Array,            # (B, H1, W1, D)
    task_token: jax.Array,               # (B, D)
) -> Dict[str, jax.Array]:
    d = cfg.d_model
    b = mask_features.shape[0]

    stage_feats, stage_pos, size_list = [], [], []
    for i, feat in enumerate(multi_scale):
        _, h, w, _ = feat.shape
        size_list.append((h, w))
        pos = sine_pos_embed(h, w, d // 2)[None]
        proj = p["input_projections"][i]
        src = (feat if proj is None else linear(proj, feat)).reshape(b, h * w, d)
        src = src + p["level_embed"][i][None, None, :]
        stage_feats.append(src)
        stage_pos.append(jnp.broadcast_to(pos, (b,) + pos.shape[1:]))

    task_tok = layernorm(p["decoder_norm"], task_token[:, None, :], cfg.norm_eps)

    # ---- query transformer: seed object queries from mask features.
    # NOTE (OneFormer quirk, kept for weight compat): the original code passes the
    # SINE POSITION EMBEDDINGS as the transformer's memory/src and the projected
    # mask features as `pos` (OneFormerTransformerDecoder.forward), so cross
    # attention VALUES are the position embeddings while keys are pos+features.
    mh, mw = mask_features.shape[1:3]
    q_pos_feats = jnp.broadcast_to(
        sine_pos_embed(mh, mw, d // 2)[None], (b, mh * mw, d)
    )
    proj_feats = linear(p["query_input_projection"], mask_features).reshape(b, mh * mw, d)
    memory, mem_pos = q_pos_feats, proj_feats
    query_embed = p["queries_embedder"][:-1][None]            # (1, Q-1, D)
    query_embed = jnp.broadcast_to(query_embed, (b,) + query_embed.shape[1:])
    queries = jnp.broadcast_to(task_tok, (b, query_embed.shape[1], d))

    for layer in p["query_transformer_layers"]:
        qk = queries + query_embed
        sa = mha(layer["self_attn"], qk, qk, queries, cfg.num_heads)
        queries = layernorm(layer["norm1"], queries + sa, cfg.norm_eps)
        ca = mha(
            layer["cross_attn"], queries + query_embed,
            memory + mem_pos, memory, cfg.num_heads,
        )
        queries = layernorm(layer["norm2"], queries + ca, cfg.norm_eps)
        ff = linear(layer["fc2"], jax.nn.relu(linear(layer["fc1"], queries)))
        queries = layernorm(layer["norm3"], queries + ff, cfg.norm_eps)
    queries = layernorm(p["query_transformer_norm"], queries, cfg.norm_eps)

    output = jnp.concatenate([queries, task_tok], axis=1)     # (B, Q, D)
    query_embeddings = jnp.broadcast_to(
        p["queries_embedder"][None], (b, cfg.num_queries, d)
    )

    outputs_class, outputs_mask, attn_mask = _prediction_heads(
        p, cfg, output, mask_features, size_list[0]
    )
    for index, layer in enumerate(p["decoder_layers"]):
        lvl = index % cfg.num_feature_levels
        # masked cross attention
        am = jnp.repeat(attn_mask[:, None], cfg.num_heads, axis=1).reshape(
            b * cfg.num_heads, cfg.num_queries, -1
        )
        ca = mha(
            layer["cross_attn"], output + query_embeddings,
            stage_feats[lvl] + stage_pos[lvl], stage_feats[lvl],
            cfg.num_heads, attn_mask=am,
        )
        output = layernorm(layer["cross_norm"], output + ca, cfg.norm_eps)
        # self attention
        qk = output + query_embeddings
        sa = mha(layer["self_attn"], qk, qk, output, cfg.num_heads)
        output = layernorm(layer["self_norm"], output + sa, cfg.norm_eps)
        # ffn
        ff = linear(layer["fc2"], jax.nn.relu(linear(layer["fc1"], output)))
        output = layernorm(layer["ffn_norm"], output + ff, cfg.norm_eps)

        outputs_class, outputs_mask, attn_mask = _prediction_heads(
            p, cfg, output, mask_features,
            size_list[(index + 1) % cfg.num_feature_levels],
        )

    return {"class_queries_logits": outputs_class, "masks_queries_logits": outputs_mask}


def task_encoder_forward(p: Params, task_inputs: jax.Array) -> jax.Array:
    """OneFormerTaskModel: 2-layer MLP on the (B, 77) tokenized task text."""
    return _mlp(p, task_inputs.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Full get_masks (+ substitution) and semantic post-processing
# ---------------------------------------------------------------------------


def get_masks(
    params: Params,
    cfg: OneFormerDecoderConfig,
    swin_params: Params,
    swin_cfg: SwinConfig,
    pixel_values: jax.Array,                 # (B, H, W, 3) normalized
    task_inputs: jax.Array,                  # (B, 77)
    backbone_last_feature: Optional[jax.Array] = None,  # (B, 24, 24, C) substitution
) -> Dict[str, jax.Array]:
    """OneFormerHead.get_masks parity: optional substitution of the last backbone
    feature by a predicted embedding, lower features bilinearly resized to match
    (oneformer_head.py:22-28, 99-186)."""
    feats = swin_forward(swin_params, swin_cfg, pixel_values)
    if backbone_last_feature is not None:
        target_hw = feats[-1].shape[1:3]
        sub = resize_bilinear(backbone_last_feature, target_hw, align_corners=False)
        feats = [
            resize_bilinear(f, target_hw, align_corners=False) for f in feats[:-1]
        ] + [sub]
    mask_features, multi_scale = pixel_decoder_forward(params["pixel_decoder"], cfg, feats)
    task_token = task_encoder_forward(params["task_encoder"], task_inputs)
    out = transformer_decoder_forward(
        params["transformer_decoder"], cfg, multi_scale, mask_features, task_token
    )
    return out


def semantic_segmentation(
    class_queries_logits: jax.Array,   # (B, Q, num_classes+1)
    masks_queries_logits: jax.Array,   # (B, Q, H, W)
    target_hw: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """OneFormerImageProcessor.post_process_semantic_segmentation parity."""
    if target_hw is not None:
        masks_queries_logits = resize_bilinear(
            masks_queries_logits.transpose(0, 2, 3, 1), target_hw, align_corners=False
        ).transpose(0, 3, 1, 2)
    class_probs = jax.nn.softmax(class_queries_logits, axis=-1)[..., :-1]
    mask_probs = jax.nn.sigmoid(masks_queries_logits)
    seg = jnp.einsum("bqc,bqhw->bchw", class_probs, mask_probs)
    return jnp.argmax(seg, axis=1)


# ---------------------------------------------------------------------------
# HF weight importer
# ---------------------------------------------------------------------------


def _mha_from_torch(sd, prefix: str, d: int) -> Params:
    """torch nn.MultiheadAttention in_proj_{weight,bias} + out_proj."""
    from visper_lm_tpu.checkpoint.hf_import import _t

    w = sd[prefix + "in_proj_weight"]       # (3D, D)
    bias = sd[prefix + "in_proj_bias"]
    return {
        "q": {"kernel": _t(w[:d]), "bias": bias[:d]},
        "k": {"kernel": _t(w[d : 2 * d]), "bias": bias[d : 2 * d]},
        "v": {"kernel": _t(w[2 * d :]), "bias": bias[2 * d :]},
        "out": {"kernel": _t(sd[prefix + "out_proj.weight"]),
                "bias": sd[prefix + "out_proj.bias"]},
    }


def _split_attention_from_torch(sd, prefix: str) -> Params:
    """OneFormerAttention with separate q/k/v/out projections."""
    from visper_lm_tpu.checkpoint.hf_import import _lin

    return {
        "q": _lin(sd, prefix + "q_proj"),
        "k": _lin(sd, prefix + "k_proj"),
        "v": _lin(sd, prefix + "v_proj"),
        "out": _lin(sd, prefix + "out_proj"),
    }


def _mlp_from_torch(sd, prefix: str, n_layers: int) -> Params:
    from visper_lm_tpu.checkpoint.hf_import import _lin

    return {
        "layers": [
            _lin(sd, f"{prefix}layers.{i}.0") for i in range(n_layers)
        ]
    }


def configs_from_hf(hf: Dict) -> Tuple[OneFormerDecoderConfig, SwinConfig]:
    """Map an HF OneFormerConfig json dict (+ nested backbone_config) to our
    (decoder, swin) config pair, so a teacher checkpoint dir is self-describing
    for the demo/eval loaders (mirrors tests/test_oneformer.py's mapping)."""
    bb = hf.get("backbone_config", {})
    embed_dim = bb.get("embed_dim", 192)
    dec = OneFormerDecoderConfig(
        d_model=hf.get("conv_dim", 256),
        encoder_layers=hf.get("encoder_layers", 6),
        decoder_layers=hf.get("decoder_layers", 10),
        encoder_ffn_dim=hf.get("encoder_feedforward_dim", 1024),
        dim_feedforward=hf.get("dim_feedforward", 2048),
        num_heads=hf.get("num_attention_heads", 8),
        num_queries=hf.get("num_queries", 150),
        num_classes=hf.get("num_labels", 133),
        task_seq_len=hf.get("task_seq_len", 77),
        backbone_dims=tuple(embed_dim * 2 ** i for i in range(4)),
    )
    swin = SwinConfig(
        embed_dim=embed_dim,
        depths=tuple(bb.get("depths", (2, 2, 18, 2))),
        num_heads=tuple(bb.get("num_heads", (6, 12, 24, 48))),
        window_size=bb.get("window_size", 12),
    )
    return dec, swin


def import_oneformer_decoder(
    sd: Dict[str, np.ndarray], cfg: OneFormerDecoderConfig = ONEFORMER_COCO
) -> Params:
    """Import the non-backbone parts of an HF OneFormerModel state dict."""
    from visper_lm_tpu.checkpoint.hf_import import _lin, _ln, _t

    pd = "pixel_level_module.decoder."
    pixel: Params = {
        "level_embed": sd[pd + "level_embed"],
        "input_projections": [],
        "encoder_layers": [],
        "lateral_convs": [],
        "output_convs": [],
        "mask_projection": {
            "kernel": _t(sd[pd + "mask_projection.weight"].reshape(
                sd[pd + "mask_projection.weight"].shape[0], -1)),
            "bias": sd[pd + "mask_projection.bias"],
        },
    }
    for i in range(cfg.num_feature_levels):
        conv_w = sd[f"{pd}input_projections.{i}.0.weight"]      # (D, C, 1, 1)
        pixel["input_projections"].append(
            {
                "proj": {
                    "kernel": _t(conv_w.reshape(conv_w.shape[0], -1)),
                    "bias": sd[f"{pd}input_projections.{i}.0.bias"],
                },
                # GroupNorm(32) after the 1x1 conv acts per-channel; stored as a
                # groupnorm in HF: weight/bias (D,)
                "norm": {
                    "scale": sd[f"{pd}input_projections.{i}.1.weight"],
                    "bias": sd[f"{pd}input_projections.{i}.1.bias"],
                },
            }
        )
    i = 0
    while f"{pd}encoder.layers.{i}.self_attn.value_proj.weight" in sd:
        lp = f"{pd}encoder.layers.{i}."
        pixel["encoder_layers"].append(
            {
                "self_attn": {
                    "value_proj": _lin(sd, lp + "self_attn.value_proj"),
                    "sampling_offsets": _lin(sd, lp + "self_attn.sampling_offsets"),
                    "attention_weights": _lin(sd, lp + "self_attn.attention_weights"),
                    "output_proj": _lin(sd, lp + "self_attn.output_proj"),
                },
                "norm1": _ln(sd, lp + "self_attn_layer_norm"),
                "fc1": _lin(sd, lp + "fc1"),
                "fc2": _lin(sd, lp + "fc2"),
                "norm2": _ln(sd, lp + "final_layer_norm"),
            }
        )
        i += 1
    # FPN convs registered as adapter_{k}/layer_{k}, already in top-down order in
    # lateral_convs/output_convs (reversed registration) — adapter_1 is the
    # SHALLOWEST; forward iterates shallow-last so reverse here.
    ks = []
    i = 1
    while f"{pd}adapter_{i}.0.weight" in sd:
        ks.append(i)
        i += 1
    for i in reversed(ks):
        lw = sd[f"{pd}adapter_{i}.0.weight"]
        pixel["lateral_convs"].append(
            {
                "conv": {"kernel": _t(lw.reshape(lw.shape[0], -1))},
                "norm": {"scale": sd[f"{pd}adapter_{i}.1.weight"],
                         "bias": sd[f"{pd}adapter_{i}.1.bias"]},
            }
        )
        ow = sd[f"{pd}layer_{i}.0.weight"]
        pixel["output_convs"].append(
            {
                "conv": {"kernel": np.ascontiguousarray(np.transpose(ow, (2, 3, 1, 0)))},
                "norm": {"scale": sd[f"{pd}layer_{i}.1.weight"],
                         "bias": sd[f"{pd}layer_{i}.1.bias"]},
            }
        )

    td = "transformer_module."
    dec: Params = {
        "level_embed": sd[td + "level_embed.weight"],
        "queries_embedder": sd[td + "queries_embedder.weight"],
        "input_projections": [],
        "query_input_projection": None,
        "decoder_norm": _ln(sd, td + "decoder.decoder_norm"),
        "class_embed": _lin(sd, td + "decoder.class_embed"),
        "mask_embed": _mlp_from_torch(sd, td + "decoder.mask_embed.", 3),
        "query_transformer_layers": [],
        "query_transformer_norm": _ln(sd, td + "decoder.query_transformer.decoder.norm"),
        "decoder_layers": [],
    }
    for i in range(cfg.num_feature_levels):
        key = f"{td}input_projections.{i}.weight"
        if key not in sd:
            dec["input_projections"].append(None)   # identity (conv_dim == hidden_dim)
            continue
        w = sd[key]
        if w.ndim == 4:
            w = w.reshape(w.shape[0], -1)
        dec["input_projections"].append(
            {"kernel": _t(w), "bias": sd.get(f"{td}input_projections.{i}.bias",
                                             np.zeros(w.shape[0], np.float32))}
        )
    qw = sd[td + "decoder.query_input_projection.weight"]
    dec["query_input_projection"] = {
        "kernel": _t(qw.reshape(qw.shape[0], -1)),
        "bias": sd[td + "decoder.query_input_projection.bias"],
    }
    i = 0
    qt = td + "decoder.query_transformer.decoder.layers."
    while f"{qt}{i}.self_attn.in_proj_weight" in sd:
        lp = f"{qt}{i}."
        dec["query_transformer_layers"].append(
            {
                "self_attn": _mha_from_torch(sd, lp + "self_attn.", cfg.d_model),
                "norm1": _ln(sd, lp + "norm1"),
                "cross_attn": _mha_from_torch(sd, lp + "multihead_attn.", cfg.d_model),
                "norm2": _ln(sd, lp + "norm2"),
                "fc1": _lin(sd, lp + "linear1"),
                "fc2": _lin(sd, lp + "linear2"),
                "norm3": _ln(sd, lp + "norm3"),
            }
        )
        i += 1
    i = 0
    dl = td + "decoder.layers."
    while f"{dl}{i}.cross_attn.multihead_attn.in_proj_weight" in sd:
        lp = f"{dl}{i}."
        dec["decoder_layers"].append(
            {
                "cross_attn": _mha_from_torch(sd, lp + "cross_attn.multihead_attn.", cfg.d_model),
                "cross_norm": _ln(sd, lp + "cross_attn.norm"),
                "self_attn": _split_attention_from_torch(sd, lp + "self_attn.self_attn."),
                "self_norm": _ln(sd, lp + "self_attn.norm"),
                "fc1": _lin(sd, lp + "ffn.linear1"),
                "fc2": _lin(sd, lp + "ffn.linear2"),
                "ffn_norm": _ln(sd, lp + "ffn.norm"),
            }
        )
        i += 1

    task = _mlp_from_torch(sd, "task_encoder.task_mlp.", 2)
    return {"pixel_decoder": pixel, "transformer_decoder": dec, "task_encoder": task}
