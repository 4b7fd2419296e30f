"""LLaVA / OLA-VLM model assembly.

This replaces the reference's `prepare_inputs_labels_for_multimodal` per-sample Python
splice loop (/root/reference/ola_vlm/model/ola_arch.py:256-444) with a STATIC-SHAPE
design: the host collator (data/collate.py) lowers every example to a fixed-length
"splice plan" — per-position (token_type, src_index) — and the device does one
vectorized gather-select to build inputs_embeds. No data-dependent shapes ever reach
XLA.

PT-stage canonical layout (the reference hard-codes it via NUM_SYS_TOKENS + 576,
base_ola_vlm.py:413-443):

    [ sys (num_sys) | image (576) | task tokens (num_task_tokens per task, in
      mode order, e.g. gen,depth,seg) | text ... | pad ]

Distillation head inputs are static slices of tapped layer states
(forward_emb_predictor parity, base_ola_vlm.py:413-443).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from visper_lm_tpu import constants
from visper_lm_tpu.config import DistillTaskConfig, VLMConfig
from visper_lm_tpu.models import decoder as decoder_lib
from visper_lm_tpu.models.heads import init_task_head, task_head_forward
from visper_lm_tpu.models.projector import init_projector, projector_forward
from visper_lm_tpu.models.vit import clip_tower_features, init_vit
from visper_lm_tpu.utils.param import Params, embed


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def tap_layer_union(cfg: VLMConfig) -> Tuple[int, ...]:
    """Sorted union of all tasks' tapped layers (static)."""
    if cfg.distill is None:
        return ()
    layers = set()
    for t in cfg.distill.tasks:
        layers.update(t.layer_indices)
    return tuple(sorted(layers))


def init_vlm(key: jax.Array, cfg: VLMConfig) -> Params:
    kd, kv, kp, kt, kh, kl = jax.random.split(key, 6)
    dtype = jnp.dtype(cfg.decoder.dtype)
    if cfg.use_convnext_tower:
        from visper_lm_tpu.models.convnext import init_convnext

        tower = init_convnext(kv, cfg.convnext)
    else:
        tower = init_vit(kv, cfg.vision)
    params: Params = {
        "decoder": decoder_lib.init_decoder(kd, cfg.decoder),
        "vision_tower": tower,
        "mm_projector": init_projector(kp, cfg.projector, dtype=dtype),
    }
    if "unpad" in cfg.mm_patch_merge_type:
        # learnable row separator for unpadded anyres grids (llava_arch.py:126-144)
        params["image_newline"] = jnp.zeros((cfg.decoder.hidden_size,), dtype=dtype)
    if cfg.lora is not None:
        from visper_lm_tpu.models.lora import init_lora

        params["lora"] = init_lora(kl, cfg.decoder, cfg.lora, dtype=jnp.float32)

    d = cfg.distill
    if d is not None and d.num_task_tokens > 0:
        # reference initialize_special_tokens (ola_arch.py:67-94): depth/seg get
        # `num_tokens` rows (576), gen gets num_task_tokens rows; ~N(0,1) init.
        tkeys = jax.random.split(kt, 3)
        special: Params = {}
        for i, task in enumerate(d.task_order()):
            tcfg = d.get_task(task)
            if tcfg is None:
                continue
            rows = d.num_task_tokens if task == "gen" else tcfg.head.num_tokens
            assert rows % d.num_task_tokens == 0
            special[task] = jax.random.normal(
                tkeys[i], (rows, cfg.decoder.hidden_size), dtype=jnp.float32
            ).astype(dtype)
        params["special_tokens"] = special

    if d is not None:
        hkeys = jax.random.split(kh, len(d.tasks))
        heads: Params = {}
        scales: Params = {}
        for i, tcfg in enumerate(d.tasks):
            layer_keys = jax.random.split(hkeys[i], len(tcfg.layer_indices))
            heads[tcfg.task] = [
                init_task_head(
                    layer_keys[j],
                    tcfg,
                    cfg.decoder.hidden_size,
                    num_task_tokens=d.num_task_tokens,
                    use_intermediate_depth=True,
                    dtype=dtype,
                )
                for j in range(len(tcfg.layer_indices))
            ]
            if d.use_contrastive:
                # logit_scale init 2.0 (base_ola_vlm.py: nn.Parameter(torch.tensor(2.0)))
                scales[tcfg.task] = jnp.asarray(2.0, dtype=jnp.float32)
        params["heads"] = heads
        if scales:
            params["logit_scales"] = scales
    return params


# ---------------------------------------------------------------------------
# Splice
# ---------------------------------------------------------------------------


def build_task_token_table(params: Params, cfg: VLMConfig) -> Optional[jax.Array]:
    """(num_task_tokens * n_tasks, hidden) rows in mode order.

    Parity with append_special_tokens (ola_arch.py:224-254): depth/seg parameters are
    grouped-mean-pooled from num_tokens rows down to num_task_tokens rows; gen tokens
    are used directly ('emb' format).
    """
    d = cfg.distill
    if d is None or d.num_task_tokens == 0:
        return None
    rows = []
    for task in d.task_order():
        tok = params["special_tokens"].get(task)
        if tok is None:
            continue
        if task == "gen":
            rows.append(tok)
        else:
            grouped = tok.reshape(d.num_task_tokens, -1, tok.shape[-1])
            rows.append(jnp.mean(grouped, axis=1))
    return jnp.concatenate(rows, axis=0)


def encode_images(params: Params, cfg: VLMConfig, images: jax.Array) -> jax.Array:
    """Vision tower + projector (reference encode_images, ola_arch.py:187-190).

    images: (B, H, W, 3) normalized, or anyres tiles (B, n_tiles, H, W, 3).
    Returns (B, N, llm_hidden); for tiles N = n_tiles*per_tile (+1 newline row when
    mm_patch_merge_type uses unpad — the gather indices from data/anyres.py point
    into this flat layout).
    """
    tiled = images.ndim == 5
    if tiled:
        b, n_tiles = images.shape[:2]
        images = images.reshape((b * n_tiles,) + images.shape[2:])

    if cfg.use_convnext_tower:
        from visper_lm_tpu.models.convnext import convnext_tower_features

        feats = convnext_tower_features(params["vision_tower"], cfg.convnext, images)
    else:
        feats = clip_tower_features(params["vision_tower"], cfg.vision, images)
    feats = projector_forward(params["mm_projector"], cfg.projector, feats)

    if tiled:
        feats = feats.reshape(b, -1, feats.shape[-1])
        if "image_newline" in params:
            newline = jnp.broadcast_to(
                params["image_newline"].astype(feats.dtype),
                (b, 1, feats.shape[-1]),
            )
            feats = jnp.concatenate([feats, newline], axis=1)
    return feats


def splice_embeddings(
    params: Params,
    cfg: VLMConfig,
    text_ids: jax.Array,        # (B, T) token id at TEXT positions (0 elsewhere)
    token_type: jax.Array,      # (B, T) SEG_* codes
    src_index: jax.Array,       # (B, T) image-patch / task-token row index
    image_features: jax.Array,  # (B, N_img, hidden)
) -> jax.Array:
    """Vectorized gather-select splice -> (B, T, hidden).

    image_features may be None (a text-only chunk, e.g. a prefix-cache
    continuation turn): the image gather is skipped entirely."""
    text_emb = embed(params["decoder"]["embed_tokens"], text_ids)
    dtype = text_emb.dtype

    if image_features is None:
        emb = text_emb
    else:
        img = jnp.take_along_axis(
            image_features.astype(dtype),
            jnp.clip(src_index, 0, image_features.shape[1] - 1)[..., None],
            axis=1,
        )
        emb = jnp.where(
            (token_type == constants.SEG_IMAGE)[..., None], img, text_emb
        )

    task_table = build_task_token_table(params, cfg)
    if task_table is not None:
        task = jnp.take(
            task_table.astype(dtype),
            jnp.clip(src_index, 0, task_table.shape[0] - 1),
            axis=0,
        )
        emb = jnp.where((token_type == constants.SEG_TASK)[..., None], task, emb)

    emb = jnp.where((token_type == constants.SEG_PAD)[..., None], jnp.zeros_like(emb), emb)
    return emb


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def vlm_forward(
    params: Params,
    cfg: VLMConfig,
    batch: Dict[str, jax.Array],
    *,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    tap: bool = True,
    compute_logits: bool = True,
) -> Dict[str, Any]:
    """Full multimodal forward (training / prefill).

    batch keys: images (B,H,W,3) | precomputed image_features, text_ids, token_type,
    src_index, seq_lengths.
    """
    # LoRA rides the decoder as a low-rank SIDE PATH (decoder._lora_linear),
    # never merged inside the traced step: the merged form's backward carries
    # a full (L, din, dout) cotangent per target to reach A/B — measured
    # 1.5 GiB x 7 targets at 4B scale. Offline merge-for-serving stays in
    # models/lora.py (builder.py merge-on-load equivalent).
    lora = params.get("lora") if cfg.lora is not None else None

    if "image_features" in batch:
        image_features = batch["image_features"]
    else:
        image_features = encode_images(params, cfg, batch["images"])

    inputs_embeds = splice_embeddings(
        params, cfg, batch["text_ids"], batch["token_type"], batch["src_index"],
        image_features,
    )

    taps = tap_layer_union(cfg) if tap else ()
    out = decoder_lib.decoder_forward(
        params["decoder"],
        cfg.decoder,
        inputs_embeds,
        kv_lengths=batch.get("seq_lengths"),
        tap_layers=taps,
        remat=remat,
        remat_policy=remat_policy,
        use_pallas=use_pallas,
        compute_logits=compute_logits,
        lora=lora,
        lora_scaling=cfg.lora.scaling if cfg.lora is not None else 1.0,
    )
    out["tap_layers"] = taps
    out["image_features"] = image_features
    return out


def head_input_tokens(
    cfg: VLMConfig,
    layer_state: jax.Array,   # (B, T, D) tapped layer output
    task: str,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Assemble (inp_tokens, task_latents) for one task head.

    Parity with forward_emb_predictor (base_ola_vlm.py:413-443):
      inp = [sys+image | this task's token span | (text tail if pass_text_to_aux)]
      latents: depth/seg -> the raw special-token parameters (handled by caller);
               gen       -> the hidden states at the gen token span.
    """
    d = cfg.distill
    assert d is not None
    ns, ni, nt = cfg.num_sys_tokens, cfg.num_image_tokens, d.num_task_tokens
    order = d.task_order()
    task_idx = order.index(task)
    task_start = ns + ni + nt * task_idx
    all_end = ns + ni + nt * len(order)

    if nt == 0:
        inp = layer_state if d.pass_text_to_aux else layer_state[:, : ns + ni]
        return inp, None

    parts = [layer_state[:, : ns + ni], layer_state[:, task_start : task_start + nt]]
    if d.pass_text_to_aux:
        parts.append(layer_state[:, all_end:])
    inp = jnp.concatenate(parts, axis=1)

    latents = None
    if task == "gen":
        # gen latents = the layer states at the gen span (base_ola_vlm.py:428-433)
        latents = layer_state[:, task_start : task_start + nt]
    return inp, latents


def predict_task_embeddings(
    params: Params,
    cfg: VLMConfig,
    taps: jax.Array,               # (num_taps, B, T, D)
    tap_layers: Tuple[int, ...],
) -> Dict[str, List[jax.Array]]:
    """Run every distillation head on its tapped layer state.

    Returns {task: [pred_per_layer ...]} with preds (B, num_tokens, output_dim).
    """
    d = cfg.distill
    assert d is not None
    slot = {layer: i for i, layer in enumerate(tap_layers)}
    preds: Dict[str, List[jax.Array]] = {}
    for tcfg in d.tasks:
        task_preds = []
        for j, layer in enumerate(tcfg.layer_indices):
            layer_state = taps[slot[layer]]
            inp, latents = head_input_tokens(cfg, layer_state, tcfg.task)
            if d.num_task_tokens > 0 and latents is None:
                # depth/seg latents = raw special-token parameters broadcast on batch
                tok = params["special_tokens"][tcfg.task]
                latents = jnp.broadcast_to(
                    tok.astype(inp.dtype), (inp.shape[0],) + tok.shape
                )
            head_params = params["heads"][tcfg.task][j]
            task_preds.append(
                task_head_forward(head_params, tcfg, inp, latents if d.num_task_tokens > 0 else None)
            )
        preds[tcfg.task] = task_preds
    return preds
