"""HF checkpoint importer: torch/safetensors state dicts -> framework param trees.

Reproduces the reference loader's key layout so shi-labs checkpoints produce
bit-comparable logits (SURVEY.md §5.4):
  * OLA/LLaVA causal-LM checkpoints: model.embed_tokens / model.layers.N.* /
    model.norm / lm_head (+ Phi3 fused qkv_proj & gate_up_proj, split here),
  * mm projector Sequential keys model.mm_projector.{0,2}.* (builder.py mlp2x_gelu),
  * nested CLIP tower model.vision_tower.vision_tower.vision_model.*,
  * task-token Parameters model.special_{depth,seg,gen}_tokens (ola_arch.py:67-94),
  * per-layer heads image_{gen,seg,depth}_heads.N.projector.* with the
    open_flamingo-style Resampler module layout (resampler.py:119-224),
  * logit scales {gen,seg,depth}_logit_scale.

Weights are expected as a flat {key: np.ndarray} dict; use load_torch_state_dict /
load_safetensors for files. Linear kernels are transposed ((out,in) -> (in,out)).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import numpy as np

from visper_lm_tpu.config import (
    DecoderConfig,
    DistillTaskConfig,
    ResamplerConfig,
    VisionConfig,
    VLMConfig,
)

Array = np.ndarray
StateDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# File loading
# ---------------------------------------------------------------------------


def load_safetensors(path: str) -> StateDict:
    from safetensors import safe_open

    out: StateDict = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_sharded_safetensors(model_dir: str) -> StateDict:
    """Load model.safetensors or the index-sharded variant from a directory."""
    index = os.path.join(model_dir, "model.safetensors.index.json")
    single = os.path.join(model_dir, "model.safetensors")
    out: StateDict = {}
    if os.path.exists(index):
        shards = set(json.load(open(index))["weight_map"].values())
        for shard in sorted(shards):
            out.update(load_safetensors(os.path.join(model_dir, shard)))
    elif os.path.exists(single):
        out.update(load_safetensors(single))
    else:
        raise FileNotFoundError(f"no safetensors found under {model_dir}")
    return out


def torch_state_dict_to_numpy(sd) -> StateDict:
    return {k: np.asarray(v.detach().to("cpu").float().numpy()) for k, v in sd.items()}


def _t(w: Array) -> Array:
    """torch Linear (out, in) -> kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _lin(sd: StateDict, prefix: str, transpose: bool = True) -> Dict[str, Array]:
    p: Dict[str, Array] = {"kernel": _t(sd[f"{prefix}.weight"]) if transpose else sd[f"{prefix}.weight"]}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _rms(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": sd[f"{prefix}.weight"]}


def _stack(layers: List[Dict[str, Any]]) -> Dict[str, Any]:
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *layers)


# ---------------------------------------------------------------------------
# Decoder (Llama / Phi3)
# ---------------------------------------------------------------------------


def import_decoder(sd: StateDict, cfg: DecoderConfig, prefix: str = "model.") -> Dict[str, Any]:
    """Import a Llama/Phi3 causal LM. Handles Phi3's fused qkv/gate_up split."""
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{prefix}layers.{i}."
        block: Dict[str, Any] = {
            "attn_norm": _rms(sd, lp + "input_layernorm"),
            "mlp_norm": _rms(sd, lp + "post_attention_layernorm"),
            "o_proj": _lin(sd, lp + "self_attn.o_proj"),
            "down_proj": _lin(sd, lp + "mlp.down_proj"),
        }
        if cfg.family == "phi3":
            qkv = sd[lp + "self_attn.qkv_proj.weight"]          # (q+2kv, D)
            q_rows = nh * hd
            kv_rows = nkv * hd
            block["q_proj"] = {"kernel": _t(qkv[:q_rows])}
            block["k_proj"] = {"kernel": _t(qkv[q_rows : q_rows + kv_rows])}
            block["v_proj"] = {"kernel": _t(qkv[q_rows + kv_rows :])}
            gu = sd[lp + "mlp.gate_up_proj.weight"]             # (2M, D)
            m = cfg.mlp_dim
            block["gate_proj"] = {"kernel": _t(gu[:m])}
            block["up_proj"] = {"kernel": _t(gu[m:])}
        else:
            block["q_proj"] = _lin(sd, lp + "self_attn.q_proj")
            block["k_proj"] = _lin(sd, lp + "self_attn.k_proj")
            block["v_proj"] = _lin(sd, lp + "self_attn.v_proj")
            block["gate_proj"] = _lin(sd, lp + "mlp.gate_proj")
            block["up_proj"] = _lin(sd, lp + "mlp.up_proj")
        layers.append(block)

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": sd[f"{prefix}embed_tokens.weight"]},
        "blocks": _stack(layers),
        "final_norm": _rms(sd, f"{prefix}norm"),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _lin(sd, "lm_head")
    return params


# ---------------------------------------------------------------------------
# CLIP-style ViT
# ---------------------------------------------------------------------------


def import_clip_vision(
    sd: StateDict, cfg: VisionConfig, prefix: str = "vision_model."
) -> Dict[str, Any]:
    """Import HF CLIPVisionModel weights (clip-vit-large-patch14-336, CLIP-H, ...)."""
    d = cfg.hidden_size
    patch_w = sd[f"{prefix}embeddings.patch_embedding.weight"]  # (D, 3, P, P)
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _t(patch_w.reshape(d, -1)),
            "bias": sd.get(
                f"{prefix}embeddings.patch_embedding.bias", np.zeros((d,), patch_w.dtype)
            ),
        },
        "pos_embed": sd[f"{prefix}embeddings.position_embedding.weight"],
        "final_norm": _ln(sd, f"{prefix}post_layernorm"),
    }
    if cfg.use_class_token:
        params["cls_token"] = sd[f"{prefix}embeddings.class_embedding"].reshape(-1)
    if cfg.use_pre_norm:
        # sic: HF CLIP names it 'pre_layrnorm'
        key = (
            f"{prefix}pre_layrnorm"
            if f"{prefix}pre_layrnorm.weight" in sd
            else f"{prefix}pre_layernorm"
        )
        params["pre_norm"] = _ln(sd, key)

    layers = []
    for i in range(cfg.num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        q = _lin(sd, lp + "self_attn.q_proj")
        k = _lin(sd, lp + "self_attn.k_proj")
        v = _lin(sd, lp + "self_attn.v_proj")
        layers.append(
            {
                "norm1": _ln(sd, lp + "layer_norm1"),
                "qkv": {
                    "kernel": np.concatenate([q["kernel"], k["kernel"], v["kernel"]], axis=1),
                    "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
                },
                "proj": _lin(sd, lp + "self_attn.out_proj"),
                "norm2": _ln(sd, lp + "layer_norm2"),
                "fc1": _lin(sd, lp + "mlp.fc1"),
                "fc2": _lin(sd, lp + "mlp.fc2"),
            }
        )
    params["blocks"] = _stack(layers)

    if "visual_projection.weight" in sd:
        params["visual_projection"] = _lin(sd, "visual_projection")
    return params


# ---------------------------------------------------------------------------
# Projector / resampler heads / OLA extras
# ---------------------------------------------------------------------------


def import_mlp_projector(sd: StateDict, prefix: str = "model.mm_projector.") -> Dict[str, Any]:
    """mlpNx_gelu Sequential: indices 0, 2, 4, ... are Linears."""
    layers = []
    i = 0
    while f"{prefix}{i}.weight" in sd:
        layers.append(_lin(sd, f"{prefix}{i}"))
        i += 2
    if not layers and f"{prefix}weight" in sd:  # plain 'linear' projector
        layers.append(_lin(sd, prefix.rstrip(".")))
    return {"layers": layers}


def import_resampler(
    sd: StateDict, prefix: str, cfg: ResamplerConfig, task_token: bool
) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "proj_in": _lin(sd, prefix + "proj_in"),
        "proj_out": _lin(sd, prefix + "proj_out"),
        "norm_out": _ln(sd, prefix + "norm_out"),
        "layers": [],
    }
    if not task_token:
        p["latents"] = sd[prefix + "latents"].reshape(cfg.num_tokens, -1)
    for i in range(cfg.depth):
        lp = f"{prefix}layers.{i}."
        p["layers"].append(
            {
                "attn": {
                    "norm1": _ln(sd, lp + "0.norm1"),
                    "norm2": _ln(sd, lp + "0.norm2"),
                    "to_q": _lin(sd, lp + "0.to_q"),
                    "to_kv": _lin(sd, lp + "0.to_kv"),
                    "to_out": _lin(sd, lp + "0.to_out"),
                },
                # FeedForward Sequential: 0=LayerNorm, 1=Linear, 3=Linear
                "ff": {
                    "norm": _ln(sd, lp + "1.0"),
                    "fc1": _lin(sd, lp + "1.1"),
                    "fc2": _lin(sd, lp + "1.3"),
                },
            }
        )
    return p


def import_task_head(
    sd: StateDict, prefix: str, task_cfg: DistillTaskConfig, task_token: bool
) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "resampler": import_resampler(sd, prefix + "projector.", task_cfg.head, task_token)
    }
    if f"{prefix}linear_1.0.weight" in sd:  # DepthHead intermediate build_mlp's
        p["intermediate"] = [
            {
                "fc1": _lin(sd, f"{prefix}linear_{j}.0"),
                "fc2": _lin(sd, f"{prefix}linear_{j}.2"),
            }
            for j in (1, 2, 3)
        ]
    return p


def import_vlm(sd: StateDict, cfg: VLMConfig) -> Dict[str, Any]:
    """Import a full OLA/LLaVA checkpoint into the framework's param tree.

    Covers the reference loader's special cases (builder.py:26-222):
      * image_newline for anyres/unpad patch merging (llava_arch.py:126-144);
      * the ConvNeXt tower, whose weights live in the model safetensors under
        model.vision_tower.vision_tower.* in timm/OpenCLIP layout — the post-hoc
        reload_from_ckpt path (builder.py:194-222) collapses to a prefix here;
      * gamma/beta LayerNorm names inside the tower survive untouched
        (base_lm.py:111-127 exempts vision_tower keys from HF's rename) — the
        ConvNeXt importer accepts both namings.
    """
    params: Dict[str, Any] = {
        "decoder": import_decoder(sd, cfg.decoder),
        "mm_projector": import_mlp_projector(sd),
    }
    if "model.image_newline" in sd:
        params["image_newline"] = sd["model.image_newline"]
    tower_prefix = "model.vision_tower.vision_tower.vision_model."
    convnext_prefix = "model.vision_tower.vision_tower."
    if any(k.startswith(tower_prefix) for k in sd):
        params["vision_tower"] = import_clip_vision(sd, cfg.vision, tower_prefix)
    elif cfg.use_convnext_tower and any(
        k.startswith(convnext_prefix) for k in sd
    ):
        from visper_lm_tpu.models.convnext import import_openclip_convnext

        tower_sd = {
            k[len(convnext_prefix):]: v
            for k, v in sd.items()
            if k.startswith(convnext_prefix)
        }
        params["vision_tower"] = import_openclip_convnext(
            tower_sd, cfg.convnext, prefix=""
        )

    d = cfg.distill
    if d is not None:
        special: Dict[str, Any] = {}
        for task in d.task_order():
            key = f"model.special_{task}_tokens"
            if key in sd:
                special[task] = sd[key]
        if special:
            params["special_tokens"] = special

        head_names = {"gen": "image_gen_heads", "seg": "image_seg_heads",
                      "depth": "image_depth_heads"}
        heads: Dict[str, Any] = {}
        scales: Dict[str, Any] = {}
        for tcfg in d.tasks:
            base = head_names[tcfg.task]
            task_heads = []
            for i in range(len(tcfg.layer_indices)):
                hp = f"{base}.{i}."
                if not any(k.startswith(hp) for k in sd):
                    break
                task_heads.append(
                    import_task_head(sd, hp, tcfg, d.num_task_tokens > 0)
                )
            if task_heads:
                heads[tcfg.task] = task_heads
            scale_key = f"{tcfg.task}_logit_scale"
            if scale_key in sd:
                scales[tcfg.task] = sd[scale_key].reshape(())
        if heads:
            params["heads"] = heads
        if scales:
            params["logit_scales"] = scales
    return params


def to_jax(tree: Any, dtype=None) -> Any:
    import jax
    import jax.numpy as jnp

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree_util.tree_map(conv, tree)
