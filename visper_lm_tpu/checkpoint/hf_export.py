"""Export framework params to reference/HF-format state dicts.

Inverse of hf_import: a model trained here can be saved so reference tooling
(builder.load_pretrained_model, HF from_pretrained) loads it — the interchange
contract in both directions. Keys/layouts mirror import_vlm exactly, including
Phi3's fused qkv/gate_up re-packing and the torch (out, in) Linear convention.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from visper_lm_tpu.config import DecoderConfig, VLMConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def _t(kernel) -> Array:
    return np.ascontiguousarray(np.asarray(kernel, dtype=np.float32).T)


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def export_linear(sd: StateDict, prefix: str, p: Dict[str, Any]) -> None:
    sd[prefix + ".weight"] = _t(p["kernel"])
    if "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def export_ln(sd: StateDict, prefix: str, p: Dict[str, Any]) -> None:
    sd[prefix + ".weight"] = _np(p["scale"])
    if "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def export_decoder(params: Dict[str, Any], cfg: DecoderConfig, prefix: str = "model.") -> StateDict:
    sd: StateDict = {}
    sd[f"{prefix}embed_tokens.weight"] = _np(params["embed_tokens"]["embedding"])
    export_ln(sd, f"{prefix}norm", params["final_norm"])
    if "lm_head" in params:
        export_linear(sd, "lm_head", params["lm_head"])

    blocks = params["blocks"]
    for i in range(cfg.num_layers):
        lp = f"{prefix}layers.{i}."
        layer = {k: {kk: np.asarray(vv)[i] for kk, vv in v.items()} for k, v in blocks.items()}
        export_ln(sd, lp + "input_layernorm", layer["attn_norm"])
        export_ln(sd, lp + "post_attention_layernorm", layer["mlp_norm"])
        export_linear(sd, lp + "self_attn.o_proj", layer["o_proj"])
        export_linear(sd, lp + "mlp.down_proj", layer["down_proj"])
        if cfg.family == "phi3":
            qkv = np.concatenate(
                [_t(layer["q_proj"]["kernel"]), _t(layer["k_proj"]["kernel"]),
                 _t(layer["v_proj"]["kernel"])], axis=0,
            )
            sd[lp + "self_attn.qkv_proj.weight"] = qkv
            gu = np.concatenate(
                [_t(layer["gate_proj"]["kernel"]), _t(layer["up_proj"]["kernel"])], axis=0
            )
            sd[lp + "mlp.gate_up_proj.weight"] = gu
        else:
            export_linear(sd, lp + "self_attn.q_proj", layer["q_proj"])
            export_linear(sd, lp + "self_attn.k_proj", layer["k_proj"])
            export_linear(sd, lp + "self_attn.v_proj", layer["v_proj"])
            export_linear(sd, lp + "mlp.gate_proj", layer["gate_proj"])
            export_linear(sd, lp + "mlp.up_proj", layer["up_proj"])
    return sd


def export_clip_vision(params: Dict[str, Any], cfg, prefix: str = "vision_model.") -> StateDict:
    sd: StateDict = {}
    d = cfg.hidden_size
    kern = _t(params["patch_embed"]["kernel"])              # (D, 3*P*P)
    sd[f"{prefix}embeddings.patch_embedding.weight"] = kern.reshape(
        d, 3, cfg.patch_size, cfg.patch_size
    )
    sd[f"{prefix}embeddings.position_embedding.weight"] = _np(params["pos_embed"])
    if "cls_token" in params:
        sd[f"{prefix}embeddings.class_embedding"] = _np(params["cls_token"])
    if "pre_norm" in params:
        export_ln(sd, f"{prefix}pre_layrnorm", params["pre_norm"])
    export_ln(sd, f"{prefix}post_layernorm", params["final_norm"])

    blocks = params["blocks"]
    n_layers = np.asarray(blocks["norm1"]["scale"]).shape[0]
    for i in range(n_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layer = {k: {kk: np.asarray(vv)[i] for kk, vv in v.items()} for k, v in blocks.items()}
        export_ln(sd, lp + "layer_norm1", layer["norm1"])
        export_ln(sd, lp + "layer_norm2", layer["norm2"])
        qkv_k = layer["qkv"]["kernel"]                      # (D, 3D)
        qkv_b = layer["qkv"]["bias"]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[lp + f"self_attn.{name}.weight"] = _t(qkv_k[:, j * d : (j + 1) * d])
            sd[lp + f"self_attn.{name}.bias"] = _np(qkv_b[j * d : (j + 1) * d])
        export_linear(sd, lp + "self_attn.out_proj", layer["proj"])
        export_linear(sd, lp + "mlp.fc1", layer["fc1"])
        export_linear(sd, lp + "mlp.fc2", layer["fc2"])
    if "visual_projection" in params:
        export_linear(sd, "visual_projection", params["visual_projection"])
    return sd


def export_resampler(sd: StateDict, prefix: str, p: Dict[str, Any]) -> None:
    export_linear(sd, prefix + "proj_in", p["proj_in"])
    export_linear(sd, prefix + "proj_out", p["proj_out"])
    export_ln(sd, prefix + "norm_out", p["norm_out"])
    if "latents" in p:
        sd[prefix + "latents"] = _np(p["latents"])[None]
    for i, layer in enumerate(p["layers"]):
        lp = f"{prefix}layers.{i}."
        export_ln(sd, lp + "0.norm1", layer["attn"]["norm1"])
        export_ln(sd, lp + "0.norm2", layer["attn"]["norm2"])
        export_linear(sd, lp + "0.to_q", layer["attn"]["to_q"])
        export_linear(sd, lp + "0.to_kv", layer["attn"]["to_kv"])
        export_linear(sd, lp + "0.to_out", layer["attn"]["to_out"])
        export_ln(sd, lp + "1.0", layer["ff"]["norm"])
        export_linear(sd, lp + "1.1", layer["ff"]["fc1"])
        export_linear(sd, lp + "1.3", layer["ff"]["fc2"])


def export_vlm(params: Dict[str, Any], cfg: VLMConfig) -> StateDict:
    """Full OLA/LLaVA-format state dict from a framework param tree."""
    from visper_lm_tpu.models.decoder import normalize_stream_layout

    # a stream_grads-trained state carries decoder['blocks_chunks'] instead
    # of 'blocks'; rebuild the stacked layout before export
    params = normalize_stream_layout(params)
    sd = export_decoder(params["decoder"], cfg.decoder)
    if "mm_projector" in params and params["mm_projector"]:
        for i, layer in enumerate(params["mm_projector"]["layers"]):
            export_linear(sd, f"model.mm_projector.{2 * i}", layer)
    if "image_newline" in params:
        sd["model.image_newline"] = _np(params["image_newline"])
    if "vision_tower" in params:
        if cfg.use_convnext_tower:
            from visper_lm_tpu.models.convnext import export_openclip_convnext

            sd.update(
                export_openclip_convnext(
                    params["vision_tower"], cfg.convnext,
                    prefix="model.vision_tower.vision_tower.",
                )
            )
        else:
            sd.update(
                export_clip_vision(
                    params["vision_tower"], cfg.vision,
                    prefix="model.vision_tower.vision_tower.vision_model.",
                )
            )

    d = cfg.distill
    if d is not None:
        for task, tok in params.get("special_tokens", {}).items():
            sd[f"model.special_{task}_tokens"] = _np(tok)
        head_names = {"gen": "image_gen_heads", "seg": "image_seg_heads",
                      "depth": "image_depth_heads"}
        for tcfg in d.tasks:
            for i, head in enumerate(params.get("heads", {}).get(tcfg.task, [])):
                hp = f"{head_names[tcfg.task]}.{i}."
                export_resampler(sd, hp + "projector.", head["resampler"])
                for j, mlp in enumerate(head.get("intermediate", []), start=1):
                    export_linear(sd, f"{hp}linear_{j}.0", mlp["fc1"])
                    export_linear(sd, f"{hp}linear_{j}.2", mlp["fc2"])
        for task, scale in params.get("logit_scales", {}).items():
            sd[f"{task}_logit_scale"] = _np(scale).reshape(())
    return sd


def save_safetensors(sd: StateDict, path: str) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def save_hf_checkpoint(model_dir: str, params: Dict[str, Any], cfg: VLMConfig) -> None:
    """Write a complete HF-layout checkpoint directory: model.safetensors in
    the reference's key surface plus a config.json that is BOTH
      * HF-decoder-loadable (LlamaForCausalLM/Phi3ForCausalLM field set, so
        transformers can instantiate the text model for logit-parity gates —
        eval/validate.py), and
      * fully self-describing for this framework (the whole VLMConfig under
        "visper_config"; api.from_hf_checkpoint prefers it over the lossy
        reference-field reconstruction).
    Reference parity anchor: the denormalized self-describing config the
    trainer injects (ola_vlm_train.py:1196-1231)."""
    import json

    from visper_lm_tpu.config import config_to_json

    os.makedirs(model_dir, exist_ok=True)
    save_safetensors(export_vlm(params, cfg), os.path.join(model_dir, "model.safetensors"))
    d = cfg.decoder
    arch = "Phi3ForCausalLM" if d.family == "phi3" else "LlamaForCausalLM"
    hf_cfg = {
        "architectures": [arch],
        "model_type": "phi3" if d.family == "phi3" else "llama",
        "vocab_size": d.vocab_size,
        "hidden_size": d.hidden_size,
        "intermediate_size": d.mlp_dim,
        "num_hidden_layers": d.num_layers,
        "num_attention_heads": d.num_heads,
        "num_key_value_heads": d.num_kv_heads,
        "head_dim": d.head_dim,
        "rope_theta": d.rope_theta,
        "rms_norm_eps": d.norm_eps,
        "max_position_embeddings": d.max_seq_len,
        "max_sequence_length": d.max_seq_len,
        "tie_word_embeddings": d.tie_embeddings,
        "torch_dtype": "float32",
        "mm_vision_tower": "convnext" if cfg.use_convnext_tower else "clip",
        "mm_patch_merge_type": cfg.mm_patch_merge_type,
        "image_aspect_ratio": cfg.image_aspect_ratio,
        "mm_use_im_patch_token": False,
        "visper_config": json.loads(config_to_json(cfg)),
    }
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)
