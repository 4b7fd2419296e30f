"""StableUnCLIPImg2ImgPipeline-equivalent driver: image embedding -> pixels.

Reference semantics (diffusers pipeline as invoked by /root/reference/demo.py:177-188
and ola_vlm/eval/eval_probe_task.py:222-237 — only `image_embeds` and
`num_inference_steps=25` passed, scheduler swapped to DPM-Solver multistep):

  1. noise-augment the CLIP-H image embedding (normalizer scale -> DDPM add_noise at
     noise_level=0 -> unscale) and append the sinusoidal noise-level embedding;
  2. encode the empty prompt with the CLIP text encoder (CFG: uncond == cond text,
     uncond class conditioning = zeros);
  3. run the UNet over DPM-Solver++(2M) steps from pure noise at guidance 10;
  4. VAE-decode the latent to RGB.

TPU-first: the entire denoise loop is one lax.scan over stacked per-step
coefficients; CFG runs as a single batch-2B UNet call; everything jits once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.models.genpipe.clip_text import (
    CLIPTextConfig,
    clip_text_forward,
    empty_prompt_ids,
    init_clip_text,
)
from visper_lm_tpu.models.genpipe.schedulers import (
    DPMConfig,
    NoiseAugConfig,
    add_noise,
    data_prediction,
    make_dpm_step_coeffs,
    make_dpm_tables,
)
from visper_lm_tpu.models.genpipe.unet import (
    UNetConfig,
    init_unet,
    timestep_embedding,
    unet_forward,
)
from visper_lm_tpu.models.genpipe.vae import VAEConfig, init_vae_decoder, vae_decode
from visper_lm_tpu.utils.param import Params, split_keys


@dataclasses.dataclass(frozen=True)
class GenPipeConfig:
    embed_dim: int = 1024
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    dpm: DPMConfig = dataclasses.field(default_factory=DPMConfig)
    noise_aug: NoiseAugConfig = dataclasses.field(default_factory=NoiseAugConfig)
    guidance_scale: float = 10.0  # StableUnCLIPImg2ImgPipeline default


SD21_UNCLIP = GenPipeConfig()


def tiny_genpipe_config() -> GenPipeConfig:
    """CPU-testable miniature with the same topology."""
    return GenPipeConfig(
        embed_dim=32,
        text=CLIPTextConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            mlp_dim=64, max_positions=8,
            bos_token_id=126, eos_token_id=127, pad_token_id=0,
        ),
        unet=UNetConfig(
            block_out_channels=(16, 32),
            layers_per_block=1,
            cross_attention_dim=32,
            attention_head_dim=(2, 2),
            cross_attn_levels=(True, False),
            norm_groups=4,
            projection_class_embeddings_input_dim=64,
            sample_size=8,
        ),
        vae=VAEConfig(block_out_channels=(8, 16), norm_groups=4),
        dpm=DPMConfig(),
    )


def init_genpipe(key: jax.Array, cfg: GenPipeConfig, dtype=jnp.float32) -> Params:
    ks = split_keys(key, 4)
    return {
        "text": init_clip_text(ks[0], cfg.text, dtype),
        "unet": init_unet(ks[1], cfg.unet, dtype),
        "vae": init_vae_decoder(ks[2], cfg.vae, dtype),
        "normalizer": {
            "mean": jnp.zeros((1, cfg.embed_dim), jnp.float32),
            "std": jnp.ones((1, cfg.embed_dim), jnp.float32),
        },
    }


def noise_image_embeddings(
    params: Params,
    cfg: GenPipeConfig,
    image_embeds: jax.Array,  # (B, embed_dim)
    noise_level: int,
    rng: jax.Array,
) -> jax.Array:
    """StableUnCLIP noise augmentation -> (B, 2*embed_dim) class conditioning."""
    mean = params["normalizer"]["mean"]
    std = params["normalizer"]["std"]
    emb = (image_embeds - mean) / std
    noise = jax.random.normal(rng, emb.shape, emb.dtype)
    emb = add_noise(cfg.noise_aug, emb, noise, noise_level)
    emb = emb * std + mean
    level = jnp.full((emb.shape[0],), noise_level, jnp.float32)
    level_emb = timestep_embedding(level, cfg.embed_dim)
    return jnp.concatenate([emb, level_emb], axis=-1)


def generate_from_embeds(
    params: Params,
    cfg: GenPipeConfig,
    image_embeds,  # (B, embed_dim) or (B, 1, embed_dim) head output
    *,
    num_inference_steps: int = 25,
    guidance_scale: Optional[float] = None,
    noise_level: int = 0,
    seed: int = 0,
) -> np.ndarray:
    """Render images from predicted CLIP-H embeddings. Returns (B, H, W, 3) in [0,1].

    Equivalent to `pipe(image_embeds=emb.squeeze(1), num_inference_steps=25)` in the
    reference call sites.
    """
    image_embeds = jnp.asarray(image_embeds, jnp.float32)
    if image_embeds.ndim == 3:
        image_embeds = image_embeds.squeeze(1)
    b = image_embeds.shape[0]
    gs = cfg.guidance_scale if guidance_scale is None else guidance_scale

    tables = make_dpm_tables(cfg.dpm, num_inference_steps)

    rng = jax.random.PRNGKey(seed)
    r_aug, r_lat = jax.random.split(rng)

    class_cond = noise_image_embeddings(params, cfg, image_embeds, noise_level, r_aug)
    class_labels = jnp.concatenate(
        [jnp.zeros_like(class_cond), class_cond], axis=0
    )  # [uncond | cond]

    text_states = clip_text_forward(
        params["text"], cfg.text, empty_prompt_ids(cfg.text)
    )
    text_states = jnp.broadcast_to(
        text_states, (2 * b,) + text_states.shape[1:]
    )

    size = cfg.unet.sample_size
    latents = (
        jax.random.normal(r_lat, (b, size, size, cfg.unet.in_channels), jnp.float32)
        * tables.init_noise_sigma
    )

    denoise = _denoise_fn(cfg, float(gs), num_inference_steps)
    images = denoise(params, latents, class_labels, text_states)
    return np.asarray(images)


@functools.lru_cache(maxsize=8)
def _denoise_fn(cfg: GenPipeConfig, gs: float, num_inference_steps: int):
    """Jitted 2B-batched CFG denoise loop, cached per (config, guidance, steps)."""
    tables = make_dpm_tables(cfg.dpm, num_inference_steps)

    def denoise(params, latents, class_labels, text_states):
        coeffs = make_dpm_step_coeffs(tables)  # tiny (S,)-tables, traced as consts

        def body(carry, ci):
            lat, x0_prev = carry
            lat_in = jnp.concatenate([lat, lat], axis=0)
            out = unet_forward(
                params["unet"], cfg.unet, lat_in, ci["timesteps"],
                text_states, class_labels,
            )
            out_u, out_c = jnp.split(out, 2, axis=0)
            model_out = out_u + gs * (out_c - out_u)
            x0 = data_prediction(cfg.dpm, model_out, lat, ci["alpha"], ci["sigma"])
            new_lat = (
                ci["sigma_ratio"] * lat
                + ci["alpha_coef"] * ((1.0 + ci["r_weight"]) * x0 - ci["r_weight"] * x0_prev)
            )
            return (new_lat, x0), None

        (lat, _), _ = jax.lax.scan(body, (latents, jnp.zeros_like(latents)), coeffs)
        return vae_decode(params["vae"], cfg.vae, lat)

    return jax.jit(denoise)


# ----------------------------------------------------------------- importers


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(sd: Dict[str, np.ndarray], p: str) -> Params:
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{p}.weight"]).transpose(2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _lin(sd, p: str) -> Params:
    out = {"kernel": _t(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _norm(sd, p: str) -> Params:
    return {"scale": np.asarray(sd[f"{p}.weight"]), "bias": np.asarray(sd[f"{p}.bias"])}


def _import_resnet(sd, p: str) -> Params:
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, f"{p}.time_emb_proj")
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _import_spatial_transformer(sd, p: str) -> Params:
    tb = f"{p}.transformer_blocks.0"
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _lin(sd, f"{p}.proj_in"),
        "proj_out": _lin(sd, f"{p}.proj_out"),
        "block": {
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn1": {
                "q": _lin(sd, f"{tb}.attn1.to_q"),
                "k": _lin(sd, f"{tb}.attn1.to_k"),
                "v": _lin(sd, f"{tb}.attn1.to_v"),
                "o": _lin(sd, f"{tb}.attn1.to_out.0"),
            },
            "norm2": _norm(sd, f"{tb}.norm2"),
            "attn2": {
                "q": _lin(sd, f"{tb}.attn2.to_q"),
                "k": _lin(sd, f"{tb}.attn2.to_k"),
                "v": _lin(sd, f"{tb}.attn2.to_v"),
                "o": _lin(sd, f"{tb}.attn2.to_out.0"),
            },
            "norm3": _norm(sd, f"{tb}.norm3"),
            "ff_in": _lin(sd, f"{tb}.ff.net.0.proj"),
            "ff_out": _lin(sd, f"{tb}.ff.net.2"),
        },
    }


def import_unet(sd: Dict[str, np.ndarray], cfg: UNetConfig) -> Params:
    """diffusers UNet2DConditionModel state dict -> genpipe unet params."""
    n_levels = len(cfg.block_out_channels)
    down = []
    for lvl in range(n_levels):
        blk: Params = {"resnets": [], "attentions": []}
        for i in range(cfg.layers_per_block):
            blk["resnets"].append(_import_resnet(sd, f"down_blocks.{lvl}.resnets.{i}"))
            if cfg.cross_attn_levels[lvl]:
                blk["attentions"].append(
                    _import_spatial_transformer(sd, f"down_blocks.{lvl}.attentions.{i}")
                )
        if f"down_blocks.{lvl}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv(sd, f"down_blocks.{lvl}.downsamplers.0.conv")
        down.append(blk)
    up = []
    for j in range(n_levels):  # diffusers up_blocks are already deepest-first
        lvl = n_levels - 1 - j
        blk = {"resnets": [], "attentions": []}
        for i in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_import_resnet(sd, f"up_blocks.{j}.resnets.{i}"))
            if cfg.cross_attn_levels[lvl]:
                blk["attentions"].append(
                    _import_spatial_transformer(sd, f"up_blocks.{j}.attentions.{i}")
                )
        if f"up_blocks.{j}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv(sd, f"up_blocks.{j}.upsamplers.0.conv")
        up.append(blk)
    return {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "class_embedding": {
            "linear_1": _lin(sd, "class_embedding.linear_1"),
            "linear_2": _lin(sd, "class_embedding.linear_2"),
        },
        "down": down,
        "mid": {
            "resnet1": _import_resnet(sd, "mid_block.resnets.0"),
            "attn": _import_spatial_transformer(sd, "mid_block.attentions.0"),
            "resnet2": _import_resnet(sd, "mid_block.resnets.1"),
        },
        "up": up,
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }


def import_vae_decoder(sd: Dict[str, np.ndarray], cfg: VAEConfig) -> Params:
    n_levels = len(cfg.block_out_channels)
    up = []
    for j in range(n_levels):
        blk: Params = {
            "resnets": [
                _import_resnet(sd, f"decoder.up_blocks.{j}.resnets.{i}")
                for i in range(cfg.layers_per_block + 1)
            ]
        }
        if f"decoder.up_blocks.{j}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv(sd, f"decoder.up_blocks.{j}.upsamplers.0.conv")
        up.append(blk)
    a = "decoder.mid_block.attentions.0"
    return {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": {
            "resnet1": _import_resnet(sd, "decoder.mid_block.resnets.0"),
            "attn": {
                "norm": _norm(sd, f"{a}.group_norm"),
                "q": _lin(sd, f"{a}.to_q"),
                "k": _lin(sd, f"{a}.to_k"),
                "v": _lin(sd, f"{a}.to_v"),
                "o": _lin(sd, f"{a}.to_out.0"),
            },
            "resnet2": _import_resnet(sd, "decoder.mid_block.resnets.1"),
        },
        "up": up,
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }


def import_clip_text(sd: Dict[str, np.ndarray], cfg: CLIPTextConfig) -> Params:
    from visper_lm_tpu.utils.param import stack_layer_params

    p = "text_model"
    blocks = []
    for i in range(cfg.num_layers):
        lp = f"{p}.encoder.layers.{i}"
        blocks.append(
            {
                "ln1": _norm(sd, f"{lp}.layer_norm1"),
                "q_proj": _lin(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{lp}.self_attn.v_proj"),
                "o_proj": _lin(sd, f"{lp}.self_attn.out_proj"),
                "ln2": _norm(sd, f"{lp}.layer_norm2"),
                "fc1": _lin(sd, f"{lp}.mlp.fc1"),
                "fc2": _lin(sd, f"{lp}.mlp.fc2"),
            }
        )
    blocks = jax.tree_util.tree_map(jnp.asarray, blocks)
    return {
        "token_embedding": {
            "embedding": np.asarray(sd[f"{p}.embeddings.token_embedding.weight"])
        },
        "position_embedding": np.asarray(
            sd[f"{p}.embeddings.position_embedding.weight"]
        ),
        "blocks": stack_layer_params(blocks),
        "final_ln": _norm(sd, f"{p}.final_layer_norm"),
    }


def import_genpipe(
    cfg: GenPipeConfig,
    *,
    unet_sd: Dict[str, np.ndarray],
    vae_sd: Dict[str, np.ndarray],
    text_sd: Dict[str, np.ndarray],
    normalizer_sd: Dict[str, np.ndarray],
) -> Params:
    """Assemble full pipeline params from the four diffusers component state dicts
    (unet/, vae/, text_encoder/, image_normalizer/ of stable-diffusion-2-1-unclip)."""
    params = {
        "text": import_clip_text(text_sd, cfg.text),
        "unet": import_unet(unet_sd, cfg.unet),
        "vae": import_vae_decoder(vae_sd, cfg.vae),
        "normalizer": {
            "mean": np.asarray(normalizer_sd["mean"]).reshape(1, -1),
            "std": np.asarray(normalizer_sd["std"]).reshape(1, -1),
        },
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def genpipe_config_to_dict(cfg: GenPipeConfig) -> Dict:
    """JSON-serializable config (the demo's teachers-dir bundle format)."""
    return dataclasses.asdict(cfg)


def genpipe_config_from_dict(d: Dict) -> GenPipeConfig:
    """Inverse of genpipe_config_to_dict (json lists -> tuples)."""
    from visper_lm_tpu.models.genpipe.schedulers import DPMConfig, NoiseAugConfig

    def make(cls, sub):
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in sub.items() if k in fields
        })

    return GenPipeConfig(
        embed_dim=d.get("embed_dim", 1024),
        text=make(CLIPTextConfig, d.get("text", {})),
        unet=make(UNetConfig, d.get("unet", {})),
        vae=make(VAEConfig, d.get("vae", {})),
        dpm=make(DPMConfig, d.get("dpm", {})),
        noise_aug=make(NoiseAugConfig, d.get("noise_aug", {})),
        guidance_scale=d.get("guidance_scale", 10.0),
    )
