"""Typed configuration system.

One canonical config tree (dataclasses) that is JSON-serializable so checkpoints are
self-describing, mirroring how the reference denormalizes everything into the HF config
(/root/reference/ola_vlm/train/ola_vlm_train.py:1196-1230) and reads it back at
demo/eval time (demo.py:152-154).

Also parses the reference's two micro-DSLs for checkpoint compatibility:
  * layer indices  "d18-20_s10-18_g12-20"  (dash = LIST of 1-indexed layers, not a range;
    reference regex at ola_vlm_train.py:1161, conversion at base_ola_vlm.py:97-102)
  * loss weights   "d0.5_s0.5_g0.5"        (ola_vlm_train.py:1181-1194)
"""

from __future__ import annotations

import dataclasses
import json
import re
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Tuple


# ---------------------------------------------------------------------------
# DSL parsers (reference-compatible)
# ---------------------------------------------------------------------------

_LAYER_DSL_PATTERN = re.compile(r"[a-zA-Z]\d+(?:-\d+)?")
_WEIGHT_DSL_PATTERN = re.compile(r"[a-zA-Z]\d+\.\d+")


def parse_layer_indices_dsl(spec: str) -> Dict[str, List[int]]:
    """Parse e.g. "d18-20_s10-18_g12-20" -> {"depth": [17,19], "seg": [9,17], "gen": [11,19]}.

    Returned indices are 0-indexed into the per-layer hidden-state list (the reference
    subtracts 1: base_ola_vlm.py:100).
    """
    out: Dict[str, List[int]] = {}
    key_map = {"d": "depth", "s": "seg", "g": "gen"}
    for match in _LAYER_DSL_PATTERN.findall(spec):
        task = key_map.get(match[0].lower())
        if task is None:
            continue
        out[task] = [int(i) - 1 for i in match[1:].split("-")]
    return out


def parse_loss_weights_dsl(spec: str) -> Dict[str, float]:
    """Parse e.g. "d0.5_s0.5_g0.5" -> {"depth": 0.5, "seg": 0.5, "gen": 0.5}."""
    out = {"depth": 0.5, "seg": 0.5, "gen": 0.5}
    key_map = {"d": "depth", "s": "seg", "g": "gen"}
    for match in _WEIGHT_DSL_PATTERN.findall(spec):
        task = key_map.get(match[0].lower())
        if task is not None:
            out[task] = float(match[1:])
    return out


# ---------------------------------------------------------------------------
# Component configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DecoderConfig:
    """A generic pre-norm decoder-only transformer (covers Llama3-8b & Phi3-mini)."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    mlp_dim: int
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 4096
    tie_embeddings: bool = False
    # Phi3 packs qkv / gate+up into single matmuls in the HF checkpoint; we keep
    # them split in our canonical tree and split during import instead.
    family: str = "llama"  # "llama" | "phi3"
    dtype: str = "bfloat16"
    # Sparse MLP (ops/moe.py): 0 = dense (every reference model). When > 0 the
    # per-block MLP becomes a top-k MoE; expert weights shard over the
    # 'expert' mesh axis and the Switch aux losses enter the training loss
    # with moe_aux_weight.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01

    @property
    def q_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads


@dataclass(frozen=True)
class VisionConfig:
    """CLIP-style ViT vision encoder (covers CLIP-ViT-L/14-336, CLIP-H, DINOv2-L)."""

    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    norm_eps: float = 1e-5
    use_class_token: bool = True
    use_pre_norm: bool = True            # CLIP has pre-layernorm after embeddings
    use_class_embedding_bias: bool = False
    hidden_act: str = "quick_gelu"       # CLIP uses quick_gelu; DINOv2 plain gelu
    # Feature selection (reference: clip_encoder.py:37-45): select hidden layer
    # (negative = from the end, -2 in all shipped configs) and drop CLS.
    select_layer: int = -2
    select_feature: str = "patch"
    dtype: str = "bfloat16"

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side ** 2


@dataclass(frozen=True)
class ConvNeXtConfig:
    """OpenCLIP ConvNeXt-XXL trunk config (reference: clip_convnext_encoder.py)."""

    image_size: int = 768
    depths: Tuple[int, ...] = (3, 4, 30, 3)
    dims: Tuple[int, ...] = (384, 768, 1536, 3072)
    norm_eps: float = 1e-6
    # reference exposes stage-3 output (3072-d) flattened to 576 tokens at res768
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class ProjectorConfig:
    """mm projector: 'linear' | 'mlpNx_gelu' | 'identity' (reference builder.py:47-65)."""

    projector_type: str = "mlp2x_gelu"
    input_dim: int = 1024
    output_dim: int = 4096

    @property
    def mlp_depth(self) -> int:
        m = re.match(r"^mlp(\d+)x_gelu$", self.projector_type)
        return int(m.group(1)) if m else 1


@dataclass(frozen=True)
class LoraConfig:
    """LoRA adapter config (reference train.py:983-999: r=64, alpha=16)."""

    r: int = 64
    alpha: int = 16
    targets: Tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"
    )

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


@dataclass(frozen=True)
class ResamplerConfig:
    """Perceiver resampler head hyperparams (reference resampler.py:119-165).

    Defaults match the shipped head configs (ola_vlm_train.py:85-109).
    """

    depth: int = 1
    dim_head: int = 32
    num_heads: int = 4
    num_tokens: int = 1          # num_queries
    output_dim: int = 1024
    ff_mult: int = 1


@dataclass(frozen=True)
class DistillTaskConfig:
    """Per-task distillation head config."""

    task: str                        # "depth" | "seg" | "gen"
    layer_indices: Tuple[int, ...]   # 0-indexed block outputs to tap
    loss_weight: float
    head: ResamplerConfig
    target_dim: int                  # teacher embedding dim
    target_tokens: int               # teacher token count (1 for gen, 576 for depth/seg)


@dataclass(frozen=True)
class DistillConfig:
    """Distillation engine config (PT stage). Mirrors reference config.image_* dicts."""

    mode: str = "gen-depth-seg"
    num_task_tokens: int = 8
    contrastive_loss_weight: float = 0.3
    use_contrastive: bool = True
    pass_text_to_aux: bool = True
    # The reference zeroes per-sample masks in place right before the loss
    # (base_ola_vlm.py:472-473,498-499,525-526) which multiplies both loss terms by 0.
    # We implement the documented semantics (mask=1 <=> real image) by default and keep
    # the literal reference behavior behind this flag for A/B (SURVEY.md §7).
    replicate_mask_zero_bug: bool = False
    tasks: Tuple[DistillTaskConfig, ...] = ()

    def task_order(self) -> List[str]:
        return self.mode.split("-")

    def get_task(self, name: str) -> Optional[DistillTaskConfig]:
        for t in self.tasks:
            if t.task == name:
                return t
        return None


@dataclass(frozen=True)
class VLMConfig:
    """Full multimodal model config."""

    decoder: DecoderConfig
    vision: VisionConfig
    projector: ProjectorConfig
    distill: Optional[DistillConfig] = None
    conv_template: str = "llava_phi_3"
    num_sys_tokens: int = 13           # see constants.NUM_SYS_TOKENS
    num_image_tokens: int = 576
    image_aspect_ratio: str = "square"  # 'square' | 'pad' | 'anyres'
    mm_patch_merge_type: str = "flat"
    use_convnext_tower: bool = False
    convnext: Optional[ConvNeXtConfig] = None
    lora: Optional[LoraConfig] = None

    @property
    def num_task_tokens_total(self) -> int:
        if self.distill is None or self.distill.num_task_tokens == 0:
            return 0
        return self.distill.num_task_tokens * len(self.distill.task_order())


# ---------------------------------------------------------------------------
# Factory helpers / presets
# ---------------------------------------------------------------------------


def make_distill_config(
    mode: str = "gen-depth-seg",
    layer_indices: str = "d18-20_s10-18_g12-20",
    loss_weights: str = "d0.5_s0.5_g0.5",
    num_task_tokens: int = 8,
    contrastive_loss_weight: float = 0.3,
    **overrides: Any,
) -> DistillConfig:
    """Build a DistillConfig from the reference CLI surface (pretrain.sh:19-24)."""
    layers = parse_layer_indices_dsl(layer_indices)
    weights = parse_loss_weights_dsl(loss_weights)
    task_specs = {
        # (head defaults, target_dim, target_tokens) per ola_vlm_train.py:85-109
        "gen": (ResamplerConfig(num_tokens=1, output_dim=1024), 1024, 1),
        "seg": (ResamplerConfig(num_tokens=576, output_dim=1536), 1536, 576),
        "depth": (ResamplerConfig(num_tokens=576, output_dim=1024), 1024, 576),
    }
    tasks = []
    for task in mode.split("-"):
        if task not in task_specs or task not in layers:
            continue
        head, tdim, ttok = task_specs[task]
        tasks.append(
            DistillTaskConfig(
                task=task,
                layer_indices=tuple(layers[task]),
                loss_weight=weights[task],
                head=head,
                target_dim=tdim,
                target_tokens=ttok,
            )
        )
    return DistillConfig(
        mode=mode,
        num_task_tokens=num_task_tokens,
        contrastive_loss_weight=contrastive_loss_weight,
        tasks=tuple(tasks),
        **overrides,
    )


LLAMA3_8B = DecoderConfig(
    vocab_size=128256,
    hidden_size=4096,
    num_layers=32,
    num_heads=32,
    num_kv_heads=8,
    head_dim=128,
    mlp_dim=14336,
    rope_theta=500000.0,
    norm_eps=1e-5,
    max_seq_len=4096,
    family="llama",
)

PHI3_MINI_4K = DecoderConfig(
    vocab_size=32064,
    hidden_size=3072,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    head_dim=96,
    mlp_dim=8192,
    rope_theta=10000.0,
    norm_eps=1e-5,
    max_seq_len=4096,
    family="phi3",
)

VICUNA_7B = DecoderConfig(
    vocab_size=32000,
    hidden_size=4096,
    num_layers=32,
    num_heads=32,
    num_kv_heads=32,
    head_dim=128,
    mlp_dim=11008,
    rope_theta=10000.0,
    norm_eps=1e-5,
    max_seq_len=4096,
    family="llama",
)

CLIP_VIT_L_336 = VisionConfig(
    image_size=336,
    patch_size=14,
    hidden_size=1024,
    num_layers=24,
    num_heads=16,
    mlp_dim=4096,
    select_layer=-2,
    select_feature="patch",
)

# unCLIP generation teacher: CLIP-ViT-H/14 image encoder @224 (diffusers
# StableUnCLIPImg2ImgPipeline.image_encoder; reference base_ola_vlm.py:323-332).
CLIP_VIT_H_224 = VisionConfig(
    image_size=224,
    patch_size=14,
    hidden_size=1280,
    num_layers=32,
    num_heads=16,
    mlp_dim=5120,
    select_layer=-1,
    select_feature="cls",
    hidden_act="gelu",
)

# DINOv2 ViT-L/14 backbone of Depth-Anything-V2 (vendored in the reference at
# ola_vlm/model/aux_heads/depth_anything_v2/dinov2.py).
DINOV2_VIT_L = VisionConfig(
    image_size=336,
    patch_size=14,
    hidden_size=1024,
    num_layers=24,
    num_heads=16,
    mlp_dim=4096,
    norm_eps=1e-6,
    hidden_act="gelu",
    use_pre_norm=False,
)

CONVNEXT_XXL_768 = ConvNeXtConfig()


def phi3_clip_vlm(distill: bool = False, **kwargs: Any) -> VLMConfig:
    return VLMConfig(
        decoder=PHI3_MINI_4K,
        vision=CLIP_VIT_L_336,
        projector=ProjectorConfig(input_dim=1024, output_dim=3072),
        distill=make_distill_config() if distill else None,
        conv_template="llava_phi_3",
        num_sys_tokens=13,
        **kwargs,
    )


def llama3_clip_vlm(distill: bool = False, **kwargs: Any) -> VLMConfig:
    return VLMConfig(
        decoder=LLAMA3_8B,
        vision=CLIP_VIT_L_336,
        projector=ProjectorConfig(input_dim=1024, output_dim=4096),
        distill=make_distill_config() if distill else None,
        conv_template="llava_llama_3",
        num_sys_tokens=38,
        **kwargs,
    )


def vicuna_clip_vlm(distill: bool = False, **kwargs: Any) -> VLMConfig:
    """Vicuna-7b-v1.5 + CLIP-ViT-L: the third shipped LLM family. The vicuna_v1
    template's system prompt occupies 26 tokens (reference ola_llama.py:65-68
    NUM_SYS_TOKENS for non-llama3 names)."""
    return VLMConfig(
        decoder=VICUNA_7B,
        vision=CLIP_VIT_L_336,
        projector=ProjectorConfig(input_dim=1024, output_dim=4096),
        distill=make_distill_config() if distill else None,
        conv_template="vicuna_v1",
        num_sys_tokens=26,
        **kwargs,
    )


def with_convnext_tower(cfg: VLMConfig) -> VLMConfig:
    """Swap the CLIP-ViT tower for the OpenCLIP ConvNeXt-XXL@768 trunk
    (clip_convnext_encoder.py:150-174: 24x24 -> 576 tokens x 3072)."""
    return replace(
        cfg,
        use_convnext_tower=True,
        convnext=CONVNEXT_XXL_768,
        projector=replace(cfg.projector, input_dim=3072),
    )


def probe_distill_config(
    probe_mode: str,
    num_layers: int,
    **overrides: Any,
) -> DistillConfig:
    """Probing config: ONE head per LLM layer for a single task, plain smooth-L1
    (reference base_probe_vlm.init_heads, base_probe_vlm.py:60-108: GenHead /
    OneFormerSegHead / DepthHead(use_intermediate_depth=False), no task tokens,
    no contrastive)."""
    specs = {
        "gen": (ResamplerConfig(num_tokens=1, output_dim=1024), 1024, 1),
        "seg": (ResamplerConfig(num_tokens=576, output_dim=1536), 1536, 576),
        "depth": (ResamplerConfig(num_tokens=576, output_dim=1024), 1024, 576),
    }
    head, tdim, ttok = specs[probe_mode]
    return DistillConfig(
        mode=probe_mode,
        num_task_tokens=0,
        use_contrastive=False,
        contrastive_loss_weight=0.0,
        tasks=(
            DistillTaskConfig(
                task=probe_mode,
                layer_indices=tuple(range(num_layers)),
                loss_weight=1.0,
                head=head,
                target_dim=tdim,
                target_tokens=ttok,
            ),
        ),
        **overrides,
    )


def tiny_test_vlm(distill: bool = False) -> VLMConfig:
    """A miniature config for CPU tests: same topology, tiny dims."""
    decoder = DecoderConfig(
        vocab_size=512,
        hidden_size=64,
        num_layers=4,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        mlp_dim=128,
        rope_theta=10000.0,
        max_seq_len=256,
        family="llama",
        dtype="float32",
    )
    vision = VisionConfig(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        mlp_dim=64,
        select_layer=-2,
        dtype="float32",
    )
    distill_cfg = None
    if distill:
        distill_cfg = DistillConfig(
            mode="gen-depth-seg",
            num_task_tokens=2,
            contrastive_loss_weight=0.3,
            tasks=(
                DistillTaskConfig(
                    task="gen",
                    layer_indices=(1, 3),
                    loss_weight=0.5,
                    head=ResamplerConfig(num_tokens=1, output_dim=24, dim_head=8, num_heads=2),
                    target_dim=24,
                    target_tokens=1,
                ),
                DistillTaskConfig(
                    task="depth",
                    layer_indices=(3,),
                    loss_weight=0.5,
                    head=ResamplerConfig(num_tokens=4, output_dim=24, dim_head=8, num_heads=2),
                    target_dim=24,
                    target_tokens=4,
                ),
                DistillTaskConfig(
                    task="seg",
                    layer_indices=(2,),
                    loss_weight=0.5,
                    head=ResamplerConfig(num_tokens=4, output_dim=16, dim_head=8, num_heads=2),
                    target_dim=16,
                    target_tokens=4,
                ),
            ),
        )
    return VLMConfig(
        decoder=decoder,
        vision=vision,
        projector=ProjectorConfig(projector_type="mlp2x_gelu", input_dim=32, output_dim=64),
        distill=distill_cfg,
        conv_template="llava_phi_3",
        num_sys_tokens=3,
        num_image_tokens=vision.num_patches,
    )


# ---------------------------------------------------------------------------
# (De)serialization — checkpoints embed the full config as JSON
# ---------------------------------------------------------------------------

_CONFIG_CLASSES = {
    cls.__name__: cls
    for cls in (
        DecoderConfig,
        VisionConfig,
        ConvNeXtConfig,
        ProjectorConfig,
        LoraConfig,
        ResamplerConfig,
        DistillTaskConfig,
        DistillConfig,
        VLMConfig,
    )
}


def config_to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        body = {
            f.name: config_to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)
        }
        return {"__class__": type(cfg).__name__, **body}
    if isinstance(cfg, (list, tuple)):
        return [config_to_dict(v) for v in cfg]
    return cfg


def config_from_dict(obj: Any) -> Any:
    if isinstance(obj, dict) and "__class__" in obj:
        cls = _CONFIG_CLASSES[obj["__class__"]]
        kwargs = {k: config_from_dict(v) for k, v in obj.items() if k != "__class__"}
        fields = {f.name: f for f in dataclasses.fields(cls)}
        for k, v in kwargs.items():
            if isinstance(v, list) and fields[k].type.startswith("Tuple"):
                kwargs[k] = tuple(v)
        return cls(**kwargs)
    if isinstance(obj, list):
        vals = [config_from_dict(v) for v in obj]
        return tuple(vals) if any(dataclasses.is_dataclass(v) for v in vals) else vals
    return obj


def config_to_json(cfg: Any) -> str:
    return json.dumps(config_to_dict(cfg), indent=2)


def config_from_json(text: str) -> Any:
    return config_from_dict(json.loads(text))
