"""User-facing model API.

The framework equivalent of the reference's checkpoint loader + model surface
(builder.load_pretrained_model, ola_vlm/model/builder.py:26-191; generate,
base_ola_vlm.py:578-616; get_visual_interpretations, base_ola_vlm.py:537-576):

    model = VisperModel.from_hf_checkpoint(dir, tokenizer=...)   # shi-labs ckpts
    model = VisperModel.from_orbax(dir, tokenizer=...)           # our ckpts
    texts = model.chat([...prompts...], [PIL images], max_new_tokens=128)
    interp = model.get_visual_interpretations(prompt, image)

Model-zoo dispatch by name substring (probe / phi / llama) mirrors builder.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu import conversation as conversation_lib
from visper_lm_tpu.config import (
    VLMConfig,
    llama3_clip_vlm,
    phi3_clip_vlm,
)
from visper_lm_tpu.constants import DEFAULT_IMAGE_TOKEN
from visper_lm_tpu.data.collate import build_splice_plan
from visper_lm_tpu.data.mm_utils import process_images, tokenizer_image_token
from visper_lm_tpu.models.vlm import (
        predict_task_embeddings,
    vlm_forward,
)
from visper_lm_tpu.serve.generate import GenerationConfig, Generator, left_pad_plans


def config_for_model_name(model_name: str, distill: bool = True) -> VLMConfig:
    """Model-zoo dispatch by substring (reference builder.py:26-191)."""
    name = model_name.lower()
    if "phi" in name:
        return phi3_clip_vlm(distill=distill)
    return llama3_clip_vlm(distill=distill)


@dataclasses.dataclass
class VisperModel:
    cfg: VLMConfig
    params: Any
    tokenizer: Any = None
    context_len: int = 4096
    # anyres grid (reference image_grid_pinpoints, train.py:1040)
    grid_pinpoints: Any = "[[336,672],[672,336],[672,672],[1008,336],[336,1008]]"

    # ------------------------------------------------------------------ load
    @classmethod
    def from_hf_checkpoint(
        cls, model_dir: str, tokenizer=None, model_name: Optional[str] = None,
        dtype=jnp.bfloat16,
    ) -> "VisperModel":
        from visper_lm_tpu.checkpoint.hf_import import (
            import_vlm,
            load_sharded_safetensors,
            to_jax,
        )

        model_name = model_name or os.path.basename(os.path.normpath(model_dir))
        cfg = config_for_model_name(model_name)
        sd = load_sharded_safetensors(model_dir)
        params = to_jax(import_vlm(sd, cfg), dtype=dtype)
        return cls(cfg=cfg, params=params, tokenizer=tokenizer)

    @classmethod
    def from_orbax(cls, ckpt_dir: str, tokenizer=None) -> "VisperModel":
        from visper_lm_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        cfg = mgr.restore_config()
        assert cfg is not None, "checkpoint has no embedded config"
        # restore with abstract target from config
        from visper_lm_tpu.models.vlm import init_vlm

        template = jax.eval_shape(lambda: init_vlm(jax.random.PRNGKey(0), cfg))
        state = mgr.restore(template)
        mgr.close()
        return cls(cfg=cfg, params=state, tokenizer=tokenizer)

    # ---------------------------------------------------------------- prompts
    def build_prompt(self, question: str, with_image: bool = True) -> str:
        conv = conversation_lib.conv_templates[self.cfg.conv_template].copy()
        if with_image and DEFAULT_IMAGE_TOKEN not in question:
            question = DEFAULT_IMAGE_TOKEN + "\n" + question
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        return conv.get_prompt()

    def _plans(self, prompts: Sequence[str], max_len: int):
        d = self.cfg.distill
        return [
            build_splice_plan(
                tokenizer_image_token(p, self.tokenizer),
                None,
                max_len,
                num_image_tokens=self.cfg.num_image_tokens,
                num_task_tokens=d.num_task_tokens if d else 0,
                num_tasks=len(d.task_order()) if d else 0,
            )
            for p in prompts
        ]

    def stop_strings(self) -> List[str]:
        conv = conversation_lib.conv_templates[self.cfg.conv_template]
        if conv.sep_style == conversation_lib.SeparatorStyle.TWO:
            return [conv.sep2]
        return [conv.sep]

    # --------------------------------------------------------------- generate
    def chat(
        self,
        questions: Sequence[str],
        images: Sequence[Any],
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
    ) -> List[str]:
        """Batched VQA: build prompts, preprocess images, greedy/sampled decode.

        anyres configs tile each image on its best grid (mm_utils.py:238-288),
        encode all tiles batched, and splice via host-computed gather indices
        (data/anyres.py); tile counts are padded to the batch max with zero tiles
        (their rows are never gathered)."""
        prompts = [self.build_prompt(q) for q in questions]
        d = self.cfg.distill
        anyres = self.cfg.image_aspect_ratio == "anyres" and self.grid_pinpoints

        if anyres:
            from visper_lm_tpu.data.anyres import anyres_index_plan

            tile_lists = process_images(
                list(images), image_aspect_ratio="anyres",
                image_size=self.cfg.vision.image_size,
                grid_pinpoints=self.grid_pinpoints,
            )
            raw_plans = [
                anyres_index_plan(
                    im.size, self.grid_pinpoints,
                    tile_size=self.cfg.vision.image_size,
                    patch_side=self.cfg.vision.num_patches_per_side,
                    merge_type=self.cfg.mm_patch_merge_type,
                )
                for im in images
            ]
            max_tiles = max(t.shape[0] for t in tile_lists)
            per_tile = self.cfg.vision.num_patches
            # tiles are padded to the batch max; the newline row then lives at
            # max_tiles*per_tile in the encoded buffer — remap each sample's own
            # newline index to that slot
            index_plans = []
            for idx, nl in raw_plans:
                idx = idx.copy()
                idx[idx == nl] = max_tiles * per_tile
                index_plans.append(idx)
            size = self.cfg.vision.image_size
            pixels = np.zeros(
                (len(images), max_tiles, size, size, 3), dtype=np.float32
            )
            for i, tiles in enumerate(tile_lists):
                pixels[i, : tiles.shape[0]] = tiles
            token_counts = [idx.shape[0] for idx in index_plans]
        else:
            pixels = np.asarray(
                process_images(
                    list(images),
                    image_aspect_ratio=self.cfg.image_aspect_ratio,
                    image_size=self.cfg.vision.image_size,
                ),
                dtype=np.float32,
            )
            index_plans = [None] * len(images)
            token_counts = [self.cfg.num_image_tokens] * len(images)

        raw_len = max(
            len(tokenizer_image_token(p, self.tokenizer)) for p in prompts
        )
        spliced = raw_len + max(token_counts) + (
            d.num_task_tokens * len(d.task_order()) if d else 0
        )
        pad_to = min(-(-spliced // 128) * 128, self.context_len)

        plans = [
            build_splice_plan(
                tokenizer_image_token(p, self.tokenizer),
                None,
                pad_to,
                num_image_tokens=self.cfg.num_image_tokens,
                num_task_tokens=d.num_task_tokens if d else 0,
                num_tasks=len(d.task_order()) if d else 0,
                image_feature_indices=[index_plans[i]] if index_plans[i] is not None else None,
            )
            for i, p in enumerate(prompts)
        ]
        batch = left_pad_plans(plans, pad_to)
        batch["images"] = pixels

        eos_ids = []
        for s in self.stop_strings():
            try:
                ids = self.tokenizer(s).input_ids
                ids = [i for i in ids if i != getattr(self.tokenizer, "bos_token_id", None)]
                if len(ids) == 1:
                    eos_ids.append(ids[0])
            except Exception:
                pass
        if getattr(self.tokenizer, "eos_token_id", None) is not None:
            eos_ids.append(self.tokenizer.eos_token_id)

        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            eos_token_ids=tuple(eos_ids),
            stop_strings=tuple(self.stop_strings()),
        )
        gen = Generator(self.params, self.cfg, gen_cfg, len(prompts), pad_to)
        out = gen.generate(batch, tokenizer=self.tokenizer)
        if gen_cfg.stop_strings:
            return [t.strip() for t in out]
        return [
            self.tokenizer.decode(ids, skip_special_tokens=True).strip() for ids in out
        ]

    # ------------------------------------------------ visual interpretations
    def get_visual_interpretations(
        self, question: str, image: Any
    ) -> Dict[str, Any]:
        """Forward the multimodal prompt and run every distillation head on its
        tapped layer (reference get_visual_interpretations, base_ola_vlm.py:537-576).
        Returns {task: {layer_index: (B, num_tokens, dim) prediction}}."""
        assert self.cfg.distill is not None, "model has no distillation heads"
        prompt = self.build_prompt(question)
        pixels = process_images(
            [image], image_aspect_ratio="square",
            image_size=self.cfg.vision.image_size,
        )
        raw = tokenizer_image_token(prompt, self.tokenizer)
        d = self.cfg.distill
        spliced = len(raw) + self.cfg.num_image_tokens + d.num_task_tokens * len(
            d.task_order()
        )
        pad_to = -(-spliced // 128) * 128
        plan = build_splice_plan(
            raw, None, pad_to,
            num_image_tokens=self.cfg.num_image_tokens,
            num_task_tokens=d.num_task_tokens,
            num_tasks=len(d.task_order()),
        )
        batch = {
            "text_ids": jnp.asarray(plan.text_ids)[None],
            "token_type": jnp.asarray(plan.token_type)[None],
            "src_index": jnp.asarray(plan.src_index)[None],
            "seq_lengths": jnp.asarray([plan.seq_length]),
            "images": jnp.asarray(pixels, dtype=jnp.float32),
        }
        out = vlm_forward(self.params, self.cfg, batch, tap=True)
        preds = predict_task_embeddings(
            self.params, self.cfg, out["taps"], out["tap_layers"]
        )
        result: Dict[str, Any] = {}
        for tcfg in d.tasks:
            result[tcfg.task] = {
                layer: np.asarray(pred)
                for layer, pred in zip(tcfg.layer_indices, preds[tcfg.task])
            }
        return result
