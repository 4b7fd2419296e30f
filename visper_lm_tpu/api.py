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
import functools
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


def config_for_model_name(model_name: str, distill: Optional[bool] = None) -> VLMConfig:
    """Model-zoo dispatch by substring (reference builder.py:26-191):
    'phi' -> Phi3 family, 'vicuna'/'v1.5' -> Vicuna-7b, else Llama3-8b;
    'dsg'/'ola' -> distillation heads on; 'convnext' -> ConvNeXt-XXL tower."""
    from visper_lm_tpu.config import vicuna_clip_vlm, with_convnext_tower

    name = model_name.lower()
    if distill is None:
        distill = "dsg" in name or "ola" in name
    if "phi" in name:
        cfg = phi3_clip_vlm(distill=distill)
    elif "vicuna" in name or "v1.5" in name:
        cfg = vicuna_clip_vlm(distill=distill)
    else:
        cfg = llama3_clip_vlm(distill=distill)
    if "convnext" in name:
        cfg = with_convnext_tower(cfg)
    return cfg


def config_from_hf_json(hf: Dict[str, Any]) -> VLMConfig:
    """Build a VLMConfig from a reference checkpoint's self-describing config.json
    (the denormalized dicts ola_vlm_train.py:1196-1231 injects)."""
    import dataclasses as dc

    from visper_lm_tpu.config import (
        DecoderConfig,
        DistillConfig,
        DistillTaskConfig,
        ProjectorConfig,
        ResamplerConfig,
        CLIP_VIT_L_336,
        CONVNEXT_XXL_768,
    )

    mt = hf.get("model_type", "")
    family = "phi3" if "phi" in mt else "llama"
    decoder = DecoderConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf["hidden_size"] // hf["num_attention_heads"],
        mlp_dim=hf["intermediate_size"],
        rope_theta=hf.get("rope_theta", 10000.0),
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_seq_len=min(hf.get("max_position_embeddings", 4096), 4096),
        family=family,
    )
    tower = hf.get("mm_vision_tower", "clip")
    use_convnext = "convnext" in tower.lower()
    mm_hidden = hf.get("mm_hidden_size", 3072 if use_convnext else 1024)

    tasks = []
    spec_keys = {"gen": "image_gen", "seg": "image_seg", "depth": "image_depth"}
    dims = {"gen": (1024, 1), "seg": (1536, 576), "depth": (1024, 576)}
    for task, key in spec_keys.items():
        d = hf.get(key)
        if not d:
            continue
        layers = d.get(f"{'img' if task == 'gen' else task}_layer_indices")
        weight = d.get(f"{'img' if task == 'gen' else task}_loss_weight", 0.5)
        head = ResamplerConfig(
            depth=d.get("depth", 1),
            dim_head=d.get("dim_head", 32),
            num_heads=d.get("num_heads", 4),
            num_tokens=d.get("num_tokens", dims[task][1]),
            output_dim=d.get("output_dim", dims[task][0]),
            ff_mult=d.get("ff_mult", 1),
        )
        tdim, ttok = dims[task]
        tasks.append(
            DistillTaskConfig(
                task=task,
                layer_indices=tuple(int(i) - 1 for i in layers)
                if layers
                else (decoder.num_layers - 1,),
                loss_weight=float(weight),
                head=head,
                target_dim=tdim,
                target_tokens=ttok,
            )
        )
    distill = None
    if tasks:
        distill = DistillConfig(
            num_task_tokens=hf.get("num_task_tokens", 8),
            contrastive_loss_weight=hf.get("contrastive_loss_weight", 0.3),
            tasks=tuple(tasks),
        )

    if "phi" in mt:
        template, sys_tokens = "llava_phi_3", 13
    elif decoder.vocab_size >= 100000:
        template, sys_tokens = "llava_llama_3", 38
    else:
        template, sys_tokens = "vicuna_v1", 26

    cfg = VLMConfig(
        decoder=decoder,
        vision=CLIP_VIT_L_336,
        projector=ProjectorConfig(input_dim=mm_hidden, output_dim=decoder.hidden_size),
        distill=distill,
        conv_template=template,
        num_sys_tokens=sys_tokens,
        image_aspect_ratio=hf.get("image_aspect_ratio", "square"),
        mm_patch_merge_type=hf.get("mm_patch_merge_type", "flat"),
        use_convnext_tower=use_convnext,
        convnext=CONVNEXT_XXL_768 if use_convnext else None,
    )
    return cfg


def fixup_tokenizer(tokenizer, hf_config: Dict[str, Any]):
    """Reference tokenizer fixup (builder.py:176-183): register the image patch /
    start / end special tokens the checkpoint was trained with."""
    from visper_lm_tpu.constants import (
        DEFAULT_IM_END_TOKEN,
        DEFAULT_IM_START_TOKEN,
        DEFAULT_IMAGE_PATCH_TOKEN,
    )

    if tokenizer is None:
        return tokenizer
    if hf_config.get("mm_use_im_patch_token", True):
        tokenizer.add_tokens([DEFAULT_IMAGE_PATCH_TOKEN], special_tokens=True)
    if hf_config.get("mm_use_im_start_end", False):
        tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN], special_tokens=True
        )
    return tokenizer


@dataclasses.dataclass
class VisperModel:
    cfg: VLMConfig
    params: Any
    tokenizer: Any = None
    context_len: int = 4096
    # anyres grid (reference image_grid_pinpoints, train.py:1040)
    grid_pinpoints: Any = "[[336,672],[672,336],[672,672],[1008,336],[336,1008]]"
    # Serving quantization policy: None = auto (ON on TPU — the bench-measured
    # 801 tok/s config: int8 KV cache + w8a16 decoder weights — OFF elsewhere).
    # Greedy-token parity with bf16 on the tiny model is guarded by
    # tests/test_serving_quant.py; per-call override via chat(kv_quant=...).
    kv_quant: Optional[bool] = None
    weight_quant: Optional[bool] = None
    _gen_cache: Dict[Any, Any] = dataclasses.field(
        default_factory=dict, repr=False
    )
    _serving_params: Any = dataclasses.field(default=None, repr=False)

    def _resolve_quant(self, kv, wq):
        auto = jax.default_backend() == "tpu"
        kv = self.kv_quant if kv is None else kv
        wq = self.weight_quant if wq is None else wq
        kv = auto if kv is None else bool(kv)
        # weight_quant may be the string "int4" (w4a16 opt-in); keep it intact
        if wq is None:
            wq = auto
        elif not isinstance(wq, str):
            wq = bool(wq)
        return kv, wq

    def _quantized_params(self, mode="int8", calibration=None):
        """Serving copy of the decoder weights (w8a16 or w4a16), quantized once
        per (mode, calibration) and reused across Generators (shape buckets)."""
        if not isinstance(self._serving_params, dict):
            self._serving_params = {}
        key = mode if calibration is None else (mode, id(calibration))
        if key not in self._serving_params:
            from visper_lm_tpu.utils.param import (
                quantize_linear_weights,
                quantize_linear_weights_int4,
            )

            if mode == "int4":
                quantize = functools.partial(
                    quantize_linear_weights_int4, act_rms=calibration
                )
            else:
                quantize = quantize_linear_weights
            p = dict(self.params)
            p["decoder"] = quantize(p["decoder"])
            self._serving_params[key] = p
        return self._serving_params[key]

    def _generator(self, gen_cfg: GenerationConfig, batch_size: int, pad_to: int):
        """Generators are cached by (shapes, config): a fresh Generator per
        call would re-trace the jitted prefill/step and re-quantize weights."""
        def _hashable(v):
            # content-keyed for plain config values; identity-keyed for array
            # payloads (e.g. a calibration act-RMS dict — pass the same object
            # to share the cached Generator)
            if isinstance(v, (int, float, str, bool, type(None))):
                return v
            if isinstance(v, (list, tuple)):
                return tuple(_hashable(u) for u in v)
            if isinstance(v, dict):
                return tuple(sorted((k, id(u)) for k, u in v.items()))
            return id(v)

        cfg_parts = tuple(
            _hashable(getattr(gen_cfg, f.name))
            for f in dataclasses.fields(gen_cfg)
        )
        key = (batch_size, pad_to, cfg_parts)
        gen = self._gen_cache.get(key)
        if gen is not None:
            # LRU refresh: each cached Generator holds jitted prefill/decode
            # executables, so the cache is bounded (varied max_new_tokens or
            # pad buckets would otherwise accumulate compiled state forever)
            self._gen_cache.pop(key)
            self._gen_cache[key] = gen
        if gen is None:
            params = self.params
            if gen_cfg.weight_quant:
                params = self._quantized_params(
                    "int4" if gen_cfg.weight_quant == "int4" else "int8",
                    calibration=gen_cfg.calibration,
                )
                # params already carry kernel_q8; linear() auto-detects, so the
                # Generator must not quantize again
                gen_cfg = dataclasses.replace(gen_cfg, weight_quant=False)
            gen = Generator(params, self.cfg, gen_cfg, batch_size, pad_to)
            self._gen_cache[key] = gen
            while len(self._gen_cache) > 8:
                self._gen_cache.pop(next(iter(self._gen_cache)))
        return gen

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
        cfg_json = os.path.join(model_dir, "config.json")
        hf_cfg: Dict[str, Any] = {}
        if os.path.exists(cfg_json):
            import json

            hf_cfg = json.load(open(cfg_json))
        if hf_cfg.get("visper_config"):
            # our own exports carry the complete VLMConfig (hf_export.
            # save_hf_checkpoint) — lossless round trip
            from visper_lm_tpu.config import config_from_json

            cfg = config_from_json(json.dumps(hf_cfg["visper_config"]))
        elif hf_cfg.get("hidden_size"):
            cfg = config_from_hf_json(hf_cfg)  # self-describing checkpoint
        else:
            cfg = config_for_model_name(model_name)
        sd = load_sharded_safetensors(model_dir)
        params = to_jax(import_vlm(sd, cfg), dtype=dtype)
        tokenizer = fixup_tokenizer(tokenizer, hf_cfg)
        context_len = int(hf_cfg.get("max_sequence_length", 4096))
        return cls(
            cfg=cfg, params=params, tokenizer=tokenizer, context_len=context_len
        )

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

    def _eos_ids(self) -> List[int]:
        """Single-token stop strings + the tokenizer eos, for on-device stops."""
        eos_ids = []
        for s in self.stop_strings():
            try:
                ids = self.tokenizer(s).input_ids
                ids = [
                    i for i in ids
                    if i != getattr(self.tokenizer, "bos_token_id", None)
                ]
                if len(ids) == 1:
                    eos_ids.append(ids[0])
            except Exception:
                pass
        if getattr(self.tokenizer, "eos_token_id", None) is not None:
            eos_ids.append(self.tokenizer.eos_token_id)
        return eos_ids

    # --------------------------------------------------------------- generate
    def chat(
        self,
        questions: Sequence[str],
        images: Sequence[Any],
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        stream_callback: Optional[Any] = None,
        kv_quant: Optional[bool] = None,
        weight_quant: Optional[bool] = None,
    ) -> List[str]:
        """Batched VQA: build prompts, preprocess images, greedy/sampled decode.

        stream_callback(text_delta) streams sample 0's decoded text
        incrementally (the reference's TextIteratorStreamer surface,
        demo.py:286-350); deltas arrive per decode chunk. The full strings are
        still returned.

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

        eos_ids = self._eos_ids()

        kvq, wq = self._resolve_quant(kv_quant, weight_quant)
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            eos_token_ids=tuple(eos_ids),
            stop_strings=tuple(self.stop_strings()),
            kv_quant=kvq,
            weight_quant=wq,
        )
        streamer = None
        if stream_callback is not None:
            # smaller device chunks -> lower first-token/update latency
            gen_cfg = dataclasses.replace(gen_cfg, decode_chunk=4)
            state = {"ids": [], "emitted": "", "done": False}
            eos_set = set(eos_ids)
            stops = tuple(self.stop_strings())

            def streamer(row, accepted):
                if state["done"] or not accepted[0]:
                    return
                tok = int(row[0])
                if tok in eos_set:
                    state["done"] = True
                    return
                state["ids"].append(tok)
                text = self.tokenizer.decode(
                    state["ids"], skip_special_tokens=True
                )
                for s in stops:
                    idx = text.find(s)
                    if idx >= 0:
                        text = text[:idx]
                        state["done"] = True
                if not state["done"]:
                    # hold back trailing replacement chars: byte-fallback
                    # tokenizers decode a split multi-byte char as U+FFFD
                    # until its remaining bytes arrive — emitting it would
                    # bake the placeholder into the stream
                    text = text.rstrip("�")
                # emit only append-extensions of what was already streamed;
                # if the decode rewrote earlier characters, wait for it to
                # stabilize (the non-streamed return value is always exact)
                if len(text) > len(state["emitted"]) and text.startswith(
                    state["emitted"]
                ):
                    stream_callback(text[len(state["emitted"]):])
                    state["emitted"] = text

        gen = self._generator(gen_cfg, len(prompts), pad_to)
        out = gen.generate(batch, tokenizer=self.tokenizer, streamer=streamer)
        if gen_cfg.stop_strings:
            return [t.strip() for t in out]
        return [
            self.tokenizer.decode(ids, skip_special_tokens=True).strip() for ids in out
        ]

    def serve(
        self,
        questions: Sequence[str],
        images: Sequence[Any],
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        num_slots: int = 8,
        cache_len: Optional[int] = None,
        kv_quant: Optional[bool] = None,
        weight_quant: Optional[bool] = None,
        decode_quantum: int = 8,
        spec_k: int = 0,
        spec_quantum: int = 4,
        admit_group: int = 8,
        admit_defer: int = 4,
    ) -> List[str]:
        """Continuous-batching VQA (serve/engine.py): answers in question order.

        Unlike chat(), no request waits for the batch-longest sample — a slot
        refills from the queue the moment its request retires, so mixed-length
        workloads keep the decode batch full. Greedy outputs are token-exact
        with chat() (tests/test_engine.py). Use for large mixed-length queues;
        chat() remains the right call for a handful of similar prompts.

        decode_quantum is the latency<->throughput dial on remote-relay
        links: 8 for chat-grade first-token latency, 64 for offline sweeps
        (measured to beat static batching e2e, BASELINE.md round-5 table).
        admit_group/admit_defer control fused group admission and the
        retirement-pooling hysteresis."""
        from visper_lm_tpu.serve.engine import Engine, EngineConfig, Request

        prompts = [self.build_prompt(q) for q in questions]
        d = self.cfg.distill
        anyres = self.cfg.image_aspect_ratio == "anyres" and self.grid_pinpoints
        size = self.cfg.vision.image_size

        reqs = []
        stops = tuple(self.stop_strings())
        eos_ids = tuple(self._eos_ids())
        for i, (p, im) in enumerate(zip(prompts, images)):
            if anyres:
                from visper_lm_tpu.data.anyres import anyres_index_plan

                tiles = process_images(
                    [im], image_aspect_ratio="anyres", image_size=size,
                    grid_pinpoints=self.grid_pinpoints,
                )[0]
                idx, _ = anyres_index_plan(
                    im.size, self.grid_pinpoints, tile_size=size,
                    patch_side=self.cfg.vision.num_patches_per_side,
                    merge_type=self.cfg.mm_patch_merge_type,
                )
                pixels = np.asarray(tiles, dtype=np.float32)[None]
                feature_indices = [idx]
            else:
                pixels = np.asarray(
                    process_images(
                        [im], image_aspect_ratio=self.cfg.image_aspect_ratio,
                        image_size=size,
                    ),
                    dtype=np.float32,
                )
                feature_indices = None
            plan = build_splice_plan(
                tokenizer_image_token(p, self.tokenizer), None,
                self.context_len,
                num_image_tokens=self.cfg.num_image_tokens,
                num_task_tokens=d.num_task_tokens if d else 0,
                num_tasks=len(d.task_order()) if d else 0,
                image_feature_indices=feature_indices,
            )
            reqs.append(Request(
                plan=plan, images=pixels, max_new_tokens=max_new_tokens,
                eos_token_ids=eos_ids, stop_strings=stops, uid=i,
            ))

        kvq, wq = self._resolve_quant(kv_quant, weight_quant)
        params = self.params
        if wq:
            # share the one quantized serving copy with chat()'s Generators
            params = self._quantized_params(
                "int4" if wq == "int4" else "int8"
            )
        if cache_len is None:
            # prompts left-pad to a 128 bucket inside the engine, so capacity
            # must cover the BUCKETED prompt plus the decode budget
            longest = max(r.plan.seq_length for r in reqs)
            bucket = -(-longest // 128) * 128
            cache_len = min(
                -(-(bucket + max_new_tokens + 1) // 128) * 128,
                self.context_len,
            )
        n_slots = min(num_slots, len(reqs))
        eng = Engine(params, self.cfg, EngineConfig(
            num_slots=n_slots, max_len=cache_len, temperature=temperature,
            kv_quant=kvq, weight_quant=False,
            # host-round-trip schedulers (BASELINE.md "Serving engine under
            # link latency"): N decode tokens per sync; optional greedy
            # speculative rounds fully in-graph
            decode_quantum=decode_quantum,
            spec_k=spec_k if temperature == 0.0 else 0,
            spec_quantum=spec_quantum if temperature == 0.0 else 0,
            admit_group=admit_group, admit_defer=admit_defer,
        ), tokenizer=self.tokenizer)
        finished = eng.run(reqs)
        texts = eng.decode_texts(finished)
        return [texts[i] for i in range(len(reqs))]

    def chat_session(self, image: Any = None, **kw) -> "ChatSession":
        """Open a multi-turn chat session with prefix-cached history: each
        turn prefills only its new tokens (see ChatSession)."""
        return ChatSession(self, image, **kw)

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


class ChatSession:
    """Multi-turn chat with prefix-cached history.

    The reference demo re-runs HF generate over the WHOLE conversation every
    turn (/root/reference/demo.py:286-350: the chatbot state is re-templated
    and re-prefilled from scratch). A session instead keeps the conversation's
    KV in a serve.engine.PrefixHandle: each turn prefills only the new tokens
    (user message + the previous reply's extension), so turn latency is
    O(new tokens), not O(history).

    Robustness: the handle is only reused when the freshly templated prompt's
    token ids literally extend the session's cached ids (BPE can merge across
    text boundaries); on any mismatch the turn transparently falls back to a
    full prefill — exactness never depends on tokenizer prefix stability.

        session = model.chat_session(image)
        a1 = session.ask("What is in the image?")
        a2 = session.ask("What color is it?")        # prefills only this turn
    """

    def __init__(self, model: VisperModel, image: Any = None, *,
                 num_slots: int = 1,
                 kv_quant: Optional[bool] = None,
                 weight_quant: Optional[bool] = None):
        from visper_lm_tpu.serve.engine import Engine, EngineConfig

        self.model = model
        self.conv = conversation_lib.conv_templates[model.cfg.conv_template].copy()
        self._pixels = None
        if image is not None:
            self._pixels = np.asarray(
                process_images(
                    [image],
                    image_aspect_ratio=model.cfg.image_aspect_ratio
                    if model.cfg.image_aspect_ratio != "anyres" else "square",
                    image_size=model.cfg.vision.image_size,
                ),
                dtype=np.float32,
            )
        kvq, wq = model._resolve_quant(kv_quant, weight_quant)
        params = model.params
        if wq:
            params = model._quantized_params("int4" if wq == "int4" else "int8")
        self.engine = Engine(
            params, model.cfg,
            EngineConfig(num_slots=num_slots, max_len=model.context_len,
                         kv_quant=kvq),
            tokenizer=model.tokenizer,
        )
        self._prefix = None
        self._ids: List[int] = []
        self._turns = 0

    def _plan(self, ids: Sequence[int]):
        d = self.model.cfg.distill
        return build_splice_plan(
            list(ids), None, self.model.context_len,
            num_image_tokens=self.model.cfg.num_image_tokens,
            num_task_tokens=d.num_task_tokens if d else 0,
            num_tasks=len(d.task_order()) if d else 0,
        )

    def ask(self, question: str, *, max_new_tokens: int = 256,
            stream_callback: Optional[Any] = None) -> str:
        model = self.model
        if self._turns == 0 and self._pixels is not None \
                and DEFAULT_IMAGE_TOKEN not in question:
            question = DEFAULT_IMAGE_TOKEN + "\n" + question
        self.conv.append_message(self.conv.roles[0], question)
        self.conv.append_message(self.conv.roles[1], None)
        full_ids = tokenizer_image_token(self.conv.get_prompt(), model.tokenizer)

        from visper_lm_tpu.serve.engine import Request

        n = len(self._ids)
        bucket = self.engine.ecfg.prompt_bucket

        def fits(prefix_len: int, n_tokens: int) -> bool:
            pad = -(-max(n_tokens, 1) // bucket) * bucket
            return prefix_len + pad + max_new_tokens + 1 <= self.engine.ecfg.max_len

        reuse = (
            self._prefix is not None
            and len(full_ids) > n
            and list(full_ids[:n]) == list(self._ids)
            and fits(self._prefix.length, len(full_ids) - n)
        )
        delta_ids = list(full_ids[n:]) if reuse else list(full_ids)

        stops = tuple(model.stop_strings())
        streamer = None
        if stream_callback is not None:
            state = {"ids": [], "emitted": ""}
            eos_set = set(model._eos_ids())

            def streamer(tok: int) -> None:
                if tok in eos_set:
                    return
                state["ids"].append(tok)
                text = model.tokenizer.decode(
                    state["ids"], skip_special_tokens=True
                )
                for s in stops:
                    idx = text.find(s)
                    if idx >= 0:
                        text = text[:idx]
                # lstrip so the streamed increments concatenate to the same
                # text ask() returns (BPE leading-space tokens would otherwise
                # stream whitespace the stripped final answer lacks); trailing
                # whitespace may still stream before the stop is known
                text = text.lstrip().rstrip("�")
                if len(text) > len(state["emitted"]) and text.startswith(
                    state["emitted"]
                ):
                    stream_callback(text[len(state["emitted"]):])
                    state["emitted"] = text

        req = Request(
            plan=self._plan(delta_ids),
            prefix=self._prefix if reuse else None,
            images=None if reuse else self._pixels,
            max_new_tokens=max_new_tokens,
            eos_token_ids=tuple(model._eos_ids()),
            stop_strings=stops,
            stream_callback=streamer,
        )
        done = self.engine.run([req])[0]
        text = model.tokenizer.decode(done.output_ids, skip_special_tokens=True)
        for s in stops:
            idx = text.find(s)
            if idx >= 0:
                text = text[:idx]
        text = text.strip()
        self.conv.messages[-1][-1] = text

        # grow the cached prefix by this turn so the next turn can continue
        # from it: harvest the slot's ALREADY-COMPUTED KV (prompt + decoded
        # tokens) into the handle — zero extra forward passes. The cache holds
        # KV for everything but the last sampled token, so the tracked ids
        # exclude it (the next turn's delta re-includes it naturally).
        base_ids = list(self._ids) if reuse else []
        handle = self.engine.harvest(done)
        if handle is not None:
            self._prefix = handle
            self._ids = base_ids + delta_ids + list(done.output_ids)[:-1]
        else:
            # slot KV already recycled (cannot happen in a single-request
            # session) — fall back to re-prefilling this turn's tokens; when
            # the extension no longer fits the cache, drop the handle so
            # later turns full-prefill instead of overflowing
            turn_ids = delta_ids + list(done.output_ids)
            base_len = self._prefix.length if (reuse and self._prefix) else 0
            if fits(base_len, len(turn_ids)):
                self._prefix = self.engine.prefill_prefix(
                    self._plan(turn_ids),
                    images=None if reuse else self._pixels,
                    prefix=self._prefix if reuse else None,
                )
                self._ids = base_ids + turn_ids
            else:
                self._prefix = None
                self._ids = []
        self._turns += 1
        return text
