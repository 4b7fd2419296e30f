"""Batched multimodal generation: KV-cache prefill + per-step decode.

Replaces the reference's forked HF `_sample` loop (base_lm.py:211-373) and
`prepare_inputs_for_generation` re-injection (base_ola_vlm.py:618-643) with a
TPU-native design:

  * prompts are LEFT-padded to a static bucket length so every sample's next slot is
    batch-uniform (no ragged dynamic writes); invalid left slots are masked with
    kv_starts, rope positions are shifted so the first real token is position 0;
  * prefill is one jitted multimodal forward that also fills the KV cache;
  * each decode step is one jitted call; greedy (temperature 0, the reference's
    benchmark setting, cv-bench.sh:12) or temperature/top-p sampling;
  * stop handling: eos-token set on device + KeywordsStoppingCriteria-equivalent
    string matching on host (mm_utils.py:366-398).

The distillation heads do NOT run during decode (the reference pays that overhead on
every prefill, SURVEY.md §3.2 note).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu import constants
from visper_lm_tpu.config import VLMConfig
from visper_lm_tpu.data.collate import SplicePlan
from visper_lm_tpu.models import decoder as dec
from visper_lm_tpu.models.vlm import encode_images, splice_embeddings


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 128
    temperature: float = 0.0
    top_p: float = 1.0
    eos_token_ids: Tuple[int, ...] = ()
    stop_strings: Tuple[str, ...] = ()
    pad_to: Optional[int] = None      # static prompt bucket; default next mult of 128
    # tokens decoded per jitted call (lax.scan on device). Host round-trips through
    # the runtime happen once per chunk instead of once per token; stop conditions
    # are evaluated at chunk boundaries (over-generated tokens are trimmed).
    decode_chunk: int = 16
    # int8 KV cache (per-token-head scales): halves cache HBM footprint/bandwidth,
    # unlocking larger decode batches (dense bf16 cache + weights exceed HBM at
    # phi3 batch 8 on one 16 GB chip)
    kv_quant: bool = False
    # Serving weights: True/"int8" = w8a16 per-output-channel int8 decoder
    # kernels (exact scale folding, token-parity-safe; halves decode weight
    # streaming); "int4" = w4a16 group-wise int4 (quarter bandwidth, ~10% rms
    # weight noise — opt-in quality tradeoff). The Generator quantizes its own
    # copy at init.
    weight_quant: object = False
    # Optional AWQ activation calibration for "int4": the act-RMS dict from
    # serve.calibrate.decoder_act_rms (keys matching the decoder projections).
    # Ignored for other weight_quant modes.
    calibration: object = None
    # unroll the decode layer loop (static weight/cache slices, scheduler-
    # pipelined DMA). Measured on v5e at B8/S1024/int8: 19.23 ms/step vs 18.99
    # scanned — the scan is NOT the decode bottleneck (weight streaming is), so
    # the default avoids the 32x compile-size cost.
    decode_unroll: bool = False


def left_pad_plans(plans: Sequence[SplicePlan], pad_to: int) -> Dict[str, np.ndarray]:
    """Stack plans left-padded to pad_to. Returns batch dict + pad_offsets."""
    b = len(plans)
    text_ids = np.zeros((b, pad_to), dtype=np.int32)
    token_type = np.full((b, pad_to), constants.SEG_PAD, dtype=np.int32)
    src_index = np.zeros((b, pad_to), dtype=np.int32)
    offsets = np.zeros((b,), dtype=np.int32)
    for i, p in enumerate(plans):
        n = p.seq_length
        assert n <= pad_to, (n, pad_to)
        off = pad_to - n
        offsets[i] = off
        text_ids[i, off:] = p.text_ids[:n]
        token_type[i, off:] = p.token_type[:n]
        src_index[i, off:] = p.src_index[:n]
    return {
        "text_ids": text_ids,
        "token_type": token_type,
        "src_index": src_index,
        "pad_offsets": offsets,
    }


def right_pad_plans(plans: Sequence[SplicePlan], pad_to: int) -> Dict[str, np.ndarray]:
    """Stack plans right-padded to pad_to (prefix-continuation prefill: the
    valid tokens must sit flush against the cached prefix, so padding goes at
    the end; `seq_lengths` marks where each sample's real tokens stop)."""
    b = len(plans)
    text_ids = np.zeros((b, pad_to), dtype=np.int32)
    token_type = np.full((b, pad_to), constants.SEG_PAD, dtype=np.int32)
    src_index = np.zeros((b, pad_to), dtype=np.int32)
    seq_lengths = np.zeros((b,), dtype=np.int32)
    for i, p in enumerate(plans):
        n = p.seq_length
        assert n <= pad_to, (n, pad_to)
        seq_lengths[i] = n
        text_ids[i, :n] = p.text_ids[:n]
        token_type[i, :n] = p.token_type[:n]
        src_index[i, :n] = p.src_index[:n]
    return {
        "text_ids": text_ids,
        "token_type": token_type,
        "src_index": src_index,
        "seq_lengths": seq_lengths,
    }


def _sample_tokens(logits: jax.Array, gen_cfg: GenerationConfig, key: jax.Array) -> jax.Array:
    if gen_cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / gen_cfg.temperature
    if gen_cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gen_cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


class Generator:
    """Compiled prefill + step functions for a fixed (batch, prompt_len, max_len)."""

    def __init__(
        self,
        params: Any,
        cfg: VLMConfig,
        gen_cfg: GenerationConfig,
        batch_size: int,
        prompt_len: int,
        cache_dtype=jnp.bfloat16,
    ):
        from visper_lm_tpu.models.decoder import normalize_stream_layout

        # a stream_grads-trained tree carries decoder['blocks_chunks'];
        # decode needs the stacked layout (cacheless chunked forward is
        # training-only)
        params = normalize_stream_layout(params)
        self.params = params
        self.cfg = cfg
        self.gen_cfg = gen_cfg
        self.batch_size = batch_size
        self.prompt_len = prompt_len
        chunk = max(gen_cfg.decode_chunk, 1)
        n_chunks = -(-gen_cfg.max_new_tokens // chunk)
        # round the cache length to a multiple of 128 so the Pallas decode
        # kernel gets well-tiled KV blocks (positions past the valid length are
        # masked; the extra slots cost only cache zeros)
        self.max_len = -(-(prompt_len + n_chunks * chunk + 1) // 128) * 128
        self.cache_dtype = cache_dtype
        if gen_cfg.weight_quant:
            from visper_lm_tpu.utils.param import (
                quantize_linear_weights,
                quantize_linear_weights_int4,
            )

            if gen_cfg.weight_quant == "int4":
                quantize = functools.partial(
                    quantize_linear_weights_int4, act_rms=gen_cfg.calibration
                )
            else:
                quantize = quantize_linear_weights
            self.params = dict(self.params)
            self.params["decoder"] = quantize(self.params["decoder"])
        self._prefill = jax.jit(self._prefill_impl)
        # DONATE the cache: without it XLA must preserve the input cache buffer,
        # doubling cache HBM (2x3.8 GiB at B16 = the batch-16 OOM) and forcing a
        # full cache copy every decode step instead of in-place token writes
        self._step = jax.jit(self._step_impl, donate_argnums=(1,))

    def _prefill_impl(self, params, batch):
        cfg = self.cfg
        if "image_features" in batch:
            image_features = batch["image_features"]
        else:
            image_features = encode_images(params, cfg, batch["images"])
        embeds = splice_embeddings(
            params, cfg, batch["text_ids"], batch["token_type"], batch["src_index"],
            image_features,
        )
        offsets = batch["pad_offsets"]
        positions = jnp.maximum(
            jnp.arange(self.prompt_len)[None, :] - offsets[:, None], 0
        )
        if self.gen_cfg.kv_quant:
            cache = dec.init_quant_kv_cache(cfg.decoder, self.batch_size, self.max_len)
        else:
            cache = dec.init_kv_cache(
                cfg.decoder, self.batch_size, self.max_len, dtype=self.cache_dtype
            )
        out = dec.decoder_forward(
            params["decoder"], cfg.decoder, embeds,
            positions=positions,
            kv_lengths=jnp.full((self.batch_size,), self.prompt_len, jnp.int32),
            kv_starts=offsets,
            cache=cache, q_offset=0, tap_layers=(),
            compute_logits=False,
        )
        # only the LAST position's logits are needed: the full (B, T, vocab)
        # f32 tensor is ~1.6 GiB at B16xT768 and was the prefill OOM at batch 16
        last = out["hidden"][:, -1]
        dp = params["decoder"]
        if cfg.decoder.tie_embeddings:
            next_logits = (last @ dp["embed_tokens"]["embedding"].T).astype(jnp.float32)
        else:
            from visper_lm_tpu.utils.param import linear

            next_logits = linear(dp["lm_head"], last).astype(jnp.float32)
        return next_logits, out["cache"]

    def _step_impl(self, params, cache, token, step, offsets, key):
        """Decode gen_cfg.decode_chunk tokens in one compiled call (device scan)."""
        cfg = self.cfg
        chunk = max(self.gen_cfg.decode_chunk, 1)

        def body(carry, subkey):
            cache, token, step_ = carry
            emb = dec.embed_tokens(params["decoder"], token[:, None])
            slot = self.prompt_len + step_
            positions = (self.prompt_len - offsets + step_)[:, None]
            out = dec.decoder_forward(
                params["decoder"], cfg.decoder, emb,
                positions=positions,
                kv_lengths=jnp.full((self.batch_size,), slot + 1, jnp.int32),
                kv_starts=offsets,
                cache=cache, q_offset=slot, tap_layers=(),
                unroll_layers=self.gen_cfg.decode_unroll,
            )
            next_token = _sample_tokens(out["logits"][:, 0], self.gen_cfg, subkey)
            return (out["cache"], next_token, step_ + 1), next_token

        keys = jax.random.split(key, chunk)
        (cache, _, _), tokens = jax.lax.scan(body, (cache, token, step), keys)
        return tokens, cache  # tokens: (chunk, B)

    def generate(
        self,
        batch: Dict[str, Any],
        *,
        tokenizer=None,
        seed: int = 0,
        streamer=None,
    ) -> List[List[int]]:
        """Run generation; returns generated token ids per sample (without prompt)."""
        gen_cfg = self.gen_cfg
        params = self.params
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        offsets = batch["pad_offsets"]

        logits, cache = self._prefill(params, batch)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        token = _sample_tokens(logits, gen_cfg, sub)

        eos = set(gen_cfg.eos_token_ids)
        outputs: List[List[int]] = [[] for _ in range(self.batch_size)]
        finished = np.zeros((self.batch_size,), dtype=bool)

        def absorb(toks_np: np.ndarray) -> None:
            """toks_np: (n, B) tokens to append, respecting finished/eos/limits.

            streamer(row, accepted) is called per row with accepted[i] = True
            iff row[i] was actually appended to sample i's output (tokens past
            eos/max_new_tokens are decoded on device but dropped here)."""
            for row in toks_np:
                accepted = np.zeros((self.batch_size,), dtype=bool)
                for i in range(self.batch_size):
                    if not finished[i] and len(outputs[i]) < gen_cfg.max_new_tokens:
                        outputs[i].append(int(row[i]))
                        accepted[i] = True
                        if int(row[i]) in eos:
                            finished[i] = True
                if streamer is not None and accepted.any():
                    streamer(row, accepted)
            if gen_cfg.stop_strings and tokenizer is not None:
                for i in range(self.batch_size):
                    if not finished[i]:
                        text = tokenizer.decode(outputs[i], skip_special_tokens=False)
                        if any(s in text for s in gen_cfg.stop_strings):
                            finished[i] = True

        absorb(np.asarray(token)[None])
        step = 0

        def _need_more() -> bool:
            lens = [len(o) for i, o in enumerate(outputs) if not finished[i]]
            return bool(lens) and max(lens) < gen_cfg.max_new_tokens

        while _need_more():
            key, sub = jax.random.split(key)
            chunk_tokens, cache = self._step(
                params, cache, token, jnp.int32(step), offsets, sub
            )
            toks_np = np.asarray(chunk_tokens)      # (chunk, B)
            token = chunk_tokens[-1]
            step += toks_np.shape[0]
            absorb(toks_np)

        # strip trailing eos and anything after stop strings (host-side cleanup)
        if gen_cfg.stop_strings and tokenizer is not None:
            cleaned = []
            for ids in outputs:
                text = tokenizer.decode(ids, skip_special_tokens=False)
                for s in gen_cfg.stop_strings:
                    idx = text.find(s)
                    if idx >= 0:
                        text = text[:idx]
                cleaned.append(text)
            return cleaned
        return outputs


def greedy_decode_text(
    params: Any,
    cfg: VLMConfig,
    plans: Sequence[SplicePlan],
    images: np.ndarray,
    tokenizer,
    *,
    max_new_tokens: int = 128,
    stop_strings: Sequence[str] = (),
    eos_token_ids: Sequence[int] = (),
    kv_quant: Optional[bool] = None,
    weight_quant: Optional[bool] = None,
) -> List[str]:
    """Convenience wrapper: plans+images -> decoded strings.

    kv_quant/weight_quant default to the measured serving config on TPU
    (int8 KV + w8a16 weights, the bench_decode numbers) and bf16 elsewhere —
    same policy as api.VisperModel."""
    if kv_quant is None:
        kv_quant = jax.default_backend() == "tpu"
    if weight_quant is None:
        weight_quant = jax.default_backend() == "tpu"
    longest = max(p.seq_length for p in plans)
    pad_to = -(-longest // 128) * 128
    batch = left_pad_plans(plans, pad_to)
    batch["images"] = images
    gen_cfg = GenerationConfig(
        max_new_tokens=max_new_tokens,
        eos_token_ids=tuple(eos_token_ids),
        stop_strings=tuple(stop_strings),
        kv_quant=bool(kv_quant),
        # keep "int4" intact — bool() would silently downgrade it to w8a16
        weight_quant=weight_quant if isinstance(weight_quant, str)
        else bool(weight_quant),
    )
    gen = Generator(params, cfg, gen_cfg, len(plans), pad_to)
    out = gen.generate(batch, tokenizer=tokenizer)
    if stop_strings:
        return [t.strip() for t in out]
    return [tokenizer.decode(ids, skip_special_tokens=True).strip() for ids in out]


def _selftest():
    """Tiny random-model decode selftest (CPU)."""
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX
    from visper_lm_tpu.data.collate import build_splice_plan
    from visper_lm_tpu.models.vlm import init_vlm

    cfg = tiny_test_vlm(distill=True)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    plans = []
    for b in range(2):
        ids = [1, 2, 3, IMAGE_TOKEN_INDEX] + list(rng.integers(4, 400, size=5 + 3 * b))
        plans.append(
            build_splice_plan(
                ids, None, 128,
                num_image_tokens=cfg.num_image_tokens,
                num_task_tokens=cfg.distill.num_task_tokens,
                num_tasks=3,
            )
        )
    images = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    batch = left_pad_plans(plans, 128)
    batch["images"] = images
    gen = Generator(params, cfg, GenerationConfig(max_new_tokens=8), 2, 128)
    out = gen.generate(batch)
    print("selftest generated:", out)
    assert all(len(o) == 8 for o in out)
    print("generate selftest OK")


if __name__ == "__main__":
    import sys

    if "--selftest" in sys.argv:
        _selftest()
