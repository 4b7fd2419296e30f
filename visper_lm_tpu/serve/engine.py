"""Continuous-batching serving engine: slot-based KV cache + in-flight joins.

The reference serves requests one batch at a time (demo.py / eval loaders:
build a batch, generate, wait for the LONGEST sample, repeat). This engine is
the TPU-native production upgrade — the vLLM/JetStream serving model mapped
onto XLA's static-shape world:

  * a fixed pool of decode SLOTS (the jitted decode step's batch dimension
    never changes, so the step compiles exactly once);
  * each slot holds one in-flight request at its OWN sequence position — the
    decoder writes new K/V at per-slot cache positions (a tiny scatter,
    models/decoder.py `_write_new_kv`) and masks per-slot valid ranges
    (ops/attention.mha_xla_cache takes a (B,) cache_len);
  * when a request finishes, its slot is refilled from the queue IMMEDIATELY —
    a single-request prefill runs at batch 1 (bucketed prompt lengths keep the
    compile count finite) and its K/V slab is inserted into the shared cache
    with one donated dynamic-update-slice;
  * no request ever waits for the rest of the batch, and the decode batch
    stays full: throughput tracks slot-count, latency tracks own-length.

Everything host-side (queueing, eos/stop-string detection, slot recycling) is
plain Python; everything per-token is inside three jitted programs (prefill,
insert, step) with donated buffers, so steady-state serving is one host
round-trip per decode step.

Reference parity anchor: replaces the batch-loop serving in
`/root/reference/ola_vlm/eval/model_cvbench_loader.py:118-170` and
`/root/reference/demo.py` — a capability the reference does not have.
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.config import VLMConfig
from visper_lm_tpu.data.collate import SplicePlan
from visper_lm_tpu.models import decoder as dec
from visper_lm_tpu.models.vlm import encode_images, splice_embeddings
from visper_lm_tpu.serve.generate import (
    GenerationConfig,
    left_pad_plans,
    right_pad_plans,
    _sample_tokens,
)


@dataclasses.dataclass
class EngineConfig:
    num_slots: int = 8                 # decode batch width (compiled once)
    max_len: int = 2048                # shared KV cache length per slot
    prompt_bucket: int = 128           # prompt lengths round up to a multiple
    # chunked prefill: prompts longer than this prefill in <=chunk pieces via
    # the prefix-continuation path. At most ONE chunk runs per engine step, so
    # decode steps for occupied slots interleave between chunks — the stall an
    # in-flight decode batch sees is bounded by one chunk's prefill, not the
    # whole prompt (None = single-shot prefill). Each chunk costs one extra
    # copy of the batch-1 cache slab; numerics are unchanged. Rounded up to a
    # prompt_bucket multiple at engine init so chunk prefills carry no dead
    # left-pad slots in the handle.
    prefill_chunk: Optional[int] = None
    # decode quantum: one engine step scans N decode tokens per slot inside a
    # single jit and syncs tokens to host ONCE. Per-token host syncs dominate
    # wall time when host<->device latency is nontrivial (measured on the
    # tunneled v5e: 362 ms/step vs 12 ms of device compute); stop detection /
    # slot retirement happen at quantum boundaries (outputs are unchanged —
    # absorb discards post-stop tokens), and admission latency is quantized
    # to N tokens. N=1 reproduces per-token scheduling exactly.
    decode_quantum: int = 8
    temperature: float = 0.0
    top_p: float = 1.0
    kv_quant: bool = False             # int8 KV cache (same tradeoff as Generator)
    weight_quant: object = False       # False | True/"int8" | "int4"
    calibration: object = None
    # slot-wise speculative decoding (greedy only): every engine step runs ONE
    # (B, k+1)-token target verify chunk instead of a 1-token step; per-slot
    # proposals come from prompt-lookup n-gram drafting over each slot's own
    # token history (serve/speculative.ngram_propose) — no draft model, no
    # extra cache. Acceptance is per slot; rejected KV slots are masked by the
    # per-slot lengths and overwritten in place by the next (monotonically
    # advancing) chunk write, exactly the batch-1 scheme in
    # serve/speculative.py. Greedy outputs are token-exact vs the plain step.
    spec_k: int = 0                    # drafted tokens per step (0 = off)
    spec_ngram: int = 3                # n-gram length for prompt lookup
    # in-graph speculative quantum: R propose/verify/accept rounds run inside
    # ONE jit per engine step (proposals come from an on-device token-history
    # buffer, acceptance is computed in-graph) and the emitted tokens sync to
    # host once. This is what lets speculative decoding compose with the
    # decode quantum — the host-driven spec path (spec_quantum=0) pays a full
    # host round trip per verify round. Greedy outputs stay token-exact.
    spec_quantum: int = 0
    # grouped admission: when several slots are free and several queued
    # requests are compatible (same modality, no prefix handle), admit up to
    # this many in ONE fused jit — a batched prefill at the group's prompt
    # bucket + first-token sample + multi-slot scatter insert. Group sizes
    # round down to powers of two so the compile count stays bounded
    # ({2,4,8} x prompt buckets). The reference-style static batch loop beats
    # per-request admission on dispatch count exactly here (48 batch-1
    # prefills vs 3 batched ones, BASELINE.md "Serving engine under link
    # latency"); grouping closes that without giving up slot scheduling.
    # 1 disables grouping. Ignored while chunked prefill is active (that path
    # bounds per-step prefill work to one unit by design).
    admit_group: int = 8
    # admission hysteresis: when the queue is deeper than the free slots and
    # a LARGER compatible group could form, defer admission up to this many
    # steps so retiring slots pool into one fused group admission instead of
    # trickling in as singleton dispatches (a retirement frees slots one at a
    # time, so mid-run admissions would otherwise all be batch-1 — the exact
    # dispatch pattern grouping exists to avoid). Occupied slots keep
    # decoding during the deferral, so the cost is bounded admission latency
    # (defer x decode_quantum tokens), not idle time; 0 admits eagerly.
    admit_defer: int = 4


@dataclasses.dataclass
class PrefixHandle:
    """A prefilled, reusable KV prefix (shared system prompt / chat history).

    `cache` is a batch-1, full-length (L, S, 1, ...) slab in the engine's cache
    layout; valid KV occupies slots [start, length). Handles are read-only —
    many in-flight requests can continue from the same handle — and chainable
    via Engine.prefill_prefix(..., prefix=handle) for multi-turn growth.
    The reference re-prefills the whole conversation every turn
    (/root/reference/demo.py:286-350, HF generate with a fresh cache); this is
    the vLLM-style prefix-caching upgrade mapped onto static XLA shapes.
    """

    cache: Tuple[jax.Array, ...]
    length: int        # one past the last valid kv slot
    start: int         # first valid kv slot (left-pad offset of the base turn)


@dataclasses.dataclass
class Request:
    plan: SplicePlan
    images: Optional[np.ndarray] = None        # (1, H, W, 3) or None (text-only)
    image_features: Optional[np.ndarray] = None
    # continue from a cached prefix: plan then covers ONLY the new tokens
    prefix: Optional[PrefixHandle] = None
    max_new_tokens: int = 128
    eos_token_ids: Tuple[int, ...] = ()
    stop_strings: Tuple[str, ...] = ()
    uid: Any = None
    # called with each sampled token id as it lands (host-side streaming)
    stream_callback: Optional[Callable[[int], None]] = None
    # filled by the engine:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    submit_t: float = 0.0
    first_token_t: float = 0.0
    done_t: float = 0.0
    # retirement bookkeeping (set when the request finishes) so the slot's KV
    # can be harvested into a PrefixHandle before the slot is reused:
    slot: Optional[int] = None
    slot_gen: int = -1
    final_kv_len: int = 0
    final_kv_start: int = 0
    # engine-internal: this request is mid chunked-prefill (its `prefix` is
    # engine-built chunk progress, not a caller-supplied handle)
    _chunking: bool = False
    # engine-internal: token history for prompt-lookup proposals (prompt text
    # ids + generated ids; spec_k > 0 only)
    _history: List[int] = dataclasses.field(default_factory=list)


class Engine:
    """Continuous-batching decode engine over a shared slot-major KV cache."""

    def __init__(self, params: Any, cfg: VLMConfig, ecfg: EngineConfig,
                 tokenizer=None):
        self.cfg = cfg
        self.ecfg = ecfg
        self.tokenizer = tokenizer
        # a stream_grads-trained tree carries 'blocks_chunks' instead of
        # 'blocks' (train_step.py); inference paths read 'blocks' — rebuild
        # the stacked layout at the serving boundary (same normalization as
        # generate.Generator / checkpoint.hf_export).
        from visper_lm_tpu.models.decoder import normalize_stream_layout

        params = normalize_stream_layout(params)
        self.params = params
        if ecfg.weight_quant:
            from visper_lm_tpu.utils.param import (
                quantize_linear_weights,
                quantize_linear_weights_int4,
            )

            self.params = dict(params)
            if ecfg.weight_quant == "int4":
                import functools

                q = functools.partial(
                    quantize_linear_weights_int4, act_rms=ecfg.calibration
                )
            else:
                q = quantize_linear_weights
            self.params["decoder"] = q(self.params["decoder"])

        B, S = ecfg.num_slots, ecfg.max_len
        if ecfg.kv_quant:
            self.cache = dec.init_quant_kv_cache(cfg.decoder, B, S)
        else:
            self.cache = dec.init_kv_cache(cfg.decoder, B, S)
        self._cache_cls = type(self.cache)
        # per-slot device state
        self.lengths = jnp.zeros((B,), jnp.int32)      # valid kv length (write pos)
        self.kv_starts = jnp.full((B,), S, jnp.int32)  # first valid slot (mask all)
        self.tokens = jnp.zeros((B,), jnp.int32)       # last sampled token
        # host mirrors of lengths/kv_starts: every host decision (stop checks,
        # capacity, harvest bookkeeping) reads these instead of the device
        # arrays — a device read per token costs a full host<->device round
        # trip (the dominant serving cost on high-latency links)
        self.lengths_host = np.zeros((B,), np.int64)
        self.kv_starts_host = np.full((B,), S, np.int64)
        self.tokens_host = np.zeros((B,), np.int32)
        # slots whose prefill-sampled first token awaits the next quantum sync
        self._pending_first = [False] * B
        # host-side slot table
        self.slot_req: List[Optional[Request]] = [None] * B
        self.slot_gen = [0] * B           # bumps on every fill (harvest guard)
        self.queue: collections.deque[Request] = collections.deque()
        # requests finished since the last run() drain — run() clears this on
        # entry, so a long-lived engine does not accumulate request history
        self.finished: List[Request] = []
        # chunk size normalized to a prompt_bucket multiple: chunk prefills
        # then bucket to exactly their own length (no dead left-pad slots)
        self._chunk: Optional[int] = None
        if ecfg.prefill_chunk:
            b = ecfg.prompt_bucket
            self._chunk = min(
                -(-ecfg.prefill_chunk // b) * b, ecfg.max_len
            )
        self._prefill_cache: Dict[int, Callable] = {}
        self._step = jax.jit(self._step_impl, donate_argnums=(1,))
        self._qstep = jax.jit(self._quantum_impl, donate_argnums=(1,))
        self._insert = jax.jit(self._insert_impl, donate_argnums=(1,))
        self._key = jax.random.PRNGKey(0)
        if ecfg.spec_k:
            assert ecfg.temperature == 0.0, (
                "engine speculative decoding is greedy-only (temperature 0); "
                "sampling uses the plain step or serve/speculative.py"
            )
            self._spec_step = jax.jit(self._spec_step_impl, donate_argnums=(1,))
            if ecfg.spec_quantum > 0:
                # device-side token history (text prompt + emitted tokens) for
                # in-graph prompt-lookup proposals; one row per slot
                self.hist = jnp.zeros((B, S), jnp.int32)
                self.hist_len = jnp.zeros((B,), jnp.int32)
                self._spec_qstep = jax.jit(
                    self._spec_quantum_impl, donate_argnums=(1, 5)
                )
                self._hist_fill = jax.jit(
                    lambda h, hl, slot, row, n: (
                        h.at[slot].set(row), hl.at[slot].set(n)
                    ),
                    donate_argnums=(0,),
                )
        self.stats = {"steps": 0, "decoded_tokens": 0, "slot_steps": 0,
                      "prefills": 0, "spec_proposed": 0, "spec_accepted": 0,
                      "group_admissions": 0}
        self._admit_deferred = 0

    # ---------------------------------------------------------------- prefill

    def _make_prefill(self, pad_to: int):
        """Batch-1 prefill at a bucketed prompt length; returns (logits, kv)."""
        return jax.jit(self._make_prefill_fn(pad_to))

    def _make_prefill_fn(self, pad_to: int, batch_size: int = 1):
        cfg = self.cfg

        def prefill(params, batch):
            if "image_features" in batch:
                image_features = batch["image_features"]
            elif "images" in batch:
                image_features = encode_images(params, cfg, batch["images"])
            else:
                image_features = None
            embeds = splice_embeddings(
                params, cfg, batch["text_ids"], batch["token_type"],
                batch["src_index"], image_features,
            )
            offsets = batch["pad_offsets"]
            positions = jnp.maximum(
                jnp.arange(pad_to)[None, :] - offsets[:, None], 0
            )
            if self.ecfg.kv_quant:
                cache = dec.init_quant_kv_cache(
                    cfg.decoder, batch_size, self.ecfg.max_len
                )
            else:
                cache = dec.init_kv_cache(
                    cfg.decoder, batch_size, self.ecfg.max_len
                )
            out = dec.decoder_forward(
                params["decoder"], cfg.decoder, embeds,
                positions=positions,
                kv_lengths=jnp.full((batch_size,), pad_to, jnp.int32),
                kv_starts=offsets,
                cache=cache, q_offset=0, tap_layers=(),
                compute_logits=False,
            )
            last = out["hidden"][:, -1]
            dp = params["decoder"]
            if cfg.decoder.tie_embeddings:
                logits = (last @ dp["embed_tokens"]["embedding"].T).astype(jnp.float32)
            else:
                from visper_lm_tpu.utils.param import linear

                logits = linear(dp["lm_head"], last).astype(jnp.float32)
            return logits, tuple(out["cache"])

        return prefill

    def _make_prefill_insert(self, pad_to: int):
        """Fused admission: batch-1 prefill + first-token sample + slot
        insert in ONE jitted call. Admission used to cost two device calls
        (prefill, insert) — per-call dispatch latency is a real serving cost
        on high-latency links, and the batch-1 KV slab round-trips through a
        host-visible handle between them."""
        prefill = self._make_prefill_fn(pad_to)
        gen_cfg = GenerationConfig(
            temperature=self.ecfg.temperature, top_p=self.ecfg.top_p
        )

        def prefill_insert(params, batch, slot, cache_arrays, lengths,
                           kv_starts, tokens, new_len, new_start, key):
            logits, kv = prefill(params, batch)
            first = _sample_tokens(logits[0], gen_cfg, key)
            out = self._insert_impl(
                slot, cache_arrays, kv, lengths, kv_starts, tokens,
                new_len, new_start, first,
            )
            return out + (first,)

        return jax.jit(prefill_insert, donate_argnums=(3,))

    def _make_group_prefill_insert(self, pad_to: int, k: int):
        """Grouped admission: ONE jitted call prefills k prompts (left-padded
        to a shared bucket, per-row pad offsets), samples their first tokens,
        and scatter-inserts the k KV columns into k slots. k batch-1
        admissions cost k dispatches; this costs one — the currency that made
        reference-style static batching win the 48-request workload."""
        prefill = self._make_prefill_fn(pad_to, batch_size=k)
        gen_cfg = GenerationConfig(
            temperature=self.ecfg.temperature, top_p=self.ecfg.top_p
        )

        def prefill_insert(params, batch, slots, cache_arrays, lengths,
                           kv_starts, tokens, new_lens, new_starts, key):
            logits, kv = prefill(params, batch)          # (k, V), (L, S, k, …)
            firsts = _sample_tokens(logits, gen_cfg, key)
            arrays = []
            for c, u in zip(cache_arrays, kv):
                # one scatter along the slot axis per cache slab
                arrays.append(c.at[:, :, slots].set(u.astype(c.dtype)))
            lengths = lengths.at[slots].set(new_lens)
            kv_starts = kv_starts.at[slots].set(new_starts)
            tokens = tokens.at[slots].set(firsts)
            return tuple(arrays), lengths, kv_starts, tokens, firsts

        return jax.jit(prefill_insert, donate_argnums=(3,))

    def _make_suffix(self, pad_to: int):
        """Batch-1 continuation prefill: run only the NEW tokens (right-padded
        to a bucket) over an existing prefix cache; returns (last-valid-token
        logits, full kv slab incl. the prefix)."""
        cfg = self.cfg

        def suffix(params, prefix_cache, prefix_len, prefix_start, batch):
            if "image_features" in batch:
                image_features = batch["image_features"]
            elif "images" in batch:
                image_features = encode_images(params, cfg, batch["images"])
            else:
                image_features = None
            embeds = splice_embeddings(
                params, cfg, batch["text_ids"], batch["token_type"],
                batch["src_index"], image_features,
            )
            seq_len = batch["seq_lengths"]          # (1,) real suffix length
            # rope continues from the prefix's last logical position; the
            # right-padded tail computes garbage that stays invisible (extras
            # are causally masked for real queries; cache reads are bounded by
            # kv_lengths; later writes overwrite the garbage slots)
            positions = (prefix_len - prefix_start) + jnp.arange(pad_to)[None, :]
            cache = self._cache_cls(*prefix_cache)
            out = dec.decoder_forward(
                params["decoder"], cfg.decoder, embeds,
                positions=positions,
                kv_lengths=prefix_len + seq_len,
                kv_starts=jnp.reshape(prefix_start, (1,)).astype(jnp.int32),
                cache=cache, q_offset=jnp.asarray(prefix_len, jnp.int32),
                tap_layers=(), compute_logits=False,
            )
            last = jnp.take(out["hidden"][0], seq_len[0] - 1, axis=0)[None]
            dp = params["decoder"]
            if cfg.decoder.tie_embeddings:
                logits = (last @ dp["embed_tokens"]["embedding"].T).astype(jnp.float32)
            else:
                from visper_lm_tpu.utils.param import linear

                logits = linear(dp["lm_head"], last).astype(jnp.float32)
            return logits, tuple(out["cache"])

        return jax.jit(suffix)

    # ---------------------------------------------------------- prefix cache

    def prefill_prefix(
        self,
        plan: SplicePlan,
        images: Optional[np.ndarray] = None,
        image_features: Optional[np.ndarray] = None,
        prefix: Optional[PrefixHandle] = None,
    ) -> PrefixHandle:
        """Prefill `plan` into a reusable KV prefix handle.

        Without `prefix`: a fresh base prefix (bucketed, left-padded — zero
        garbage slots). With `prefix`: extends it with `plan`'s tokens (chat
        history growth); the handle chain shares no buffers, so older handles
        stay valid. Requests carrying the handle prefill only their own
        suffix tokens."""
        if prefix is None:
            pad_to = self._bucket(plan.seq_length)
            if pad_to not in self._prefill_cache:
                self._prefill_cache[pad_to] = self._make_prefill(pad_to)
            batch = left_pad_plans([plan], pad_to)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if image_features is not None:
                batch["image_features"] = jnp.asarray(image_features)
            elif images is not None:
                batch["images"] = jnp.asarray(images)
            _, kv = self._prefill_cache[pad_to](self.params, batch)
            return PrefixHandle(
                cache=kv, length=pad_to, start=pad_to - plan.seq_length
            )
        logits, kv, new_len = self._run_suffix(prefix, plan, images, image_features)
        return PrefixHandle(cache=kv, length=new_len, start=prefix.start)

    def _run_suffix(self, prefix: PrefixHandle, plan: SplicePlan,
                    images, image_features):
        pad_to = self._bucket(plan.seq_length)
        assert prefix.length + pad_to <= self.ecfg.max_len, (
            "prefix + suffix bucket exceeds cache capacity"
        )
        key = ("suffix", pad_to)
        if key not in self._prefill_cache:
            self._prefill_cache[key] = self._make_suffix(pad_to)
        batch = right_pad_plans([plan], pad_to)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if image_features is not None:
            batch["image_features"] = jnp.asarray(image_features)
        elif images is not None:
            batch["images"] = jnp.asarray(images)
        logits, kv = self._prefill_cache[key](
            self.params, tuple(prefix.cache),
            jnp.int32(prefix.length), jnp.int32(prefix.start), batch,
        )
        return logits, kv, prefix.length + plan.seq_length

    def _insert_impl(self, slot, cache_arrays, new_arrays, lengths, kv_starts,
                     tokens, new_len, new_start, new_token):
        """Copy a batch-1 prefilled KV column into the shared cache at `slot`."""
        out = []
        for c, u in zip(cache_arrays, new_arrays):
            # c: (L, S, B, ...), u: (L, S, 1, ...) -> write the whole slot column
            out.append(jax.lax.dynamic_update_slice(
                c, u.astype(c.dtype), (0, 0, slot) + (0,) * (c.ndim - 3)
            ))
        lengths = lengths.at[slot].set(new_len)
        kv_starts = kv_starts.at[slot].set(new_start)
        tokens = tokens.at[slot].set(new_token)
        return tuple(out), lengths, kv_starts, tokens

    # ------------------------------------------------------------------ step

    def _step_impl(self, params, cache_arrays, tokens, lengths, kv_starts, key):
        """One decode token for every slot (active or not) at its own position."""
        cfg = self.cfg
        cache = self._cache_cls(*cache_arrays)
        emb = dec.embed_tokens(params["decoder"], tokens[:, None])
        positions = (lengths - kv_starts)[:, None]
        out = dec.decoder_forward(
            params["decoder"], cfg.decoder, emb,
            positions=positions,
            kv_lengths=lengths + 1,
            kv_starts=kv_starts,
            cache=cache,
            q_offset=lengths,            # (B,) per-slot write positions
            tap_layers=(),
        )
        gen_cfg = GenerationConfig(
            temperature=self.ecfg.temperature, top_p=self.ecfg.top_p
        )
        next_tokens = _sample_tokens(out["logits"][:, 0], gen_cfg, key)
        # slots at capacity stop advancing (their writes are dropped anyway)
        new_lengths = jnp.minimum(lengths + 1, self.ecfg.max_len)
        return next_tokens, tuple(out["cache"]), new_lengths

    def _quantum_impl(self, params, cache_arrays, tokens, lengths, kv_starts,
                      key):
        """decode_quantum tokens for every slot in ONE jit: lax.scan over the
        single-token step so the host syncs once per quantum instead of once
        per token. Returns ((Q, B) tokens, cache, last tokens, lengths)."""
        cfg = self.cfg
        gen_cfg = GenerationConfig(
            temperature=self.ecfg.temperature, top_p=self.ecfg.top_p
        )

        def body(carry, k):
            arrays, toks, lens = carry
            cache = self._cache_cls(*arrays)
            emb = dec.embed_tokens(params["decoder"], toks[:, None])
            out = dec.decoder_forward(
                params["decoder"], cfg.decoder, emb,
                positions=(lens - kv_starts)[:, None],
                kv_lengths=lens + 1,
                kv_starts=kv_starts,
                cache=cache,
                q_offset=lens,
                tap_layers=(),
            )
            nxt = _sample_tokens(out["logits"][:, 0], gen_cfg, k)
            new_lens = jnp.minimum(lens + 1, self.ecfg.max_len)
            return (tuple(out["cache"]), nxt, new_lens), nxt

        keys = jax.random.split(key, self.ecfg.decode_quantum)
        in_tokens = tokens
        (arrays, tokens, lengths), toks = jax.lax.scan(
            body, (cache_arrays, tokens, lengths), keys
        )
        # in_tokens rides back so a just-filled slot's FIRST token (sampled by
        # the prefill, never synced) can be absorbed at this quantum's single
        # sync instead of costing its own host round trip at admission
        return toks, in_tokens, arrays, tokens, lengths

    def _spec_step_impl(self, params, cache_arrays, chunk_tokens, lengths,
                        kv_starts):
        """Verify a (B, spec_k+1) token chunk for every slot at its own
        positions in ONE target forward — one weight read serves up to k+1
        tokens per slot. Returns the target argmax at every position."""
        cfg = self.cfg
        k1 = self.ecfg.spec_k + 1
        cache = self._cache_cls(*cache_arrays)
        emb = dec.embed_tokens(params["decoder"], chunk_tokens)  # (B, k+1, D)
        positions = (lengths - kv_starts)[:, None] + jnp.arange(k1)[None, :]
        out = dec.decoder_forward(
            params["decoder"], cfg.decoder, emb,
            positions=positions,
            kv_lengths=lengths + k1,
            kv_starts=kv_starts,
            cache=cache,
            q_offset=lengths,
            tap_layers=(),
        )
        argmax = jnp.argmax(out["logits"], axis=-1).astype(jnp.int32)
        return argmax, tuple(out["cache"])

    def _spec_quantum_impl(self, params, cache_arrays, tokens, lengths,
                           kv_starts, hist, hist_len):
        """spec_quantum in-graph speculative rounds in ONE jit: per-slot
        prompt-lookup proposals over the device history buffer, a batched
        (B, k+1) verify forward, in-graph greedy acceptance, and history /
        length advance — the host syncs the emitted tokens once per quantum.
        Greedy-exact: emitted tokens are exactly the target's greedy chain
        (drafts only change how many land per weight read)."""
        cfg = self.cfg
        k = self.ecfg.spec_k
        n = self.ecfg.spec_ngram
        H = hist.shape[1]

        def propose(row, hlen):
            """Most recent earlier occurrence of the last m-gram (m = n..1,
            ngram_propose semantics); returns a (k,) draft, -1-padded when
            nothing matches (a -1 draft can never equal a real argmax)."""
            idx = jnp.arange(H)
            best = jnp.int32(-1)
            mstar = jnp.int32(0)
            for m in range(n, 0, -1):  # static unroll over suffix lengths
                win = row[(idx[:, None] + jnp.arange(m)[None, :]) % H]
                suffix = jax.lax.dynamic_slice(
                    row, (jnp.maximum(hlen - m, 0),), (m,)
                )
                ok = (
                    jnp.all(win == suffix[None, :], axis=1)
                    & (idx < hlen - m)          # strictly earlier occurrence
                    & (hlen >= m + 1)
                )
                b_m = jnp.max(jnp.where(ok, idx, -1))
                take = (best < 0) & (b_m >= 0)
                mstar = jnp.where(take, m, mstar)
                best = jnp.where(take, b_m, best)
            start = jnp.maximum(best + mstar, 0)
            draft = jax.lax.dynamic_slice(row, (start,), (k,))
            # positions past hist_len hold stale tokens: mask them out too
            valid = (best >= 0) & (start + jnp.arange(k) < hlen)
            return jnp.where(valid, draft, -1)

        def round_body(carry, _):
            arrays, toks, lens, h, hl = carry
            drafts = jax.vmap(propose)(h, hl)                    # (B, k)
            chunk = jnp.concatenate([toks[:, None], drafts], axis=1)
            cache = self._cache_cls(*arrays)
            emb = dec.embed_tokens(params["decoder"], jnp.maximum(chunk, 0))
            positions = (lens - kv_starts)[:, None] + jnp.arange(k + 1)[None, :]
            out = dec.decoder_forward(
                params["decoder"], cfg.decoder, emb,
                positions=positions,
                kv_lengths=lens + k + 1,
                kv_starts=kv_starts,
                cache=cache,
                q_offset=lens,
                tap_layers=(),
            )
            am = jnp.argmax(out["logits"], axis=-1).astype(jnp.int32)
            acc = jnp.cumprod(
                (drafts == am[:, :-1]).astype(jnp.int32), axis=1
            )                                                    # (B, k)
            n_acc = jnp.sum(acc, axis=1)                         # (B,)
            jidx = jnp.arange(k + 1)[None, :]
            bonus = jnp.take_along_axis(am, n_acc[:, None], axis=1)
            drafts_p = jnp.concatenate(
                [drafts, jnp.full((drafts.shape[0], 1), -1, jnp.int32)], axis=1
            )
            emitted = jnp.where(
                jidx < n_acc[:, None], drafts_p,
                jnp.where(jidx == n_acc[:, None], bonus, -1),
            )                                                    # (B, k+1)
            n_emit = n_acc + 1
            # rejected KV slots stay masked by per-slot lengths and are
            # overwritten by the next (monotonically advancing) chunk write
            new_lens = jnp.minimum(lens + n_emit, self.ecfg.max_len)
            h = jax.vmap(
                lambda r, l, e: jax.lax.dynamic_update_slice(r, e, (l,))
            )(h, hl, emitted)
            new_hl = hl + n_emit
            n_prop = jnp.sum(drafts >= 0, axis=1)
            return (tuple(out["cache"]), bonus[:, 0], new_lens, h, new_hl), (
                emitted, n_emit, n_prop
            )

        carry = (cache_arrays, tokens, lengths, hist, hist_len)
        carry, (emitted, n_emit, n_prop) = jax.lax.scan(
            round_body, carry, None, length=self.ecfg.spec_quantum
        )
        arrays, tokens, lengths, hist, hist_len = carry
        return (emitted, n_emit, n_prop), arrays, tokens, lengths, hist, hist_len

    # ------------------------------------------------------------- host logic

    def submit(self, req: Request) -> None:
        req.submit_t = time.perf_counter()
        self.queue.append(req)

    def _bucket(self, n: int) -> int:
        b = self.ecfg.prompt_bucket
        return min(-(-n // b) * b, self.ecfg.max_len)

    def _encode_images_once(self, images) -> jax.Array:
        if not hasattr(self, "_encode_fn"):
            cfg = self.cfg
            self._encode_fn = jax.jit(
                lambda p, im: encode_images(p, cfg, im)
            )
        return self._encode_fn(self.params, jnp.asarray(images))

    def _chunk_plan(self, plan: SplicePlan, a: int, b: int) -> SplicePlan:
        return SplicePlan(
            text_ids=plan.text_ids[a:b], token_type=plan.token_type[a:b],
            src_index=plan.src_index[a:b], labels=plan.labels[a:b],
            seq_length=b - a,
        )

    def _needs_chunk(self, req: Request) -> bool:
        """True while `req`'s remaining prompt must be advanced by one more
        chunk before it can take a slot. Requests arriving with a CALLER
        prefix handle are never chunked (their plan is already a suffix)."""
        return bool(
            self._chunk
            and req.plan.seq_length > self._chunk
            and (req.prefix is None or req._chunking)
        )

    def _advance_chunk(self, req: Request) -> None:
        """Prefill ONE chunk of `req`'s prompt into its chunk-progress handle
        (in place; the request stays queued). The final <=chunk tokens are
        left as the request's suffix — their prefill seeds the first sampled
        token when the request eventually takes a slot."""
        chunk = self._chunk
        if req.image_features is None and req.images is not None:
            # encode once; every chunk splices from the same feature rows
            req.image_features = self._encode_images_once(req.images)
            req.images = None
        n = req.plan.seq_length  # > chunk (guarded by _needs_chunk), so the
        # remainder after this chunk is >=1 token and can seed the first sample
        head = self._chunk_plan(req.plan, 0, chunk)
        if self.ecfg.spec_k:
            req._history.extend(self._plan_text_ids(head))
        req.prefix = self.prefill_prefix(
            head, image_features=req.image_features, prefix=req.prefix,
        )
        req.plan = self._chunk_plan(req.plan, chunk, n)
        req._chunking = True

    @staticmethod
    def _plan_text_ids(plan: SplicePlan) -> List[int]:
        from visper_lm_tpu.constants import SEG_TEXT

        tt = np.asarray(plan.token_type)[: plan.seq_length]
        ids = np.asarray(plan.text_ids)[: plan.seq_length]
        return [int(t) for t in ids[tt == SEG_TEXT]]

    def _fill_slot(self, slot: int, req: Request) -> None:
        plan = req.plan
        if req.prefix is not None:
            logits, kv, new_len = self._run_suffix(
                req.prefix, plan, req.images, req.image_features
            )
            new_start = req.prefix.start
            first = None
        else:
            pad_to = self._bucket(plan.seq_length)
            assert plan.seq_length <= self.ecfg.max_len, "prompt exceeds cache"
            key = ("fill", pad_to)
            if key not in self._prefill_cache:
                self._prefill_cache[key] = self._make_prefill_insert(pad_to)
            batch = left_pad_plans([plan], pad_to)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if req.image_features is not None:
                batch["image_features"] = jnp.asarray(req.image_features)
            elif req.images is not None:
                batch["images"] = jnp.asarray(req.images)
            new_len, new_start = pad_to, pad_to - plan.seq_length
            self._key, sub = jax.random.split(self._key)
            # ONE fused device call: prefill + first-token sample + insert
            (cache_arrays, self.lengths, self.kv_starts, self.tokens,
             first) = self._prefill_cache[key](
                self.params, batch, jnp.int32(slot), tuple(self.cache),
                self.lengths, self.kv_starts, self.tokens,
                jnp.int32(new_len), jnp.int32(new_start), sub,
            )
        if req.prefix is not None:
            self._key, sub = jax.random.split(self._key)
            gen_cfg = GenerationConfig(
                temperature=self.ecfg.temperature, top_p=self.ecfg.top_p
            )
            first = _sample_tokens(logits[0], gen_cfg, sub)
            cache_arrays, self.lengths, self.kv_starts, self.tokens = self._insert(
                jnp.int32(slot), tuple(self.cache), kv,
                self.lengths, self.kv_starts, self.tokens,
                jnp.int32(new_len), jnp.int32(new_start), first,
            )
        self.cache = self._cache_cls(*cache_arrays)
        self.lengths_host[slot] = int(new_len)
        self.kv_starts_host[slot] = int(new_start)
        self.slot_gen[slot] += 1
        self.slot_req[slot] = req
        req.first_token_t = time.perf_counter()
        if self.ecfg.spec_k or self.ecfg.decode_quantum <= 1:
            # spec proposals need the token value on host immediately
            self.tokens_host[slot] = int(first)   # one sync per admission
            if self.ecfg.spec_k:
                req._history.extend(self._plan_text_ids(plan))
            if self.ecfg.spec_k and self.ecfg.spec_quantum > 0:
                # device history row: the FULL prompt's text ids + the first
                # token. req._history already holds every chunk's text ids
                # (_advance_chunk extends per chunk); seeding from the final
                # chunk's plan alone would lose most of a long prompt — the
                # main case where prompt-lookup speculation pays.
                ids = list(req._history) + [int(first)]
                if len(ids) > self.ecfg.max_len:
                    ids = ids[-self.ecfg.max_len:]
                row = np.full((self.ecfg.max_len,), -1, np.int32)
                row[: len(ids)] = ids
                self.hist, self.hist_len = self._hist_fill(
                    self.hist, self.hist_len, jnp.int32(slot),
                    jnp.asarray(row), jnp.int32(len(ids)),
                )
            self._absorb(slot, int(self.tokens_host[slot]))
            self._pending_first[slot] = False
        else:
            # the first token's VALUE stays on device; it is absorbed at the
            # next quantum's single sync (in_tokens) — admission costs no
            # host round trip
            self._pending_first[slot] = True
        self.stats["prefills"] += 1
        self.stats["admit_dispatches"] = self.stats.get("admit_dispatches", 0) + 1

    def _fill_slots(self, slots: List[int], reqs: List["Request"]) -> None:
        """Grouped admission of len(slots) compatible requests in one fused
        device call (see _make_group_prefill_insert). Host-side bookkeeping
        mirrors _fill_slot per slot; when first tokens are needed immediately
        (spec / quantum<=1) the whole group costs ONE host sync."""
        k = len(slots)
        plans = [r.plan for r in reqs]
        pad_to = self._bucket(max(p.seq_length for p in plans))
        assert all(p.seq_length <= self.ecfg.max_len for p in plans)
        key = ("gfill", k, pad_to)
        if key not in self._prefill_cache:
            self._prefill_cache[key] = self._make_group_prefill_insert(pad_to, k)
        batch = left_pad_plans(plans, pad_to)
        batch = {kk: jnp.asarray(v) for kk, v in batch.items()}
        if reqs[0].image_features is not None:
            batch["image_features"] = jnp.asarray(
                np.concatenate([r.image_features for r in reqs])
            )
        elif reqs[0].images is not None:
            batch["images"] = jnp.asarray(
                np.concatenate([r.images for r in reqs])
            )
        new_lens = np.full((k,), pad_to, np.int32)
        new_starts = np.asarray(
            [pad_to - p.seq_length for p in plans], np.int32
        )
        self._key, sub = jax.random.split(self._key)
        (cache_arrays, self.lengths, self.kv_starts, self.tokens,
         firsts) = self._prefill_cache[key](
            self.params, batch, jnp.asarray(slots, jnp.int32),
            tuple(self.cache), self.lengths, self.kv_starts, self.tokens,
            jnp.asarray(new_lens), jnp.asarray(new_starts), sub,
        )
        self.cache = self._cache_cls(*cache_arrays)
        now = time.perf_counter()
        for i, (slot, req) in enumerate(zip(slots, reqs)):
            self.lengths_host[slot] = int(new_lens[i])
            self.kv_starts_host[slot] = int(new_starts[i])
            self.slot_gen[slot] += 1
            self.slot_req[slot] = req
            req.first_token_t = now
        self.stats["prefills"] += k
        self.stats["admit_dispatches"] = self.stats.get("admit_dispatches", 0) + 1
        self.stats["group_admissions"] = (
            self.stats.get("group_admissions", 0) + 1
        )
        if self.ecfg.spec_k or self.ecfg.decode_quantum <= 1:
            firsts_host = np.asarray(firsts)   # one sync for the whole group
            for i, (slot, req) in enumerate(zip(slots, reqs)):
                self.tokens_host[slot] = int(firsts_host[i])
                if self.ecfg.spec_k:
                    req._history.extend(self._plan_text_ids(req.plan))
                if self.ecfg.spec_k and self.ecfg.spec_quantum > 0:
                    ids = list(req._history) + [int(firsts_host[i])]
                    if len(ids) > self.ecfg.max_len:
                        ids = ids[-self.ecfg.max_len:]
                    row = np.full((self.ecfg.max_len,), -1, np.int32)
                    row[: len(ids)] = ids
                    self.hist, self.hist_len = self._hist_fill(
                        self.hist, self.hist_len, jnp.int32(slot),
                        jnp.asarray(row), jnp.int32(len(ids)),
                    )
                self._absorb(slot, int(firsts_host[i]))
                self._pending_first[slot] = False
        else:
            for slot in slots:
                self._pending_first[slot] = True

    def _absorb(self, slot: int, token: int,
                slot_len: Optional[int] = None) -> None:
        """Append a sampled token to the slot's request; retire on stop.
        `slot_len` overrides the capacity check's view of the slot's kv
        length (the speculative path emits several tokens before the device
        lengths array is refreshed)."""
        req = self.slot_req[slot]
        if req is None:
            return
        req.output_ids.append(token)
        if self.ecfg.spec_k:
            req._history.append(token)
        if req.stream_callback is not None:
            req.stream_callback(token)
        self.stats["decoded_tokens"] += 1
        if slot_len is None:
            slot_len = int(self.lengths_host[slot])  # host mirror — no sync
        done = (
            token in req.eos_token_ids
            or len(req.output_ids) >= req.max_new_tokens
            or self.ecfg.max_len - slot_len <= 1
        )
        if not done and req.stop_strings and self.tokenizer is not None:
            text = self.tokenizer.decode(req.output_ids, skip_special_tokens=False)
            done = any(s in text for s in req.stop_strings)
        if done:
            req.done_t = time.perf_counter()
            # record where the request's KV lives so harvest() can lift it
            # into a PrefixHandle before the slot is reused. The cache holds
            # KV for the prompt plus all output tokens EXCEPT the last
            # sampled one (its KV would have been written by the next step).
            req.slot = slot
            req.slot_gen = self.slot_gen[slot]
            req.final_kv_len = slot_len
            req.final_kv_start = int(self.kv_starts_host[slot])
            self.finished.append(req)
            self.slot_req[slot] = None

    def harvest(self, req: Request) -> Optional[PrefixHandle]:
        """Lift a finished request's slot KV into a reusable PrefixHandle.

        The handle covers the request's prompt plus output_ids[:-1] (the last
        sampled token's KV was never written — include that token in the next
        suffix prefill). Returns None if the slot has been refilled since the
        request finished (the KV is gone) — callers fall back to re-prefill.
        Zero extra forward passes: this is one batch-1 slice of the shared
        cache, the ChatSession growth path that replaces a full re-prefill."""
        if req.slot is None or self.slot_gen[req.slot] != req.slot_gen:
            return None
        if not hasattr(self, "_harvest_fn"):
            self._harvest_fn = jax.jit(lambda arrays, slot: tuple(
                jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=2)
                for c in arrays
            ))
        kv = self._harvest_fn(tuple(self.cache), jnp.int32(req.slot))
        return PrefixHandle(
            cache=kv, length=req.final_kv_len, start=req.final_kv_start
        )

    @staticmethod
    def _group_compatible(a: "Request", b: "Request") -> bool:
        """Requests that can share one batched admission: no prefix handle,
        matching modality (both images / both features / both text-only) with
        identical array shapes."""
        if a.prefix is not None or b.prefix is not None:
            return False

        def sig(r):
            if r.image_features is not None:
                return ("feat", tuple(np.shape(r.image_features)))
            if r.images is not None:
                return ("img", tuple(np.shape(r.images)))
            return ("text",)

        return sig(a) == sig(b)

    def _admit(self) -> None:
        """Move queued requests into free slots. When chunked prefill is on,
        at most ONE prefill unit (a chunk advance or a slot fill) runs per
        call, so occupied slots keep decoding between prefill pieces.
        Otherwise, compatible queued requests admit in GROUPS (one fused
        batched prefill per group, _fill_slots) — per-request admission costs
        one dispatch each, which is the serving currency on real links."""
        if self._chunk:
            for slot in range(self.ecfg.num_slots):
                if self.slot_req[slot] is None and self.queue:
                    req = self.queue[0]
                    if self._needs_chunk(req):
                        self._advance_chunk(req)
                        return  # request stays queued; decode interleaves
                    self._fill_slot(slot, self.queue.popleft())
                    return  # bound per-step prefill work to one unit
            return
        free = [s for s in range(self.ecfg.num_slots)
                if self.slot_req[s] is None]
        if free and self.queue and self.ecfg.admit_defer:
            # hysteresis: if a bigger compatible group could form than the
            # free slots can hold, let decoding continue and pool retirements
            head = self.queue[0]
            n_compat = 1
            # cap at num_slots so the hoped-for group is attainable when all
            # slots retire (admit_group may exceed the engine's capacity);
            # the defer decision itself is unchanged while occupied > 0
            # (free < num_slots <= cap either way) — this bounds the
            # compatibility scan and keeps the target honest
            cap = min(len(self.queue), max(self.ecfg.admit_group, 1),
                      self.ecfg.num_slots)
            while (n_compat < cap
                   and self._group_compatible(head, self.queue[n_compat])):
                n_compat += 1
            occupied = self.ecfg.num_slots - len(free)
            if (occupied > 0 and len(free) < n_compat
                    and self._admit_deferred < self.ecfg.admit_defer):
                self._admit_deferred += 1
                return
        self._admit_deferred = 0
        while free and self.queue:
            head = self.queue[0]
            limit = min(len(free), max(self.ecfg.admit_group, 1))
            n = 1
            while (n < limit and n < len(self.queue)
                   and self._group_compatible(head, self.queue[n])):
                n += 1
            # round DOWN to a power of two: bounded compile-key set
            while n & (n - 1):
                n &= n - 1
            if n == 1:
                self._fill_slot(free.pop(0), self.queue.popleft())
            else:
                reqs = [self.queue.popleft() for _ in range(n)]
                self._fill_slots([free.pop(0) for _ in range(n)], reqs)

    def step(self) -> None:
        """Admit queued requests into free slots, then decode one QUANTUM of
        tokens per slot (or verify a speculative chunk per slot when spec_k
        is on) — one host sync per quantum, not per token."""
        self._admit()
        if not any(r is not None for r in self.slot_req):
            return
        if self.ecfg.spec_k and self.ecfg.spec_quantum > 0 and (
            self._spec_capacity_ok(
                margin=self.ecfg.spec_quantum * (self.ecfg.spec_k + 1)
            )
        ):
            self._spec_quantum_step()
            return
        if self.ecfg.spec_k and self._spec_capacity_ok():
            self._spec_decode_step()
            return
        q = self.ecfg.decode_quantum
        self._key, sub = jax.random.split(self._key)
        if q <= 1:
            next_tokens, cache_arrays, self.lengths = self._step(
                self.params, tuple(self.cache), self.tokens, self.lengths,
                self.kv_starts, sub,
            )
            toks = np.asarray(next_tokens)[None, :]   # (1, B)
            in_toks = None
            self.tokens = next_tokens
        else:
            toks_stack, in_tokens, cache_arrays, self.tokens, self.lengths = (
                self._qstep(
                    self.params, tuple(self.cache), self.tokens, self.lengths,
                    self.kv_starts, sub,
                )
            )
            # ONE sync for the quantum's tokens AND any deferred first tokens
            joined = np.asarray(
                jnp.concatenate([in_tokens[None, :], toks_stack], axis=0)
            )
            in_toks, toks = joined[0], joined[1:]
        self.cache = self._cache_cls(*cache_arrays)
        self.tokens_host = toks[-1].astype(np.int32).copy()
        base = self.lengths_host.copy()
        self.lengths_host = np.minimum(base + toks.shape[0], self.ecfg.max_len)
        self.stats["steps"] += 1
        for slot in range(self.ecfg.num_slots):
            if self.slot_req[slot] is None:
                continue
            if self._pending_first[slot] and in_toks is not None:
                self._pending_first[slot] = False
                self.stats["slot_steps"] += 1
                self._absorb(slot, int(in_toks[slot]),
                             slot_len=int(base[slot]))
                if self.slot_req[slot] is None:
                    continue
            for j in range(toks.shape[0]):
                self.stats["slot_steps"] += 1
                self._absorb(
                    slot, int(toks[j, slot]),
                    slot_len=int(min(base[slot] + j + 1, self.ecfg.max_len)),
                )
                if self.slot_req[slot] is None:
                    # retired mid-quantum: later tokens are discarded (their
                    # clamped KV writes land outside the harvest range)
                    break

    def _spec_capacity_ok(self, margin: Optional[int] = None) -> bool:
        """A verify chunk writes spec_k+1 KV slots per ACTIVE slot; near the
        cache end (or max_new_tokens) fall back to the plain 1-token step so
        the chunk's dynamic-update-slice can never clamp backwards and
        overwrite valid slots."""
        k1 = margin if margin is not None else self.ecfg.spec_k + 1
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            if int(self.lengths_host[slot]) + k1 > self.ecfg.max_len:
                return False
        return True

    def _spec_quantum_step(self) -> None:
        """Run spec_quantum in-graph speculative rounds, then absorb all
        emitted tokens from ONE host sync."""
        R = self.ecfg.spec_quantum
        ((emitted, n_emit, n_prop), arrays, self.tokens, self.lengths,
         self.hist, self.hist_len) = self._spec_qstep(
            self.params, tuple(self.cache), self.tokens, self.lengths,
            self.kv_starts, self.hist, self.hist_len,
        )
        self.cache = self._cache_cls(*arrays)
        em, ne, npp = jax.device_get((emitted, n_emit, n_prop))  # one sync
        cur = self.lengths_host.astype(np.int64).copy()
        self.stats["steps"] += 1
        active0 = [r is not None for r in self.slot_req]
        for r in range(R):
            for slot in range(self.ecfg.num_slots):
                req = self.slot_req[slot]
                cnt = int(ne[r, slot])
                if req is not None:
                    if active0[slot]:
                        self.stats["spec_proposed"] += int(npp[r, slot])
                        self.stats["spec_accepted"] += cnt - 1
                    for j in range(cnt):
                        self.stats["slot_steps"] += 1
                        self._absorb(
                            slot, int(em[r, slot, j]),
                            slot_len=int(min(cur[slot] + j + 1,
                                             self.ecfg.max_len)),
                        )
                        if self.slot_req[slot] is None:
                            break
                # device advanced EVERY slot (active or not): mirror it
                cur[slot] = min(cur[slot] + cnt, self.ecfg.max_len)
        self.lengths_host = cur
        self.tokens_host = np.array(
            [em[-1, s, max(int(ne[-1, s]) - 1, 0)] for s
             in range(self.ecfg.num_slots)], np.int32,
        )

    def _spec_decode_step(self) -> None:
        """One speculative engine step: host n-gram proposals per slot, one
        batched (B, k+1) verify forward, per-slot greedy acceptance. Emitted
        tokens are exactly the target's greedy tokens (drafts only move how
        many land per weight read, never their values)."""
        from visper_lm_tpu.serve.speculative import ngram_propose

        k = self.ecfg.spec_k
        B = self.ecfg.num_slots
        toks_host = self.tokens_host.copy()  # host mirror — no sync
        chunk = np.zeros((B, k + 1), np.int32)
        proposals: List[List[int]] = []
        for slot in range(B):
            req = self.slot_req[slot]
            prop = (
                ngram_propose(req._history, self.ecfg.spec_ngram, k)
                if req is not None else []
            )
            proposals.append(list(prop))
            chunk[slot, 0] = toks_host[slot]
            chunk[slot, 1 : 1 + len(prop)] = prop
        argmax, cache_arrays = self._spec_step(
            self.params, tuple(self.cache), jnp.asarray(chunk),
            self.lengths, self.kv_starts,
        )
        self.cache = self._cache_cls(*cache_arrays)
        am = np.asarray(argmax)
        lengths = self.lengths_host.astype(np.int64).copy()
        new_tokens = toks_host.copy()
        self.stats["steps"] += 1
        for slot in range(B):
            req = self.slot_req[slot]
            if req is None:
                continue
            self.stats["slot_steps"] += 1
            prop = proposals[slot]
            n_acc = 0
            while n_acc < len(prop) and prop[n_acc] == int(am[slot, n_acc]):
                n_acc += 1
            self.stats["spec_proposed"] += len(prop)
            self.stats["spec_accepted"] += n_acc
            # accepted drafts verbatim + one bonus token from the target
            emitted = prop[:n_acc] + [int(am[slot, n_acc])]
            base = int(lengths[slot])
            adv = 0
            for j, t in enumerate(emitted):
                self._absorb(slot, int(t), slot_len=base + j + 1)
                adv = j + 1
                if self.slot_req[slot] is None:
                    break
            lengths[slot] = base + adv
            new_tokens[slot] = emitted[adv - 1]
        self.lengths_host = lengths.copy()
        self.lengths = jnp.asarray(lengths)
        self.tokens_host = new_tokens.copy()
        self.tokens = jnp.asarray(new_tokens)

    def run(self, requests: Sequence[Request]) -> List[Request]:
        """Serve a list of requests to completion; returns the requests that
        finished during THIS call, in finish order. `self.finished` is
        cleared on entry so a long-lived engine (ChatSession, demo REPL)
        never accumulates request history."""
        self.finished = []
        for r in requests:
            self.submit(r)
        while self.queue or any(r is not None for r in self.slot_req):
            self.step()
        out = self.finished
        self.finished = []
        return out

    def decode_texts(self, requests: Sequence[Request]) -> Dict[Any, str]:
        """uid -> decoded text (stop strings trimmed) for finished requests."""
        out = {}
        for r in requests:
            text = self.tokenizer.decode(r.output_ids, skip_special_tokens=True)
            for s in r.stop_strings:
                idx = text.find(s)
                if idx >= 0:
                    text = text[:idx]
            out[r.uid] = text.strip()
        return out
