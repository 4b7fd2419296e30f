"""Speculative (draft/verify) decoding — the decode-floor lever past
weight/KV quantization. Greedy by default; with ``temperature > 0`` it runs
speculative SAMPLING (Leviathan et al.'s rejection scheme): each drafted
token is accepted with probability min(1, p(x)/q(x)) and a rejection
resamples from normalize(max(p - q, 0)), which makes the OUTPUT DISTRIBUTION
exactly the target model's (warped) sampling distribution regardless of the
draft — pinned statistically in tests/test_speculative.py.

Single-chip decode is weight-streaming-bound (~380 GB/s effective on v5e, see
docs/Design.md): every generated token pays one full read of the target
decoder's weights. Speculative decoding amortizes that read across several
tokens — a small DRAFT model proposes k tokens autoregressively, the TARGET
verifies all k+1 positions in ONE chunked forward (one weight read), and the
longest prefix on which the draft agrees with the target's greedy argmax is
accepted plus one bonus token from the target. With greedy decoding the
output is EXACTLY the target model's greedy sequence regardless of draft
quality (pinned in tests/test_speculative.py); draft quality only moves the
speed-up, never the tokens.

TPU-shaped design:
  * two compiled programs, reused every iteration: a single-token draft step
    and a STATIC (k+1)-token target verify chunk (models/decoder.py's cache
    path attends cache + in-register chunk and writes all k+1 slots in one
    dynamic-update-slice);
  * variable acceptance never creates dynamic shapes on device — the host
    loop tracks the valid length, stale cache slots beyond it are masked by
    kv_lengths and overwritten in place by later (monotonically advancing)
    chunk writes;
  * the draft runs k+1 single-token steps (the last one's logits are unused)
    so its cache always covers slot p+k like the target's; otherwise a
    full-k acceptance would leave a hole at the draft's slot p+k.

Latency-oriented: batch 1 (per-sequence acceptance lengths diverge in a
batch; throughput-oriented serving uses serve/generate.Generator). The
reference has no speculative path — pure TPU-serving headroom beyond parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.config import DecoderConfig
from visper_lm_tpu.models import decoder as dec


@dataclasses.dataclass
class SpecStats:
    proposed: int = 0          # draft tokens proposed
    accepted: int = 0          # draft tokens accepted by the target
    iterations: int = 0        # verify calls (== target weight reads)
    generated: int = 0         # tokens emitted (accepted + bonus per iter)

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0

    @property
    def tokens_per_target_pass(self) -> float:
        return self.generated / self.iterations if self.iterations else 0.0


def _safe_log(probs: jax.Array) -> jax.Array:
    """log(probs) with exact -inf (not a huge negative) at zero entries, so
    top-p-excluded tokens can never be drawn by jax.random.categorical."""
    return jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)


def warp_probs(logits: jax.Array, temperature: float, top_p: float) -> jax.Array:
    """Temperature + nucleus warp -> probabilities over the last axis. Same
    semantics as serve/generate._sample_tokens (cutoff keeps the smallest
    prefix of descending-prob tokens whose cumulative mass reaches top_p)."""
    logits = logits.astype(jnp.float32) / temperature
    if top_p < 1.0:
        sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.nn.softmax(logits, axis=-1)


def spec_accept(
    p: jax.Array, q: jax.Array, d: jax.Array, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """The speculative-sampling accept/resample rule, fully on device.

    p: (k+1, V) target probs at the k drafted positions plus the bonus slot;
    q: (k, V) draft probs the proposals were sampled from; d: (k,) proposals.
    Returns (n, fixup): n = accepted prefix length in [0, k]; fixup = the one
    extra emitted token — a residual resample at position n when n < k, else
    the bonus sample from p[k]. Output tokens d[:n] + [fixup] are distributed
    exactly as k_eff+1 draws from the target's autoregressive distribution.
    """
    k = d.shape[0]
    ku, kr, kb = jax.random.split(key, 3)
    bonus = jax.random.categorical(kb, _safe_log(p[-1]))
    if k == 0:  # draft-free iteration (e.g. no n-gram match): pure target step
        return jnp.int32(0), bonus
    idx = jnp.arange(k)
    # accept iff u < p(x)/q(x)  <=>  u*q < p (robust when q(x) underflows)
    u = jax.random.uniform(ku, (k,), dtype=jnp.float32)
    accept = u * q[idx, d] < p[idx, d]
    # first rejected position == number of leading accepts (sentinel => k)
    n = jnp.argmin(jnp.concatenate([accept, jnp.zeros((1,), bool)]))
    res = jnp.maximum(p[:k] - q, 0.0)
    res_sum = jnp.sum(res, axis=-1, keepdims=True)
    # residual mass is provably > 0 whenever a rejection can occur; the
    # where() only guards float underflow on near-identical p, q
    res = jnp.where(res_sum > 1e-12, res / jnp.maximum(res_sum, 1e-20), p[:k])
    resample = jax.random.categorical(kr, _safe_log(res[jnp.minimum(n, k - 1)]))
    fixup = jnp.where(n < k, resample, bonus)
    return n.astype(jnp.int32), fixup


class SpeculativeDecoder:
    """Compiled draft/verify decoder for one sequence (batch 1): greedy-exact
    at temperature 0, distribution-exact speculative sampling above it."""

    def __init__(
        self,
        target_params: Any,
        target_cfg: DecoderConfig,
        draft_params: Any,
        draft_cfg: DecoderConfig,
        *,
        k: int = 4,
        max_len: int = 2048,
        cache_dtype=jnp.bfloat16,
        temperature: float = 0.0,
        top_p: float = 1.0,
    ):
        assert target_cfg.vocab_size == draft_cfg.vocab_size, (
            "draft and target must share the tokenizer/vocab"
        )
        assert k >= 1
        self.tp, self.tc = target_params, target_cfg
        self.dp, self.dc = draft_params, draft_cfg
        self.k = k
        # multiple of 128 for well-tiled KV blocks (serve/generate.py:126-129)
        self.max_len = -(-max_len // 128) * 128
        self.cache_dtype = cache_dtype
        # static per instance so the warp branch bakes into the compiled fns
        self.temperature = float(temperature)
        self.top_p = float(top_p)

        # one compiled program per (params-structure, chunk length); donation
        # keeps each cache single-buffered (serve/generate.py:146-149). params
        # ride as ARGUMENTS — closed-over arrays inline into the serialized
        # HLO and blow up remote compiles (train_step.py:69-71 lesson).
        self._chunk_fwd = jax.jit(
            self._chunk_fwd_impl, donate_argnums=(2,),
            static_argnames=("is_target",),
        )
        self._draft_sample = jax.jit(self._draft_sample_impl, donate_argnums=(2,))
        self._verify_sample = jax.jit(self._verify_sample_impl, donate_argnums=(2,))

    def _chunk_fwd_impl(self, params, tokens, cache, q_offset, *,
                        is_target: bool):
        """Feed a (1, t) token chunk at q_offset; greedy argmax per position."""
        cfg = self.tc if is_target else self.dc
        t = tokens.shape[1]
        emb = dec.embed_tokens(params, tokens)
        out = dec.decoder_forward(
            params, cfg, emb,
            kv_lengths=q_offset[None] + t,
            cache=cache, q_offset=q_offset,
        )
        return jnp.argmax(out["logits"], axis=-1)[0], out["cache"]

    def _fwd(self, tokens: Sequence[int], cache, offset: int, is_target: bool):
        toks = jnp.asarray(np.asarray(tokens, np.int32)[None, :])
        greedy, cache = self._chunk_fwd(
            self.tp if is_target else self.dp,
            toks, cache, jnp.int32(offset), is_target=is_target,
        )
        return np.asarray(greedy), cache

    def _draft_sample_impl(self, params, tokens, cache, q_offset, key):
        """One draft step: sample next token AND return the warped draft
        distribution it was drawn from (the q row spec_accept needs)."""
        emb = dec.embed_tokens(params, tokens)
        out = dec.decoder_forward(
            params, self.dc, emb,
            kv_lengths=q_offset[None] + tokens.shape[1],
            cache=cache, q_offset=q_offset,
        )
        probs = warp_probs(out["logits"][0, -1], self.temperature, self.top_p)
        tok = jax.random.categorical(key, _safe_log(probs))
        return tok, probs, out["cache"]

    def _verify_sample_impl(self, params, tokens, cache, q_offset,
                            q_probs, d_tokens, key):
        """Target verify chunk + on-device accept/resample: no (k+1, V)
        distribution ever leaves the chip, only (n, fixup) scalars do."""
        emb = dec.embed_tokens(params, tokens)
        out = dec.decoder_forward(
            params, self.tc, emb,
            kv_lengths=q_offset[None] + tokens.shape[1],
            cache=cache, q_offset=q_offset,
        )
        p = warp_probs(out["logits"][0], self.temperature, self.top_p)
        n, fixup = spec_accept(p, q_probs, d_tokens, key)
        return n, fixup, out["cache"]

    def generate(
        self,
        prompt_ids: Sequence[int],
        *,
        max_new_tokens: int = 128,
        eos_token_ids: Sequence[int] = (),
        seed: int = 0,
    ) -> Tuple[List[int], SpecStats]:
        """Speculative decode: greedy-exact (temperature 0) or
        distribution-exact sampling. Returns (generated_ids, stats)."""
        sampling = self.temperature > 0.0
        key = jax.random.PRNGKey(seed)
        prompt = list(map(int, prompt_ids))
        assert prompt, "empty prompt"
        assert len(prompt) + max_new_tokens + self.k + 1 <= self.max_len, (
            "raise max_len"
        )
        eos = set(map(int, eos_token_ids))

        t_cache = self._init_cache(self.tc)
        d_cache = self._init_cache(self.dc)

        # prefill both on the prompt MINUS its last token; the last prompt
        # token becomes the first `last` fed through the verify chunk, so the
        # prefill's logits are never needed
        p = len(prompt) - 1
        if p:
            _, t_cache = self._fwd(prompt[:-1], t_cache, 0, True)
            _, d_cache = self._fwd(prompt[:-1], d_cache, 0, False)
        last = prompt[-1]

        out: List[int] = []
        stats = SpecStats()
        while len(out) < max_new_tokens:
            # ---- draft k proposals (k+1 steps; see module docstring) ----
            drafts: List[int] = []
            q_rows: List[jax.Array] = []
            tok = last
            for i in range(self.k + 1):
                if sampling:
                    key, sub = jax.random.split(key)
                    g, probs, d_cache = self._draft_sample(
                        self.dp, jnp.asarray([[tok]], jnp.int32),
                        d_cache, jnp.int32(p + i), sub,
                    )
                    if i < self.k:
                        drafts.append(int(g))
                        q_rows.append(probs)
                        tok = drafts[-1]
                else:
                    g, d_cache = self._fwd([tok], d_cache, p + i, False)
                    if i < self.k:
                        drafts.append(int(g[0]))
                        tok = drafts[-1]
            # ---- one target pass verifies all k+1 positions ----
            if sampling:
                key, sub = jax.random.split(key)
                n_dev, fixup, t_cache = self._verify_sample(
                    self.tp,
                    jnp.asarray([[last] + drafts], jnp.int32),
                    t_cache, jnp.int32(p),
                    jnp.stack(q_rows), jnp.asarray(drafts, jnp.int32), sub,
                )
                n = int(n_dev)
                emitted = drafts[:n] + [int(fixup)]
            else:
                greedy, t_cache = self._fwd([last] + drafts, t_cache, p, True)
                n = 0
                while n < self.k and drafts[n] == int(greedy[n]):
                    n += 1
                emitted = drafts[:n] + [int(greedy[n])]

            stats.proposed += self.k
            stats.accepted += n
            stats.iterations += 1

            for e in emitted:
                out.append(e)
                stats.generated += 1
                if e in eos or len(out) >= max_new_tokens:
                    return out, stats
            p += n + 1
            last = out[-1]
        return out, stats

    def _init_cache(self, cfg: DecoderConfig):
        return dec.init_kv_cache(cfg, 1, self.max_len, dtype=self.cache_dtype)


def ngram_propose(
    history: Sequence[int], n: int, k: int, min_match: int = 1
) -> List[int]:
    """Prompt-lookup proposal: find the MOST RECENT earlier occurrence of the
    last `n`-gram (falling back to shorter suffixes down to `min_match`) in
    `history` and copy up to k following tokens. Returns [] when nothing
    matches — the caller degrades to a plain target step."""
    h = list(history)
    for m in range(min(n, len(h) - 1), min_match - 1, -1):
        suffix = h[-m:]
        # scan right-to-left over prior positions (most recent match wins)
        for start in range(len(h) - m - 1, -1, -1):
            if h[start:start + m] == suffix:
                cont = h[start + m : start + m + k]
                if cont:
                    return cont
    return []


class PromptLookupDecoder:
    """Draft-FREE speculative decoding: proposals come from n-gram matches
    against the token history (prompt + generated) instead of a draft model.

    Multimodal serving prompts are long and answers are often extractive
    (OCR reads, DocVQA spans, option letters echoed from the choices), so the
    continuation of the current n-gram frequently already sits in the prompt.
    Zero extra weights, zero draft passes — an iteration costs ONE target
    chunk forward whether it verifies 1 or k+1 positions. Greedy-exact like
    SpeculativeDecoder (same verify rule)."""

    def __init__(
        self,
        target_params: Any,
        target_cfg: DecoderConfig,
        *,
        k: int = 8,
        ngram: int = 3,
        max_len: int = 2048,
        cache_dtype=jnp.bfloat16,
        temperature: float = 0.0,
        top_p: float = 1.0,
    ):
        self.tp, self.tc = target_params, target_cfg
        self.k, self.n = k, ngram
        self.max_len = -(-max_len // 128) * 128
        self.cache_dtype = cache_dtype
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self._chunk_fwd = jax.jit(
            self._chunk_fwd_impl, donate_argnums=(2,)
        )
        self._verify_sample = jax.jit(self._verify_sample_impl, donate_argnums=(2,))

    def _chunk_fwd_impl(self, params, tokens, cache, q_offset):
        emb = dec.embed_tokens(params, tokens)
        out = dec.decoder_forward(
            params, self.tc, emb,
            kv_lengths=q_offset[None] + tokens.shape[1],
            cache=cache, q_offset=q_offset,
        )
        return jnp.argmax(out["logits"], axis=-1)[0], out["cache"]

    def _verify_sample_impl(self, params, tokens, cache, q_offset,
                            d_tokens, key):
        """A deterministic n-gram proposal is a point-mass draft distribution:
        q = one_hot(d), so accept prob collapses to p(d) and the residual is
        p with the proposed token zeroed — still distribution-exact."""
        emb = dec.embed_tokens(params, tokens)
        out = dec.decoder_forward(
            params, self.tc, emb,
            kv_lengths=q_offset[None] + tokens.shape[1],
            cache=cache, q_offset=q_offset,
        )
        p = warp_probs(out["logits"][0], self.temperature, self.top_p)
        q = jax.nn.one_hot(d_tokens, self.tc.vocab_size, dtype=jnp.float32)
        n, fixup = spec_accept(p, q, d_tokens, key)
        return n, fixup, out["cache"]

    def _fwd(self, tokens, cache, offset):
        toks = jnp.asarray(np.asarray(tokens, np.int32)[None, :])
        g, cache = self._chunk_fwd(self.tp, toks, cache, jnp.int32(offset))
        return np.asarray(g), cache

    def generate(
        self,
        prompt_ids: Sequence[int],
        *,
        max_new_tokens: int = 128,
        eos_token_ids: Sequence[int] = (),
        seed: int = 0,
    ) -> Tuple[List[int], SpecStats]:
        sampling = self.temperature > 0.0
        key = jax.random.PRNGKey(seed)
        prompt = list(map(int, prompt_ids))
        assert prompt, "empty prompt"
        assert len(prompt) + max_new_tokens + self.k + 1 <= self.max_len
        eos = set(map(int, eos_token_ids))

        cache = dec.init_kv_cache(self.tc, 1, self.max_len,
                                  dtype=self.cache_dtype)
        p = len(prompt) - 1
        if p:
            _, cache = self._fwd(prompt[:-1], cache, 0)
        last = prompt[-1]

        out: List[int] = []
        stats = SpecStats()
        while len(out) < max_new_tokens:
            history = prompt + out
            drafts = ngram_propose(history, self.n, self.k)
            if sampling:
                key, sub = jax.random.split(key)
                n_dev, fixup, cache = self._verify_sample(
                    self.tp,
                    jnp.asarray([[last] + drafts], jnp.int32),
                    cache, jnp.int32(p),
                    jnp.asarray(drafts, jnp.int32), sub,
                )
                n = int(n_dev)
                emitted = drafts[:n] + [int(fixup)]
            else:
                greedy, cache = self._fwd([last] + drafts, cache, p)
                n = 0
                while n < len(drafts) and drafts[n] == int(greedy[n]):
                    n += 1
                emitted = drafts[:n] + [int(greedy[n])]

            stats.proposed += len(drafts)
            stats.accepted += n
            stats.iterations += 1
            for e in emitted:
                out.append(e)
                stats.generated += 1
                if e in eos or len(out) >= max_new_tokens:
                    return out, stats
            p += n + 1
            last = out[-1]
        return out, stats


def greedy_reference_ids(
    params: Any,
    cfg: DecoderConfig,
    prompt_ids: Sequence[int],
    *,
    max_new_tokens: int = 128,
    eos_token_ids: Sequence[int] = (),
    max_len: int = 2048,
    cache_dtype=jnp.bfloat16,
) -> List[int]:
    """Plain one-token-at-a-time greedy decode (the exactness oracle)."""
    max_len = -(-max_len // 128) * 128
    cache = dec.init_kv_cache(cfg, 1, max_len, dtype=cache_dtype)

    @jax.jit
    def step(tokens, cache, q_offset):
        emb = dec.embed_tokens(params, tokens)
        out = dec.decoder_forward(
            params, cfg, emb,
            kv_lengths=q_offset[None] + tokens.shape[1],
            cache=cache, q_offset=q_offset,
        )
        return jnp.argmax(out["logits"][0, -1]), out["cache"]

    prompt = list(map(int, prompt_ids))
    eos = set(map(int, eos_token_ids))
    tok, cache = step(
        jnp.asarray(np.asarray(prompt, np.int32)[None, :]), cache, jnp.int32(0)
    )
    out = [int(tok)]
    p = len(prompt)
    while len(out) < max_new_tokens and out[-1] not in eos:
        tok, cache = step(
            jnp.asarray([[out[-1]]], jnp.int32), cache, jnp.int32(p)
        )
        out.append(int(tok))
        p += 1
    return out


def _bench(args=None) -> None:
    """Time the speculative building blocks on the current backend and print
    the break-even acceptance rate as one JSON line.

    Effective tokens/s = (alpha*k + 1) / T_iter with
    T_iter = (k+1)*T_draft + T_verify(k+1); plain decode = 1 / T_target.
    Speculation wins when alpha > (T_iter/T_target - 1) / k. No trained draft
    is needed to measure the mechanics — alpha moves quality, not cost.
    """
    import argparse
    import json
    import time

    p = argparse.ArgumentParser()
    p.add_argument("--target-layers", type=int, default=32)
    p.add_argument("--hidden", type=int, default=3072)
    p.add_argument("--draft-layers", type=int, default=4)
    p.add_argument("--draft-hidden", type=int, default=1024)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--prompt", type=int, default=768)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--smoke", action="store_true")
    a = p.parse_args(args)
    if a.smoke:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        a.target_layers, a.hidden = 2, 128
        a.draft_layers, a.draft_hidden = 1, 64
        a.prompt, a.iters = 32, 3

    def mk(layers, hidden):
        return DecoderConfig(
            vocab_size=32064, hidden_size=hidden, num_layers=layers,
            num_heads=hidden // 96 if hidden % 96 == 0 else 8,
            num_kv_heads=4 if hidden >= 512 else 2,
            head_dim=96 if hidden % 96 == 0 else hidden // 8,
            mlp_dim=int(hidden * 8 / 3) // 128 * 128 or hidden * 2,
            max_seq_len=4096,
        )

    from visper_lm_tpu.models.decoder import init_decoder

    tc, dcfg = mk(a.target_layers, a.hidden), mk(a.draft_layers, a.draft_hidden)
    tp = init_decoder(jax.random.PRNGKey(0), tc)
    dp = init_decoder(jax.random.PRNGKey(1), dcfg)
    spec = SpeculativeDecoder(tp, tc, dp, dcfg, k=a.k,
                              max_len=a.prompt + 256 + a.k)
    prompt = list(np.random.default_rng(0).integers(3, 30000, size=a.prompt))
    # warm up all three compiled shapes
    spec.generate(prompt, max_new_tokens=a.k + 2)

    def timed(fn, n):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    pos = a.prompt + 8
    d_cache = spec._init_cache(dcfg)
    t_cache = spec._init_cache(tc)
    _, d_cache = spec._fwd([1], d_cache, pos, False)
    _, t_cache = spec._fwd([1], t_cache, pos, True)

    def draft_step():
        nonlocal d_cache
        g, d_cache = spec._fwd([1], d_cache, pos, False)
        float(g[0])

    def verify_chunk():
        nonlocal t_cache
        g, t_cache = spec._fwd([1] * (a.k + 1), t_cache, pos, True)
        float(g[0])

    def target_step():
        nonlocal t_cache
        g, t_cache = spec._fwd([1], t_cache, pos, True)
        float(g[0])

    t_draft = timed(draft_step, a.iters)
    t_verify = timed(verify_chunk, a.iters)
    t_target = timed(target_step, a.iters)
    t_iter = (a.k + 1) * t_draft + t_verify
    breakeven = max(0.0, (t_iter / t_target - 1.0) / a.k)
    print(json.dumps({
        "metric": "speculative_breakeven_acceptance",
        "value": round(breakeven, 4),
        "unit": "accept_rate",
        "k": a.k,
        "draft_step_ms": round(t_draft * 1e3, 3),
        "verify_chunk_ms": round(t_verify * 1e3, 3),
        "target_step_ms": round(t_target * 1e3, 3),
        "tokens_per_sec_at_alpha": {
            str(al): round((al * a.k + 1) / t_iter, 1)
            for al in (0.5, 0.7, 0.9)
        },
        "plain_tokens_per_sec": round(1 / t_target, 1),
    }))


if __name__ == "__main__":
    _bench()
