"""Beam search over the KV-cache decode path.

The reference exposes ``--num_beams`` through its eval loaders
(ola_vlm/eval/model_cvbench_loader.py:134,162, model_mmstar_loader.py:132,160)
and inherits HF's beam implementation; this is the TPU-native equivalent:

  * beams ride the BATCH axis of one KV cache — each step is a single jitted
    call that (1) reorders cache rows to each surviving beam's parent with one
    gather on the batch axis (axis 2 of the (L, S, B, Nkv, H) layout,
    models/decoder.py:69), (2) advances all beams one token, and (3) selects
    the top max(2, 1+n_eos)·B of the B·V candidate continuations with
    lax.top_k (HF's width rule: with k eos ids the top-2B could be all EOS
    and starve the live beams) — only those few scalars per step cross the
    host boundary, never a (B, V) distribution;
  * hypothesis bookkeeping (EOS candidates retiring to the finished set, the
    early-stopping test) is tiny host logic with HF's exact semantics:
    candidates are ranked sorted, an EOS candidate only retires when its rank
    is < num_beams, scores normalize by generated_len ** length_penalty, and
    with early_stopping=False the search ends when the worst finished score
    beats best_sum_logprobs / cur_generated_len ** length_penalty
    (transformers BeamSearchScorer.process/BeamHypotheses.is_done semantics);
  * num_beams=1 degrades to exactly the greedy path (pinned in tests).

Parity vs HF ``generate(num_beams=N, do_sample=False)`` on an imported
checkpoint is pinned in tests/test_hf_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.config import DecoderConfig
from visper_lm_tpu.models import decoder as dec


@dataclasses.dataclass
class _Hypothesis:
    tokens: List[int]      # generated tokens (no prompt, no trailing EOS)
    sum_logprobs: float
    score: float           # sum_logprobs / generated_len ** length_penalty


class BeamSearchDecoder:
    """Length-normalized beam search for one sequence (beams = batch rows)."""

    def __init__(
        self,
        params: Any,
        cfg: DecoderConfig,
        *,
        num_beams: int,
        max_len: int = 2048,
        cache_dtype=jnp.bfloat16,
        length_penalty: float = 1.0,
    ):
        assert num_beams >= 1
        self.params, self.cfg = params, cfg
        self.num_beams = num_beams
        self.length_penalty = float(length_penalty)
        self.max_len = -(-max_len // 128) * 128
        self.cache_dtype = cache_dtype
        # candidates per beam: HF's max(2, 1 + n_eos) — with k eos ids the
        # top-2B could otherwise be ALL eos (every parent's eos variants) and
        # starve the B live beams. Widened on demand by generate().
        self._cand_factor = 2
        self._build_jits()

    def _build_jits(self):
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(2,))
        self._step = jax.jit(self._step_impl, donate_argnums=(4,))
        self._select = jax.jit(self._select_impl)

    def _select_impl(self, logp, beam_scores):
        """Top (cand_factor*B) of the B*V candidate continuations (HF takes
        max(2, 1+n_eos)*B so EOS retirements can't starve the B live beams)."""
        flat = (beam_scores[:, None] + logp).reshape(-1)
        top_scores, top_idx = jax.lax.top_k(
            flat, self._cand_factor * self.num_beams
        )
        v = self.cfg.vocab_size
        return top_scores, top_idx // v, top_idx % v  # (scores, parents, tokens)

    def _prefill_impl(self, params, tokens, cache, beam_scores):
        emb = dec.embed_tokens(params, tokens)
        out = dec.decoder_forward(
            params, self.cfg, emb,
            kv_lengths=jnp.full((tokens.shape[0],), tokens.shape[1], jnp.int32),
            cache=cache, q_offset=jnp.int32(0),
        )
        logp = jax.nn.log_softmax(out["logits"][:, -1].astype(jnp.float32))
        return (*self._select_impl(logp, beam_scores), out["cache"])

    def _step_impl(self, params, tokens, parents, beam_scores, cache, q_offset):
        # apply the previous step's beam selection: one batch-axis gather
        cache = jax.tree.map(lambda a: jnp.take(a, parents, axis=2), cache)
        emb = dec.embed_tokens(params, tokens[:, None])
        out = dec.decoder_forward(
            params, self.cfg, emb,
            kv_lengths=q_offset[None].repeat(self.num_beams) + 1,
            cache=cache, q_offset=q_offset,
        )
        logp = jax.nn.log_softmax(out["logits"][:, 0].astype(jnp.float32))
        return (*self._select_impl(logp, beam_scores), out["cache"])

    def generate(
        self,
        prompt_ids: Sequence[int],
        *,
        max_new_tokens: int = 128,
        eos_token_ids: Sequence[int] = (),
    ) -> Tuple[List[int], float]:
        """Returns (best generated ids sans EOS, normalized score)."""
        prompt = list(map(int, prompt_ids))
        assert prompt, "empty prompt"
        assert len(prompt) + max_new_tokens <= self.max_len, "raise max_len"
        eos = set(map(int, eos_token_ids))
        B = self.num_beams
        need = max(2, 1 + len(eos))
        if need > self._cand_factor:
            # wider top-k so the candidate list can't be exhausted by EOS
            # rows alone; re-wrap the jits (the width is a static shape)
            self._cand_factor = need
            self._build_jits()

        cache = dec.init_kv_cache(self.cfg, B, self.max_len,
                                  dtype=self.cache_dtype)
        # beam 0 seeds the search; the rest start unreachable so step 1
        # expands B distinct continuations of the same prompt
        beam_scores = jnp.array([0.0] + [-1e9] * (B - 1), jnp.float32)
        toks = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (B, 1)))
        cand_scores, cand_parents, cand_tokens, cache = self._prefill(
            self.params, toks, cache, beam_scores
        )

        # host bookkeeping: per-beam generated suffixes + finished hypotheses
        beams: List[List[int]] = [[] for _ in range(B)]
        finished: List[_Hypothesis] = []
        p = len(prompt)

        for step in range(max_new_tokens):
            scores = np.asarray(cand_scores, np.float32)
            parents = np.asarray(cand_parents, np.int64)
            tokens = np.asarray(cand_tokens, np.int64)
            gen_len = step + 1

            next_rows: List[Tuple[float, int, int]] = []
            for rank in range(len(scores)):
                s, par, tok = float(scores[rank]), int(parents[rank]), int(tokens[rank])
                if tok in eos:
                    # HF rule: an EOS candidate ranked past the top B can
                    # never have survived as a beam — drop it
                    if rank >= B:
                        continue
                    self._add_hypothesis(finished, beams[par], s, gen_len)
                else:
                    next_rows.append((s, par, tok))
                    if len(next_rows) == B:
                        break
            assert len(next_rows) == B, "top-2B cannot exhaust below B non-EOS"

            last = step == max_new_tokens - 1
            done = self._is_done(finished, float(scores[0]), gen_len)
            if done or last:
                if not done:
                    # length limit: live beams retire as-is (HF finalize)
                    for s, par, tok in next_rows:
                        self._add_hypothesis(
                            finished, beams[par] + [tok], s, gen_len
                        )
                break

            beams = [beams[par] + [tok] for _, par, tok in next_rows]
            beam_scores = jnp.asarray([s for s, _, _ in next_rows], jnp.float32)
            cand_scores, cand_parents, cand_tokens, cache = self._step(
                self.params,
                jnp.asarray([t for _, _, t in next_rows], jnp.int32),
                jnp.asarray([par for _, par, _ in next_rows], jnp.int32),
                beam_scores, cache, jnp.int32(p + step),
            )

        best = max(finished, key=lambda h: h.score)
        return list(best.tokens), best.score

    def _add_hypothesis(self, finished: List[_Hypothesis],
                        tokens: List[int], sum_logprobs: float, gen_len: int):
        score = sum_logprobs / (gen_len ** self.length_penalty)
        finished.append(_Hypothesis(list(tokens), sum_logprobs, score))
        if len(finished) > self.num_beams:
            finished.remove(min(finished, key=lambda h: h.score))

    def _is_done(self, finished: List[_Hypothesis],
                 best_sum_logprobs: float, gen_len: int) -> bool:
        """early_stopping=False heuristic (BeamHypotheses.is_done)."""
        if len(finished) < self.num_beams:
            return False
        worst = min(h.score for h in finished)
        return worst >= best_sum_logprobs / (gen_len ** self.length_penalty)
