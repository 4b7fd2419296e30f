"""Speculative decoding: greedy-exactness vs the plain target decode,
acceptance accounting, eos handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visper_lm_tpu.config import DecoderConfig
from visper_lm_tpu.models.decoder import init_decoder
from visper_lm_tpu.serve.speculative import (
    SpeculativeDecoder,
    greedy_reference_ids,
)


def _cfg(layers: int, seed_dim: int = 64) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=256, hidden_size=seed_dim, num_layers=layers, num_heads=4,
        num_kv_heads=2, head_dim=16, mlp_dim=seed_dim * 2, dtype="float32",
        max_seq_len=512,
    )


@pytest.fixture(scope="module")
def models():
    tc = _cfg(4)
    dc = _cfg(2, seed_dim=32)
    tp = init_decoder(jax.random.PRNGKey(0), tc)
    dp = init_decoder(jax.random.PRNGKey(1), dc)
    return tp, tc, dp, dc


def test_speculative_matches_target_greedy_exactly(models):
    """The guarantee: output tokens == the target's greedy sequence no matter
    how bad the (independently random) draft is."""
    tp, tc, dp, dc = models
    prompt = [5, 17, 101, 33, 7]
    ref = greedy_reference_ids(
        tp, tc, prompt, max_new_tokens=24, max_len=512,
        cache_dtype=jnp.float32,
    )
    for k in (1, 3, 5):
        spec = SpeculativeDecoder(
            tp, tc, dp, dc, k=k, max_len=512, cache_dtype=jnp.float32
        )
        out, stats = spec.generate(prompt, max_new_tokens=24)
        assert out == ref, (k, out, ref)
        assert stats.generated == len(out)
        assert stats.iterations >= 1
        # every iteration emits accepted + 1 bonus
        assert stats.generated >= stats.iterations


def test_speculative_self_draft_accepts_everything(models):
    """Draft == target: every proposal must be accepted, so k+1 tokens come
    out of every single target pass."""
    tp, tc, _, _ = models
    prompt = [9, 42, 250]
    k = 4
    spec = SpeculativeDecoder(
        tp, tc, tp, tc, k=k, max_len=512, cache_dtype=jnp.float32
    )
    out, stats = spec.generate(prompt, max_new_tokens=20)
    ref = greedy_reference_ids(
        tp, tc, prompt, max_new_tokens=20, max_len=512,
        cache_dtype=jnp.float32,
    )
    assert out == ref
    assert stats.acceptance_rate == pytest.approx(1.0)
    assert stats.tokens_per_target_pass == pytest.approx(k + 1)


def test_speculative_eos_stops_mid_chunk(models):
    """An eos inside an accepted run must cut the output there, exactly like
    the plain greedy loop."""
    tp, tc, dp, dc = models
    prompt = [5, 17, 101, 33, 7]
    ref_full = greedy_reference_ids(
        tp, tc, prompt, max_new_tokens=24, max_len=512,
        cache_dtype=jnp.float32,
    )
    eos = ref_full[7]  # force a stop at the 8th generated token
    ref = greedy_reference_ids(
        tp, tc, prompt, max_new_tokens=24, eos_token_ids=[eos], max_len=512,
        cache_dtype=jnp.float32,
    )
    spec = SpeculativeDecoder(
        tp, tc, dp, dc, k=4, max_len=512, cache_dtype=jnp.float32
    )
    out, _ = spec.generate(prompt, max_new_tokens=24, eos_token_ids=[eos])
    assert out == ref
    assert out[-1] == eos


def test_speculative_single_token_prompt(models):
    tp, tc, dp, dc = models
    prompt = [11]
    ref = greedy_reference_ids(
        tp, tc, prompt, max_new_tokens=8, max_len=512,
        cache_dtype=jnp.float32,
    )
    spec = SpeculativeDecoder(
        tp, tc, dp, dc, k=2, max_len=512, cache_dtype=jnp.float32
    )
    out, _ = spec.generate(prompt, max_new_tokens=8)
    assert out == ref


# ----------------------------------------------------------- prompt lookup


def test_ngram_propose():
    from visper_lm_tpu.serve.speculative import ngram_propose

    #              0  1  2  3  4  5  6  7
    history = [10, 20, 30, 40, 10, 20]
    # last 2-gram (10, 20) recurs at position 0 -> copy 30, 40
    assert ngram_propose(history, n=2, k=2) == [30, 40]
    assert ngram_propose(history, n=2, k=5) == [30, 40, 10, 20]
    # most RECENT match wins
    h2 = [1, 2, 9, 1, 2, 7, 1, 2]
    assert ngram_propose(h2, n=2, k=1) == [7]
    # fallback to shorter suffix when the full n-gram never recurred
    h3 = [5, 6, 7, 6]
    assert ngram_propose(h3, n=3, k=1) == [7]  # matches 1-gram [6]
    # nothing to match
    assert ngram_propose([1, 2, 3], n=2, k=3) == []


def test_prompt_lookup_matches_target_greedy_exactly(models):
    """Exactness holds whether n-gram proposals hit or miss."""
    from visper_lm_tpu.serve.speculative import PromptLookupDecoder

    tp, tc, _, _ = models
    # a repetitive prompt gives the matcher something to copy
    prompt = [5, 17, 101, 33, 5, 17, 101, 33, 5, 17]
    ref = greedy_reference_ids(
        tp, tc, prompt, max_new_tokens=20, max_len=512,
        cache_dtype=jnp.float32,
    )
    for k, n in ((4, 2), (8, 3)):
        dec_ = PromptLookupDecoder(
            tp, tc, k=k, ngram=n, max_len=512, cache_dtype=jnp.float32
        )
        out, stats = dec_.generate(prompt, max_new_tokens=20)
        assert out == ref, (k, n, out, ref)
        assert stats.generated == len(out)


# ------------------------------------------------------ speculative sampling


def test_spec_accept_distribution_exact():
    """The statistical guarantee: with proposals drawn from q, the emitted
    token at each position is distributed EXACTLY as the target's p —
    checked to Monte-Carlo precision over 200k trials."""
    from visper_lm_tpu.serve.speculative import spec_accept

    V, k, M = 13, 3, 200_000
    kp, kq = jax.random.split(jax.random.PRNGKey(7))
    p = jax.nn.softmax(1.5 * jax.random.normal(kp, (k + 1, V)), axis=-1)
    q = jax.nn.softmax(1.5 * jax.random.normal(kq, (k, V)), axis=-1)

    @jax.jit
    def trial(key):
        kd, ka = jax.random.split(key)
        d = jax.random.categorical(kd, jnp.log(q), axis=-1)
        n, fix = spec_accept(p, q, d, ka)
        tok0 = jnp.where(n > 0, d[0], fix)
        tok1 = jnp.where(n > 1, d[1], fix)  # valid conditioned on n >= 1
        return tok0, tok1, n

    tok0, tok1, n = jax.vmap(trial)(jax.random.split(jax.random.PRNGKey(1), M))
    tok0, tok1, n = map(np.asarray, (tok0, tok1, n))

    emp0 = np.bincount(tok0, minlength=V) / M
    tv0 = 0.5 * np.abs(emp0 - np.asarray(p[0])).sum()
    assert tv0 < 0.01, tv0

    # position 1's marginal (given position 0 accepted) is p[1] — the chain
    # property that makes the whole emitted sequence target-distributed
    sel = tok1[n >= 1]
    emp1 = np.bincount(sel, minlength=V) / sel.size
    tv1 = 0.5 * np.abs(emp1 - np.asarray(p[1])).sum()
    assert tv1 < 0.02, tv1


def test_spec_accept_empty_draft_samples_target():
    """k == 0 degrades to a plain sample from the target row."""
    from visper_lm_tpu.serve.speculative import spec_accept

    V, M = 11, 100_000
    p = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (1, V)))

    @jax.jit
    def trial(key):
        n, fix = spec_accept(p, jnp.zeros((0, V)), jnp.zeros((0,), jnp.int32), key)
        return fix

    toks = np.asarray(jax.vmap(trial)(jax.random.split(jax.random.PRNGKey(4), M)))
    emp = np.bincount(toks, minlength=V) / M
    assert 0.5 * np.abs(emp - np.asarray(p[0])).sum() < 0.01


def test_speculative_sampling_e2e(models):
    """Plumbing: sampling mode runs, is seed-deterministic, and a self-draft
    accepts everything (u < p/p == 1 always)."""
    tp, tc, dp, dc = models
    prompt = [5, 17, 101, 33, 7]
    spec = SpeculativeDecoder(
        tp, tc, dp, dc, k=3, max_len=512, cache_dtype=jnp.float32,
        temperature=0.9, top_p=0.95,
    )
    out1, stats = spec.generate(prompt, max_new_tokens=16, seed=11)
    assert len(out1) == 16 and stats.generated == 16
    spec2 = SpeculativeDecoder(
        tp, tc, dp, dc, k=3, max_len=512, cache_dtype=jnp.float32,
        temperature=0.9, top_p=0.95,
    )
    out2, _ = spec2.generate(prompt, max_new_tokens=16, seed=11)
    assert out1 == out2  # same seed, fresh caches -> same tokens
    out3, _ = spec2.generate(prompt, max_new_tokens=16, seed=12)
    assert out3 != out1  # (overwhelmingly likely for 16 sampled tokens)

    self_spec = SpeculativeDecoder(
        tp, tc, tp, tc, k=3, max_len=512, cache_dtype=jnp.float32,
        temperature=0.9,
    )
    _, st = self_spec.generate(prompt, max_new_tokens=12, seed=0)
    assert st.acceptance_rate == pytest.approx(1.0)


def test_prompt_lookup_sampling_e2e(models):
    from visper_lm_tpu.serve.speculative import PromptLookupDecoder

    tp, tc, _, _ = models
    prompt = [5, 17, 101, 33, 5, 17, 101, 33, 5, 17]
    dec_ = PromptLookupDecoder(
        tp, tc, k=4, ngram=2, max_len=512, cache_dtype=jnp.float32,
        temperature=0.8,
    )
    out1, stats = dec_.generate(prompt, max_new_tokens=12, seed=5)
    assert len(out1) == 12 and stats.generated == 12
    dec2 = PromptLookupDecoder(
        tp, tc, k=4, ngram=2, max_len=512, cache_dtype=jnp.float32,
        temperature=0.8,
    )
    out2, _ = dec2.generate(prompt, max_new_tokens=12, seed=5)
    assert out1 == out2
