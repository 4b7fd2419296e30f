"""Generic decoder-only transformer (covers Llama3-8b, Phi3-mini-4k, Vicuna-7b).

TPU-first design choices (vs the reference's HF LlamaModel/Phi3Model usage,
/root/reference/ola_vlm/model/language_model/ola_llama.py:105-119):

  * Block params are STACKED along a leading layer axis and the layer loop is a single
    `lax.scan`, so XLA compiles one block body regardless of depth and rematerializes
    cleanly under `jax.checkpoint`.
  * Layer taps: the reference materializes all 33 hidden states
    (output_hidden_states=True) to slice 2-6 of them. Here the tapped layers SEGMENT
    the scan — each tapped block output is a segment boundary, costing zero extra
    activation memory; segments scan over layer indices and gather blocks from the
    stacked tree so no weight copies are materialized either. taps[i] equals the
    reference's `layer_states[tap_layers[i]]` (hidden_states[1:][idx],
    ola_llama.py:119).
  * KV caches are scanned over alongside the params, stored SLOT-MAJOR
    (L, S, B, Nkv, H) — the layout XLA's TPU layout assignment picks for the
    decode loop (per-step single-token writes are contiguous, so the
    dynamic-update-slice is in-place; any other order relayout-copies the
    whole cache every step). TP still shards Nkv.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from visper_lm_tpu.config import DecoderConfig
from visper_lm_tpu.models.rope import apply_rope, rope_cos_sin
from visper_lm_tpu.ops.attention import mha_xla_cache, multi_head_attention
from visper_lm_tpu.utils.param import (
    Params,
    embed,
    init_embedding,
    init_linear,
    init_rmsnorm,
    linear,
    rmsnorm,
    stack_layer_params,
)


class KVCache(NamedTuple):
    """Slot-major cache: (L, S_max, B, Nkv, H).

    This is the layout XLA's TPU layout assignment picks for the decode loop
    (observed {4,2,1,3,0} on the 5D cache): the per-step single-token write
    (all batch x heads at one slot) is one contiguous slab, so the
    dynamic-update-slice is in-place. Any OTHER logical order made XLA
    relayout-copy the ENTIRE cache (2x ~2 GiB temps per step at B16 — both the
    round-1 sequence-major and the head-major experiment paid this).
    """

    k: jax.Array  # (L, S_max, B, Nkv, H)
    v: jax.Array  # (L, S_max, B, Nkv, H)

    @property
    def max_len(self) -> int:
        return self.k.shape[1]


def init_kv_cache(
    cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_layers, max_len, batch, cfg.num_kv_heads, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype=dtype), v=jnp.zeros(shape, dtype=dtype))


class QuantKVCache(NamedTuple):
    """int8 KV cache with per-(token, head) scales over the head dim.

    Halves decode-time cache HBM footprint and read bandwidth vs bf16 (the decode
    bottleneck is cache+weight streaming). Quantization happens at cache-write,
    dequantization is a fused multiply at attention time.
    """

    k: jax.Array        # (L, S_max, B, Nkv, H) int8
    v: jax.Array        # (L, S_max, B, Nkv, H) int8
    k_scale: jax.Array  # (L, S_max, B, Nkv) float32
    v_scale: jax.Array  # (L, S_max, B, Nkv) float32

    @property
    def max_len(self) -> int:
        return self.k.shape[1]


def init_quant_kv_cache(cfg: DecoderConfig, batch: int, max_len: int) -> QuantKVCache:
    shape = (cfg.num_layers, max_len, batch, cfg.num_kv_heads, cfg.head_dim)
    return QuantKVCache(
        k=jnp.zeros(shape, dtype=jnp.int8),
        v=jnp.zeros(shape, dtype=jnp.int8),
        k_scale=jnp.ones(shape[:-1], dtype=jnp.float32),
        v_scale=jnp.ones(shape[:-1], dtype=jnp.float32),
    )


def _quantize_head_vectors(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization per (..., H) vector. Returns (int8, f32 scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _stacked_linear(key: jax.Array, L: int, din: int, dout: int, dtype) -> Params:
    """(L, din, dout) kernel initialized in ONE low-precision random call.

    Per-layer f32 init + tree stacking peaks at ~3x the final weight footprint on
    device — at 8B scale that alone exceeds HBM. Generate stacked and in-dtype.
    """
    import math

    scale = 1.0 / math.sqrt(din)
    kernel = jax.random.uniform(
        key, (L, din, dout), dtype=dtype, minval=-scale, maxval=scale
    )
    return {"kernel": kernel}


def init_decoder(key: jax.Array, cfg: DecoderConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    ks = jax.random.split(key, 10)
    L = cfg.num_layers
    h, nh, nkv, hd, m = (
        cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.mlp_dim
    )
    blocks: Params = {
        "attn_norm": {"scale": jnp.ones((L, h), dtype)},
        "q_proj": _stacked_linear(ks[0], L, h, nh * hd, dtype),
        "k_proj": _stacked_linear(ks[1], L, h, nkv * hd, dtype),
        "v_proj": _stacked_linear(ks[2], L, h, nkv * hd, dtype),
        "o_proj": _stacked_linear(ks[3], L, nh * hd, h, dtype),
        "mlp_norm": {"scale": jnp.ones((L, h), dtype)},
    }
    if cfg.moe_experts:
        # sparse MLP: per-layer router + (E, ...) expert banks (ops/moe.py)
        import math as _math

        E = cfg.moe_experts
        eks = jax.random.split(ks[4], 4)
        s_in, s_mid = 1.0 / _math.sqrt(h), 1.0 / _math.sqrt(m)
        blocks["moe_router"] = {
            "kernel": jax.random.normal(eks[0], (L, h, E), jnp.float32) * 0.02
        }
        blocks["moe_gate"] = {"kernel": jax.random.uniform(
            eks[1], (L, E, h, m), dtype=dtype, minval=-s_in, maxval=s_in)}
        blocks["moe_up"] = {"kernel": jax.random.uniform(
            eks[2], (L, E, h, m), dtype=dtype, minval=-s_in, maxval=s_in)}
        blocks["moe_down"] = {"kernel": jax.random.uniform(
            eks[3], (L, E, m, h), dtype=dtype, minval=-s_mid, maxval=s_mid)}
    else:
        blocks["gate_proj"] = _stacked_linear(ks[4], L, h, m, dtype)
        blocks["up_proj"] = _stacked_linear(ks[5], L, h, m, dtype)
        blocks["down_proj"] = _stacked_linear(ks[6], L, m, h, dtype)
    params: Params = {
        "embed_tokens": {
            "embedding": jax.random.normal(ks[7], (cfg.vocab_size, h), dtype) * 0.02
        },
        "blocks": blocks,
        "final_norm": init_rmsnorm(h, dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _stacked_linear(ks[8], 1, h, cfg.vocab_size, dtype)
        params["lm_head"]["kernel"] = params["lm_head"]["kernel"][0]
    return params


def chunk_blocks(blocks: Params, n_chunks: int) -> Tuple[Params, ...]:
    """Split a stacked (L, ...) block tree into n contiguous layer sub-stacks
    (the gradient-streaming training layout: each segment's dW is a SEPARATE
    leaf, so the backward can emit it to pinned host and free its HBM before
    the next segment's backward runs — stacked dW leaves are emitted whole by
    the scan transpose and would all coexist)."""
    L = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    n_chunks = max(1, min(n_chunks, L))
    rows = [(i * L // n_chunks, (i + 1) * L // n_chunks) for i in range(n_chunks)]
    return tuple(
        jax.tree_util.tree_map(lambda x: x[s:e], blocks) for s, e in rows
    )


def stream_chunk_ranges(
    num_layers: int, n_chunks: int, tap_layers: Sequence[int] = ()
) -> Tuple[Tuple[int, int], ...]:
    """Layer ranges for the gradient-streaming layout: the uniform n_chunks
    grid UNIONED with the tap-segment boundaries, so a distillation stage
    (taps present) can stream per-segment dW while every tapped block output
    still lands on a chunk boundary (decoder_forward records taps only
    there)."""
    n_chunks = max(1, min(n_chunks, num_layers))
    ends = {
        (i + 1) * num_layers // n_chunks for i in range(n_chunks)
    } | {l + 1 for l in tap_layers}
    ends = sorted(e for e in ends if 0 < e <= num_layers)
    starts = [0] + ends[:-1]
    return tuple(zip(starts, ends))


def chunk_blocks_at(
    blocks: Params, ranges: Sequence[Tuple[int, int]]
) -> Tuple[Params, ...]:
    """chunk_blocks with explicit layer ranges (see stream_chunk_ranges)."""
    return tuple(
        jax.tree_util.tree_map(lambda x: x[s:e], blocks) for s, e in ranges
    )


def unchunk_blocks(chunks: Sequence[Params]) -> Params:
    """Inverse of chunk_blocks (checkpoint export / HF interop)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *chunks
    )


def normalize_stream_layout(params: Params) -> Params:
    """Undo the gradient-streaming decoder layout at export/inference
    boundaries: rebuild the stacked 'blocks' tree from 'blocks_chunks'.
    train_step.make_train_step installs the chunked layout when
    stream_grads>0; export_vlm and the KV-cache decode path expect 'blocks'.
    No-op for ordinary param trees."""
    dec = params.get("decoder") if isinstance(params, dict) else None
    if not isinstance(dec, dict) or "blocks_chunks" not in dec:
        return params
    dec = dict(dec)
    chunks = dec.pop("blocks_chunks")
    dec["blocks"] = unchunk_blocks([chunks[k] for k in sorted(chunks, key=int)])
    out = dict(params)
    out["decoder"] = dec
    return out


def _grads_to_pinned_host(tree):
    """Move a cotangent tree to pinned host memory so each segment's dW frees
    its HBM the moment it is computed. Single device: a replicated pinned_host
    NamedSharding. Multi-chip SPMD: a memory-SPACE transfer
    (jax.memory.Space.Host) that keeps whatever ZeRO/TP partitioning GSPMD
    assigned the cotangent — an explicit replicated annotation would be
    unpartitionable there. No-op off TPU (CPU tests have no pinned_host)."""
    from visper_lm_tpu.ops.attention import _ambient_mesh

    mesh = _ambient_mesh()
    if mesh is None:
        return tree
    if any(
        getattr(d, "platform", None) != "tpu" for d in mesh.devices.flat
    ):
        return tree
    if mesh.devices.size == 1:
        from jax.sharding import NamedSharding, PartitionSpec

        ns = NamedSharding(mesh, PartitionSpec(), memory_kind="pinned_host")
        return jax.tree_util.tree_map(lambda g: jax.device_put(g, ns), tree)
    import os

    if os.environ.get("VISPER_STREAM_NO_HOST"):  # compile-bisect escape hatch
        return tree
    import jax.memory

    host = jax.memory.Space.Host
    return jax.tree_util.tree_map(lambda g: jax.device_put(g, host), tree)


def host_grad_segment(fn):
    """Wrap fn(sub_params, carry) -> carry so the backward emits d(sub_params)
    into pinned host memory the moment it is computed, instead of letting all
    segments' dW coexist in HBM until the optimizer update (train/
    staged_update.py stages host grads back block-by-block)."""

    @jax.custom_vjp
    def wrapped(sub_params, carry):
        return fn(sub_params, carry)

    def fwd(sub_params, carry):
        return fn(sub_params, carry), (sub_params, carry)

    def bwd(res, ct):
        sub_params, carry = res
        _, vjp = jax.vjp(fn, sub_params, carry)
        dparams, dcarry = vjp(ct)
        hparams = _grads_to_pinned_host(dparams)
        if hparams is not dparams:
            # tie the outgoing carry cotangent to this segment's host
            # transfers: without the barrier XLA launches every segment's
            # dW copies concurrently and their device SOURCE buffers all
            # coexist — measured 2 GiB of stacked copy-start temps at 3.8B.
            # The cost is serializing transfer behind the next segment's
            # backward; the win is bounded in-flight grads.
            pflat, ptree = jax.tree_util.tree_flatten(hparams)
            cflat, ctree = jax.tree_util.tree_flatten(dcarry)
            out = jax.lax.optimization_barrier(tuple(pflat + cflat))
            hparams = jax.tree_util.tree_unflatten(ptree, out[: len(pflat)])
            dcarry = jax.tree_util.tree_unflatten(ctree, out[len(pflat):])
        return hparams, dcarry

    wrapped.defvjp(fwd, bwd)
    return wrapped


def _lora_linear(block: Params, name: str, x: jax.Array) -> jax.Array:
    """linear() plus the low-rank LoRA side path y = xW + (xA)B_scaled.

    The side path is the TRAINING-memory-correct formulation: folding W+AB
    into a merged kernel inside the traced step makes the backward carry a
    full (L, din, dout) cotangent per target to reach A/B — measured 1.5 GiB
    x 7 targets at 4B scale (compile OOM). Here dA/dB come from rank-r
    intermediates only. (Offline merge for serving stays in models/lora.py.)
    """
    y = linear(block[name], x)
    ab = block.get(f"lora_{name}")
    if ab is not None:
        z = jnp.einsum("btd,dr->btr", x, ab["a"].astype(x.dtype))
        y = y + jnp.einsum("btr,ro->bto", z, ab["b"].astype(x.dtype))
    return y


def _block_forward(
    block: Params,
    cfg: DecoderConfig,
    h: jax.Array,                      # (B, T, D)
    cos: jax.Array,
    sin: jax.Array,
    kv_lengths: Optional[jax.Array],
    q_offset,
    cache_kv: Optional[Tuple[jax.Array, jax.Array]],  # per-layer (B, S, Nkv, H)
    use_pallas: Optional[bool],
    kv_starts: Optional[jax.Array] = None,
    quant_saves: bool = False,
    stats_out: Optional[list] = None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]], Optional[Dict[str, jax.Array]]]:
    b, t, d = h.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def _record(**sites):
        # mean-square per input channel, for AWQ-style int4 calibration.
        # CONTRACT: stats_out is only meaningful when _block_forward is called
        # from an UNROLLED python loop over layers (serve/calibrate.
        # decoder_act_rms does this); decoder_forward's scanned/remat paths
        # never pass it — appending traced values from inside a lax.scan body
        # would leak tracers. If you add a new caller, unroll it.
        if stats_out is not None:
            stats_out.append({
                k: jnp.mean(jnp.square(v.astype(jnp.float32)), axis=(0, 1))
                for k, v in sites.items()
            })

    x = rmsnorm(block["attn_norm"], h, cfg.norm_eps)
    _record(q_proj=x, k_proj=x, v_proj=x)
    q = _lora_linear(block, "q_proj", x)
    k = _lora_linear(block, "k_proj", x)
    v = _lora_linear(block, "v_proj", x)
    # Barrier between the projections and the head-split: without it XLA fuses
    # dot+reshape into a convolution emitter whose preferred kernel layout
    # ({1,2,0}, din-minor) differs from the backward's ({2,1,0}), so it
    # materializes full relayout copies of the stacked q/k/v weights — 1.7 GiB
    # at 4B scale. Lowered as plain dots (like o_proj) no copy is needed; q/k/v
    # activations materialize anyway as attention-kernel inputs.
    q, k, v = jax.lax.optimization_barrier((q, k, v))
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, nkv, hd)
    v = v.reshape(b, t, nkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    # post-rope tags: the save_qkv_mlp policy hands the flash backward its
    # inputs directly (skips qkv-matmul AND rope recompute)
    q = checkpoint_name(q, "qkv")
    k = checkpoint_name(k, "qkv")
    v = checkpoint_name(v, "qkv")

    new_cache = None
    if cache_kv is not None:
        # The cache slice holds tokens [0, q_offset) and is NEVER written here:
        # the current chunk's K/V attend as in-register "extras" and the caller
        # writes only the tiny new-token slab into the stacked cache carry.
        # (A write-then-read slice would force XLA to materialize a fresh copy
        # of the whole per-layer cache every step.)
        quant = len(cache_kv) == 4
        # slot-major: computed (B, T, Nkv, H) -> stored (T, B, Nkv, H)
        kt = jnp.swapaxes(k, 0, 1)
        vt = jnp.swapaxes(v, 0, 1)
        if quant:
            kq, ksc = _quantize_head_vectors(kt)
            vq, vsc = _quantize_head_vectors(vt)
            new_cache = (kq, vq, ksc[..., 0], vsc[..., 0])
        else:
            new_cache = (kt, vt)
        if isinstance(q_offset, int) and q_offset == 0 and t > 1:
            # PREFILL: the cache is empty, so attention over the chunk itself
            # is exact — eligible for the flash kernel (incl. the left-pad
            # kv_starts mask), instead of the XLA path over the full cache.
            attn = multi_head_attention(
                q, k, v, causal=True, kv_lengths=kv_lengths, kv_starts=kv_starts,
                use_pallas=use_pallas,
            )
        else:
            # slot-major XLA attention: reads the cache in its stored layout
            # (any per-step relayout copies the whole cache), folds the int8
            # scales into the scores (no dequant materialization), and attends
            # the current chunk via extras
            ck, cv = cache_kv[0], cache_kv[1]
            attn = mha_xla_cache(
                q, ck, cv,
                cache_kv[2] if quant else None, cache_kv[3] if quant else None,
                extra_k=k, extra_v=v,
                cache_len=q_offset, kv_starts=kv_starts,
            )
    else:
        attn = multi_head_attention(
            q, k, v, causal=True, q_offset=q_offset, kv_lengths=kv_lengths,
            kv_starts=kv_starts, use_pallas=use_pallas,
        )

    attn = attn.reshape(b, t, nh * hd)
    _record(o_proj=attn)
    h = h + _lora_linear(block, "o_proj", attn)

    x = rmsnorm(block["mlp_norm"], h, cfg.norm_eps)
    if "moe_router" in block:
        # sparse MLP (ops/moe.py): static-capacity top-k dispatch; expert banks
        # shard over the 'expert' mesh axis when the ambient mesh carries one.
        # Aux (Switch load-balance + z-loss) rides up to decoder_forward, which
        # averages it over layers for the training loss.
        from visper_lm_tpu.ops.moe import moe_mlp

        mlp_out, moe_aux = moe_mlp(
            {
                "router": block["moe_router"]["kernel"],
                "gate": block["moe_gate"]["kernel"],
                "up": block["moe_up"]["kernel"],
                "down": block["moe_down"]["kernel"],
            },
            x,
            top_k=cfg.moe_top_k,
            capacity_factor=cfg.moe_capacity_factor,
        )
        h = h + mlp_out
        return h, new_cache, moe_aux
    _record(gate_proj=x, up_proj=x)
    # named for the save_mlp/save_qkv_mlp remat policies: with a FROZEN decoder
    # (PT stage) the backward's dx path needs activations only at the nonlinear
    # points — pre-silu gate and up (for d(gate*up)) and q/k/v (for the flash
    # backward). Saving them skips the three expensive recompute matmuls per
    # block; everything else (o_proj, down_proj outputs) is DCE'd from the
    # recompute because frozen layers take no dw.
    gate_pre = _lora_linear(block, "gate_proj", x)
    up = _lora_linear(block, "up_proj", x)
    if quant_saves:
        # save_mlp_q8: checkpoint int8 (value, per-token scale) pairs instead
        # of bf16 — half the residual HBM of save_mlp (which OOMs at B4 on
        # v5e: 16.76G of 15.75G), still skipping both 8x-wide recompute
        # matmuls. fwd uses the dequantized values too, so fwd and bwd see
        # identical activations (the ~0.4% rounding is consistent, not noise).
        gate_pre = _dequant_saved(*_quant_saved(gate_pre, "mlp_gate"))
        up = _dequant_saved(*_quant_saved(up, "mlp_up"))
    else:
        gate_pre = checkpoint_name(gate_pre, "mlp_gate")
        up = checkpoint_name(up, "mlp_up")
    gate = jax.nn.silu(gate_pre)
    gu = gate * up
    _record(down_proj=gu)
    h = h + _lora_linear(block, "down_proj", gu)
    return h, new_cache, None


def _quant_saved(x: jax.Array, name: str):
    """Per-token symmetric int8 quantization of a saved residual, with both the
    int8 values and the (tiny) f32 scales tagged for the remat policy."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return (
        checkpoint_name(q, f"{name}_q8"),
        checkpoint_name(scale, f"{name}_scale"),
    )


def _dequant_saved(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _remat_policy(name: Optional[str]):
    """Checkpoint policy by name. 'save_flash' saves the named flash-attention
    outputs across the scan (ops/attention tags them 'flash_out'), skipping
    the flash forward recompute in backward at the cost of one (B, T, N, H)
    residual per layer."""
    if name is None or name == "none":
        return None
    if name == "save_flash":
        return jax.checkpoint_policies.save_only_these_names("flash_out")
    if name == "save_mlp":
        # pre-silu gate + up: the only MLP activations the frozen-decoder dx
        # path needs — skips both 8x-wide matmuls in the backward recompute
        # for one (B, T, 2*mlp_dim) bf16 residual per layer
        return jax.checkpoint_policies.save_only_these_names(
            "mlp_gate", "mlp_up"
        )
    if name == "save_qkv_mlp":
        # + post-rope q/k/v: hands the flash backward its inputs directly
        # (skips the qkv matmul and rope recompute too)
        return jax.checkpoint_policies.save_only_these_names(
            "mlp_gate", "mlp_up", "qkv"
        )
    if name == "save_gate":
        # half of save_mlp (fits where save_mlp OOMs): skips the gate-matmul
        # recompute only, exact numerics
        return jax.checkpoint_policies.save_only_these_names("mlp_gate")
    if name == "save_gate_flash":
        # gate + flash outputs: skips the gate matmul AND the flash-forward
        # recompute — (B,T,mlp) + (B,T,N,H) bf16 residuals per layer, the
        # in-between point of save_gate and save_mlp
        return jax.checkpoint_policies.save_only_these_names(
            "mlp_gate", "flash_out"
        )
    if name == "save_mlp_q8":
        # int8 saved residuals: the bytes of save_gate, the skipped FLOPs of
        # save_mlp (see _quant_saved)
        return jax.checkpoint_policies.save_only_these_names(
            "mlp_gate_q8", "mlp_gate_scale", "mlp_up_q8", "mlp_up_scale"
        )
    raise ValueError(f"unknown remat policy {name!r}")


def decoder_forward(
    params: Params,
    cfg: DecoderConfig,
    inputs_embeds: jax.Array,                    # (B, T, D)
    *,
    positions: Optional[jax.Array] = None,       # (B, T) or (T,); default arange
    kv_lengths: Optional[jax.Array] = None,      # (B,) valid kv length incl. this chunk
    kv_starts: Optional[jax.Array] = None,       # (B,) first valid kv slot (left pad)
    tap_layers: Tuple[int, ...] = (),            # static 0-indexed block outputs to keep
    cache: Optional[KVCache] = None,
    q_offset: int | jax.Array = 0,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    compute_logits: bool = True,
    unroll_layers: bool = False,
    lora: Optional[Params] = None,               # {target: {a (L,din,r), b (L,r,dout)}}
    lora_scaling: float = 1.0,
) -> Dict[str, Any]:
    """Run the decoder trunk.

    Returns dict with:
      hidden: final-normed hidden states (B, T, D)
      logits: (B, T, vocab) in float32
      taps: tuple of num_taps (B, T, D) raw block outputs for tap_layers (pre
        final norm); a tuple rather than a stacked array so no extra buffer is
        materialized (consumers index per layer)
      cache: updated KVCache if one was passed
    """
    b, t, d = inputs_embeds.shape
    if lora is not None:
        # per-target LoRA A/B ride the scanned block tree as extra stacked
        # (L, ...) entries (the scan/tap-segment bodies slice them per layer
        # like any other block weight); scaling is baked into B here so the
        # side path in _lora_linear is a plain pair of rank-r matmuls
        params = dict(params)
        blocks = dict(params["blocks"])
        for name, ab in lora.items():
            blocks[f"lora_{name}"] = {
                "a": ab["a"],
                "b": ab["b"] * jnp.asarray(lora_scaling, ab["b"].dtype),
            }
        params["blocks"] = blocks
    if positions is None:
        positions = jnp.arange(t)[None, :] + jnp.asarray(q_offset).reshape((-1, 1))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]

    num_taps = len(tap_layers)
    if num_taps:
        # out-of-range taps would silently produce wrong segmentation — fail loud
        assert max(tap_layers) < cfg.num_layers, (
            f"tap layers {tap_layers} out of range for {cfg.num_layers}-layer decoder"
        )
        assert cache is None, "layer taps are a training/prefill feature (no cache)"

    has_cache = cache is not None
    quant_cache = isinstance(cache, QuantKVCache)

    quant_saves = remat and remat_policy == "save_mlp_q8"
    moe_on = cfg.moe_experts > 0 and "moe_router" in params.get("blocks", {})
    _AUX_KEYS = ("lb_loss", "z_loss", "dropped_frac")

    def _aux_zero():
        return tuple(jnp.zeros((), jnp.float32) for _ in _AUX_KEYS)

    def _aux_add(acc, aux):
        if aux is None:
            return acc
        return tuple(a + aux[k].astype(jnp.float32) for a, k in zip(acc, _AUX_KEYS))

    def _aux_mean(acc):
        # per-layer mean so the loss weight is depth-independent
        return {k: a / cfg.num_layers for k, a in zip(_AUX_KEYS, acc)}

    def body(carry, xs):
        h, acc = carry
        block = xs
        h, _, aux = _block_forward(
            block, cfg, h, cos, sin, kv_lengths, q_offset, None, use_pallas,
            kv_starts, quant_saves=quant_saves,
        )
        return (h, _aux_add(acc, aux)), None

    if remat:
        body = jax.checkpoint(
            body, prevent_cse=False, policy=_remat_policy(remat_policy)
        )

    if has_cache:
        # The stacked cache rides the scan CARRY and is written via a tiny
        # (layer, slot) dynamic-update-slice of just the new tokens. Riding
        # xs/ys instead — the obvious formulation — makes the scan REWRITE the
        # whole cache into a fresh stacked buffer every decode step (measured:
        # 2 GiB defensive copies per step at B16, the decode memory ceiling).
        #
        # q_offset may be a (B,) array (continuous-batching engine: each slot
        # sits at its own sequence position) — then the new-token slab lands at
        # a per-sample slot via a tiny scatter instead of one contiguous DUS.
        per_sample = not isinstance(q_offset, int) and jnp.ndim(q_offset) >= 1
        if per_sample:
            starts = jnp.asarray(q_offset).astype(jnp.int32)      # (B,)
        else:
            start = jnp.asarray(q_offset).reshape(()).astype(jnp.int32)

        def _write_new_kv(c, layer, u):
            """Write u (T, B, ...) into c (L, S, B, ...) at [layer, start(+b)]."""
            if not per_sample:
                return jax.lax.dynamic_update_slice(
                    c, u[None].astype(c.dtype),
                    (layer, start) + (0,) * (c.ndim - 2),
                )
            t_, b_ = u.shape[0], u.shape[1]
            pos = starts[None, :] + jnp.arange(t_, dtype=jnp.int32)[:, None]
            bidx = jnp.broadcast_to(jnp.arange(b_)[None, :], (t_, b_))
            return c.at[layer, pos, bidx].set(u.astype(c.dtype), mode="drop")

        def body_cache(carry, xs):
            h, cache_arrays = carry
            block, i = xs
            per_layer = tuple(
                jax.lax.dynamic_index_in_dim(c, i, 0, keepdims=False)
                for c in cache_arrays
            )
            h, token_kv, _ = _block_forward(
                block, cfg, h, cos, sin, kv_lengths, q_offset, per_layer,
                use_pallas, kv_starts,
            )
            new_arrays = tuple(
                _write_new_kv(c, i, u) for c, u in zip(cache_arrays, token_kv)
            )
            return (h, new_arrays), None

        if unroll_layers:
            # decode steps are tiny per-layer programs; unrolling lets XLA's
            # scheduler overlap layer i+1's weight DMA with layer i's compute
            # (the scan's per-iteration machinery serializes them), and the
            # layer/cache slices become static views
            h = inputs_embeds
            arrays = tuple(cache)
            for i in range(cfg.num_layers):
                block = jax.tree_util.tree_map(lambda x: x[i], params["blocks"])
                per_layer = tuple(c[i] for c in arrays)
                h, token_kv, _ = _block_forward(
                    block, cfg, h, cos, sin, kv_lengths, q_offset, per_layer,
                    use_pallas, kv_starts,
                )
                arrays = tuple(
                    _write_new_kv(c, jnp.int32(i), u)
                    for c, u in zip(arrays, token_kv)
                )
            new_cache_arrays = arrays
        else:
            (h, new_cache_arrays), _ = jax.lax.scan(
                body_cache,
                (inputs_embeds, tuple(cache)),
                (params["blocks"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
            )
        hidden = rmsnorm(params["final_norm"], h, cfg.norm_eps)
        out: Dict[str, Any] = {"hidden": hidden}
        if compute_logits:
            if cfg.tie_embeddings:
                logits = jnp.dot(hidden, params["embed_tokens"]["embedding"].T)
            else:
                logits = linear(params["lm_head"], hidden)
            out["logits"] = logits.astype(jnp.float32)
        out["taps"] = None
        out["moe_aux"] = None
        out["cache"] = (
            QuantKVCache(*new_cache_arrays) if quant_cache
            else KVCache(*new_cache_arrays)
        )
        return out

    if num_taps > 0:
        # Tap layers SEGMENT the scan: each tapped block output is a segment
        # boundary, so taps cost zero extra activation memory. (An earlier design
        # carried a (num_taps, B, T, D) buffer through the scan; under remat that
        # buffer is saved per layer — O(num_taps * L) memory, OOM at 4B scale.)
        # Segments scan over LAYER INDICES and gather each block from the full
        # stacked tree — slicing the stacked weights per segment would materialize
        # weight copies (compile-time OOM at 4B scale).
        def body_idx(carry, i):
            h, acc = carry
            block = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
                params["blocks"],
            )
            h, _, aux = _block_forward(
                block, cfg, h, cos, sin, kv_lengths, q_offset, None, use_pallas,
                kv_starts, quant_saves=quant_saves,
            )
            return (h, _aux_add(acc, aux)), None

        if remat:
            body_idx = jax.checkpoint(
                body_idx, prevent_cse=False, policy=_remat_policy(remat_policy)
            )

        boundaries = sorted(set(tap_layers))
        by_layer = {}
        h = inputs_embeds
        aux_acc = _aux_zero()
        chunks = params.get("blocks_chunks")
        if chunks is not None:
            # gradient-streaming layout UNDER TAPS (the beyond-parity
            # pretrain_full stage: distillation taps + full-model backward):
            # each chunk is a separate param leaf scanned whole, its dW
            # host-offloaded by host_grad_segment the moment the chunk's
            # backward finishes. stream_chunk_ranges guarantees every tap
            # boundary is a chunk end, so taps stay segment carries (zero
            # extra activation memory, as in the stacked path below).
            assert cache is None and not moe_on, (
                "blocks_chunks is a training-only layout (no cache/MoE)"
            )

            def seg_fn(sub, carry):
                return jax.lax.scan(body, carry, sub)[0]

            seg = host_grad_segment(seg_fn)
            subs = (
                [chunks[k] for k in sorted(chunks, key=int)]
                if isinstance(chunks, dict) else list(chunks)
            )
            layer = 0
            carry = (h, aux_acc)
            for sub in subs:
                layer += jax.tree_util.tree_leaves(sub)[0].shape[0]
                carry = seg(sub, carry)
                if layer - 1 in boundaries:
                    by_layer[layer - 1] = carry[0]
            assert layer == cfg.num_layers, (
                f"blocks_chunks covers {layer} layers, decoder has "
                f"{cfg.num_layers}"
            )
            missing = [l for l in boundaries if l not in by_layer]
            assert not missing, (
                f"tap layers {missing} do not land on chunk boundaries — "
                "build the layout with stream_chunk_ranges(num_layers, "
                "n_chunks, tap_layers)"
            )
            h, aux_acc = carry
            # falls through to the shared final-norm/logits tail below
        else:
            starts = [0] + [l + 1 for l in boundaries]
            ends = [l + 1 for l in boundaries] + [cfg.num_layers]
            for seg_start, seg_end in zip(starts, ends):
                if seg_start == seg_end:
                    continue
                (h, aux_acc), _ = jax.lax.scan(
                    body_idx, (h, aux_acc),
                    jnp.arange(seg_start, seg_end, dtype=jnp.int32),
                )
                if seg_end - 1 in boundaries:
                    by_layer[seg_end - 1] = h
        # tuple, NOT jnp.stack: the heads index taps per layer immediately, and a
        # stacked (num_taps, B, T, D) buffer is a pure extra materialization
        # (~1 GiB at B8xT1024x10 taps); the per-layer values are alive anyway as
        # segment-boundary carries.
        taps = tuple(by_layer[l] for l in tap_layers)
    else:
        aux_acc = _aux_zero()
        chunks = params.get("blocks_chunks")
        if chunks is not None:
            # gradient-streaming layout: sequential segment scans over layer
            # sub-stacks; each segment's backward host-offloads its own dW
            assert cache is None and not moe_on, (
                "blocks_chunks is a training-only layout (no cache/MoE)"
            )

            def seg_fn(sub, carry):
                return jax.lax.scan(body, carry, sub)[0]

            seg = host_grad_segment(seg_fn)
            carry = (inputs_embeds, aux_acc)
            subs = (
                [chunks[k] for k in sorted(chunks, key=int)]
                if isinstance(chunks, dict) else list(chunks)
            )
            for sub in subs:
                carry = seg(sub, carry)
            h, aux_acc = carry
        else:
            h = None if moe_on else _maybe_pipelined_stack(
                params, cfg, inputs_embeds, cos, sin, kv_lengths, kv_starts,
                q_offset, use_pallas, quant_saves, remat, remat_policy,
            )
            if h is None:
                (h, aux_acc), _ = jax.lax.scan(
                    body, (inputs_embeds, aux_acc), params["blocks"]
                )
        taps = None

    hidden = rmsnorm(params["final_norm"], h, cfg.norm_eps)
    out: Dict[str, Any] = {"hidden": hidden}
    if compute_logits:
        if cfg.tie_embeddings:
            logits = jnp.dot(hidden, params["embed_tokens"]["embedding"].T)
        else:
            logits = linear(params["lm_head"], hidden)
        out["logits"] = logits.astype(jnp.float32)
    out["taps"] = taps if num_taps > 0 else None
    out["moe_aux"] = _aux_mean(aux_acc) if moe_on else None
    return out


def _maybe_pipelined_stack(
    params, cfg, inputs_embeds, cos, sin, kv_lengths, kv_starts, q_offset,
    use_pallas, quant_saves, remat, remat_policy,
):
    """Route the layer stack through GPipe pipelining when the ambient mesh
    carries a 'pipe' axis (parallel/pipeline.py); None = not eligible, caller
    runs the plain scan. One knob, like the 'seq' routing in ops/attention."""
    from visper_lm_tpu.ops.attention import _ambient_mesh
    from visper_lm_tpu.parallel.mesh import PIPE_AXIS

    mesh = _ambient_mesh()
    if mesh is None:
        return None
    pipe = dict(zip(mesh.axis_names, mesh.devices.shape)).get(PIPE_AXIS, 1)
    b = inputs_embeds.shape[0]
    if (
        pipe <= 1
        or cfg.num_layers % pipe
        or b % pipe
        or not isinstance(q_offset, int)
    ):
        return None
    from visper_lm_tpu.parallel.pipeline import pipeline_scan

    # smallest microbatches ≤ 4·stages: bubble fraction (S-1)/(M+S-1) shrinks
    # with M, while too-small microbatches starve the MXU
    n_micro = pipe
    for m in range(min(b, 4 * pipe), pipe, -1):
        if b % m == 0:
            n_micro = m
            break

    def pipe_block(block, hh, args):
        hh, _, _ = _block_forward(
            block, cfg, hh, args["cos"], args["sin"], args["kv_lengths"],
            q_offset, None, use_pallas, args["kv_starts"],
            quant_saves=quant_saves,
        )
        return hh

    if remat:
        pipe_block = jax.checkpoint(
            pipe_block, prevent_cse=False, policy=_remat_policy(remat_policy)
        )
    return pipeline_scan(
        pipe_block, params["blocks"], inputs_embeds,
        {"cos": cos, "sin": sin, "kv_lengths": kv_lengths,
         "kv_starts": kv_starts},
        mesh=mesh, n_micro=n_micro,
    )


def embed_tokens(params: Params, ids: jax.Array) -> jax.Array:
    return embed(params["embed_tokens"], ids)
