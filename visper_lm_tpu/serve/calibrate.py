"""AWQ-style activation calibration for int4 serving weights.

Plain round-to-nearest int4 leaves ~10% rms weight noise (docs/Design.md).
AWQ's observation (Lin et al., 2023, arXiv:2306.00978) is that quantization
error is dominated by the input channels with the largest ACTIVATION
magnitudes: scaling those weight rows UP before quantization (and the
activations correspondingly down at runtime) spends the 4-bit budget where the
dot product actually concentrates. Runtime cost is one per-input-channel
multiply on the (B, T, din) activation — negligible next to the weight stream.

Usage:
    rms = decoder_act_rms(params["decoder"], cfg.decoder, [embeds1, embeds2])
    qparams = quantize_linear_weights_int4(params["decoder"], act_rms=rms)
or pass ``calibration=rms`` through serve.generate.GenerationConfig.

The reference has no quantized serving path at all (HF eager decode,
`ola_vlm/model/language_model/base_lm.py:211-373`); this is a TPU serving
lever beyond parity.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from visper_lm_tpu.config import DecoderConfig
from visper_lm_tpu.models.decoder import _block_forward
from visper_lm_tpu.models.rope import rope_cos_sin
from visper_lm_tpu.utils.param import Params, rmsnorm


def decoder_act_rms(
    params: Params,
    cfg: DecoderConfig,
    embeds_batches: Sequence[jax.Array],
    *,
    include_lm_head: bool = True,
) -> Dict[str, jax.Array]:
    """Per-input-channel activation RMS at every linear's input site.

    Replays the decoder UNROLLED (python loop over layers, no cache, no scan)
    over the given (B, T, D) inputs-embeds batches and accumulates the mean
    square of each linear's input. Returns {proj_name: (L, din) f32} for the
    seven block projections plus {"lm_head": (din,)} when the model has an
    untied head. Feed the result to
    utils.param.quantize_linear_weights_int4(act_rms=...).
    """
    blocks = params["blocks"]
    L = cfg.num_layers

    @jax.jit
    def _one_batch(p, embeds):
        h = embeds
        t = embeds.shape[1]
        cos, sin = rope_cos_sin(jnp.arange(t), cfg.head_dim, cfg.rope_theta)
        cos, sin = cos[None], sin[None]
        per_layer: List[dict] = []
        for layer in range(L):
            block = jax.tree.map(lambda x: x[layer], p["blocks"])
            stats: list = []
            h, _, _ = _block_forward(
                block, cfg, h, cos, sin, None, 0, None, use_pallas=False,
                stats_out=stats,
            )
            merged: dict = {}
            for s in stats:
                merged.update(s)
            per_layer.append(merged)
        out = {
            name: jnp.stack([pl_[name] for pl_ in per_layer])
            for name in per_layer[0]
        }
        if include_lm_head and "lm_head" in p:
            hidden = rmsnorm(p["final_norm"], h, cfg.norm_eps)
            out["lm_head"] = jnp.mean(
                jnp.square(hidden.astype(jnp.float32)), axis=(0, 1)
            )
        return out

    acc: Optional[dict] = None
    total = 0
    for embeds in embeds_batches:
        ms = _one_batch(params, jnp.asarray(embeds))
        w = embeds.shape[0] * embeds.shape[1]
        if acc is None:
            acc = {k: v * w for k, v in ms.items()}
        else:
            acc = {k: acc[k] + v * w for k, v in ms.items()}
        total += w
    assert acc is not None, "need at least one calibration batch"
    return {k: jnp.sqrt(v / total) for k, v in acc.items()}
