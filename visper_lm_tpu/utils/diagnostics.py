"""Tracing, profiling, and numerical-safety diagnostics.

The reference has no dedicated tracing/profiling or sanitizers (SURVEY.md §5.1-5.2 —
only HF speed_metrics and icecream prints in dead code). This subsystem provides:

  * StepTimer — steady-state wall timing with examples/sec, tokens/sec, and MFU
    against an analytic FLOP estimate;
  * trace() — jax.profiler trace context for TensorBoard/XProf dumps;
  * finite_check() — one-jit finiteness/abs-max summary per top-level param group
    (the grad-NaN debugging tool);
  * nan_guard() — context manager enabling jax_debug_nans for op-level isolation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp


class StepTimer:
    """Track steady-state step timing; call .step() after each synced step."""

    def __init__(self, warmup: int = 2, flops_per_step: Optional[float] = None):
        self.warmup = warmup
        self.flops_per_step = flops_per_step
        self.count = 0
        self._t0: Optional[float] = None

    def step(self) -> None:
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def measured_steps(self) -> int:
        return max(self.count - self.warmup, 0)

    def summary(self, batch_size: int, seq_len: int) -> Dict[str, float]:
        if self._t0 is None or self.measured_steps == 0:
            return {}
        dt = (time.perf_counter() - self._t0) / self.measured_steps
        out = {
            "step_time_s": dt,
            "steps_per_sec": 1.0 / dt,
            "examples_per_sec": batch_size / dt,
            "tokens_per_sec": batch_size * seq_len / dt,
        }
        if self.flops_per_step:
            out["tflops_per_sec"] = self.flops_per_step / dt / 1e12
        return out


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XProf/TensorBoard trace of the enclosed device work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def train_step_flops(cfg, batch_size: int, seq_len: int) -> float:
    """Analytic FLOPs for one PT-stage fwd+bwd step (matmul-dominated terms).

    Decoder: 6 * P_active * tokens (fwd 2x, bwd 4x) + attention 12*B*L*T^2*H_dim*N.
    Vision tower fwd only (frozen): 2 * P_vis * patches.
    """
    d = cfg.decoder
    p_dec = (
        d.num_layers
        * (
            d.hidden_size * (d.num_heads + 2 * d.num_kv_heads) * d.head_dim
            + d.num_heads * d.head_dim * d.hidden_size
            + 3 * d.hidden_size * d.mlp_dim
        )
        + 2 * d.vocab_size * d.hidden_size
    )
    tokens = batch_size * seq_len
    flops = 6.0 * p_dec * tokens
    # causal attention: 2 matmuls fwd + 4 bwd, half the T^2 square
    flops += 6.0 * batch_size * d.num_layers * seq_len * seq_len * d.num_heads * d.head_dim / 2
    flops += vision_flops(cfg) * batch_size
    return flops


def vision_flops(cfg) -> float:
    """Analytic forward FLOPs per image through the configured tower."""
    if getattr(cfg, "use_convnext_tower", False) and cfg.convnext is not None:
        return convnext_flops(cfg.convnext)
    v = cfg.vision
    p_vis = v.num_layers * (4 * v.hidden_size ** 2 + 2 * v.hidden_size * v.mlp_dim)
    return 2.0 * p_vis * (v.num_patches + 1)


def convnext_flops(ccfg) -> float:
    """Analytic forward FLOPs per image for the ConvNeXt trunk (config #3's
    XXL@768: stem /4 then 4 stages at /4,/8,/16,/32). Per block at dim d over
    N tokens: 7x7 depthwise (2*49*d) + two 4x MLP matmuls (2*8*d^2)."""
    side = ccfg.image_size // 4
    total = 2.0 * side * side * ccfg.dims[0] * 3 * 16  # stem 4x4 conv
    for s, (depth, d) in enumerate(zip(ccfg.depths, ccfg.dims)):
        n = (ccfg.image_size // (4 * 2 ** s)) ** 2
        if s > 0:
            total += 2.0 * n * ccfg.dims[s - 1] * d * 4  # 2x2 downsample conv
        total += depth * n * (2.0 * 49 * d + 16.0 * d * d)
    return total


def teacher_flops(batch_size: int) -> float:
    """Analytic forward FLOPs for the three frozen flagship teachers, per step.

    The teachers run batched inside the compiled train step (no grads):
      * DINOv2-L @336/14 (577 tokens, h=1024, mlp=4096, 24 layers)  ~0.38 TF/img
      * CLIP-H   @224/14 (257 tokens, h=1280, mlp=5120, 32 layers)  ~0.33 TF/img
      * Swin-L   @768    (windowed; 12*d^2 per token per layer)     ~0.85 TF/img
    Matmul-dominated terms only, like train_step_flops. Used to report an MFU
    that counts ALL executed math, not just the student's.
    """
    vit = 2 * 577 * 24 * (4 * 1024 ** 2 + 2 * 1024 * 4096)
    vit += 2 * 2 * 24 * 577 ** 2 * 1024  # attention scores+values fwd
    clip = 2 * 257 * 32 * (4 * 1280 ** 2 + 2 * 1280 * 5120)
    clip += 2 * 2 * 32 * 257 ** 2 * 1280
    # Swin-L stages: tokens 36864/9216/2304/576, dims 192/384/768/1536,
    # depths 2/2/18/2; 12*d^2 per token per layer (qkvo + mlp(4x))
    swin = 0.0
    for tok, dim, depth in ((36864, 192, 2), (9216, 384, 2),
                            (2304, 768, 18), (576, 1536, 2)):
        swin += 2 * tok * depth * 12 * dim ** 2
    return batch_size * float(vit + clip + swin)


def finite_check(tree: Any, group_depth: int = 2) -> Dict[str, Tuple[bool, float]]:
    """Per-group (finite?, abs-max) summary computed in ONE jit call.

    Groups are tree paths truncated to group_depth. Use on grads/params when
    debugging divergence; avoids per-leaf host syncs.
    """
    groups: Dict[str, list] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path[:group_depth]
        )
        groups.setdefault(key, []).append(leaf)

    @jax.jit
    def stats(gs):
        out = {}
        for key, leaves in gs.items():
            fin = jnp.all(
                jnp.stack([jnp.all(jnp.isfinite(x.astype(jnp.float32))) for x in leaves])
            )
            mx = jnp.max(
                jnp.stack([jnp.max(jnp.abs(x.astype(jnp.float32))) for x in leaves])
            )
            out[key] = (fin, mx)
        return out

    res = stats(groups)
    return {k: (bool(v[0]), float(v[1])) for k, v in res.items()}


@contextlib.contextmanager
def nan_guard() -> Iterator[None]:
    """Enable jax_debug_nans inside the context (op-level NaN isolation)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
