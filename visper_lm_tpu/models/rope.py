"""Rotary position embeddings (NeoX/Llama-style half rotation).

Matches HF Llama/Phi3 semantics: inv_freq = theta^(-2i/d), cos/sin broadcast over both
halves, rotate_half(x) = concat(-x[d/2:], x[:d/2]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> tuple[jax.Array, jax.Array]:
    """Compute cos/sin tables for the given positions.

    Args:
      positions: int array of any shape (typically (B, T) or (T,)).
      head_dim: rotary dimension (full head dim for Llama/Phi3).
      theta: rope base.

    Returns: (cos, sin) of shape positions.shape + (head_dim,), float32.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., half)
    angles = jnp.concatenate([angles, angles], axis=-1)           # (..., head_dim)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Apply rotary embedding.

    Args:
      x: (B, T, N, H).
      cos/sin: (B, T, H) or (T, H), broadcast over heads.
    """
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
