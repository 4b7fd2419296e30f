"""Image-space ops: convolutions (NHWC) and align_corners-style bilinear resize.

jax.image.resize implements half-pixel sampling only; the DPT decoder and OneFormer
teacher use torch F.interpolate(..., align_corners=True/False) semantics, so both are
implemented here explicitly as separable gather+lerp (shapes are small feature maps —
XLA fuses these fine).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visper_lm_tpu.utils.param import Params


def init_conv(
    key: jax.Array,
    kh: int,
    kw: int,
    cin: int,
    cout: int,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    fan_in = kh * kw * cin
    scale = 1.0 / math.sqrt(fan_in)
    kernel = jax.random.uniform(
        key, (kh, kw, cin, cout), jnp.float32, minval=-scale, maxval=scale
    ).astype(dtype)
    p: Params = {"kernel": kernel}
    if use_bias:
        p["bias"] = jnp.zeros((cout,), dtype=dtype)
    return p


def conv2d(
    p: Params, x: jax.Array, stride: int = 1, padding="SAME"
) -> jax.Array:
    """x: (B, H, W, C) NHWC; kernel (kh, kw, cin, cout)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv_transpose2d(p: Params, x: jax.Array, stride: int) -> jax.Array:
    """torch ConvTranspose2d(k=stride, s=stride, p=0) equivalent (NHWC).

    torch's ConvTranspose2d is the conv ADJOINT (spatially flipped kernel);
    jax.lax.conv_transpose correlates without flipping, so flip the kernel's
    spatial axes here (parity-pinned against torch in test_ref_oracles)."""
    y = jax.lax.conv_transpose(
        x,
        p["kernel"][::-1, ::-1].astype(x.dtype),
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def depthwise_conv2d(p: Params, x: jax.Array, padding: int) -> jax.Array:
    """Depthwise conv (ConvNeXt): kernel (kh, kw, 1, C), feature_group_count=C."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _resize_1d_indices(in_size: int, out_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        coords = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        coords = jnp.clip(coords, 0.0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = coords - lo.astype(jnp.float32)
    return lo, hi, frac


def resize_bilinear(
    x: jax.Array, size: Tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """torch F.interpolate(mode='bilinear') for NHWC tensors."""
    b, h, w, c = x.shape
    oh, ow = size
    lo_h, hi_h, fh = _resize_1d_indices(h, oh, align_corners)
    lo_w, hi_w, fw = _resize_1d_indices(w, ow, align_corners)

    xf = x.astype(jnp.float32)
    top = jnp.take(xf, lo_h, axis=1)
    bot = jnp.take(xf, hi_h, axis=1)
    rows = top + (bot - top) * fh[None, :, None, None]
    left = jnp.take(rows, lo_w, axis=2)
    right = jnp.take(rows, hi_w, axis=2)
    out = left + (right - left) * fw[None, None, :, None]
    return out.astype(x.dtype)


def _cubic_kernel(x: "np.ndarray", a: float = -0.75) -> "np.ndarray":
    """Keys cubic convolution kernel, torch's a=-0.75."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _bicubic_matrix(in_size: int, out_size: int) -> "np.ndarray":
    """(out, in) weight matrix reproducing torch F.interpolate(mode='bicubic',
    align_corners=False, antialias=False) along one axis: half-pixel source
    coords, 4 taps, indices clamped to the border (replicate)."""
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * (
        in_size / out_size
    ) - 0.5
    i0 = np.floor(coords).astype(np.int64) - 1
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for k in range(4):
        idx = i0 + k
        w = _cubic_kernel(coords - idx)
        np.add.at(mat, (np.arange(out_size), np.clip(idx, 0, in_size - 1)), w)
    return mat


def _area_matrix(in_size: int, out_size: int) -> "np.ndarray":
    """(out, in) weight matrix for torch F.interpolate(mode='area') ==
    adaptive_avg_pool: bin i averages indices [floor(i*in/out),
    ceil((i+1)*in/out))."""
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        mat[i, s:e] = 1.0 / (e - s)
    return mat


def _resize_by_matrix(x: jax.Array, size: Tuple[int, int], make_mat) -> jax.Array:
    b, h, w, c = x.shape
    oh, ow = size
    mh = jnp.asarray(make_mat(h, oh), dtype=jnp.float32)
    mw = jnp.asarray(make_mat(w, ow), dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    out = jnp.einsum("Oh,bhwc->bOwc", mh, xf)
    out = jnp.einsum("Ow,bhwc->bhOc", mw, out)
    return out.astype(x.dtype)


def resize_bicubic(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """torch F.interpolate(mode='bicubic', align_corners=False) for NHWC
    (s2wrapper's input-scale resize). Separable matrix form — sizes are
    static, so the weights fold into two einsums."""
    if (x.shape[1], x.shape[2]) == tuple(size):
        return x
    return _resize_by_matrix(x, size, _bicubic_matrix)


def resize_area(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """torch F.interpolate(mode='area') == adaptive average pooling for NHWC
    (s2wrapper's output-grid downscale)."""
    if (x.shape[1], x.shape[2]) == tuple(size):
        return x
    return _resize_by_matrix(x, size, _area_matrix)


def grid_sample_bilinear(
    value: jax.Array,      # (B, H, W, C)
    grid: jax.Array,       # (B, N, P, 2) normalized [-1, 1] (x, y)
    align_corners: bool = False,
) -> jax.Array:
    """torch F.grid_sample(mode='bilinear', padding_mode='zeros') for NHWC values.

    Returns (B, N, P, C). Out-of-bounds samples contribute zero (per-corner masking,
    matching torch's zero padding exactly).
    """
    b, h, w, c = value.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    tx = fx - x0
    ty = fy - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = value.reshape(b, h * w, c)
        idx = yc * w + xc                          # (B, N, P)
        out = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(idx.shape + (c,))
        return out * inb[..., None].astype(value.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    tx = tx[..., None].astype(value.dtype)
    ty = ty[..., None].astype(value.dtype)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def resize_bicubic_pos_embed(
    pos: jax.Array, src_grid: int, dst_grid: int, has_cls: bool = True
) -> jax.Array:
    """Interpolate a (N, D) ViT positional embedding between grid sizes (bicubic,
    DINOv2 interpolate_pos_encoding semantics). Used at import time."""
    if src_grid == dst_grid:
        return pos
    cls = pos[:1] if has_cls else None
    grid = pos[1:] if has_cls else pos
    d = grid.shape[-1]
    grid = grid.reshape(1, src_grid, src_grid, d).astype(jnp.float32)
    out = jax.image.resize(grid, (1, dst_grid, dst_grid, d), method="bicubic")
    out = out.reshape(dst_grid * dst_grid, d)
    if cls is not None:
        out = jnp.concatenate([cls.astype(jnp.float32), out], axis=0)
    return out.astype(pos.dtype)
