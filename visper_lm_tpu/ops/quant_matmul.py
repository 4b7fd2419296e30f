"""Pallas w4a16 dequant-matmul: nibble-packed int4 weights dequantized in VMEM.

Why a kernel: the XLA formulation of group-wise int4 (utils/param.linear's
``kernel_q4p`` branch) measures 5x SLOWER than w8a16 at decode because XLA
materializes the dequantized bf16 weight matrix to HBM every step instead of
fusing the unpack+scale into the matmul operand stream (the group-wise scale
along the INPUT dim defeats the operand-fusion pattern that makes w8a16's
per-output-channel scale free — docs/Design.md "int4"). Here the packed bytes
stream HBM->VMEM at 0.5 B/weight and the unpack/scale never leaves VMEM.

Layout (matches utils/param.quantize_linear_weights_int4):
  packed[r, o] holds original rows 2r (low nibble) and 2r+1 (high nibble) of
  the (din, dout) kernel; scales[g, o] covers original rows
  [g*group, (g+1)*group). The caller splits x into even/odd input columns so
  the kernel needs NO lane interleave: y = x_even @ low + x_odd @ high, with
  the group scale folded into the per-group PARTIAL DOT OUTPUT (B x bdout), not
  per-weight — unpack cost stays ~2-3 VPU ops/weight, under the 0.5 B/weight
  HBM stream.

Reference counterpart: none (the reference serves via HF eager torch,
`ola_vlm/model/language_model/base_lm.py:211-373`); this is a TPU serving
lever beyond parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor(n: int, target: int, align: int) -> int:
    """Largest multiple of ``align`` that divides n and is <= target (0 if none)."""
    best = 0
    d = align
    while d <= min(n, target):
        if n % d == 0:
            best = d
        d += align
    return best


def _w4_kernel(
    xe_ref, xo_ref, pk_ref, s_ref, out_ref, acc,
    *, n_groups: int, gph: int, n_din_blocks: int,
):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # unpack both nibbles, sign-extended, via i32 shifts (Mosaic-safe)
    pk = pk_ref[...].astype(jnp.int32)            # (bdinh, bdout)
    low = jnp.left_shift(pk, 28)
    low = jnp.right_shift(low, 28)
    high = jnp.right_shift(pk, 4)                 # floor-div keeps the sign
    wdt = xe_ref.dtype
    low = low.astype(wdt)
    high = high.astype(wdt)

    # per-group partial dots; the (1, bdout) scale row lands on the (B, bdout)
    # partial output — O(B*dout) scale work instead of O(din*dout)
    for g in range(n_groups):
        sl = slice(g * gph, (g + 1) * gph)
        pe = jnp.dot(
            xe_ref[:, sl], low[sl], preferred_element_type=jnp.float32
        )
        pe += jnp.dot(
            xo_ref[:, sl], high[sl], preferred_element_type=jnp.float32
        )
        acc[:] += pe * s_ref[g : g + 1, :].astype(jnp.float32)

    @pl.when(i == n_din_blocks - 1)
    def _finalize():
        out_ref[...] = acc[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "block_out", "block_in", "interpret")
)
def w4_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    *,
    group: int = 128,
    block_out: int = 512,
    block_in: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(M, din) @ dequant(packed (din/2, dout) int8, scales (G, dout)) -> (M, dout).

    din must be divisible by ``group`` (guaranteed by the quantizer, which
    falls back to smaller groups or dense storage otherwise).
    """
    m, din = x.shape
    dinh, dout = packed.shape
    assert din == 2 * dinh, (x.shape, packed.shape)
    n_g_total = scales.shape[0]
    assert n_g_total * group == din, (scales.shape, group, din)
    gph = group // 2                                     # packed rows per group

    bdinh = _largest_divisor(dinh, block_in // 2, gph)
    if bdinh == 0:                                       # din too small/ragged
        bdinh = dinh
    bdout = min(block_out, dout)
    n_groups = bdinh // gph
    n_din_blocks = dinh // bdinh
    # tile rows too: decode is m=B (one tile), but the SAME quantized params
    # serve prefill where m = B*T — unblocked rows would put an (m, bdout) f32
    # accumulator plus (m, bdinh) x tiles in VMEM and blow the ~16 MiB budget
    bm = min(m, 256)
    grid = (pl.cdiv(m, bm), pl.cdiv(dout, bdout), n_din_blocks)

    xe = x[:, 0::2]
    xo = x[:, 1::2]

    kernel = functools.partial(
        _w4_kernel, n_groups=n_groups, gph=gph, n_din_blocks=n_din_blocks
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bdinh), lambda r, j, i: (r, i)),
            pl.BlockSpec((bm, bdinh), lambda r, j, i: (r, i)),
            pl.BlockSpec((bdinh, bdout), lambda r, j, i: (i, j)),
            pl.BlockSpec((n_groups, bdout), lambda r, j, i: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, bdout), lambda r, j, i: (r, j)),
        out_shape=jax.ShapeDtypeStruct((m, dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bdout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xe, xo, packed, scales)
    return out


# Force interpret mode for the dispatched kernel (CPU testing of the full
# decode path with the Pallas branch engaged).
INTERPRET: bool = False


def w4_linear(
    p, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Apply a q4-packed linear param dict via the Pallas kernel.

    Accepts x of shape (..., din); flattens leading dims. Falls back to the
    caller's XLA path by raising ValueError when the layout is unsupported
    (callers catch via w4_supported()).
    """
    packed = p["kernel_q4p"]
    scales = p["q4_scale"]
    din = packed.shape[0] * 2
    lead = x.shape[:-1]
    x2 = x.reshape(-1, din)
    group = din // scales.shape[0]
    y = w4_matmul(
        x2, packed, scales, group=group, interpret=interpret or INTERPRET
    )
    y = y.reshape(*lead, packed.shape[1])
    if "bias" in p:
        y = y + p["bias"]
    return y


def w4_supported(p, x: jax.Array, group_min: int = 2) -> bool:
    """Whether the Pallas kernel layout constraints hold for this param/input."""
    if "kernel_q4p" not in p:
        return False
    packed = p["kernel_q4p"]
    scales = p["q4_scale"]
    if packed.ndim != 2 or scales.ndim != 2:
        return False                    # stacked per-layer trees unsupported
    din = packed.shape[0] * 2
    if x.shape[-1] != din or scales.shape[0] == 0 or din % scales.shape[0]:
        return False
    group = din // scales.shape[0]
    return group % 2 == 0 and group >= group_min
