"""Parameter-tree conventions and layer primitives.

The framework uses explicit pytrees of jnp arrays (nested dicts) rather than a module
system: params are first-class so pjit shardings, HF imports, optimizer param groups
and surgical freezing are all plain tree operations.

Conventions:
  * Linear:    {"kernel": (in, out)[, "bias": (out,)]}  — kernel is input-major so
               y = x @ kernel; HF torch weights (out, in) are transposed at import.
  * LayerNorm: {"scale": (d,), "bias": (d,)}
  * RMSNorm:   {"scale": (d,)}
  * Embedding: {"embedding": (vocab, d)}
  * Stacked decoder blocks: every leaf gets a leading (num_layers,) axis for lax.scan.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _as_dtype(dtype) -> jnp.dtype:
    return jnp.dtype(dtype)


def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    use_bias: bool = True,
    dtype=jnp.float32,
    scale: Optional[float] = None,
) -> Params:
    if scale is None:
        scale = 1.0 / math.sqrt(in_dim)
    kernel = jax.random.uniform(
        key, (in_dim, out_dim), dtype=jnp.float32, minval=-scale, maxval=scale
    ).astype(dtype)
    p: Params = {"kernel": kernel}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype=dtype)
    return p


# w4a16 kernel dispatch: None = auto (Pallas on single-device TPU), True/False
# force. The Pallas path cannot be GSPMD-partitioned, so it stays off under a
# multi-device ambient mesh (TP-sharded generation keeps the XLA fallback).
W4_USE_PALLAS: Optional[bool] = None


def _use_w4_kernel(p: Params, x: jax.Array) -> bool:
    if W4_USE_PALLAS is not None:
        if not W4_USE_PALLAS:
            return False
    elif jax.default_backend() != "tpu":
        return False
    # the ambient PHYSICAL mesh (`with mesh:`) — get_abstract_mesh() does NOT
    # reflect the legacy context manager and would let the kernel engage under
    # a multi-device mesh, where GSPMD cannot partition Mosaic calls
    from visper_lm_tpu.ops.attention import _ambient_mesh

    mesh = _ambient_mesh()
    if mesh is not None and mesh.size > 1:
        return False
    from visper_lm_tpu.ops.quant_matmul import w4_supported

    return w4_supported(p, x)


def linear(p: Params, x: jax.Array, precision=None) -> jax.Array:
    if "kernel_q8" in p:
        # w8a16 inference weights (serving): int8 kernel with a per-OUTPUT-
        # channel f32 scale. int8 values are exact in bf16, and a per-column
        # scale folds exactly into the matmul output — x @ (W_int * s_col)
        # == (x @ W_int) * s_col — so this halves weight HBM streaming with no
        # approximation beyond the quantization itself.
        y = jnp.dot(x, p["kernel_q8"].astype(x.dtype), precision=precision)
        y = y * p["out_scale"].astype(y.dtype)
    elif "kernel_q4p" in p:
        if "q4_in_scale" in p:
            # AWQ calibration (quantize_linear_weights_int4 act_rms=...): the
            # weights were pre-scaled per input channel; undo on the activation
            x = x * p["q4_in_scale"].astype(x.dtype)
        if _use_w4_kernel(p, x):
            # Pallas dequant-matmul: streams the packed bytes and dequantizes
            # in VMEM (the XLA formulation below materializes the bf16
            # weights — measured 5x slower at decode; ops/quant_matmul.py).
            from visper_lm_tpu.ops.quant_matmul import w4_linear

            return w4_linear(p, x)
        # w4a16 serving weights: two int4 values NIBBLE-PACKED per int8 byte
        # (the native S4 dtype cannot be transferred under the TPU relay), with
        # GROUP-wise (input-dim groups x output-channel) scales — per-output-
        # channel alone is too coarse at 4 bits. The packed kernel streams from
        # HBM at a quarter of bf16; unpack is two arithmetic shifts in-fusion.
        # y = sum_g (x_g @ W_g) * s_g.
        packed = p["kernel_q4p"]                 # (din//2, dout) int8
        s = p["q4_scale"]                        # (G, dout)
        low = jnp.right_shift(jnp.left_shift(packed, 4), 4)   # sign-extended
        high = jnp.right_shift(packed, 4)
        q = jnp.stack([low, high], axis=1).reshape(
            packed.shape[0] * 2, packed.shape[1]
        )
        groups = s.shape[0]
        din, dout = q.shape
        # dequantize as ONE elementwise chain feeding ONE dot: XLA fuses the
        # unpack+scale into the matmul operand load (a per-group einsum
        # decomposition was measured 5x slower at decode: tiny per-group
        # matvecs defeat the weight-streaming pipeline)
        wf = (
            q.astype(x.dtype).reshape(groups, din // groups, dout)
            * s[:, None, :].astype(x.dtype)
        ).reshape(din, dout)
        y = jnp.dot(x, wf, precision=precision)
    else:
        y = jnp.dot(x, p["kernel"], precision=precision)
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_linear_weights(params: Params) -> Params:
    """Per-output-channel symmetric int8 quantization of every linear 'kernel'.

    Returns a tree of the same structure with {kernel} -> {kernel_q8, out_scale}
    (stacked leading dims preserved; reductions run over the second-to-last
    axis, the input dim). Embedding tables and norm scales are untouched.
    Intended for SERVING weight copies (models/decoder + serve/generate); the
    bf16 originals remain the training representation.
    """

    @jax.jit
    def _quant(w):
        # under jit the f32 intermediates fuse away — computed eagerly, the
        # f32 upcast of a (32, 3072, 8192) stacked kernel alone is 3 GiB and
        # OOM'd the quantization pass at flagship scale
        wf = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        # (..., 1, dout) squeezed to (..., dout): broadcasts over (..., T, dout)
        return q, jnp.squeeze(scale, -2)

    def convert(p):
        if not (isinstance(p, dict) and "kernel" in p):
            return None
        q, scale = _quant(p["kernel"])
        out = {"kernel_q8": q, "out_scale": scale}
        if "bias" in p:
            out["bias"] = p["bias"]
        return out

    def walk(tree, name=None):
        if isinstance(tree, dict):
            # MoE banks stay dense: ops/moe.py consumes raw kernels via
            # einsum (no quantized dispatch path yet), so a quantized bank
            # would KeyError at decode time
            if name is not None and name.startswith("moe_"):
                return tree
            q = convert(tree)
            if q is not None:
                return q
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(params)


def quantize_linear_weights_int4(
    params: Params,
    group: int = 128,
    act_rms: Optional[Dict[str, jax.Array]] = None,
    awq_alpha: float = 0.5,
) -> Params:
    """GROUP-wise symmetric int4 quantization of every linear 'kernel'.

    {kernel} -> {kernel_q4p (nibble-packed int8, (din/2, dout)), q4_scale
    (G, dout) f32} with G = din/group
    input-dim groups (stacked leading dims quantized per layer then restacked).
    Tensors whose input dim doesn't divide by `group` fall back to one group
    per 128.. smallest divisor, or stay dense if din < 16. Serving-only: int4
    streams decoder weights at 1/4 the bf16 bandwidth (the measured decode
    bottleneck); accuracy bound guarded by tests/test_serving_quant.py.

    ``act_rms`` (from serve.calibrate.decoder_act_rms): {param_key: rms array
    matching kernel.shape[:-1]} enables AWQ-style calibration — weight rows are
    pre-scaled by (rms/gmean)^awq_alpha before quantization so the 4-bit budget
    concentrates on the high-activation input channels, and the inverse scale
    is stored as ``q4_in_scale`` for linear() to apply to x at runtime.
    """

    @functools.partial(jax.jit, static_argnums=(1,))
    def _quant(w, g):
        wf = w.astype(jnp.float32)
        din, dout = wf.shape[-2], wf.shape[-1]
        lead = wf.shape[:-2]
        grouped = wf.reshape(lead + (g, din // g, dout))
        amax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 7.0
        q = jnp.clip(jnp.round(grouped / scale), -7, 7).astype(jnp.int8)
        q = q.reshape(lead + (din, dout))
        # nibble-pack rows pairwise: even row -> low nibble, odd -> high
        pairs = q.reshape(lead + (din // 2, 2, dout))
        low = pairs[..., 0, :]
        high = pairs[..., 1, :]
        packed = jnp.bitwise_or(
            jnp.bitwise_and(low, jnp.int8(0x0F)), jnp.left_shift(high, 4)
        ).astype(jnp.int8)
        return packed, jnp.squeeze(scale, -2)

    def convert(p, name):
        if not (isinstance(p, dict) and "kernel" in p):
            return None
        w = p["kernel"]
        if w.ndim < 2:
            return dict(p)
        din = w.shape[-2]
        g = None
        for cand in (group, 64, 32, 16):
            if din % cand == 0:
                g = din // cand
                break
        if g is None:
            return dict(p)
        in_scale = None
        rms = act_rms.get(name) if act_rms else None
        if rms is not None and tuple(rms.shape) == tuple(w.shape[:-1]):
            # AWQ: s = (rms/gmean)^alpha, clipped; quantize W*s, run x/s
            r = jnp.maximum(rms.astype(jnp.float32), 1e-6)
            gmean = jnp.exp(
                jnp.mean(jnp.log(r), axis=-1, keepdims=True)
            )
            s = jnp.clip((r / gmean) ** awq_alpha, 0.1, 10.0)
            w = (w.astype(jnp.float32) * s[..., None]).astype(w.dtype)
            in_scale = 1.0 / s
        q, scale = _quant(w, g)
        out = {"kernel_q4p": q, "q4_scale": scale}
        if in_scale is not None:
            out["q4_in_scale"] = in_scale
        if "bias" in p:
            out["bias"] = p["bias"]
        return out

    def walk(tree, name=None):
        if isinstance(tree, dict):
            # MoE banks stay dense (see quantize_linear_weights)
            if name is not None and name.startswith("moe_"):
                return tree
            q = convert(tree, name)
            if q is not None:
                return q
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(params)


def init_layernorm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype=dtype), "bias": jnp.zeros((dim,), dtype=dtype)}


def layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    # Normalize in f32 for stability regardless of activation dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_rmsnorm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype=dtype)}


def rmsnorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_embedding(key: jax.Array, vocab: int, dim: int, dtype=jnp.float32) -> Params:
    emb = jax.random.normal(key, (vocab, dim), dtype=jnp.float32) * 0.02
    return {"embedding": emb.astype(dtype)}


def embed(p: Params, ids: jax.Array) -> jax.Array:
    return jnp.take(p["embedding"], ids, axis=0)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
}


def count_params(tree: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def tree_cast(tree: Params, dtype) -> Params:
    dt = _as_dtype(dtype)
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def stack_layer_params(layer_params: Sequence[Params]) -> Params:
    """Stack per-layer trees into one tree with a leading layer axis (for lax.scan)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layer_params)


def split_keys(key: jax.Array, n: int) -> Sequence[jax.Array]:
    return jax.random.split(key, n)


def partition_params(params: Params, mask: Params) -> tuple:
    """Split a param tree into (trainable, frozen) by a per-leaf bool mask.

    The two trees keep the full structure with None at the other side's positions;
    merge with merge_params. Differentiating only the trainable tree means XLA never
    materializes grads or optimizer state for frozen teachers/trunks (the reference
    relies on requires_grad_(False) + DeepSpeed for this).
    """
    trainable = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def merge_params(a: Params, b: Params) -> Params:
    """Inverse of partition_params: take the non-None leaf at each position."""
    return jax.tree_util.tree_map(
        lambda x, y: y if x is None else x, a, b, is_leaf=lambda v: v is None
    )


def save_params_npz(path: str, tree: Params) -> None:
    """Persist a param tree as a flat .npz ('/'-joined key paths, list indices
    as decimal segments). Portable teacher-weight bundles for the demo/eval
    decoders (DPT / OneFormer / genpipe) without an Orbax checkpoint dir."""
    import numpy as np

    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None
    )[0]
    for kp, leaf in leaves:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        key = "/".join(parts)
        if leaf is None:
            # None leaves are structural (e.g. identity projections) — keep
            # them so list indices and dict keys survive the round trip
            flat[key + "#None"] = np.zeros((0,), np.int8)
        else:
            flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Params:
    """Inverse of save_params_npz: nested dicts; all-integer-keyed levels
    become lists."""
    import numpy as np

    data = np.load(path)
    root: dict = {}
    for key in data.files:
        value = data[key]
        if key.endswith("#None"):
            key, value = key[: -len("#None")], None
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        out = {k: listify(v) for k, v in node.items()}
        if out and all(k.isdigit() for k in out):
            return [out[str(i)] for i in range(len(out))]
        return out

    return listify(root)
