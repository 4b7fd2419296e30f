"""InceptionV3 (FID variant) in functional JAX — the canonical FID feature net.

Port target: the reference's vendored pytorch-fid extractor
(/root/reference/ola_vlm/eval/inception.py:1-343): torchvision inception_v3 with
the three TF-compat patches (FIDInceptionA/C/E: branch-pool average pooling with
count_include_pad=False; the second InceptionE uses MAX pooling in its pool
branch), fed by bilinear resize to 299 and [-1, 1] scaling, producing the
2048-d final-average-pool features (output block 3).

Weights: `import_inception(sd)` consumes the pt_inception-2015-12-05 state dict
(torchvision key layout: Conv2d_1a_3x3.conv/bn, Mixed_5b.branch1x1..., fc) once
it is reachable; offline tests cover the architecture and the key mapping with a
synthetic state dict. BatchNorm runs in inference mode (running stats, eps 1e-3).

All convs are NHWC; pooling via lax.reduce_window; one jit for the whole net.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]
BN_EPS = 1e-3


# --------------------------------------------------------------- primitives


def _conv(p: Params, x: jax.Array, stride: int = 1, padding=((0, 0), (0, 0))) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def basic_conv(p: Params, x: jax.Array, stride: int = 1, padding=((0, 0), (0, 0))) -> jax.Array:
    """BasicConv2d: conv (no bias) -> BN(eps 1e-3, running stats) -> relu."""
    y = _conv(p, x, stride, padding)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"] + BN_EPS) * bn["scale"]
    y = y * inv + (bn["bias"] - bn["mean"] * inv)
    return jax.nn.relu(y)


def max_pool(x: jax.Array, k: int = 3, stride: int = 2, pad: int = 0) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def avg_pool_nocountpad(x: jax.Array, k: int = 3, stride: int = 1, pad: int = 1) -> jax.Array:
    """TF-style average pooling: padded zeros are NOT counted in the divisor
    (the FIDInception* patch, reference inception.py:236-242)."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return sums / counts


P0 = ((0, 0), (0, 0))
P1 = ((1, 1), (1, 1))


# ------------------------------------------------------------ mixed blocks


def inception_a(p: Params, x: jax.Array) -> jax.Array:
    b1 = basic_conv(p["branch1x1"], x)
    b5 = basic_conv(p["branch5x5_1"], x)
    b5 = basic_conv(p["branch5x5_2"], b5, padding=((2, 2), (2, 2)))
    b3 = basic_conv(p["branch3x3dbl_1"], x)
    b3 = basic_conv(p["branch3x3dbl_2"], b3, padding=P1)
    b3 = basic_conv(p["branch3x3dbl_3"], b3, padding=P1)
    bp = avg_pool_nocountpad(x)
    bp = basic_conv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def inception_b(p: Params, x: jax.Array) -> jax.Array:
    b3 = basic_conv(p["branch3x3"], x, stride=2)
    bd = basic_conv(p["branch3x3dbl_1"], x)
    bd = basic_conv(p["branch3x3dbl_2"], bd, padding=P1)
    bd = basic_conv(p["branch3x3dbl_3"], bd, stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def inception_c(p: Params, x: jax.Array) -> jax.Array:
    w = ((0, 0), (3, 3))  # 1x7
    h = ((3, 3), (0, 0))  # 7x1
    b1 = basic_conv(p["branch1x1"], x)
    b7 = basic_conv(p["branch7x7_1"], x)
    b7 = basic_conv(p["branch7x7_2"], b7, padding=w)
    b7 = basic_conv(p["branch7x7_3"], b7, padding=h)
    bd = basic_conv(p["branch7x7dbl_1"], x)
    bd = basic_conv(p["branch7x7dbl_2"], bd, padding=h)
    bd = basic_conv(p["branch7x7dbl_3"], bd, padding=w)
    bd = basic_conv(p["branch7x7dbl_4"], bd, padding=h)
    bd = basic_conv(p["branch7x7dbl_5"], bd, padding=w)
    bp = avg_pool_nocountpad(x)
    bp = basic_conv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def inception_d(p: Params, x: jax.Array) -> jax.Array:
    b3 = basic_conv(p["branch3x3_1"], x)
    b3 = basic_conv(p["branch3x3_2"], b3, stride=2)
    b7 = basic_conv(p["branch7x7x3_1"], x)
    b7 = basic_conv(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = basic_conv(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = basic_conv(p["branch7x7x3_4"], b7, stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def inception_e(p: Params, x: jax.Array, pool: str) -> jax.Array:
    b1 = basic_conv(p["branch1x1"], x)
    b3 = basic_conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [
            basic_conv(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
            basic_conv(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    bd = basic_conv(p["branch3x3dbl_1"], x)
    bd = basic_conv(p["branch3x3dbl_2"], bd, padding=P1)
    bd = jnp.concatenate(
        [
            basic_conv(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
            basic_conv(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    if pool == "max":  # FIDInceptionE_2 (reference inception.py:307-341)
        bp = max_pool(x, 3, 1, 1)
    else:
        bp = avg_pool_nocountpad(x)
    bp = basic_conv(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ------------------------------------------------------------------ network


STEM = (
    ("Conv2d_1a_3x3", 2, P0),
    ("Conv2d_2a_3x3", 1, P0),
    ("Conv2d_2b_3x3", 1, P1),
)
STEM2 = (("Conv2d_3b_1x1", 1, P0), ("Conv2d_4a_3x3", 1, P0))
MIXED_C = ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e")


def inception_features(params: Params, images: jax.Array) -> jax.Array:
    """images (B, H, W, 3) in [0, 1] -> pool3 features (B, 2048).

    Matches InceptionV3(output_blocks=[3], resize_input=True, normalize_input=True)
    — the pytorch-fid default the reference uses.
    """
    x = jax.image.resize(
        images.astype(jnp.float32),
        (images.shape[0], 299, 299, images.shape[-1]),
        method="bilinear",
    )
    x = 2.0 * x - 1.0

    for name, stride, pad in STEM:
        x = basic_conv(params[name], x, stride=stride, padding=pad)
    x = max_pool(x)
    for name, stride, pad in STEM2:
        x = basic_conv(params[name], x, stride=stride, padding=pad)
    x = max_pool(x)
    x = inception_a(params["Mixed_5b"], x)
    x = inception_a(params["Mixed_5c"], x)
    x = inception_a(params["Mixed_5d"], x)
    x = inception_b(params["Mixed_6a"], x)
    for name in MIXED_C:
        x = inception_c(params[name], x)
    x = inception_d(params["Mixed_7a"], x)
    x = inception_e(params["Mixed_7b"], x, pool="avg")
    x = inception_e(params["Mixed_7c"], x, pool="max")
    return x.mean(axis=(1, 2))  # adaptive avg pool to 1x1


# ------------------------------------------------------- init & importer


_A_BRANCHES = (
    "branch1x1", "branch5x5_1", "branch5x5_2",
    "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool",
)
_B_BRANCHES = ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3")
_C_BRANCHES = (
    "branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
    "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3", "branch7x7dbl_4",
    "branch7x7dbl_5", "branch_pool",
)
_D_BRANCHES = (
    "branch3x3_1", "branch3x3_2",
    "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4",
)
_E_BRANCHES = (
    "branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
    "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a", "branch3x3dbl_3b",
    "branch_pool",
)


def module_branches() -> Dict[str, Sequence[str]]:
    """Full module -> BasicConv2d branch-name table (torchvision inception_v3)."""
    table: Dict[str, Sequence[str]] = {name: ("",) for name, _, _ in STEM + STEM2}
    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        table[m] = _A_BRANCHES
    table["Mixed_6a"] = _B_BRANCHES
    for m in MIXED_C:
        table[m] = _C_BRANCHES
    table["Mixed_7a"] = _D_BRANCHES
    for m in ("Mixed_7b", "Mixed_7c"):
        table[m] = _E_BRANCHES
    return table


# (cin, cout, kh, kw) per BasicConv2d, derived from the torchvision architecture
def conv_shapes() -> Dict[str, Tuple[int, int, int, int]]:
    shapes: Dict[str, Tuple[int, int, int, int]] = {
        "Conv2d_1a_3x3": (3, 32, 3, 3),
        "Conv2d_2a_3x3": (32, 32, 3, 3),
        "Conv2d_2b_3x3": (32, 64, 3, 3),
        "Conv2d_3b_1x1": (64, 80, 1, 1),
        "Conv2d_4a_3x3": (80, 192, 3, 3),
    }

    def a(mod, cin, pool):
        shapes[f"{mod}.branch1x1"] = (cin, 64, 1, 1)
        shapes[f"{mod}.branch5x5_1"] = (cin, 48, 1, 1)
        shapes[f"{mod}.branch5x5_2"] = (48, 64, 5, 5)
        shapes[f"{mod}.branch3x3dbl_1"] = (cin, 64, 1, 1)
        shapes[f"{mod}.branch3x3dbl_2"] = (64, 96, 3, 3)
        shapes[f"{mod}.branch3x3dbl_3"] = (96, 96, 3, 3)
        shapes[f"{mod}.branch_pool"] = (cin, pool, 1, 1)

    a("Mixed_5b", 192, 32)
    a("Mixed_5c", 256, 64)
    a("Mixed_5d", 288, 64)
    shapes["Mixed_6a.branch3x3"] = (288, 384, 3, 3)
    shapes["Mixed_6a.branch3x3dbl_1"] = (288, 64, 1, 1)
    shapes["Mixed_6a.branch3x3dbl_2"] = (64, 96, 3, 3)
    shapes["Mixed_6a.branch3x3dbl_3"] = (96, 96, 3, 3)

    def c(mod, c7):
        shapes[f"{mod}.branch1x1"] = (768, 192, 1, 1)
        shapes[f"{mod}.branch7x7_1"] = (768, c7, 1, 1)
        shapes[f"{mod}.branch7x7_2"] = (c7, c7, 1, 7)
        shapes[f"{mod}.branch7x7_3"] = (c7, 192, 7, 1)
        shapes[f"{mod}.branch7x7dbl_1"] = (768, c7, 1, 1)
        shapes[f"{mod}.branch7x7dbl_2"] = (c7, c7, 7, 1)
        shapes[f"{mod}.branch7x7dbl_3"] = (c7, c7, 1, 7)
        shapes[f"{mod}.branch7x7dbl_4"] = (c7, c7, 7, 1)
        shapes[f"{mod}.branch7x7dbl_5"] = (c7, 192, 1, 7)
        shapes[f"{mod}.branch_pool"] = (768, 192, 1, 1)

    c("Mixed_6b", 128)
    c("Mixed_6c", 160)
    c("Mixed_6d", 160)
    c("Mixed_6e", 192)
    shapes["Mixed_7a.branch3x3_1"] = (768, 192, 1, 1)
    shapes["Mixed_7a.branch3x3_2"] = (192, 320, 3, 3)
    shapes["Mixed_7a.branch7x7x3_1"] = (768, 192, 1, 1)
    shapes["Mixed_7a.branch7x7x3_2"] = (192, 192, 1, 7)
    shapes["Mixed_7a.branch7x7x3_3"] = (192, 192, 7, 1)
    shapes["Mixed_7a.branch7x7x3_4"] = (192, 192, 3, 3)

    def e(mod, cin):
        shapes[f"{mod}.branch1x1"] = (cin, 320, 1, 1)
        shapes[f"{mod}.branch3x3_1"] = (cin, 384, 1, 1)
        shapes[f"{mod}.branch3x3_2a"] = (384, 384, 1, 3)
        shapes[f"{mod}.branch3x3_2b"] = (384, 384, 3, 1)
        shapes[f"{mod}.branch3x3dbl_1"] = (cin, 448, 1, 1)
        shapes[f"{mod}.branch3x3dbl_2"] = (448, 384, 3, 3)
        shapes[f"{mod}.branch3x3dbl_3a"] = (384, 384, 1, 3)
        shapes[f"{mod}.branch3x3dbl_3b"] = (384, 384, 3, 1)
        shapes[f"{mod}.branch_pool"] = (cin, 192, 1, 1)

    e("Mixed_7b", 1280)
    e("Mixed_7c", 2048)
    return shapes


def init_inception(key: jax.Array) -> Params:
    """Random-weight network with the exact architecture (tests / smoke)."""
    params: Params = {}
    branches = module_branches()
    shapes = conv_shapes()
    i = 0
    for mod, brs in branches.items():
        node: Params = {}
        for br in brs:
            full = mod if br == "" else f"{mod}.{br}"
            cin, cout, kh, kw = shapes[full]
            k = jax.random.fold_in(key, i)
            i += 1
            conv = {
                "kernel": jax.random.normal(k, (kh, kw, cin, cout)) * 0.05,
                "bn": {
                    "scale": jnp.ones((cout,)),
                    "bias": jnp.zeros((cout,)),
                    "mean": jnp.zeros((cout,)),
                    "var": jnp.ones((cout,)),
                },
            }
            if br == "":
                node = conv
            else:
                node[br] = conv
        params[mod] = node
    return params


def import_inception(sd: Dict[str, np.ndarray]) -> Params:
    """pt_inception / torchvision inception_v3 state dict -> params tree.

    Keys: '{module}.conv.weight' (OIHW), '{module}.bn.{weight,bias,
    running_mean,running_var}' for every BasicConv2d; fc.* ignored (FID uses
    pool3 features only).
    """

    def one(prefix: str) -> Params:
        return {
            "kernel": np.ascontiguousarray(
                np.asarray(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0)
            ),
            "bn": {
                "scale": np.asarray(sd[f"{prefix}.bn.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bn.bias"]),
                "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
            },
        }

    params: Params = {}
    for mod, brs in module_branches().items():
        if brs == ("",):
            params[mod] = one(mod)
        else:
            params[mod] = {br: one(f"{mod}.{br}") for br in brs}
    return jax.tree_util.tree_map(jnp.asarray, params)


def inception_feature_fn(params: Params, batch_size: int = 32) -> Callable:
    """Batched (N, H, W, 3)-in-[0,1] -> (N, 2048) canonical FID features."""
    jitted = jax.jit(inception_features)

    def fn(images: np.ndarray) -> np.ndarray:
        out: List[np.ndarray] = []
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(jitted(params, jnp.asarray(images[i : i + batch_size]))))
        return np.concatenate(out, axis=0)

    return fn
