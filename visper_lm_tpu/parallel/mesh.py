"""Device mesh construction.

The reference delegates all distribution to the DeepSpeed launcher + ZeRO engine
(SURVEY.md §2.9). The TPU-native equivalent is one `jax.sharding.Mesh` with axes:

  data  — batch / ZeRO axis (DP + optimizer-state sharding ride here)
  model — tensor-parallel axis (8B decoder matmuls shard here for v5e HBM fit)

A `sequence` axis seam is reserved for long-context work (unused at parity,
SURVEY.md §5.7). Collectives ride ICI when the mesh is built from contiguous device
slices, which `jax.experimental.mesh_utils.create_device_mesh` handles.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    sp: int = 1,
    pp: int = 1,
    ep: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh, gaining a 'pipe' axis when pp > 1
    (GPipe-style layer pipelining, parallel/pipeline.py), a 'seq' axis when
    sp > 1 (Ulysses/ring sequence parallelism, parallel/sequence.py), and an
    'expert' axis when ep > 1 (expert-parallel MoE, ops/moe.py). dp defaults
    to n_devices // (pp * sp * ep * tp).

    Axis order ('data', 'pipe', 'expert', 'seq', 'model') puts the
    highest-bandwidth collectives (TP all-reduces) on the innermost, fastest
    ICI dimension and the point-to-point pipeline hops outside them."""
    if devices is None:
        devices = jax.devices()
    if dp is None:
        dp = len(devices) // (pp * tp * sp * ep)
    devices = list(devices)[: dp * pp * tp * sp * ep]
    n = len(devices)
    assert dp * pp * sp * ep * tp == n, (
        f"dp({dp}) * pp({pp}) * sp({sp}) * ep({ep}) * tp({tp}) "
        f"!= available devices({n})"
    )
    shape = [dp]
    axes = [DATA_AXIS]
    if pp > 1:
        shape.append(pp)
        axes.append(PIPE_AXIS)
    if ep > 1:
        shape.append(ep)
        axes.append(EXPERT_AXIS)
    if sp > 1:
        shape.append(sp)
        axes.append(SEQ_AXIS)
    shape.append(tp)
    axes.append(MODEL_AXIS)
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
