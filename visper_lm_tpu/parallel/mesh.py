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


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh. dp defaults to n_devices // tp."""
    if devices is None:
        devices = jax.devices()
    if dp is None:
        dp = len(devices) // tp
    devices = list(devices)[: dp * tp]
    n = len(devices)
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != available devices({n})"
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
