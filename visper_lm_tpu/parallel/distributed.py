"""Multi-process (multi-host) runtime.

The reference's whole distribution story is the DeepSpeed launcher: one rank per
GPU, `torch.distributed`/NCCL process groups, ZeRO engine hooks
(`/root/reference/scripts/train/pretrain.sh:15`, `scripts/zero2.json:16-22`,
rank gating via `dist.get_rank()` throughout). The TPU-native equivalent
(SURVEY.md §2.9, §5.8) is:

  * `jax.distributed.initialize()` once per process — on TPU pods every argument
    autodetects from the metadata server; for CPU/GPU (and tests) the coordinator
    address / process count / process id come from args or env;
  * ONE global `Mesh` whose devices span all processes; every collective is an XLA
    op inside the jitted step riding ICI/DCN — there is no hand-written comm layer;
  * per-process data feeding: each process loads only its shard of the global batch
    and `jax.make_array_from_process_local_data` assembles the logically-global
    array (the moral equivalent of the DistributedSampler + DDP input contract).

Environment variables honored (all optional; TPU pods need none):
  VISPER_COORDINATOR  — "host:port" of process 0
  VISPER_NUM_PROCESSES, VISPER_PROCESS_ID
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visper_lm_tpu.parallel import sharding as shd
from visper_lm_tpu.parallel.mesh import make_mesh

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no args and no VISPER_* env vars this is a no-op on single-process
    backends and autodetects on TPU pods (where the env provides everything).
    """
    global _initialized
    if _initialized:
        return

    coordinator_address = coordinator_address or os.environ.get("VISPER_COORDINATOR")
    env_np = os.environ.get("VISPER_NUM_PROCESSES")
    env_pid = os.environ.get("VISPER_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    explicit = coordinator_address is not None or num_processes is not None
    autodetect = os.environ.get("VISPER_AUTO_DISTRIBUTED") == "1"
    if not explicit and not autodetect:
        return  # plain single-process run (jax.devices() must NOT be touched here:
        #         binding the backend before initialize() hides remote devices)

    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    else:  # TPU pod: every argument autodetects from the metadata server
        jax.distributed.initialize()
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """Rank-0 gate for logging / side-effecting host work (ref: dist.get_rank()==0)."""
    return jax.process_index() == 0


def make_global_mesh(dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """A ('data','model') mesh over ALL devices across processes.

    TP groups must not straddle hosts on CPU/DCN (and shouldn't on pods unless the
    slice topology makes intra-host ICI equivalent); `create_device_mesh` inside
    make_mesh keeps hosts contiguous along the trailing (model) axis.
    """
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of a global batch (must divide evenly)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} processes"
    )
    return global_batch_size // n


def shard_batch_multihost(
    batch: Dict[str, Any], mesh: Mesh, leading_accum: bool = False
) -> Dict[str, jax.Array]:
    """Assemble each process's LOCAL host batch into globally-sharded arrays.

    Every process passes its own (local_batch, ...) shard; the result is a tree of
    jax.Arrays whose global batch axis is the concatenation over processes, sharded
    along the mesh 'data' axis. Single-process: plain device_put (identical result).
    leading_accum: batch leaves carry a leading (accum_steps, ...) axis that stays
    unsharded; the 'data' axis is then axis 1.
    """
    specs = shd.batch_pspecs(batch, leading_accum=leading_accum)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(np.asarray(x), NamedSharding(mesh, s)),
            batch,
            specs,
        )
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.ascontiguousarray(np.asarray(x))
        ),
        batch,
        specs,
    )
