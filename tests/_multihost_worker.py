"""Worker for the 2-process x 4-virtual-device multi-host test.

Usage: python _multihost_worker.py <process_id> <port>
Prints "LOSS <value>" after one full PT-stage distillation train step over the
global ('data','model') mesh spanning both processes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from visper_lm_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    local_batch_size,
    make_global_mesh,
)

init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp  # noqa: E402

from visper_lm_tpu.config import tiny_test_vlm  # noqa: E402
from visper_lm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX  # noqa: E402
from visper_lm_tpu.data.collate import build_splice_plan, collate_plans  # noqa: E402
from visper_lm_tpu.models.vlm import init_vlm  # noqa: E402
from visper_lm_tpu.train.optimizer import OptimizerConfig  # noqa: E402
from visper_lm_tpu.train.train_step import make_train_step, shard_batch  # noqa: E402

cfg = tiny_test_vlm(distill=True)
params = init_vlm(jax.random.PRNGKey(0), cfg)  # same seed -> identical on both ranks

GLOBAL_B, T = 4, 64
rng = np.random.default_rng(0)  # shared seed: both ranks build the same global batch
plans, images, targets = [], [], {}
for b in range(GLOBAL_B):
    ids = (
        list(rng.integers(3, cfg.decoder.vocab_size - 10, size=cfg.num_sys_tokens))
        + [IMAGE_TOKEN_INDEX]
        + list(rng.integers(3, cfg.decoder.vocab_size - 10, size=12 + b))
    )
    labels = [IGNORE_INDEX] * (cfg.num_sys_tokens + 1) + ids[cfg.num_sys_tokens + 1 :]
    plans.append(
        build_splice_plan(
            ids,
            labels,
            T,
            num_image_tokens=cfg.num_image_tokens,
            num_task_tokens=cfg.distill.num_task_tokens,
            num_tasks=len(cfg.distill.task_order()),
        )
    )
img = rng.normal(size=(GLOBAL_B, cfg.vision.image_size, cfg.vision.image_size, 3))
batch = collate_plans(plans, images=img.astype(np.float32))
for tcfg in cfg.distill.tasks:
    batch[f"{tcfg.task}_target"] = rng.normal(
        size=(GLOBAL_B, tcfg.target_tokens, tcfg.target_dim)
    ).astype(np.float32)
    batch[f"{tcfg.task}_mask"] = np.ones((GLOBAL_B,), np.float32)

# each process feeds only its contiguous local shard of the global batch
lb = local_batch_size(GLOBAL_B)
local = {k: v[pid * lb : (pid + 1) * lb] for k, v in batch.items()}

mesh = make_global_mesh(dp=4, tp=2)
opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, stage="pretrain")
with mesh:
    step_fn, state, _ = make_train_step(cfg, opt_cfg, params, mesh, use_pallas=False)
    dbatch = shard_batch(local, mesh)
    assert dbatch["labels"].shape[0] == GLOBAL_B  # global batch axis
    state, metrics = step_fn(state, dbatch)
    loss = float(metrics["loss"])
assert np.isfinite(loss)

# multi-host Orbax checkpointing: every process participates in the save; the
# restore must reproduce the sharded state bit-true (SURVEY §5.4 on a pod).
import tempfile

from visper_lm_tpu.train.checkpoint import CheckpointManager

ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else tempfile.gettempdir() + "/mh_ckpt"
with mesh:
    mgr = CheckpointManager(ckpt_dir, async_save=False)
    mgr.save(1, state, cfg)
    mgr.wait()
    restored = mgr.restore(state)
    mgr.close()
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        # arrays span processes: compare this process's addressable shards only
        sa = sorted(a.addressable_shards, key=lambda s: s.index.__repr__())
        sb = sorted(b.addressable_shards, key=lambda s: s.index.__repr__())
        assert len(sa) == len(sb) > 0
        for x, y in zip(sa, sb):
            np.testing.assert_array_equal(np.asarray(x.data), np.asarray(y.data))
print("CKPT_OK", flush=True)
print(f"LOSS {loss:.6f}", flush=True)
