"""Multi-process runtime + ZeRO-3 param sharding tests.

SURVEY.md §2.9/§5.8: the reference's distribution is the deepspeed launcher +
torch.distributed (pretrain.sh:15); the TPU-native equivalent is
jax.distributed.initialize + one global mesh. These tests run the REAL multi-process
path (2 subprocesses x 4 virtual CPU devices, Gloo collectives) and the ZeRO-3
zero_params sharding (scripts/zero3.json:16-27 semantics).
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

# heavyweight (subprocess / AOT compile / oracle / e2e) — excluded from the
# fast default suite (pytest.ini addopts); run everything with: pytest -m ''
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_pt_step(tmp_path):
    """2 processes x 4 devices: one full PT distillation step on a global mesh,
    then a multi-host Orbax save + bit-true restore."""
    port = _free_port()
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    ckpt_dir = str(tmp_path / "ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), ckpt_dir],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    losses = []
    for out in outs:
        assert "CKPT_OK" in out, out
        lines = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert lines, out
        losses.append(float(lines[-1].split()[1]))
    # both ranks see the same replicated global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
    assert np.isfinite(losses[0])


def test_zero_params_shards_params_on_data_axis():
    """zero_params=True adds the 'data' axis to large trainable params."""
    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.parallel.mesh import make_mesh
    from visper_lm_tpu.train.optimizer import OptimizerConfig
    from visper_lm_tpu.train.train_step import make_train_step

    cfg = tiny_test_vlm(distill=False)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=4, tp=2)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, stage="finetune")
    with mesh:
        _, state, shardings = make_train_step(
            cfg, opt_cfg, params, mesh, use_pallas=False,
            zero_params=True, zero_min_size=1024,
        )
    specs = jax.tree_util.tree_map(
        lambda ns: ns.spec, shardings.params,
        is_leaf=lambda x: hasattr(x, "spec"),
    )
    flat = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))
    n_data_sharded = sum(1 for s in flat if "data" in [e for e in s if e])
    assert n_data_sharded > 0, "no param picked up ZeRO-3 'data' sharding"
    # the embedding is big and divisible: it must be sharded on data
    emb = specs["decoder"]["embed_tokens"]["embedding"]
    assert "data" in [e for e in emb if e], emb


def test_zero_params_step_runs():
    """One train step executes with fully-sharded params and matches ZeRO-2 loss."""
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    from visper_lm_tpu.config import tiny_test_vlm
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.parallel.mesh import make_mesh
    from visper_lm_tpu.train.optimizer import OptimizerConfig
    from visper_lm_tpu.train.train_step import make_train_step, shard_batch

    cfg = tiny_test_vlm(distill=False)
    params = init_vlm(jax.random.PRNGKey(0), cfg)
    _, batch = g._build(cfg)
    batch = {k: v for k, v in batch.items()}
    mesh = make_mesh(dp=4, tp=2)
    opt_cfg = OptimizerConfig(learning_rate=1e-3, total_steps=10, stage="finetune")

    losses = {}
    for zp in (False, True):
        p = init_vlm(jax.random.PRNGKey(0), cfg)
        with mesh:
            step_fn, state, _ = make_train_step(
                cfg, opt_cfg, p, mesh, use_pallas=False,
                zero_params=zp, zero_min_size=1024,
            )
            dbatch = shard_batch(batch, mesh)
            state, metrics = step_fn(state, dbatch)
            losses[zp] = float(metrics["loss"])
    assert np.isfinite(losses[True])
    assert losses[True] == pytest.approx(losses[False], rel=1e-5)


def test_batch_iterator_process_sharding_disjoint():
    from visper_lm_tpu.data.dataset import modality_grouped_order  # noqa: F401

    # emulate the order-slicing logic with a BatchIterator-free check of the
    # contract: same seed -> same global order; strided batch slices are disjoint
    # and exhaustive over the truncated prefix.
    rng0 = np.random.default_rng(7)
    order = list(rng0.permutation(103))
    bs, pc = 4, 2
    n_global = (len(order) // (bs * pc)) * pc
    batches = [order[k * bs : (k + 1) * bs] for k in range(n_global)]
    shards = [
        [i for b in batches[p::pc] for i in b] for p in range(pc)
    ]
    assert len(shards[0]) == len(shards[1])
    assert not set(shards[0]) & set(shards[1])
    assert len(set(shards[0]) | set(shards[1])) == n_global * bs
