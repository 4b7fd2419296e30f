"""Weight delta + consolidation utilities.

Parity with the reference's legacy FastChat-style tools (ola_vlm/model/apply_delta.py,
make_delta.py, consolidate.py): deltas let a derived model be distributed as
(derived - base) and re-applied on top of base weights. Operates on the framework's
param trees; extra keys in the delta (e.g. mm_projector, heads) pass through, and
vocab-expanded embedding/lm_head rows are handled like the reference (delta rows
cover the base rows plus new tokens).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _flat(tree: Any) -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        out[key] = np.asarray(leaf)
    return out


def make_delta(base: Any, target: Any) -> Dict[str, np.ndarray]:
    """delta = target - base where shapes match; target value otherwise."""
    b, t = _flat(base), _flat(target)
    delta = {}
    for k, tv in t.items():
        if k in b and b[k].shape == tv.shape:
            delta[k] = tv - b[k]
        elif k in b and tv.ndim == 2 and b[k].shape[1:] == tv.shape[1:]:
            # vocab-expanded rows: subtract base from the overlapping prefix
            d = tv.copy()
            n = b[k].shape[0]
            d[:n] -= b[k]
            delta[k] = d
        else:
            delta[k] = tv
    return delta


def apply_delta(base: Any, delta: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of make_delta (flat-key result; use unflatten to rebuild a tree)."""
    b = _flat(base)
    out = {}
    for k, dv in delta.items():
        if k in b and b[k].shape == dv.shape:
            out[k] = b[k] + dv
        elif k in b and dv.ndim == 2 and b[k].shape[1:] == dv.shape[1:]:
            r = dv.copy()
            n = b[k].shape[0]
            r[:n] += b[k]
            out[k] = r
        else:
            out[k] = dv
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Any:
    """'a/b/c' keys -> nested dicts (list indices restored as dict-of-int keys are
    kept as string keys; the framework's importers accept either)."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def consolidate(src_ckpt_dir: str, dst_path: str) -> None:
    """Flatten an Orbax checkpoint's params into one .npz (consolidate.py parity)."""
    from visper_lm_tpu.train.checkpoint import CheckpointManager, save_params_numpy

    mgr = CheckpointManager(src_ckpt_dir)
    cfg = mgr.restore_config()
    # restore with no template: standard restore of the stored structure
    step = mgr.latest_step()
    restored = mgr._mgr.restore(step)
    mgr.close()
    state = restored["state"]
    params = state["params"] if isinstance(state, dict) and "params" in state else state
    save_params_numpy(dst_path, params)
