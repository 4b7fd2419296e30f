"""Orbax checkpointing: save/restore/resume with self-describing configs.

Replaces the reference's HF Trainer + ZeRO-gather checkpointing (SURVEY.md §5.4):
  * save_steps/save_total_limit rotation (pretrain.sh:43-44),
  * adapter-only saves for the PT stage (the TrainState already contains only
    stage-trainable params, mirroring tune_mm_mlp_adapter projector-only saves,
    llava_trainer.py:997-1016),
  * auto-resume from the latest step (train.py:1114-1117),
  * the full VLMConfig is embedded as JSON so checkpoints are self-describing
    (the reference denormalizes into HF config for the same reason, §5.6).

Orbax writes sharded arrays natively — restoring onto a different mesh reshards
transparently via the provided shardings (ZeRO/TP reshape on restore).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from visper_lm_tpu.config import VLMConfig, config_from_json, config_to_json


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        *,
        save_total_limit: int = 3,
        async_save: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_total_limit,
            create=True,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(
        self,
        step: int,
        state: Any,
        cfg: Optional[VLMConfig] = None,
        data_state: Optional[dict] = None,
    ) -> None:
        """`data_state` is the data-stream cursor — {"epoch", "steps_in_epoch",
        "seed"} — persisted so resume can fast-forward the iterator to the
        exact next unseen batch (HF Trainer skip-to-batch parity; the
        reference gets this from ignore_data_skip=False auto-resume,
        /root/reference/ola_vlm/train/train.py:1114-1117)."""
        args = {"state": ocp.args.StandardSave(state)}
        if cfg is not None:
            args["config"] = ocp.args.JsonSave(json.loads(config_to_json(cfg)))
        if data_state is not None:
            args["data"] = ocp.args.JsonSave(data_state)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of state_like."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(state_like)),
        )
        return restored["state"]

    def restore_config(self, step: Optional[int] = None) -> Optional[VLMConfig]:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
            )
            return config_from_json(json.dumps(restored["config"]))
        except Exception:
            return None

    def restore_data_state(self, step: Optional[int] = None) -> Optional[dict]:
        """The data-stream cursor saved alongside `step` (None for pre-cursor
        checkpoints — callers fall back to restarting the stream)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(data=ocp.args.JsonRestore())
            )
            return dict(restored["data"])
        except Exception:
            return None

    def close(self) -> None:
        self._mgr.close()


def save_params_numpy(path: str, params: Any) -> None:
    """Flat .npz export (host-side interchange, e.g. for eval workers)."""
    flat = {}
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in p)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)
