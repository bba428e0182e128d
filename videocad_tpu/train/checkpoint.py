"""Orbax checkpointing with true resume.

The reference saves ``{epoch, model_state_dict, optimizer_state_dict,
loss}`` but never restores the optimizer and always restarts at epoch 0
(SURVEY.md §5 checkpoint/resume). Here a checkpoint is the full TrainState
(params + optimizer moments + step) plus metadata, and ``restore`` resumes
training exactly where it stopped.

Multi-host correctness: the sharded state is handed to Orbax as-is — each
process serializes only its addressable shards and Orbax coordinates the
cross-process commit (no ``jax.device_get``, which would raise on
non-addressable shards of a pod-sharded array). Host-side metadata is
written by process 0 only, after the async save is finalized; the save/
restore/resume round trip under a mesh is exercised by
``__graft_entry__._dryrun_body``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from videocad_tpu.train.state import TrainState


class CheckpointHandler:
    """epoch_N / best_model checkpoints under <dir>/<experiment>/."""

    def __init__(self, experiment_name: str, checkpoint_dir: str = "checkpoints"):
        self.base = os.path.abspath(os.path.join(checkpoint_dir, experiment_name))
        os.makedirs(self.base, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def save(self, state: TrainState, epoch: int, loss: float,
             is_best: bool = False, name: Optional[str] = None):
        """Save a checkpoint.

        ``name`` may be arbitrary, but ``latest_epoch()`` (and thus
        ``Trainer.resume`` with no explicit name) only considers
        ``epoch_<N>`` directories with a purely numeric suffix — a custom
        name like ``epoch_final`` is restorable solely by passing that
        name to ``restore``/``resume`` explicitly.
        """
        name = name or ("best_model" if is_best else f"epoch_{epoch + 1}")
        path = self._path(name)
        # Every process participates: Orbax writes each process's
        # addressable shards and commits the directory once (atomic
        # rename on the primary host). Fetching the state to host first
        # would break on a pod — non-addressable shards raise.
        self._ckptr.save(path, state, force=True)
        # Orbax finalizes the directory asynchronously (atomic rename);
        # block before writing metadata into it.
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump({"epoch": epoch + 1, "loss": float(loss)}, f)
        return path

    def restore(self, name: str, target: TrainState
                ) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore a TrainState shaped/sharded like ``target``."""
        path = self._path(name)
        state = self._ckptr.restore(path, target)
        meta_path = os.path.join(path, "meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta

    def latest_epoch(self) -> Optional[str]:
        # Accept only fully-finalized 'epoch_<N>' dirs: a preempted run
        # leaves 'epoch_N.orbax-checkpoint-tmp-*' litter beside them,
        # which must neither crash the int() parse nor win the max.
        epochs = []
        for d in os.listdir(self.base):
            if not d.startswith("epoch_"):
                continue
            suffix = d.split("_", 1)[1]
            if suffix.isdigit():
                epochs.append((int(suffix), d))
        if not epochs:
            return None
        return max(epochs)[1]

    def wait(self):
        self._ckptr.wait_until_finished()
