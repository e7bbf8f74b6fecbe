"""Checkpoint/resume subsystem (orbax) — shared by every model.

The reference only fully realized checkpointing for DiffWave: per-epoch
SavedModels + a resume path that scans the checkpoint dir for the
lexicographically-last entry and restores model+optimizer
(``DiffWave_TF/train.py:179-228``); HiFi-GAN saves but can't load
(``gan.py:199-211``); the other models have none (SURVEY §5). Here,
checkpoint/resume is one subsystem: orbax async-capable saves of the whole
``TrainState`` pytree (params **and** optimizer state **and** step), retention
policy, and automatic latest-step resume — crash-resume without the manual
8-restart workflow described in ``DiffWave_TF/README.md``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        if step in self.manager.all_steps():
            return False  # idempotent: step already persisted
        saved = self.manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``abstract_state`` (a concrete or
        ``jax.eval_shape``-style template). Returns the restored pytree."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def restore_tree(self, step: Optional[int] = None) -> Any:
        """Restore the raw saved pytree (nested dicts of arrays) without a
        structure template. Inference CLIs use this to pull ``params`` (and
        ``batch_stats``) out of a TrainState checkpoint without rebuilding
        the exact optimizer chain the training run used."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self.manager.restore(step)

    def restore_params(self, step: Optional[int] = None) -> Any:
        tree = self.restore_tree(step)
        return tree["params"] if isinstance(tree, dict) and "params" in tree \
            else tree

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
