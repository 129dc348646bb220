"""Orbax checkpointing with the reference's logical payload.

FCGF parity (complement_trainer.py:249-263): one checkpoint per epoch carrying
{epoch, encoder/generator params, optimizer state, config, best_val*}; resume
restores everything, ``finetune_restart`` loads weights only
(complement_trainer.py:128-147).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from apr_tpu.training.trainer import TrainState


def _ckpt_dir(out_dir: str) -> str:
    return os.path.abspath(os.path.join(out_dir, "checkpoints"))


class CheckpointManager:
    """Thin orbax wrapper: save/restore TrainState + scalar metadata.

    Rolling numbered checkpoints are garbage-collected (max_to_keep); *tagged*
    checkpoints ("best", "best_loss", "best_recall") live in their own
    single-slot manager per tag and survive any number of later epoch saves —
    the reference keeps ``best_val_checkpoint.pth`` / ``model_best_recall.pth``
    forever (FCGF trainer.py:156-169; Predator trainer.py:70-85).
    """

    def __init__(self, out_dir: str, max_to_keep: int = 3):
        self.path = _ckpt_dir(out_dir)
        os.makedirs(self.path, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._tagged: Dict[str, ocp.CheckpointManager] = {}

    def _tag_mngr(self, tag: str) -> ocp.CheckpointManager:
        if tag not in self._tagged:
            self._tagged[tag] = ocp.CheckpointManager(
                self.path + f"_{tag}",
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, create=True
                ),
            )
        return self._tagged[tag]

    def save(self, epoch: int, state: TrainState,
             extra: Optional[Dict] = None, tag: Optional[str] = None):
        mngr = self._tag_mngr(tag) if tag else self.mngr
        mngr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
                meta=ocp.args.JsonSave(dict(epoch=epoch, **(extra or {}))),
            ),
        )
        mngr.wait_until_finished()

    def latest_epoch(self, tag: Optional[str] = None) -> Optional[int]:
        return (self._tag_mngr(tag) if tag else self.mngr).latest_step()

    def restore(self, state_template: TrainState, epoch: Optional[int] = None,
                tag: Optional[str] = None):
        """Returns (state, meta). ``state_template`` supplies the pytree
        structure (from trainer.init_state)."""
        mngr = self._tag_mngr(tag) if tag else self.mngr
        step = epoch if epoch is not None else mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.path}")
        template = jax.tree.map(np.asarray, state_template)
        out = mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        state = jax.tree.map(jax.numpy.asarray, out["state"])
        return state, out["meta"]

    def restore_weights_only(self, state: TrainState,
                             epoch: Optional[int] = None,
                             tag: Optional[str] = None):
        """finetune_restart parity: params + batch_stats only, fresh optimizer."""
        restored, meta = self.restore(state, epoch, tag=tag)
        return state._replace(
            params=restored.params, batch_stats=restored.batch_stats
        ), meta
