"""Orbax-backed checkpointing with the reference's checkpoint roles.

The reference saves ``{ema_state_dict, model_state_dict, optimizer_state_dict}``
for AToM (AToM/AToM.py:188-196) and raw state_dicts / EMA-only files for MToV
(tools/trainer.py:122-124, 251-257). Here every train state is one pytree
{params, ema_params, opt_state, step} checkpointed atomically; the loader
also accepts partial trees (e.g. EMA-only warm starts, ref
exps/diffusion.py:129-132).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, blocking: bool = False):
        """Async by default: orbax snapshots the tree to host memory and
        persists in a background thread, so the train loop resumes
        immediately instead of stalling for serialization. Call ``wait()``
        (the fit loops do, at exit) or pass ``blocking=True`` for a
        durability barrier."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if blocking:
            self._mgr.wait_until_finished()

    def wait(self):
        """Block until every pending async save is durable on disk."""
        self._mgr.wait_until_finished()

    def restore(self, step: int | None = None, template: Any = None):
        self._mgr.wait_until_finished()  # never read behind a pending save
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> int | None:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def save_single(path: str, tree: Any):
    """One-shot pytree save (for exports, e.g. EMA-only weights)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_single(path: str, template: Any = None):
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))


def host_tree(tree: Any):
    """Fetch a (possibly sharded) pytree fully onto host memory."""
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)
