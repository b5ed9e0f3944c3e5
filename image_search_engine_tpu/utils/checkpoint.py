"""Orbax-backed checkpointing for arbitrary pytrees (model state, index
arrays).

SURVEY.md §5 prescribes orbax for model + index arrays. The framework's
default formats stay simple (.npz for indexes, msgpack for train state —
both dependency-light and diff-friendly); this module is the orbax
alternative for large sharded arrays where per-shard async saving matters
(multi-host meshes), plus a retention-managed directory layout.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

log = logging.getLogger(__name__)


def save_pytree(path: str | Path, tree: Any, *, force: bool = True) -> None:
    """Save any pytree (params/opt_state/arrays) with orbax."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def load_pytree(path: str | Path, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (a matching pytree of abstract or real
    arrays) restores shardings/dtypes exactly."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)


class CheckpointManager:
    """Step-numbered checkpoints with retention (keeps the best-N story of
    the trainers on orbax rails)."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            Path(directory).resolve(),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, tree: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, target: Optional[Any] = None) -> Any:
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step() if step is None else step
        if target is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step)

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
