"""Preemption-safe checkpointing with Orbax.

Replaces HF Trainer's checkpoint handling (reference train.py:204-223,
configs save_steps/save_total_limit): async Orbax saves, newest-checkpoint
auto-resume, bounded retention. TPU pods are preemptible, so saving is
async and atomic by construction.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_interval_steps: int = 1000, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._protected_step: Optional[int] = None
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_interval_steps,
            max_to_keep=max_to_keep,
            enable_async_checkpointing=True,
            # the best-eval checkpoint is pinned against max_to_keep pruning
            # (the reference's save_total_limit could delete its best model;
            # load_best_model_at_end then failed — same hazard HF has)
            should_keep_fn=lambda step: step == self._protected_step,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def protect(self, step: Optional[int]) -> None:
        """Pin ``step`` (the current best) so retention never deletes it."""
        self._protected_step = step

    def should_save(self, step: int) -> bool:
        return self._mgr.should_save(step)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_model(directory: str, params: Any, config=None) -> None:
    """Persist final model params (+ config) in an Orbax StandardCheckpoint."""
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory / "params", params, force=True)
    ckptr.wait_until_finished()
    if config is not None:
        from ..configs import save_config

        save_config(config, directory)


def load_model(directory: str, params_template: Optional[Any] = None) -> Any:
    directory = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    if params_template is not None:
        return ckptr.restore(directory / "params", target=params_template)
    return ckptr.restore(directory / "params")
