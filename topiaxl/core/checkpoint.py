"""Checkpoint save/restore (orbax).

The reference persists plain torch state_dicts (DiT EMA under 'ema',
VAE under 'model_state_dict'; no optimizer state or resume logic —
SURVEY.md §5). Here checkpointing is first-class: full TrainState
(params + optimizer + EMA + step) via orbax, resumable, with the EMA
stored as a sibling tree exactly like the reference's 'ema' key concept.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Any) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def sharded_restore_template(state: Any, mesh, rules=None) -> Any:
    """Abstract restore template that RESHARDS onto ``mesh``.

    Checkpoints store global arrays, so a state written under one mesh
    layout (say ``{dp: 8}``) restores bit-identically onto any other
    (``{dp: 2, fsdp: 2, tp: 2}``) when the template carries the target
    shardings — the first thing real TPU training hits after a topology
    change (the reference's bare ``torch.save/load`` has no notion of
    this, SURVEY.md §5). ``rules`` are ``(regex, PartitionSpec)`` pairs
    (e.g. ``parallel.dit_param_rules()``); because optimizer moments
    mirror parameter paths, the same rules shard them consistently.
    Scalars and unmatched leaves replicate.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import _fit_spec, _path_str, spec_for

    rules = rules if rules is not None else [(r".*", P())]

    def make(path, x):
        name = _path_str(path)
        spec = _fit_spec(spec_for(name, rules), x.shape, mesh, name=name)
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(make, state)


class CheckpointManager:
    """Rolling manager: keeps the last N step checkpoints + latest lookup."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
