"""Training checkpoint / resume via orbax (SURVEY §5: absent in the
reference — it has no training at all; this framework does, so fine-tuning
runs need durable state).

Saves the full TrainState (params + optimizer moments + step) with pytree
structure preserved; restore re-places leaves onto the current mesh via an
abstract target built from a freshly-initialized state.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .train_step import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(path: str, state: TrainState) -> None:
    """Write a training checkpoint (directory) atomically."""
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def restore_train_state(path: str, target: TrainState) -> TrainState:
    """Restore into the structure/shardings of `target` (e.g. a step-0 state
    built with init_train_state and placed with shard_train_state)."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(os.path.abspath(path), abstract)


def latest_step_dir(base: str) -> Optional[str]:
    """Convention helper: base/step_<N> directories; returns the newest."""
    if not os.path.isdir(base):
        return None
    steps = []
    for name in os.listdir(base):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append((int(name[5:]), os.path.join(base, name)))
    return max(steps)[1] if steps else None
