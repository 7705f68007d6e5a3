"""Checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5): state lives in RAM. Here
the entire (batched) filter state is one pytree, so snapshots are a single
orbax save and resume is exact — including mid-sequence, since the scan driver
can restart from any frame index.
"""

from __future__ import annotations

import os

import jax


def save(path: str, state, step: int | None = None) -> str:
    """Save a FilterState (batched or not) pytree. Returns the final path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore(path: str, template):
    """Restore into the structure of ``template`` (same config/shape/dtype)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)
