"""Checkpoint save/restore (orbax).

Improves on the reference, which saves only model weights + epoch to
`latest.pth` and has its optimizer/scheduler saves commented out (reference
trainer/train_material.py:199-219 — its Mat resume path even references a
nonexistent optimizer, a latent bug).  Here the full pytree (params,
optimizer state, epoch, extras) is checkpointed, so resume is exact.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def save_checkpoint(directory: str, step: int, payload: Dict[str, Any]) -> str:
    """Save a pytree payload; keeps `latest` semantics like the reference."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(directory, "LATEST"), "w") as f:
        f.write(os.path.basename(path))
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    # orbax rejects relative paths on restore (save absolutizes already)
    directory = os.path.abspath(directory)
    marker = os.path.join(directory, "LATEST")
    if not os.path.exists(marker):
        steps = sorted(
            d for d in os.listdir(directory) if d.startswith("step_")
        ) if os.path.isdir(directory) else []
        return os.path.join(directory, steps[-1]) if steps else None
    with open(marker) as f:
        return os.path.join(directory, f.read().strip())


def restore_checkpoint(
    directory: str, template: Dict[str, Any]
) -> Optional[Dict[str, Any]]:
    """Restore the latest checkpoint as the same pytree structure as
    `template`; None if no checkpoint exists."""
    import orbax.checkpoint as ocp

    path = latest_checkpoint(directory)
    if path is None or not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
