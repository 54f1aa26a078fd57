"""Pytree checkpointing.

Replaces ``torch.save(model.state_dict())`` best-val checkpointing
(reference: procedures/train.py:48-55) with msgpack-serialized pytrees via
flax.serialization. Stage transitions restore then surgically re-init the
head (models/trunk.py:reset_head), mirroring load_trained(new_head=True).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree: Any) -> None:
    """Serialize the pytree's leaves (msgpack); structure comes from the
    ``like`` argument at load time, so arbitrary registered dataclasses
    (TrainState, optimizer states) round-trip."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = [np.asarray(leaf) for leaf in jax.tree.leaves(tree)]
    data = serialization.to_bytes(leaves)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (shapes/dtypes must match)."""
    with open(path, "rb") as f:
        data = f.read()
    like_leaves, treedef = jax.tree.flatten(like)
    restored = serialization.from_bytes(
        [np.asarray(leaf) for leaf in like_leaves], data)
    return jax.tree.unflatten(treedef, restored)


def save_resume_state(path: str, state: Any, epoch: int, best_val: float) -> None:
    """Full training-state snapshot (params + optimizer + progress) for
    within-stage resume — a capability the reference lacks entirely
    (SURVEY.md section 5: 'Resume-within-stage does not exist')."""
    save_checkpoint(path, {"state": state, "epoch": epoch, "best_val": best_val})


def load_resume_state(path: str, state_like: Any):
    """Returns (state, next_epoch, best_val) or None when no snapshot exists."""
    if not os.path.exists(path):
        return None
    restored = load_checkpoint(
        path, {"state": state_like, "epoch": 0, "best_val": 0.0})
    return restored["state"], int(restored["epoch"]) + 1, float(restored["best_val"])
