"""Pytree checkpointing.

Replaces ``torch.save(model.state_dict())`` best-val checkpointing
(reference: procedures/train.py:48-55) with name-addressed npz pytrees replacing
flax msgpack. Stage transitions restore then surgically re-init the
head (models/trunk.py:reset_head), mirroring load_trained(new_head=True).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten_named(tree: Any) -> dict:
    flat, _ = jax.tree.flatten_with_path(tree)
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_checkpoint(path: str, tree: Any) -> None:
    """Serialize the pytree as name-addressed arrays (npz keyed by treepath).

    Name addressing makes restores robust to structural deltas: a checkpoint
    trained with extra subtrees (e.g. the contrastive projector) loads into
    a model without them, and vice versa — matching the torch state_dict
    ergonomics the reference relies on (load_trained + new_head surgery).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **_flatten_named(tree))
    os.replace(tmp, path)


def load_checkpoint(path: str, like: Any, verbose: bool = True) -> Any:
    """Restore into the structure of ``like`` by treepath name.

    Leaves present in both must match shapes; leaves missing from the file
    keep ``like``'s values; extra file entries are ignored (both reported).
    """
    with np.load(path, allow_pickle=False) as z:
        stored = {k: z[k] for k in z.files}

    flat, treedef = jax.tree.flatten_with_path(like)
    out, missing = [], []
    for pathkey, leaf in flat:
        key = jax.tree_util.keystr(pathkey)
        if key in stored:
            value = stored.pop(key)
            if value.shape != np.asarray(leaf).shape:
                raise ValueError(
                    f"checkpoint leaf {key} has shape {value.shape}, "
                    f"expected {np.asarray(leaf).shape}")
            out.append(value)
        else:
            missing.append(key)
            out.append(leaf)
    if verbose and missing:
        print(f"checkpoint: {len(missing)} leaves not in file (kept current "
              f"values), e.g. {missing[0]}")
    if verbose and stored:
        print(f"checkpoint: ignored {len(stored)} extra file entries, "
              f"e.g. {next(iter(stored))}")
    return jax.tree.unflatten(treedef, out)


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
