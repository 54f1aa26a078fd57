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


def _to_storable(leaf) -> np.ndarray:
    """npz cannot represent ml_dtypes (bfloat16 degrades to raw void bytes);
    store such leaves as float32 and cast back to the target dtype on load."""
    x = np.asarray(leaf)
    if x.dtype.kind not in "fiub?":
        x = x.astype(np.float32)
    return x


def _flatten_named(tree: Any) -> dict:
    flat, _ = jax.tree.flatten_with_path(tree)
    return {jax.tree_util.keystr(path): _to_storable(leaf) for path, leaf in flat}


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

    Leaves present in both must match shapes (values are cast to the target
    leaf dtype); leaves missing from the file keep ``like``'s values; extra
    file entries are ignored (both reported). Raises when NOTHING matches —
    a totally foreign file (wrong model, a resume snapshot, an old-format
    checkpoint) must not silently return freshly-initialized parameters.
    """
    try:
        with np.load(path, allow_pickle=False) as z:
            stored = {k: z[k] for k in z.files}
    except Exception as e:  # noqa: BLE001 - normalize opaque zip errors
        raise ValueError(
            f"{path} is not a name-addressed npz checkpoint ({e}); "
            "checkpoints written before the npz migration must be "
            "re-created") from e

    flat, treedef = jax.tree.flatten_with_path(like)
    out, missing, matched = [], [], 0
    for pathkey, leaf in flat:
        key = jax.tree_util.keystr(pathkey)
        if key in stored:
            value = stored.pop(key)
            shape = tuple(getattr(leaf, "shape", np.shape(leaf)))
            if value.shape != shape:
                raise ValueError(
                    f"checkpoint leaf {key} has shape {value.shape}, "
                    f"expected {shape}")
            dtype = getattr(leaf, "dtype", None)
            if dtype is not None and value.dtype != dtype:
                value = value.astype(dtype)
            out.append(value)
            matched += 1
        else:
            missing.append(key)
            out.append(leaf)
    if matched == 0:
        raise ValueError(
            f"{path} shares no parameter names with the target structure "
            f"(file keys e.g. {sorted(stored)[:2]}); refusing to return "
            "freshly-initialized parameters")
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
