"""Device mesh setup and sharding helpers.

The reference is single-GPU (SURVEY.md section 2.3: no distributed anything;
device selection at train_IEDB_wFT.py:54). Parallelism here is designed
TPU-first: a named 1-D ``data`` mesh over all local devices (ICI within a
slice), with batches sharded on the leading axis and parameters replicated.
Under ``jax.jit`` XLA then inserts the gradient all-reduce over ICI — the
TPU-native equivalent of NCCL DDP. Multi-host extends the same mesh via
``jax.distributed.initialize`` (DCN across slices) without code changes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` so a single
    ``make_mesh()`` then spans every chip in the slice/pod (gradient
    all-reduce rides ICI within a slice and DCN across slices).

    Must run before any other jax call (the backend must not be initialized
    yet — do NOT probe jax.devices()/process_count() first). Failures are
    fatal when a coordinator was explicitly given; otherwise a visible
    warning is printed and the run proceeds single-process, so a silently
    degraded multi-host job cannot masquerade as a healthy one.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        # jax raises 'distributed.initialize should only be called once.' on
        # re-init — a benign no-op for this wrapper regardless of arguments
        if "only be called once" in str(e):
            return
        if coordinator_address is not None or num_processes is not None:
            raise
        print(f"WARNING: jax.distributed.initialize skipped ({e}); "
              "running single-process. For multi-host training call "
              "initialize_distributed() before any other jax usage.")


def make_mesh(axis_name: str = "data", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; other axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place every array in a batch pytree with its leading axis sharded.

    Requires the global batch size to be divisible by the mesh size; the
    pipelines guarantee this when batch_size % n_devices == 0 (pad or drop
    the remainder otherwise).
    """
    sharding = batch_sharding(mesh, axis_name)

    def _place(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(_place, batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate parameters/optimizer state across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_indices_for_process(indices, process_index: Optional[int] = None,
                              process_count: Optional[int] = None):
    """Host-side data sharding for multi-host training.

    Each process keeps a contiguous 1/process_count slice of the (already
    shuffled) index list — the TPU-native replacement for a
    DistributedSampler (which the reference never had; SURVEY.md section 5).
    Defaults read jax.process_index()/jax.process_count(), so single-host
    runs are identity.
    """
    import numpy as np
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    indices = np.asarray(indices)
    per = len(indices) // pc
    if per == 0:
        return indices
    return indices[pi * per:(pi + 1) * per]
