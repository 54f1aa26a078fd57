"""Collectives module: named-axis reductions for shard_map programs.

The comms layer the reference never had (SURVEY.md sections 2.3, 5): thin,
testable wrappers over XLA collectives. Inside ``shard_map`` these ride the
ICI within a slice and DCN across slices; under plain ``jit`` with sharded
inputs XLA inserts the equivalents automatically, so these are only needed
when writing explicit-SPMD code (custom training steps, Pallas ring
kernels).
"""

from __future__ import annotations

import jax


def psum(x, axis_name: str = "data"):
    """Sum across the named mesh axis (NCCL all-reduce equivalent)."""
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def pmax(x, axis_name: str = "data"):
    return jax.lax.pmax(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0, tiled: bool = True):
    """Gather shards along ``axis`` (e.g. collecting per-shard predictions)."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute_ring(x, axis_name: str = "data", shift: int = 1):
    """Rotate values around the mesh ring (building block for ring
    collectives; pairs with the Pallas RDMA patterns for custom overlap)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)
