"""Collectives: named-axis reductions for shard_map programs, plus a
hand-written ring all-reduce.

The comms layer the reference never had (SURVEY.md sections 2.3, 5). Two
tiers:

1. Thin wrappers over XLA collectives (``psum``/``pmean``/``all_gather``/
   ``ppermute``) — inside ``shard_map`` these ride ICI within a slice and
   DCN across slices; under plain ``jit`` with sharded inputs XLA inserts
   the equivalents automatically.

2. ``ring_all_reduce`` — an explicit reduce-scatter + all-gather ring built
   from ``ppermute`` alone: each of the n-1+n-1 rounds moves 1/n of the
   tensor to the next neighbor, the bandwidth-optimal schedule XLA's
   all-reduce lowers to on a 1-D torus. It exists (a) as an executable
   specification of what ``psum`` does on the wire, (b) as the building
   block for custom overlap schedules (pair with Pallas RDMA when
   compute/comm overlap matters), and (c) is used by
   ``shard_map_train_step(reduce='ring')``. Equivalence with ``psum`` is
   pinned in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    """Rotate values around the mesh ring (one hop of the ring schedule)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def ring_all_reduce(x, axis_name: str = "data"):
    """All-reduce(sum) via an explicit unidirectional ring.

    Phase 1 (reduce-scatter): after n-1 hops, device i holds the fully
    reduced chunk (i+1) mod n. Phase 2 (all-gather): n-1 more hops
    circulate the reduced chunks. Each hop moves size/n elements, so total
    bytes on the wire per device = 2*(n-1)/n * size — bandwidth-optimal.

    Mathematically identical to ``psum(x, axis_name)`` up to float
    reassociation (chunks accumulate in ring order, not tree order).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    idx = jax.lax.axis_index(axis_name)

    shape = x.shape
    flat = x.reshape(-1)
    pad = (-flat.shape[0]) % n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    chunks = flat.reshape(n, -1)

    # -- reduce-scatter: at round t device i sends its (partially reduced)
    # chunk (i - t) mod n to i+1 and accumulates the incoming chunk
    # (i - t - 1) mod n
    for t in range(n - 1):
        send_i = (idx - t) % n
        recv_i = (idx - t - 1) % n
        sent = ppermute_ring(
            jax.lax.dynamic_index_in_dim(chunks, send_i, 0, keepdims=False),
            axis_name)
        acc = jax.lax.dynamic_index_in_dim(chunks, recv_i, 0, keepdims=False)
        chunks = jax.lax.dynamic_update_index_in_dim(
            chunks, acc + sent, recv_i, 0)

    # -- all-gather: device i now owns reduced chunk (i + 1) mod n; n-1
    # hops circulate ownership around the ring, overwriting local copies
    for t in range(n - 1):
        send_i = (idx + 1 - t) % n
        recv_i = (idx - t) % n
        sent = ppermute_ring(
            jax.lax.dynamic_index_in_dim(chunks, send_i, 0, keepdims=False),
            axis_name)
        chunks = jax.lax.dynamic_update_index_in_dim(chunks, sent, recv_i, 0)

    out = chunks.reshape(-1)
    if pad:
        out = out[:-pad]
    return out.reshape(shape)


def ring_pmean(x, axis_name: str = "data"):
    return ring_all_reduce(x, axis_name) / jax.lax.axis_size(axis_name)
