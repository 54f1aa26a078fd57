"""Graph readout pooling.

The reference pools with PyG ``global_mean_pool``/``global_max_pool`` over a
batch-index vector (reference: hybrid_models.py:97, ablation_models.py:296-297).
Because every graph is padded to the same node count and padded nodes are
*included* in the segments (they carry node-MLP-constant features), the exact
TPU equivalent is a plain reduction over the node axis of the dense
[B, N, C] block — no scatter needed.

Masked variants are provided as an opt-in improvement (not used by the
reference-parity models).
"""

from __future__ import annotations

import jax.numpy as jnp


def mean_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C] -> [B, C]; includes padding rows (reference parity)."""
    return jnp.mean(x, axis=1)


def max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C] -> [B, C]; includes padding rows (reference parity)."""
    return jnp.max(x, axis=1)


def masked_mean_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over real nodes only. node_mask: [B, N] bool."""
    m = node_mask[..., None].astype(x.dtype)
    total = jnp.sum(x * m, axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return total / count


def masked_max_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Max over real nodes only."""
    neg = jnp.finfo(x.dtype).min
    return jnp.max(jnp.where(node_mask[..., None], x, neg), axis=1)
