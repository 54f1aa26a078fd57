"""Tensor parallelism: Megatron-style sharded linear layers over a mesh.

The reference has no intra-model parallelism of any kind (SURVEY.md
section 2.3) and the flagship models here are ~6M params, far below the
threshold where sharding a model pays — data parallelism is the
production configuration (parallel/trainer.py), a recorded scoping
decision. These primitives exist so the FRAMEWORK scales past that
point: column/row-parallel linear pairs with exactly one ``psum`` per
pair (the classic Megatron MLP schedule, here over a named ``model``
mesh axis so the collective rides ICI), composable with the data axis on
a 2-D mesh.

Sharding contract (inside ``shard_map`` over axis ``model``):

  column-parallel:  W [in, out] sharded on OUT; y_shard = x @ W_shard + b_shard
                    (activations leave sharded on features — feed them
                    straight into a row-parallel layer, no collective)
  row-parallel:     W [in, out] sharded on IN; takes feature-sharded x,
                    y = psum_model(x_shard @ W_shard) + b
                    (ONE all-reduce restores the replicated activation)

``tp_mlp_apply`` chains column -> nonlinearity -> row, the pattern used
by transformer MLPs and this repo's VAE encoder/decoder shapes
(5964->512->... , models/trunk.py).

Weights are stored UNSHARDED in the param pytree (checkpoint layout is
unchanged and single-chip runs are identity); ``shard_params`` slices
them per mesh coordinate inside shard_map via ``axis_index``. Equivalence
with the dense computation is pinned by tests/test_tensor_parallel.py on
the 8-virtual-device mesh, including a 2-D (data x model) mesh with
gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shard_column(w: jax.Array, b: jax.Array | None, axis_name: str):
    """Slice [in, out] weights on OUT for this device's mesh coordinate."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    out = w.shape[1]
    assert out % n == 0, f"out dim {out} not divisible by mesh axis {n}"
    per = out // n
    w_s = jax.lax.dynamic_slice_in_dim(w, i * per, per, axis=1)
    b_s = (jax.lax.dynamic_slice_in_dim(b, i * per, per, axis=0)
           if b is not None else None)
    return w_s, b_s


def shard_row(w: jax.Array, axis_name: str):
    """Slice [in, out] weights on IN for this device's mesh coordinate."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    in_dim = w.shape[0]
    assert in_dim % n == 0, f"in dim {in_dim} not divisible by mesh axis {n}"
    per = in_dim // n
    return jax.lax.dynamic_slice_in_dim(w, i * per, per, axis=0)


def column_parallel_apply(w, b, x, axis_name: str = "model"):
    """x [B, in] (replicated) -> y_shard [B, out/n] (feature-sharded)."""
    w_s, b_s = shard_column(w, b, axis_name)
    y = jnp.dot(x, w_s.astype(x.dtype),
                preferred_element_type=jnp.float32)
    if b_s is not None:
        y = y + b_s.astype(jnp.float32)
    return y.astype(x.dtype)


def row_parallel_apply(w, b, x_shard, axis_name: str = "model"):
    """x_shard [B, in/n] (feature-sharded) -> y [B, out] (replicated).

    The single psum of the Megatron pair happens here.
    """
    w_s = shard_row(w, axis_name)
    y = jnp.dot(x_shard, w_s.astype(x_shard.dtype),
                preferred_element_type=jnp.float32)
    y = jax.lax.psum(y, axis_name)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x_shard.dtype)


def tp_mlp_apply(params: list, x, activation=jax.nn.relu,
                 axis_name: str = "model"):
    """Two-layer MLP, column- then row-parallel: ONE collective total.

    params: [{"w": [in, h], "b": [h]}, {"w": [h, out], "b": [out]}] in the
    standard nnp layout (unsharded); must be called inside shard_map over
    ``axis_name``.
    """
    h = column_parallel_apply(params[0]["w"], params[0].get("b"), x,
                              axis_name)
    h = activation(h)
    return row_parallel_apply(params[1]["w"], params[1].get("b"), h,
                              axis_name)
