"""Tensor-parallel primitives: sharded == dense on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from immunostruct_tpu.ops.nnp import linear_apply, mlp_init
from immunostruct_tpu.parallel.tensor import (
    column_parallel_apply, row_parallel_apply, tp_mlp_apply,
)


@pytest.fixture(scope="module")
def mesh1d():
    assert len(jax.devices()) == 8
    return Mesh(np.asarray(jax.devices()), ("model",))


@pytest.fixture(scope="module")
def mesh2d():
    return Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))


def _dense_mlp(params, x):
    h = jax.nn.relu(linear_apply(params[0], x))
    return linear_apply(params[1], h)


def test_tp_mlp_matches_dense(mesh1d):
    params = mlp_init(jax.random.key(0), [48, 64, 40])
    x = jax.random.normal(jax.random.key(1), (16, 48))

    fn = shard_map(lambda p, x: tp_mlp_apply(p, x), mesh=mesh1d,
                   in_specs=(P(), P()), out_specs=P())
    np.testing.assert_allclose(np.asarray(fn(params, x)),
                               np.asarray(_dense_mlp(params, x)),
                               rtol=2e-5, atol=2e-5)


def test_column_then_row_shapes(mesh1d):
    """Column output is feature-sharded; row restores replication."""
    params = mlp_init(jax.random.key(2), [32, 64, 32])
    x = jax.random.normal(jax.random.key(3), (8, 32))

    def inner(p, x):
        h = column_parallel_apply(p[0]["w"], p[0]["b"], x)
        assert h.shape == (8, 64 // 8)   # per-shard width
        return row_parallel_apply(p[1]["w"], p[1]["b"], jax.nn.relu(h))

    fn = shard_map(inner, mesh=mesh1d, in_specs=(P(), P()), out_specs=P())
    out = fn(params, x)
    assert out.shape == (8, 32)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_dense_mlp(params, x)),
                               rtol=2e-5, atol=2e-5)


def test_tp_dp_2d_mesh_with_grads(mesh2d):
    """TP x DP on a (2, 4) mesh: loss and weight grads match dense."""
    params = mlp_init(jax.random.key(4), [24, 32, 16])
    x = jax.random.normal(jax.random.key(5), (8, 24))
    y = jax.random.normal(jax.random.key(6), (8, 16))

    def dense_loss(p, x, y):
        return jnp.mean((_dense_mlp(p, x) - y) ** 2)

    def tp_loss_inner(p, x_shard, y_shard):
        pred = tp_mlp_apply(p, x_shard)
        # per-shard sum of squared error, averaged globally over both axes
        se = jnp.sum((pred - y_shard) ** 2)
        total = jax.lax.psum(se, "data")
        return total / (8 * 16)

    def sharded_loss(p, x, y):
        fn = shard_map(tp_loss_inner, mesh=mesh2d,
                       in_specs=(P(), P("data"), P("data")),
                       out_specs=P())
        return fn(p, x, y)

    l_d, g_d = jax.value_and_grad(dense_loss)(params, x, y)
    l_s, g_s = jax.value_and_grad(sharded_loss)(params, x, y)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_vae_shapes_shard_cleanly(mesh1d):
    """The flagship VAE encoder/decoder widths (5964->512, 40->512->5964)
    are divisible by realistic model-axis sizes — the intended use if the
    model ever outgrows pure DP."""
    params = mlp_init(jax.random.key(7), [5964 // 4, 512, 5964 // 4])
    x = jax.random.normal(jax.random.key(8), (4, 5964 // 4))
    fn = shard_map(lambda p, x: tp_mlp_apply(p, x), mesh=mesh1d,
                   in_specs=(P(), P()), out_specs=P())
    np.testing.assert_allclose(np.asarray(fn(params, x)),
                               np.asarray(_dense_mlp(params, x)),
                               rtol=2e-5, atol=2e-5)
