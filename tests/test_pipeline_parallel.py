"""GPipe pipeline parallelism: staged == sequential on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from immunostruct_tpu.ops.nnp import linear_apply, linear_init
from immunostruct_tpu.parallel.pipeline import gpipe_apply


@pytest.fixture(scope="module")
def pipe_mesh():
    assert len(jax.devices()) == 8
    return Mesh(np.asarray(jax.devices()), ("pipe",))


def _make_layers(s, width, key=0):
    ks = jax.random.split(jax.random.key(key), s)
    layers = [linear_init(k, width, width) for k in ks]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _layer(params, x):
    return jax.nn.tanh(linear_apply(params, x))


def _sequential(stacked, x):
    s = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(s):
        params = jax.tree.map(lambda a: a[i], stacked)
        x = _layer(params, x)
    return x


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_gpipe_matches_sequential(pipe_mesh, n_micro):
    stacked = _make_layers(8, 16)
    x = jax.random.normal(jax.random.key(1), (8, 16))

    fn = shard_map(
        lambda p, x: gpipe_apply(_layer, p, x, n_micro),
        mesh=pipe_mesh, in_specs=(P(), P()), out_specs=P())
    np.testing.assert_allclose(np.asarray(fn(stacked, x)),
                               np.asarray(_sequential(stacked, x)),
                               rtol=2e-5, atol=2e-5)


def test_gpipe_grads_match_sequential(pipe_mesh):
    stacked = _make_layers(8, 12, key=3)
    x = jax.random.normal(jax.random.key(4), (4, 12))
    y = jax.random.normal(jax.random.key(5), (4, 12))

    def seq_loss(p):
        return jnp.mean((_sequential(p, x) - y) ** 2)

    def pipe_loss(p):
        fn = shard_map(lambda p, x: gpipe_apply(_layer, p, x, 2),
                       mesh=pipe_mesh, in_specs=(P(), P()), out_specs=P())
        return jnp.mean((fn(p, x) - y) ** 2)

    l_s, g_s = jax.value_and_grad(seq_loss)(stacked)
    l_p, g_p = jax.value_and_grad(pipe_loss)(stacked)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
