"""Fused EGNN layer kernel: interpreter-mode parity with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.ops import egnn_stack_init, egnn_stack_apply
from immunostruct_tpu.ops.experimental.pallas_egnn import fused_egnn_layer, fused_egnn_stack
from tests.reference_impl import random_graph


pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

def _inputs(rng, b=2, n=16, e=128):
    hs, xs, srcs, dsts = zip(*[random_graph(rng, n, e) for _ in range(b)])
    h = jnp.asarray(np.stack(hs))
    x = jnp.asarray(np.stack(xs))
    src = jnp.asarray(np.stack(srcs))
    dst = jnp.asarray(np.stack(dsts))
    em = jnp.asarray(rng.random((b, e)) > 0.3)
    return h, x, src, dst, em


def test_fused_layer_matches_xla(rng):
    h, x, src, dst, em = _inputs(rng)
    b, n, _ = h.shape
    e = src.shape[1]
    params = egnn_stack_init(jax.random.key(4), 0, 20, 16)  # single layer

    ef = jnp.ones((b, e, 1))
    h_ref, x_ref = egnn_stack_apply(params, h, x, src, dst, ef, em,
                                    aggregation="onehot")
    h_k, x_k = fused_egnn_layer(params[0], h, x, src, dst, em, interpret=True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_stack_matches_xla(rng):
    h, x, src, dst, em = _inputs(rng, b=3)
    b, n, _ = h.shape
    e = src.shape[1]
    params = egnn_stack_init(jax.random.key(7), 3, 20, 16)
    ef = jnp.ones((b, e, 1))
    h_ref, x_ref = egnn_stack_apply(params, h, x, src, dst, ef, em,
                                    aggregation="onehot")
    h_k, x_k = fused_egnn_stack(params, h, x, src, dst, em, interpret=True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                               rtol=5e-4, atol=5e-5)


def test_fused_rejects_unaligned_edges(rng):
    h, x, src, dst, em = _inputs(rng, e=100)
    params = egnn_stack_init(jax.random.key(4), 0, 20, 16)
    with pytest.raises(AssertionError, match="multiple of 128"):
        fused_egnn_layer(params[0], h, x, src[:, :100], dst[:, :100],
                         em[:, :100], interpret=True)
