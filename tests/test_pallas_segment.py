"""Pallas segment kernels: interpreter-mode parity with XLA one-hot matmul,
including gradients through the custom VJPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.ops.experimental.pallas_segment import segment_scatter, segment_gather
from immunostruct_tpu.ops.egnn import build_scatter_matrix, egnn_stack_init, egnn_stack_apply

pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

B, N, E, C = 2, 24, 128, 16


@pytest.fixture
def data(rng):
    idx = jnp.asarray(rng.integers(0, N, (B, E)).astype(np.int32))
    mask = jnp.asarray(rng.random((B, E)) > 0.25)
    m = jnp.asarray(rng.standard_normal((B, E, C)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    return idx, mask, m, h


def xla_scatter(idx, mask, m, n):
    s = build_scatter_matrix(idx, mask, n, dtype=m.dtype)
    return jnp.einsum("bne,bec->bnc", s, m)


def xla_gather(idx, mask, h):
    g = jnp.take_along_axis(h, idx[..., None], axis=1)
    return g * mask[..., None].astype(h.dtype)


class TestForward:
    def test_scatter_matches_xla(self, data):
        idx, mask, m, _ = data
        got = segment_scatter(idx, mask, m, N, True)
        want = xla_scatter(idx, mask, m, N)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gather_matches_xla(self, data):
        idx, mask, _, h = data
        got = segment_gather(idx, mask, h, True)
        want = xla_gather(idx, mask, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestGrad:
    def test_scatter_grad(self, data):
        idx, mask, m, _ = data

        def f_pallas(m):
            return jnp.sum(segment_scatter(idx, mask, m, N, True) ** 2)

        def f_xla(m):
            return jnp.sum(xla_scatter(idx, mask, m, N) ** 2)

        g1 = jax.grad(f_pallas)(m)
        g2 = jax.grad(f_xla)(m)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)

    def test_gather_grad(self, data):
        idx, mask, _, h = data

        def f_pallas(h):
            return jnp.sum(segment_gather(idx, mask, h, True) ** 3)

        def f_xla(h):
            return jnp.sum(xla_gather(idx, mask, h) ** 3)

        g1 = jax.grad(f_pallas)(h)
        g2 = jax.grad(f_xla)(h)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)


class TestEGNNPallasPath:
    def test_stack_matches_onehot(self, rng):
        from tests.reference_impl import random_graph
        b, n, e = 2, 16, 128
        hs, xs, srcs, dsts = [], [], [], []
        for _ in range(b):
            h_, x_, s_, d_ = random_graph(rng, n, 40)
            pad = e - len(s_)
            hs.append(h_)
            xs.append(x_)
            srcs.append(np.r_[s_, np.zeros(pad, np.int32)])
            dsts.append(np.r_[d_, np.zeros(pad, np.int32)])
        h = jnp.asarray(np.stack(hs))
        x = jnp.asarray(np.stack(xs))
        src = jnp.asarray(np.stack(srcs).astype(np.int32))
        dst = jnp.asarray(np.stack(dsts).astype(np.int32))
        em = jnp.asarray(np.arange(e)[None, :] < 40).repeat(b, 0)
        ef = jnp.ones((b, e, 1))
        params = egnn_stack_init(jax.random.key(0), 2, 20, 16)
        h1, x1 = egnn_stack_apply(params, h, x, src, dst, ef, em, aggregation="onehot")
        h2, x2 = egnn_stack_apply(params, h, x, src, dst, ef, em, aggregation="pallas")
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=2e-4, atol=2e-4)
