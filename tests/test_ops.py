"""Parity tests for the ops layer against loop-style numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.ops import (
    egnn_init, egnn_apply, egnn_stack_init, egnn_stack_apply,
    build_scatter_matrix, self_attention_init, self_attention_apply,
    mha_init, mha_apply, mean_pool, max_pool, masked_mean_pool, masked_max_pool,
)
from tests.reference_impl import egnn_layer_np, random_graph


def _np_params(p):
    return jax.tree.map(np.asarray, p)


class TestEGNN:
    @pytest.mark.parametrize("aggregation", ["scatter", "onehot"])
    def test_single_layer_matches_reference(self, rng, aggregation):
        n, e = 12, 30
        h, x, src, dst = random_graph(rng, n, e)
        edge_feat = np.ones((e, 1), np.float32)
        mask = np.ones((e,), bool)

        params = egnn_init(jax.random.key(0), 20, 16, 16)
        want_h, want_x = egnn_layer_np(_np_params(params), h, x, src, dst, edge_feat, mask)

        sm = None
        if aggregation == "onehot":
            sm = build_scatter_matrix(jnp.asarray(dst)[None], jnp.asarray(mask)[None], n)
        got_h, got_x = egnn_apply(
            params, jnp.asarray(h)[None], jnp.asarray(x)[None],
            jnp.asarray(src)[None], jnp.asarray(dst)[None],
            jnp.asarray(edge_feat)[None], jnp.asarray(mask)[None],
            scatter_matrix=sm)
        np.testing.assert_allclose(np.asarray(got_h[0]), want_h, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_x[0]), want_x, rtol=2e-4, atol=2e-5)

    def test_padded_edges_are_inert(self, rng):
        """Adding masked padding edges must not change any output."""
        n, e = 10, 24
        h, x, src, dst = random_graph(rng, n, e)
        params = egnn_init(jax.random.key(1), 20, 16, 16)

        def run(src_, dst_, mask_):
            e_ = len(src_)
            return egnn_stack_apply(
                [params], jnp.asarray(h)[None], jnp.asarray(x)[None],
                jnp.asarray(src_)[None], jnp.asarray(dst_)[None],
                jnp.ones((1, e_, 1)), jnp.asarray(mask_)[None],
                aggregation="onehot")

        h1, x1 = run(src, dst, np.ones(e, bool))
        src_pad = np.concatenate([src, np.zeros(8, np.int32)])
        dst_pad = np.concatenate([dst, np.zeros(8, np.int32)])
        mask_pad = np.concatenate([np.ones(e, bool), np.zeros(8, bool)])
        h2, x2 = run(src_pad, dst_pad, mask_pad)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)

    def test_padded_nodes_receive_constant_update(self, rng):
        """Padded (zero-feature, edgeless) nodes get the node-MLP constant,
        matching reference semantics where all nodes flow through node_mlp."""
        n, e = 8, 16
        h, x, src, dst = random_graph(rng, n, e)
        h[-2:] = 0.0  # padded nodes
        x[-2:] = 0.0
        keep = (src < n - 2) & (dst < n - 2)
        params = egnn_init(jax.random.key(2), 20, 16, 16)
        got_h, got_x = egnn_stack_apply(
            [params], jnp.asarray(h)[None], jnp.asarray(x)[None],
            jnp.asarray(src)[None], jnp.asarray(dst)[None],
            jnp.ones((1, e, 1)), jnp.asarray(keep)[None], aggregation="scatter")
        got_h = np.asarray(got_h[0])
        # the two padded nodes have identical, nonzero features
        np.testing.assert_allclose(got_h[-1], got_h[-2], rtol=1e-6)
        assert np.abs(got_h[-1]).sum() > 0
        # and their coordinates stay zero
        np.testing.assert_allclose(np.asarray(got_x[0][-2:]), 0.0, atol=1e-6)

    def test_equivariance(self, rng):
        """EGNN coordinates rotate with the input; features are invariant."""
        n, e = 10, 26
        h, x, src, dst = random_graph(rng, n, e)
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        q = q.astype(np.float32)
        params = egnn_stack_init(jax.random.key(3), 2, 20, 16)

        def run(coords):
            return egnn_stack_apply(
                params, jnp.asarray(h)[None], jnp.asarray(coords)[None],
                jnp.asarray(src)[None], jnp.asarray(dst)[None],
                jnp.ones((1, e, 1)), jnp.ones((1, e), bool), aggregation="scatter")

        h1, x1 = run(x)
        h2, x2 = run(x @ q)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(x1) @ q, np.asarray(x2), rtol=1e-3, atol=1e-4)

    def test_scatter_vs_onehot_agree_batched(self, rng):
        b, n, e = 3, 9, 20
        hs, xs, srcs, dsts = zip(*[random_graph(rng, n, e) for _ in range(b)])
        h = jnp.asarray(np.stack(hs))
        x = jnp.asarray(np.stack(xs))
        src = jnp.asarray(np.stack(srcs))
        dst = jnp.asarray(np.stack(dsts))
        ef = jnp.ones((b, e, 1))
        em = jnp.asarray(rng.random((b, e)) > 0.3)
        params = egnn_stack_init(jax.random.key(4), 3, 20, 16)
        h1, x1 = egnn_stack_apply(params, h, x, src, dst, ef, em, aggregation="scatter")
        h2, x2 = egnn_stack_apply(params, h, x, src, dst, ef, em, aggregation="onehot")
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-4, atol=1e-5)

    def test_scatter_vs_onehot_gradients_agree(self, rng):
        """The round-2 einsum-gather rewrite changed the EGNN BACKWARD pass
        (gather VJPs became matmuls): gradients through the full stack must
        match the take_along_axis/scatter-add path, including masked-edge
        gradient zeroing and the (S_src - S_dst) coordinate einsum."""
        b, n, e = 3, 9, 20
        hs, xs, srcs, dsts = zip(*[random_graph(rng, n, e) for _ in range(b)])
        h = jnp.asarray(np.stack(hs))
        x = jnp.asarray(np.stack(xs))
        src = jnp.asarray(np.stack(srcs))
        dst = jnp.asarray(np.stack(dsts))
        ef = jnp.ones((b, e, 1))
        em = jnp.asarray(rng.random((b, e)) > 0.3)
        params = egnn_stack_init(jax.random.key(4), 3, 20, 16)

        def loss(params, h, x, agg):
            ho, xo = egnn_stack_apply(params, h, x, src, dst, ef, em,
                                      aggregation=agg)
            return jnp.sum(ho ** 2) + jnp.sum(xo ** 3)

        grad_fn = jax.grad(loss, argnums=(0, 1, 2))
        g_sc = grad_fn(params, h, x, "scatter")
        g_oh = grad_fn(params, h, x, "onehot")
        for a, b_ in zip(jax.tree.leaves(g_sc), jax.tree.leaves(g_oh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-5)

    def test_single_onehot_matrix_builds_the_other(self, rng):
        """egnn_apply with exactly one one-hot provided must behave like the
        both-matrices path (no mixed einsum/take regime)."""
        b, n, e = 2, 7, 12
        hs, xs, srcs, dsts = zip(*[random_graph(rng, n, e) for _ in range(b)])
        h = jnp.asarray(np.stack(hs))
        x = jnp.asarray(np.stack(xs))
        src = jnp.asarray(np.stack(srcs))
        dst = jnp.asarray(np.stack(dsts))
        ef = jnp.ones((b, e, 1))
        em = jnp.asarray(rng.random((b, e)) > 0.4)
        params = egnn_init(jax.random.key(0), 20, 16, 16)
        from immunostruct_tpu.ops.egnn import build_scatter_matrix, egnn_apply
        sm = build_scatter_matrix(dst, em, n)
        srcm = build_scatter_matrix(src, em, n)
        h_full, x_full = egnn_apply(params, h, x, src, dst, ef, em,
                                    scatter_matrix=sm, src_matrix=srcm)
        h_one, x_one = egnn_apply(params, h, x, src, dst, ef, em,
                                  scatter_matrix=sm)
        np.testing.assert_allclose(np.asarray(h_one), np.asarray(h_full),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x_one), np.asarray(x_full),
                                   rtol=1e-5, atol=1e-6)

    def test_onehot_remat_matches_onehot_values_and_grads(self, rng):
        """'onehot_remat' is the same math with different residency: values
        AND gradients must match the plain one-hot path."""
        b, n, e = 3, 9, 20
        hs, xs, srcs, dsts = zip(*[random_graph(rng, n, e) for _ in range(b)])
        h = jnp.asarray(np.stack(hs))
        x = jnp.asarray(np.stack(xs))
        src = jnp.asarray(np.stack(srcs))
        dst = jnp.asarray(np.stack(dsts))
        ef = jnp.ones((b, e, 1))
        em = jnp.asarray(rng.random((b, e)) > 0.3)
        params = egnn_stack_init(jax.random.key(4), 3, 20, 16)

        def loss(params, agg):
            ho, xo = egnn_stack_apply(params, h, x, src, dst, ef, em,
                                      aggregation=agg)
            return jnp.sum(ho ** 2) + jnp.sum(xo ** 2)

        v1, g1 = jax.value_and_grad(lambda p: loss(p, "onehot"))(params)
        v2, g2 = jax.value_and_grad(lambda p: loss(p, "onehot_remat"))(params)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


class TestAttention:
    def test_self_attention_math(self, rng):
        b, l, d = 2, 7, 8
        x = rng.standard_normal((b, l, d)).astype(np.float32)
        params = self_attention_init(jax.random.key(0), d)
        out, w = self_attention_apply(params, jnp.asarray(x))
        p = _np_params(params)
        q = x @ p["query"]["w"] + p["query"]["b"]
        k = x @ p["key"]["w"] + p["key"]["b"]
        v = x @ p["value"]["w"] + p["value"]["b"]
        scores = q @ k.transpose(0, 2, 1) / np.sqrt(d)
        ew = np.exp(scores - scores.max(-1, keepdims=True))
        ww = ew / ew.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(w), ww, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out), ww @ v, rtol=1e-5, atol=1e-6)

    def test_mha_single_head_equals_scaled_dot(self, rng):
        """1-head MHA must equal plain scaled-dot attention + projections."""
        b, l, d = 2, 5, 8
        x = rng.standard_normal((b, l, d)).astype(np.float32)
        params = mha_init(jax.random.key(1), d, 1)
        out, w = mha_apply(params, jnp.asarray(x), n_head=1)
        p = _np_params(params)
        q = x @ p["w_q"]["w"] + p["w_q"]["b"]
        k = x @ p["w_k"]["w"] + p["w_k"]["b"]
        v = x @ p["w_v"]["w"] + p["w_v"]["b"]
        scores = q @ k.transpose(0, 2, 1) / np.sqrt(d)
        ew = np.exp(scores - scores.max(-1, keepdims=True))
        ww = ew / ew.sum(-1, keepdims=True)
        want = (ww @ v) @ p["w_concat"]["w"] + p["w_concat"]["b"]
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)

    def test_mha_input_dim_trick(self):
        """Fusion attention: length-D sequence of scalars, input_dim=1."""
        b, d_vec = 3, 104
        x = jnp.ones((b, d_vec, 1))
        params = mha_init(jax.random.key(2), 16, 8, input_dim=1)
        out, _ = mha_apply(params, x, n_head=8)
        assert out.shape == (b, d_vec, 16)

    def test_mha_mask(self, rng):
        b, l, d = 1, 4, 8
        x = rng.standard_normal((b, l, d)).astype(np.float32)
        params = mha_init(jax.random.key(3), d, 2)
        mask = jnp.ones((b, 1, l, l)).at[..., -1].set(0)
        _, w = mha_apply(params, jnp.asarray(x), n_head=2, mask=mask)
        assert np.asarray(w)[..., -1].max() < 1e-3


class TestPooling:
    def test_pools(self, rng):
        x = rng.standard_normal((2, 5, 3)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(mean_pool(jnp.asarray(x))), x.mean(1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(max_pool(jnp.asarray(x))), x.max(1), rtol=1e-6)

    def test_masked_pools(self, rng):
        x = rng.standard_normal((2, 5, 3)).astype(np.float32)
        mask = np.array([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool)
        got_mean = np.asarray(masked_mean_pool(jnp.asarray(x), jnp.asarray(mask)))
        np.testing.assert_allclose(got_mean[0], x[0, :3].mean(0), rtol=1e-5)
        np.testing.assert_allclose(got_mean[1], x[1, :1].mean(0), rtol=1e-5)
        got_max = np.asarray(masked_max_pool(jnp.asarray(x), jnp.asarray(mask)))
        np.testing.assert_allclose(got_max[0], x[0, :3].max(0), rtol=1e-5)


class TestEGNNGradients:
    def test_check_grads_small(self, rng):
        """Finite-difference gradient check through one EGNN layer."""
        from jax.test_util import check_grads
        from immunostruct_tpu.ops import egnn_init, egnn_apply
        import jax.numpy as jnp
        import jax

        n, e = 6, 10
        h, x, src, dst = random_graph(rng, n, e)
        params = egnn_init(jax.random.key(9), 20, 8, 8)
        ef = jnp.ones((1, e, 1))
        em = jnp.ones((1, e), bool)

        def f(params, h, x):
            ho, xo = egnn_apply(params, h, x, jnp.asarray(src)[None],
                                jnp.asarray(dst)[None], ef, em)
            return jnp.sum(ho ** 2) + jnp.sum(xo ** 2)

        check_grads(f, (params, jnp.asarray(h)[None], jnp.asarray(x)[None]),
                    order=1, modes=["rev"], rtol=2e-2)
