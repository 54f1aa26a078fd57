"""Parity tests for the fused edge-chain Pallas kernel (interpret mode).

The fused path must match the onehot reference path — same math, different
residency — for forward values and for gradients wrt every parameter and
input. Tolerances are f32-roundoff scale: the kernel splits the edge-MLP
L1 concat algebraically (different summation order) and runs silu in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.ops import egnn as eg
from immunostruct_tpu.ops.pallas_edge import edge_program, pack_params, pick_tile


pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

def _toy(b=3, n=24, e=128, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((b, n, 20)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    esrc = jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32))
    edst = jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32))
    efeat = jnp.asarray(rng.standard_normal((b, e, 1)).astype(np.float32))
    emask = jnp.asarray(rng.random((b, e)) > 0.25)
    params = eg.egnn_stack_init(jax.random.key(seed), 3, 20, 64)
    return params, h, x, esrc, edst, efeat, emask


def _loss(params, h, x, esrc, edst, efeat, emask, agg):
    hn, xn = eg.egnn_stack_apply(params, h, x, esrc, edst, efeat, emask,
                                 aggregation=agg)
    return jnp.sum(hn ** 2) * 1e-3 + jnp.sum(xn ** 2) * 1e-3


def test_fused_matches_onehot_forward_and_grads():
    params, *args = _toy()
    l_one, g_one = jax.value_and_grad(_loss)(params, *args, "onehot")
    l_fused, g_fused = jax.value_and_grad(_loss)(params, *args, "fused")
    assert np.isfinite(float(l_fused))
    np.testing.assert_allclose(float(l_fused), float(l_one),
                               rtol=5e-4, atol=5e-5)
    ref_scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_one))
    for a, b in zip(jax.tree.leaves(g_one), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3 * ref_scale)


def test_fused_matches_scatter_values():
    params, *args = _toy(seed=3)
    l_sc = _loss(params, *args, "scatter")
    l_fused = _loss(params, *args, "fused")
    np.testing.assert_allclose(float(l_fused), float(l_sc),
                               rtol=5e-4, atol=5e-5)


def test_fused_grad_wrt_inputs_matches():
    params, h, x, esrc, edst, efeat, emask = _toy(seed=5)

    def loss_hx(h, x, agg):
        return _loss(params, h, x, esrc, edst, efeat, emask, agg)

    gh1, gx1 = jax.grad(loss_hx, argnums=(0, 1))(h, x, "onehot")
    gh2, gx2 = jax.grad(loss_hx, argnums=(0, 1))(h, x, "fused")
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-3, atol=1e-4)


def test_edge_program_direct_vs_reference_mlp():
    """The raw kernel against a plain jnp evaluation of the same program."""
    rng = np.random.default_rng(7)
    b, f_in, e, hid = 2, 20, 256, 64
    hs = jnp.asarray(rng.standard_normal((b, f_in, e)).astype(np.float32))
    hd = jnp.asarray(rng.standard_normal((b, f_in, e)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((b, 3, e)).astype(np.float32))
    xdst = jnp.asarray(rng.standard_normal((b, 3, e)).astype(np.float32))
    # a few zero diffs exercise the radial guard
    xdst = xdst.at[:, :, :5].set(xs[:, :, :5])
    xd = xs - xdst
    ef = jnp.ones((b, 1, e), jnp.float32)
    p = eg.egnn_init(jax.random.key(0), f_in, hid, hid)
    w1ab, w2, wc1, small = pack_params(p["edge_mlp"], p["coord_mlp"])
    hsx = jnp.concatenate([hs, xs], axis=1)
    hdx = jnp.concatenate([hd, xdst], axis=1)
    out = edge_program(hsx, hdx, ef, w1ab, w2, wc1, small, True)
    m, msgx = out[:, :hid], out[:, hid:]

    from immunostruct_tpu.ops.nnp import linear_apply
    rad = jnp.sum(jnp.swapaxes(xd, 1, 2) ** 2, axis=-1, keepdims=True)
    safe = jnp.where(rad > 0, rad, 1.0)
    x_hat = jnp.swapaxes(xd, 1, 2) / (jnp.sqrt(safe) + 1e-30)
    f = jnp.concatenate([jnp.swapaxes(hs, 1, 2), jnp.swapaxes(hd, 1, 2),
                         rad, jnp.swapaxes(ef, 1, 2)], axis=-1)
    mm = jax.nn.silu(linear_apply(p["edge_mlp"][0], f))
    mm = jax.nn.silu(linear_apply(p["edge_mlp"][1], mm))
    cc = jax.nn.silu(linear_apply(p["coord_mlp"][0], mm))
    cc = linear_apply(p["coord_mlp"][1], cc)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(m, 1, 2)),
                               np.asarray(mm), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(msgx, 1, 2)),
                               np.asarray(cc * x_hat), rtol=1e-4, atol=1e-5)


def test_pick_tile():
    assert pick_tile(2560) == 2560
    assert pick_tile(128) == 128
    assert pick_tile(2048) == 2048
    assert pick_tile(100) == 0
    # VMEM budget: huge hidden forces smaller tiles
    assert pick_tile(2560, hid=512) <= 640


def test_fused_falls_back_on_unsupported_shapes():
    # edge count not a 128 multiple -> stack warns and uses onehot
    params, h, x, esrc, edst, efeat, emask = _toy(e=100)
    with pytest.warns(UserWarning, match="falling back to 'onehot'"):
        l = _loss(params, h, x, esrc, edst, efeat, emask, "fused")
    l_ref = _loss(params, h, x, esrc, edst, efeat, emask, "onehot")
    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-6)


def test_fused_with_scan_layers_matches():
    params, h, x, esrc, edst, efeat, emask = _toy(seed=11)

    def loss_scan(p, scan):
        hn, xn = eg.egnn_stack_apply(p, h, x, esrc, edst, efeat, emask,
                                     aggregation="fused", scan_layers=scan)
        return jnp.sum(hn ** 2) * 1e-3 + jnp.sum(xn ** 2) * 1e-3

    l_plain, g_plain = jax.value_and_grad(loss_scan)(params, False)
    l_scan, g_scan = jax.value_and_grad(loss_scan)(params, True)
    np.testing.assert_allclose(float(l_scan), float(l_plain), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fused_multi_tile_weight_accumulation():
    """E large enough that pick_tile splits edges across grid cells
    (j > 0): weight-gradient accumulation across revisited output blocks
    must still match the onehot reference."""
    from immunostruct_tpu.ops.pallas_edge import pick_tile

    e = 3840
    t = pick_tile(e)
    assert 0 < t < e, f"expected a multi-tile split for E={e}, got t={t}"
    params, h, x, esrc, edst, efeat, emask = _toy(b=2, n=16, e=e, seed=13)
    l_one, g_one = jax.value_and_grad(_loss)(params, h, x, esrc, edst,
                                             efeat, emask, "onehot")
    l_fused, g_fused = jax.value_and_grad(_loss)(params, h, x, esrc, edst,
                                                 efeat, emask, "fused")
    np.testing.assert_allclose(float(l_fused), float(l_one),
                               rtol=5e-4, atol=5e-5)
    ref_scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_one))
    for a, b in zip(jax.tree.leaves(g_one), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3 * ref_scale)


def test_fused_full_zoo_matches_scatter():
    """Every registry model's forward agrees between the fused Pallas path
    (the TPU default) and the scatter reference — including SSL and
    comparative variants — at one tiny batch per model."""
    from immunostruct_tpu.models.zoo import model_map, build_model
    from immunostruct_tpu.models.trunk import (
        model_apply, model_apply_comparative,
    )
    from immunostruct_tpu.structs import GraphBatch

    rng = np.random.default_rng(21)
    b, n, e, seq_len = 2, 16, 128, 24
    onehot = np.zeros((b, n, 20), np.float32)
    for i in range(b):
        onehot[i, np.arange(n), rng.integers(0, 20, n)] = 1.0
    graph = GraphBatch(
        node_feat=jnp.asarray(onehot),
        coords=jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)),
        edge_src=jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32)),
        edge_dst=jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32)),
        edge_feat=jnp.ones((b, e, 1), jnp.float32),
        edge_mask=jnp.asarray(rng.random((b, e)) > 0.2),
        node_mask=jnp.ones((b, n), bool),
        num_nodes=jnp.full((b,), n, jnp.int32))
    seq = jnp.asarray(rng.random((b, seq_len, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((b, 2)).astype(np.float32))
    key = jax.random.key(3)

    for name in model_map:
        spec, params = build_model(name, seq_len * 21, jax.random.key(7))
        outs = {}
        for agg in ("fused", "scatter"):
            if spec.comparative:
                out_c, _, logits = model_apply_comparative(
                    params, spec, (graph, graph), (seq, seq), (props, props),
                    key, deterministic=True, aggregation=agg)
                outs[agg] = np.asarray(logits)
            else:
                out = model_apply(params, spec, graph, seq, props, key,
                                  deterministic=True, aggregation=agg)
                outs[agg] = np.asarray(out.logits)
        assert np.isfinite(outs["fused"]).all(), name
        np.testing.assert_allclose(
            outs["fused"], outs["scatter"], rtol=5e-4,
            atol=5e-4 * max(1.0, np.abs(outs["scatter"]).max()),
            err_msg=f"fused/scatter mismatch for {name}")


def test_direct_egnn_apply_onehot_builds_matrices():
    """egnn_apply(aggregation='onehot') without precomputed matrices must
    take the one-hot matmul path (building BOTH matrices itself), not the
    serialized scatter path — and match scatter numerically."""
    params, h, x, esrc, edst, efeat, emask = _toy(seed=17)
    layer = params[0]
    out_oh = eg.egnn_apply(layer, h, x, esrc, edst, efeat, emask,
                           aggregation="onehot")
    out_sc = eg.egnn_apply(layer, h, x, esrc, edst, efeat, emask,
                           aggregation="scatter")
    for a, b in zip(out_oh, out_sc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
