"""Plain-numpy reference implementations used only by tests.

Independent re-derivations of the math (EGNN message passing, attention)
against which the vectorized JAX ops are checked. Written loop-style on
purpose: slow but obviously correct.
"""

import numpy as np


def silu(x):
    return x / (1.0 + np.exp(-x))


def linear(p, x):
    y = x @ np.asarray(p["w"])
    if "b" in p:
        y = y + np.asarray(p["b"])
    return y


def egnn_layer_np(params, h, x, src, dst, edge_feat, edge_mask):
    """Single-graph EGNN layer, edge-by-edge. h:[N,F], x:[N,3], src/dst:[E]."""
    n, f_dim = h.shape
    hidden = np.asarray(params["edge_mlp"][0]["b"]).shape[0]
    h_agg = np.zeros((n, hidden))
    x_agg = np.zeros((n, 3))
    for e in range(len(src)):
        if not edge_mask[e]:
            continue
        i, j = src[e], dst[e]
        x_diff = x[i] - x[j]
        radial = float(np.sum(x_diff * x_diff))
        x_hat = x_diff / (np.sqrt(radial) + 1e-30)
        feat = np.concatenate([h[i], h[j], [radial], edge_feat[e]])
        m = silu(linear(params["edge_mlp"][0], feat))
        m = silu(linear(params["edge_mlp"][1], m))
        cw = silu(linear(params["coord_mlp"][0], m))
        cw = linear(params["coord_mlp"][1], cw)
        h_agg[j] += m
        x_agg[j] += cw * x_hat
    h_out = np.stack([
        linear(params["node_mlp"][1], silu(linear(params["node_mlp"][0],
                                                  np.concatenate([h[v], h_agg[v]]))))
        for v in range(n)
    ])
    return h_out, x + x_agg


def random_graph(rng, n_nodes, n_edges, feat_dim=20):
    """Random directed graph with both edge directions included."""
    h = rng.standard_normal((n_nodes, feat_dim)).astype(np.float32)
    x = rng.standard_normal((n_nodes, 3)).astype(np.float32)
    half = n_edges // 2
    s = rng.integers(0, n_nodes, half)
    d = (s + 1 + rng.integers(0, n_nodes - 1, half)) % n_nodes
    src = np.concatenate([s, d]).astype(np.int32)
    dst = np.concatenate([d, s]).astype(np.int32)
    return h, x, src, dst
