"""E(n)-equivariant graph convolution over fixed-shape padded edge lists.

Replaces DGL's ``EGNNConv`` (CUDA gSpMM message passing; used at
reference: immunostruct/models/hybrid_models.py:29-31, :89-90) with a dense,
MXU-friendly formulation. Math matches the EGNN of Satorras et al. 2021 as
implemented by DGL:

    x_diff_ij = x_i - x_j                      (i = src, j = dst)
    radial_ij = ||x_diff_ij||^2
    x_hat_ij  = x_diff_ij / (sqrt(radial_ij) + 1e-30)
    m_ij      = edge_mlp([h_i, h_j, radial_ij, a_ij])          (SiLU MLP)
    msgx_ij   = coord_mlp(m_ij) * x_hat_ij                     (no final bias)
    h'_j      = node_mlp([h_j, sum_i m_ij])
    x'_j      = x_j + sum_i msgx_ij

Messages flow src -> dst and are summed at the destination. Padded edges
(mask False) contribute nothing; padded *nodes* still flow through the node
MLP (no edge touches them, so their aggregate is zero) — this exactly
reproduces the reference's padded-graph numerics where zero-feature padded
nodes have no incident edges (data/utils.py:54-67 builds edges from real
topology only).

Aggregation strategies:
  'scatter'  per-batch segment scatter-add (jnp .at[].add) and
             take_along_axis gathers — cheap memory, good on CPU; scatters
             serialize on TPU.
  'onehot'   EVERYTHING as batched one-hot matmuls on the MXU: the dst
             one-hot aggregates messages AND both src/dst one-hots gather
             node features/coords as einsums ("bne,bnc->bec"). Matmul
             gathers matter as much as the matmul aggregation: their
             BACKWARD is again a matmul, whereas take_along_axis
             backward is a scatter-add — measured on v5e, replacing the
             gathers cut the 6-layer EGNN fwd+bwd from 172.9 ms to
             15.0 ms at reference shapes (benchmarks/RESULTS.md round 2).
             The one-hots are built ONCE per forward (same topology for
             all layers) and reused by all 6 conv layers.
  'onehot_remat' same math, one-hots rebuilt inside each rematerialized
             layer (never persisted across layers/backward).
  'fused'    gathers/aggregation as one-hot einsums like 'onehot', but the
             gathers pull [h ++ x] bundles in the TRANSPOSED edge layout
             [B, C, E] and the whole edge program (radial/x_hat, edge MLP,
             coord MLP, msg_x) runs in ONE Pallas kernel per layer with
             in-kernel backward recompute (ops/pallas_edge.py) — no
             edge-space intermediate ever hits HBM and no diff one-hot
             matrix exists. Measured 14.6 -> 11.3 ms/step on the flagship
             fused train step at bench shapes (round 3).
  'mega'     the whole layer in ONE Pallas kernel from the RAW edge
             indices (ops/pallas_mega.py): one-hot tiles built in VMEM,
             node-level L1 projections in-kernel, gathers + edge program
             + dst-aggregation fused — no edge-space tensor or one-hot
             matrix in HBM on the forward; the backward is a measured
             hybrid (XLA one-hot einsums for the gather/aggregation
             transposes + a Pallas tail kernel from saved a1/xd
             residuals). Fastest measured path (11.24 vs 11.47 ms/step
             for 'fused' at bench shapes, round 3 finale).
  'auto'     'mega' on TPU, 'scatter' otherwise.

Masking note: the gather one-hots are mask-zeroed like the aggregation
matrix. A masked edge therefore gathers zeros instead of node values —
indistinguishable in the outputs, because its message is masked out of the
aggregation either way (and radial=0 is guarded).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from immunostruct_tpu.ops.nnp import linear_init, linear_apply


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------

def egnn_init(key: jax.Array, in_size: int, hidden_size: int, out_size: int,
              edge_feat_size: int = 1, dtype=jnp.float32) -> dict:
    """One EGNN layer; mirrors DGL EGNNConv(in, hidden, out, edge_feat)."""
    k = jax.random.split(key, 6)
    return {
        "edge_mlp": [
            linear_init(k[0], in_size * 2 + edge_feat_size + 1, hidden_size, dtype=dtype),
            linear_init(k[1], hidden_size, hidden_size, dtype=dtype),
        ],
        "node_mlp": [
            linear_init(k[2], in_size + hidden_size, hidden_size, dtype=dtype),
            linear_init(k[3], hidden_size, out_size, dtype=dtype),
        ],
        "coord_mlp": [
            linear_init(k[4], hidden_size, hidden_size, dtype=dtype),
            linear_init(k[5], hidden_size, 1, bias=False, dtype=dtype),
        ],
    }


def egnn_stack_init(key: jax.Array, num_layers: int, in_size: int,
                    hidden_size: int, edge_feat_size: int = 1,
                    dtype=jnp.float32) -> list:
    """Input layer (in_size -> hidden) + (num_layers) hidden convs.

    Matches reference construction: 1 + gcn_layers convs
    (hybrid_models.py:29-31 with gcn_layers=5 -> 6 total).
    """
    keys = jax.random.split(key, num_layers + 1)
    layers = [egnn_init(keys[0], in_size, hidden_size, hidden_size, edge_feat_size, dtype)]
    for i in range(num_layers):
        layers.append(egnn_init(keys[i + 1], hidden_size, hidden_size, hidden_size,
                                edge_feat_size, dtype))
    return layers


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

def build_scatter_matrix(edge_dst: jax.Array, edge_mask: jax.Array,
                         num_nodes: int, dtype=jnp.float32) -> jax.Array:
    """[B, E] dst indices -> [B, N, E] masked one-hot scatter matrix.

    ``S @ messages`` then computes the per-destination sum as a batched
    matmul on the MXU. Built once per forward and shared across layers.
    """
    onehot = jax.nn.one_hot(edge_dst, num_nodes, dtype=dtype, axis=1)  # [B, N, E]
    return onehot * edge_mask[:, None, :].astype(dtype)


def _aggregate(messages: jax.Array, edge_dst: jax.Array, edge_mask: jax.Array,
               num_nodes: int, scatter_matrix: Optional[jax.Array]) -> jax.Array:
    """Sum messages [B, E, C] at their destination -> [B, N, C]."""
    if scatter_matrix is not None:
        return jnp.einsum("bne,bec->bnc", scatter_matrix, messages,
                          preferred_element_type=jnp.float32).astype(messages.dtype)
    # scatter path: mask then per-batch scatter-add
    masked = messages * edge_mask[..., None].astype(messages.dtype)
    b, _, c = masked.shape
    out = jnp.zeros((b, num_nodes, c), dtype=messages.dtype)
    batch_idx = jnp.arange(b)[:, None]
    return out.at[batch_idx, edge_dst].add(masked)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _fused_or_fallback(edge_dst: jax.Array, edge_feat: jax.Array,
                       hidden_size: int = 64) -> str:
    """'fused' when the Pallas edge-program kernel supports these shapes
    (128-multiple edge pad within the VMEM tile budget for this hidden
    size, 1-dim edge features), else warn + 'onehot'."""
    from immunostruct_tpu.ops.pallas_edge import pick_tile
    if (pick_tile(edge_dst.shape[1], hidden_size) == 0
            or edge_feat.shape[-1] != 1):
        import warnings
        warnings.warn(
            f"aggregation='fused' unsupported for edge count "
            f"{edge_dst.shape[1]} / edge_feat size {edge_feat.shape[-1]} "
            "(needs a 128-multiple edge pad and 1-dim edge features); "
            "falling back to 'onehot'", stacklevel=3)
        return "onehot"
    return "fused"


def _mega_or_fallback(edge_dst: jax.Array, edge_feat: jax.Array,
                      num_nodes: int, hidden_size: int = 64) -> str:
    """'mega' when the mega kernel supports these shapes, else the 'fused'
    check's result (which itself may fall back to 'onehot')."""
    from immunostruct_tpu.ops.pallas_mega import mega_pick_tile
    if (mega_pick_tile(edge_dst.shape[1], num_nodes, hidden_size) == 0
            or edge_feat.shape[-1] != 1):
        import warnings
        warnings.warn(
            f"aggregation='mega' unsupported for edge count "
            f"{edge_dst.shape[1]} / {num_nodes} nodes / edge_feat size "
            f"{edge_feat.shape[-1]}; falling back to 'fused'", stacklevel=3)
        return _fused_or_fallback(edge_dst, edge_feat, hidden_size)
    return "mega"


def _gather(x: jax.Array, idx: jax.Array,
            onehot: Optional[jax.Array] = None) -> jax.Array:
    """x: [B, N, C], idx: [B, E] -> [B, E, C].

    With ``onehot`` ([B, N, E], possibly mask-zeroed) the gather runs as an
    MXU einsum whose backward is another matmul; without it, a
    take_along_axis whose backward is a scatter-add (fine on CPU, slow on
    TPU)."""
    if onehot is not None:
        return jnp.einsum("bne,bnc->bec", onehot, x,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _egnn_apply_fused(params, h, x, edge_feat, scatter_matrix, src_matrix):
    """One EGNN layer with the edge/coord MLP chain in a fused Pallas kernel.

    Same math as the 'onehot' path; the gathers emit the TRANSPOSED edge
    layout [B, C, E] (the physical layout XLA assigns to edge tensors
    anyway) and the whole MLP chain runs in VMEM with in-kernel backward
    recompute (ops/pallas_edge.py). Gathers/aggregation stay XLA einsums.
    """
    from immunostruct_tpu.ops.pallas_edge import edge_program, pack_params

    interpret = not _on_tpu()
    # gather [h ++ x] bundles straight into the kernel's transposed edge
    # layout; the kernel derives x_diff internally, so no diff one-hot
    # matrix ([B,N,E] build + per-layer reads) exists on this path.
    # NOTE the bundle is single-dtype: coordinates are cast to h.dtype
    # before the gather. In production both are already the compute dtype
    # (models/trunk.py casts h AND x), so this is a no-op; a caller who
    # wants f32 coordinates under bf16 features (which the 'onehot' path
    # preserves through its mixed-dtype coord einsum) should use 'onehot'.
    hx = jnp.concatenate([h, x.astype(h.dtype)], axis=-1)  # [B,N,F+3]
    hsxT = jnp.einsum("bne,bnc->bce", src_matrix, hx,
                      preferred_element_type=jnp.float32).astype(h.dtype)
    hdxT = jnp.einsum("bne,bnc->bce", scatter_matrix, hx,
                      preferred_element_type=jnp.float32).astype(h.dtype)
    efT = jnp.swapaxes(edge_feat, 1, 2).astype(h.dtype)    # [B,1,E]

    w1ab, w2, wc1, small = pack_params(params["edge_mlp"],
                                       params["coord_mlp"])
    bothT = edge_program(hsxT, hdxT, efT, w1ab, w2, wc1, small, interpret)
    agg = jnp.einsum("bne,bce->bnc", scatter_matrix, bothT,
                     preferred_element_type=jnp.float32).astype(bothT.dtype)
    c = agg.shape[-1] - 3
    h_agg, x_agg = agg[..., :c], agg[..., c:].astype(x.dtype)
    return _node_update(params, h, x, h_agg, x_agg)


def _egnn_apply_mega(params, h, x, edge_src, edge_dst, edge_feat, edge_mask):
    """One EGNN layer in the mega kernel (ops/pallas_mega.py): one-hot
    tiles built in VMEM from the raw indices, gathers, edge/coord MLP
    chain and dst-aggregation in one Pallas program — no [B,C,E]
    edge-space tensor and no [B,N,E] one-hot matrix ever reach HBM.
    Projection-first: the edge MLP's L1 is linear in (h_src, h_dst), so
    its weight halves are applied here at NODE level (XLA autodiff covers
    dW1 and d_h) and the kernel gathers the projections."""
    from immunostruct_tpu.ops.pallas_edge import pack_params
    from immunostruct_tpu.ops.pallas_mega import edge_mega

    interpret = not _on_tpu()
    w1ab, w2, wc1, small = pack_params(params["edge_mlp"],
                                       params["coord_mlp"])
    agg = edge_mega(edge_src, edge_dst, edge_mask, edge_feat, h,
                    x.astype(h.dtype), w1ab, w2, wc1, small,
                    interpret).astype(h.dtype)
    c = agg.shape[-1] - 3
    h_agg, x_agg = agg[..., :c], agg[..., c:].astype(x.dtype)
    return _node_update(params, h, x, h_agg, x_agg)


# Split the node MLP's first matmul into h @ W_top + agg @ W_bot instead
# of concat([h, agg]) @ W. Hypothesis: the concat forces XLA to unify
# the operands' layouts with a [B,N,F+H] copy per layer (6 copies,
# ~53 MB/step in the compiled-HLO copy audit). MEASURED A TIE at bench
# shapes (11.296 vs 11.298 ms interleaved) — the copies overlap with
# kernel compute and are not on the critical path; default stays the
# concat formulation (matches the reference's shape,
# hybrid_models.py:29-31).
NODE_SPLIT_DOT = False


def _node_update(params, h, x, h_agg, x_agg):
    """Shared layer epilogue: h' = node_mlp([h ++ agg]); x' = x + x_agg."""
    if NODE_SPLIT_DOT:
        w0 = params["node_mlp"][0]
        f = h.shape[-1]
        hn = (jnp.dot(h, w0["w"][:f].astype(h.dtype),
                      preferred_element_type=jnp.float32)
              + jnp.dot(h_agg, w0["w"][f:].astype(h.dtype),
                        preferred_element_type=jnp.float32))
        if "b" in w0:
            hn = hn + w0["b"].astype(jnp.float32)
        hn = hn.astype(h.dtype)
    else:
        hn = jnp.concatenate([h, h_agg], axis=-1)
        hn = linear_apply(params["node_mlp"][0], hn)
    hn = jax.nn.silu(hn)
    hn = linear_apply(params["node_mlp"][1], hn)
    return hn, x + x_agg


def egnn_apply(
    params: dict,
    h: jax.Array,            # [B, N, F]
    x: jax.Array,            # [B, N, 3]
    edge_src: jax.Array,     # [B, E]
    edge_dst: jax.Array,     # [B, E]
    edge_feat: jax.Array,    # [B, E, Fe]
    edge_mask: jax.Array,    # [B, E]
    scatter_matrix: Optional[jax.Array] = None,
    src_matrix: Optional[jax.Array] = None,
    diff_matrix: Optional[jax.Array] = None,
    aggregation: str = "onehot",
) -> Tuple[jax.Array, jax.Array]:
    """One EGNN layer. Returns (h', x').

    ``scatter_matrix``/``src_matrix``: mask-zeroed dst/src one-hots
    [B, N, E]; when provided, gathers AND aggregation run as MXU einsums
    (see module docstring). ``diff_matrix``: optional precomputed
    ``src_matrix - scatter_matrix`` (hoisted by the stack so lax.scan
    bodies don't rebuild it per layer). Providing exactly one one-hot
    builds the other here — a mixed einsum/take regime would let masked
    edges see inconsistent gathered values."""
    n = h.shape[1]
    if aggregation == "mega":
        aggregation = _mega_or_fallback(
            edge_dst, edge_feat, n, params["edge_mlp"][1]["w"].shape[1])
    if aggregation == "mega":
        return _egnn_apply_mega(params, h, x, edge_src, edge_dst, edge_feat,
                                edge_mask)
    if aggregation == "fused":
        aggregation = _fused_or_fallback(
            edge_dst, edge_feat, params["edge_mlp"][1]["w"].shape[1])
    if aggregation == "fused":
        if scatter_matrix is None:
            scatter_matrix = build_scatter_matrix(edge_dst, edge_mask, n,
                                                  dtype=h.dtype)
        if src_matrix is None:
            src_matrix = build_scatter_matrix(edge_src, edge_mask, n,
                                              dtype=h.dtype)
        return _egnn_apply_fused(params, h, x, edge_feat, scatter_matrix,
                                 src_matrix)
    if (aggregation in ("onehot", "onehot_remat") and scatter_matrix is None
            and src_matrix is None):
        scatter_matrix = build_scatter_matrix(edge_dst, edge_mask, n,
                                              dtype=h.dtype)
        src_matrix = build_scatter_matrix(edge_src, edge_mask, n,
                                          dtype=h.dtype)
    if (scatter_matrix is None) != (src_matrix is None):
        if scatter_matrix is None:
            scatter_matrix = build_scatter_matrix(edge_dst, edge_mask, n,
                                                  dtype=h.dtype)
        else:
            src_matrix = build_scatter_matrix(edge_src, edge_mask, n,
                                              dtype=h.dtype)
    # separate einsum gathers measured FASTER than concatenated [h ++ x]
    # gathers (15.3 vs 16.5 ms/step at bench shapes): the C=64 h-gathers
    # hit an efficient MXU path that the concat's C=67 loses
    h_src = _gather(h, edge_src, src_matrix)
    h_dst = _gather(h, edge_dst, scatter_matrix)
    if src_matrix is not None:
        # coords are consumed only as x_src - x_dst: one einsum against the
        # DIFFERENCE of the one-hots replaces both coordinate gathers.
        # No pre-cast of x: the einsum promotes mixed dtypes itself, so
        # f32 coordinates keep full precision under bf16 one-hots.
        if diff_matrix is None:
            diff_matrix = src_matrix - scatter_matrix
        x_diff = jnp.einsum("bne,bnc->bec", diff_matrix, x,
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype)                  # [B, E, 3]
    else:
        x_src = _gather(x, edge_src, None)
        x_dst = _gather(x, edge_dst, None)
        x_diff = x_src - x_dst                                 # [B, E, 3]
    radial = jnp.sum(x_diff * x_diff, axis=-1, keepdims=True)  # [B, E, 1]
    # guard radial=0 (padded edges point 0->0; self-loops): sqrt has an
    # infinite derivative at 0, which would turn masked-out messages into
    # NaN gradients. The where keeps both forward (x_diff=0 -> x_hat=0) and
    # backward finite without changing real-edge values.
    radial_safe = jnp.where(radial > 0, radial, 1.0)
    x_hat = x_diff / (jnp.sqrt(radial_safe) + 1e-30)

    f = jnp.concatenate([h_src, h_dst, radial.astype(h.dtype),
                         edge_feat.astype(h.dtype)], axis=-1)
    m = linear_apply(params["edge_mlp"][0], f)
    m = jax.nn.silu(m)
    m = linear_apply(params["edge_mlp"][1], m)
    m = jax.nn.silu(m)                                         # [B, E, H]

    cw = linear_apply(params["coord_mlp"][0], m)
    cw = jax.nn.silu(cw)
    cw = linear_apply(params["coord_mlp"][1], cw)              # [B, E, 1]
    msg_x = cw.astype(x_hat.dtype) * x_hat                     # [B, E, 3]

    if scatter_matrix is None and aggregation != "pallas":
        h_agg = _aggregate(m, edge_dst, edge_mask, n, None)
        x_agg = _aggregate(msg_x, edge_dst, edge_mask, n, None)
    else:
        # fuse both aggregations into one matmul over concat channel dim
        both = jnp.concatenate([m, msg_x.astype(m.dtype)], axis=-1)
        if aggregation == "pallas":
            from immunostruct_tpu.ops.experimental.pallas_segment import segment_scatter
            interpret = not _on_tpu()
            agg = segment_scatter(edge_dst, edge_mask, both, n, interpret)
        else:
            agg = _aggregate(both, edge_dst, edge_mask, n, scatter_matrix)
        h_agg, x_agg = agg[..., : m.shape[-1]], agg[..., m.shape[-1]:].astype(x.dtype)

    return _node_update(params, h, x, h_agg, x_agg)


def egnn_stack_apply(
    layers: list,
    h: jax.Array, x: jax.Array,
    edge_src: jax.Array, edge_dst: jax.Array,
    edge_feat: jax.Array, edge_mask: jax.Array,
    aggregation: str = "auto",
    scan_layers: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the full conv stack, sharing the one-hot matrices across layers.

    aggregation: 'auto' picks 'mega' on TPU (whole layer in one Pallas
    kernel from the raw edge indices, falling back to 'fused' when the
    shapes don't fit the mega kernel's VMEM model) and 'scatter'
    elsewhere. 'fused' materializes src/dst one-hots ONCE, shares them
    across layers, runs gathers/aggregation as MXU einsums and the
    per-layer edge program in a fused Pallas kernel (module docstring).
    'onehot' is the pure-XLA variant of the same one-hot formulation.
    'onehot_remat' rebuilds the matrices inside
    each rematerialized layer (least temp HBM); 'pallas' uses the VMEM
    kernels (superseded on speed; see benchmarks/RESULTS.md).

    scan_layers: roll the identically-shaped hidden convs (layers[1:]) into
    one ``lax.scan`` body — same numerics, ~K-fold smaller HLO (faster
    compiles; matters on slow remote-compile toolchains). Params are stacked
    at trace time so the checkpoint/param layout is unchanged.
    """
    if aggregation == "auto":
        aggregation = "mega" if _on_tpu() else "scatter"
    if aggregation == "pallas":
        from immunostruct_tpu.ops.experimental.pallas_segment import _pick_tile
        if _pick_tile(edge_dst.shape[1]) == 0:
            aggregation = "onehot"  # edge pad not 128-aligned: fall back
    if aggregation == "mega":
        aggregation = _mega_or_fallback(
            edge_dst, edge_feat, h.shape[1],
            layers[0]["edge_mlp"][1]["w"].shape[1])
    if aggregation == "mega" and not scan_layers:
        # whole-stack fast path: one kernel builds the one-hot tiles ONCE
        # and runs every layer with h/x resident in VMEM — the per-layer
        # rebuilds cost a measured 1.5 ms/step at bench shapes
        # (ops/experimental/pallas_stack.py). Requires the edge set in one VMEM tile.
        from immunostruct_tpu.ops.experimental.pallas_stack import (
            apply_stack, stack_supported)
        if stack_supported(edge_dst.shape[1], h.shape[1],
                           layers[0]["edge_mlp"][1]["w"].shape[1],
                           len(layers), edge_feat.shape[-1]):
            return apply_stack(layers, h, x, edge_src, edge_dst,
                               edge_feat, edge_mask, not _on_tpu())
    if aggregation == "fused":
        aggregation = _fused_or_fallback(
            edge_dst, edge_feat, layers[0]["edge_mlp"][1]["w"].shape[1])
    scatter_matrix = None
    src_matrix = None
    diff_matrix = None
    if aggregation in ("onehot", "fused"):
        scatter_matrix = build_scatter_matrix(edge_dst, edge_mask, h.shape[1], dtype=h.dtype)
        src_matrix = build_scatter_matrix(edge_src, edge_mask, h.shape[1], dtype=h.dtype)
        if aggregation == "onehot":
            # hoisted: lax.scan layer bodies get no cross-iteration CSE, so
            # the [B,N,E] subtract must not live inside the per-layer
            # closure. (The fused path needs no diff matrix at all: the
            # kernel derives x_diff from the gathered [h ++ x] bundles.)
            diff_matrix = src_matrix - scatter_matrix

    if aggregation == "onehot_remat":
        # same math as 'onehot', different residency: the [B, N, E] one-hots
        # are rebuilt inside EVERY layer and the layer is rematerialized, so
        # the matrices are never persisted across layers or saved for the
        # backward pass — they exist only transiently inside each layer's
        # forward/recompute. Trades their (cheap: iota-compare) construction
        # FLOPs for the HBM residency of 2*B*N*E*dtype bytes x layers
        # (VERDICT round-1 weak #3).
        def one_remat(params, h, x):
            sm = build_scatter_matrix(edge_dst, edge_mask, h.shape[1],
                                      dtype=h.dtype)
            srcm = build_scatter_matrix(edge_src, edge_mask, h.shape[1],
                                        dtype=h.dtype)
            return egnn_apply(params, h, x, edge_src, edge_dst, edge_feat,
                              edge_mask, scatter_matrix=sm, src_matrix=srcm,
                              diff_matrix=srcm - sm, aggregation="onehot")

        one = jax.checkpoint(one_remat)
    else:
        def one(params, h, x):
            return egnn_apply(params, h, x, edge_src, edge_dst, edge_feat, edge_mask,
                              scatter_matrix=scatter_matrix, src_matrix=src_matrix,
                              diff_matrix=diff_matrix, aggregation=aggregation)

    if scan_layers and len(layers) > 2 and aggregation != "pallas":
        h, x = one(layers[0], h, x)  # input layer: different in-dim
        stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *layers[1:])

        def body(carry, layer_params):
            h, x = carry
            return one(layer_params, h, x), None

        (h, x), _ = jax.lax.scan(body, (h, x), stacked)
        return h, x

    for params in layers:
        h, x = one(params, h, x)
    return h, x
