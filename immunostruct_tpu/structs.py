"""Core fixed-shape pytrees.

The reference consumes graphs only as (B, N, F) dense blocks plus an edge
list (reference: immunostruct/models/hybrid_models.py:315-331 reshapes the
batched DGL graph to (B, max_nodes, C); immunostruct/data/preprocess.py:343-349
pads every graph to the corpus max). The TPU-native formulation makes that
explicit: a ``GraphBatch`` is a pytree of statically-shaped arrays with
masks, so the whole model is dense XLA with no ragged containers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls, data_fields, meta_fields=()):
    cls = jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    # also register for jax.export serialization (serving artifacts carry
    # these pytrees in their calling convention)
    try:
        from jax import export as jexport

        # register_dataclass nodes carry their meta-field values as auxdata;
        # all fields here are data fields, so the auxdata is the empty tuple
        jexport.register_pytree_node_serialization(
            cls,
            serialized_name=f"immunostruct_tpu.{cls.__name__}",
            serialize_auxdata=lambda aux: b"",
            deserialize_auxdata=lambda data: (),
        )
    except Exception:  # noqa: BLE001 - older jax without export registration
        pass
    return cls


@dataclasses.dataclass
class GraphBatch:
    """A batch of padded pMHC structure graphs.

    Shapes (B = batch, N = padded node count, E = padded edge count):
      node_feat  [B, N, 20] float  amino-acid one-hot (zeros on padding)
      coords     [B, N, 3]  float  CA coordinates (zeros on padding)
      edge_src   [B, E]     int32  source node index per edge (0 on padding)
      edge_dst   [B, E]     int32  destination node index per edge
      edge_feat  [B, E, 1]  float  edge attribute (all-ones in the reference,
                                   data/utils.py:60)
      edge_mask  [B, E]     bool   True for real edges
      node_mask  [B, N]     bool   True for real nodes
      num_nodes  [B]        int32  real node count per graph

    Padding semantics mirror the reference exactly: padded nodes have zero
    features/coords and no incident edges, but they DO flow through the node
    MLP, attention, and mean-pool denominators (the reference never masks
    them; see hybrid_models.py:92-97 where the (B, max_nodes, C) reshape and
    global_mean_pool include padding rows).
    """

    node_feat: jax.Array
    coords: jax.Array
    edge_src: jax.Array
    edge_dst: jax.Array
    edge_feat: jax.Array
    edge_mask: jax.Array
    node_mask: jax.Array
    num_nodes: jax.Array

    @property
    def batch_size(self) -> int:
        return self.node_feat.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.node_feat.shape[1]

    @property
    def max_edges(self) -> int:
        return self.edge_src.shape[1]


_register(
    GraphBatch,
    data_fields=(
        "node_feat", "coords", "edge_src", "edge_dst",
        "edge_feat", "edge_mask", "node_mask", "num_nodes",
    ),
)


@dataclasses.dataclass
class SampleBatch:
    """One training batch for non-comparative models.

    seq_onehot  [B, L, 21]  flattened to the VAE input inside the model
    props       [B, 2]      (Mprop1, Mprop2)
    target      [B]         immunogenicity (binary stage) or normalized
                            foreignness (regression stage)
    aux_residue [B] int32   masked-residue class for SSL (or -1)
    """

    graph: GraphBatch
    seq_onehot: jax.Array
    props: jax.Array
    target: jax.Array
    aux_residue: Optional[jax.Array] = None


_register(SampleBatch, data_fields=("graph", "seq_onehot", "props", "target", "aux_residue"))


@dataclasses.dataclass
class ComparativeBatch:
    """Paired cancer/wild-type batch (reference: data/utils.py:169-175)."""

    cancer: SampleBatch
    wt: SampleBatch

    @property
    def target(self) -> jax.Array:
        return self.cancer.target


_register(ComparativeBatch, data_fields=("cancer", "wt"))


def make_graph_batch(
    node_feats: list[np.ndarray],
    coords: list[np.ndarray],
    edge_indices: list[np.ndarray],
    max_nodes: Optional[int] = None,
    max_edges: Optional[int] = None,
    nodes_multiple: int = 8,
    edges_multiple: int = 128,
    dtype=np.float32,
) -> GraphBatch:
    """Host-side construction of a padded GraphBatch from ragged numpy graphs.

    ``edge_indices[i]`` is a [2, E_i] int array (PyG edge_index layout).
    Padding edges point at node 0 with mask False.
    """

    def _round_up(x, m):
        return ((x + m - 1) // m) * m

    b = len(node_feats)
    n = max(int(f.shape[0]) for f in node_feats)
    e = max(int(ei.shape[1]) for ei in edge_indices) if edge_indices else 1
    n = _round_up(max_nodes or n, nodes_multiple)
    e = _round_up(max(max_edges or e, 1), edges_multiple)

    feat_dim = node_feats[0].shape[1]
    nf = np.zeros((b, n, feat_dim), dtype=dtype)
    xyz = np.zeros((b, n, 3), dtype=dtype)
    src = np.zeros((b, e), dtype=np.int32)
    dst = np.zeros((b, e), dtype=np.int32)
    emask = np.zeros((b, e), dtype=bool)
    nmask = np.zeros((b, n), dtype=bool)
    nnum = np.zeros((b,), dtype=np.int32)

    for i, (f, c, ei) in enumerate(zip(node_feats, coords, edge_indices)):
        ni, ei_n = f.shape[0], ei.shape[1]
        if ni > n:
            raise ValueError(f"graph {i} has {ni} nodes > padded max {n}")
        if ei_n > e:
            raise ValueError(f"graph {i} has {ei_n} edges > padded max {e}")
        nf[i, :ni] = f
        xyz[i, :ni] = c
        src[i, :ei_n] = ei[0]
        dst[i, :ei_n] = ei[1]
        emask[i, :ei_n] = True
        nmask[i, :ni] = True
        nnum[i] = ni

    ones = np.ones((b, e, 1), dtype=dtype)
    return GraphBatch(
        node_feat=jnp.asarray(nf), coords=jnp.asarray(xyz),
        edge_src=jnp.asarray(src), edge_dst=jnp.asarray(dst),
        edge_feat=jnp.asarray(ones), edge_mask=jnp.asarray(emask),
        node_mask=jnp.asarray(nmask), num_nodes=jnp.asarray(nnum),
    )


def mirror_pair_edge_index(edge_index: np.ndarray) -> Optional[np.ndarray]:
    """Canonicalize a both-arcs [2, E] edge index into the v9
    MIRROR-PAIRED layout (ops/pallas_mega.py MEGA_PAIRED): returns the
    reordered [2, E] array whose slot k + E/2 holds the reverse of slot
    k, or None when the list cannot be paired (odd count, self loops,
    duplicates, or an arc without its reverse — never the case for the
    symmetric contact graphs this pipeline produces, featurize/edges.py
    and the PyG conversion both emit both directions).

    Padding note: make_graph_batch pads edge slots AFTER the real edges;
    for the paired layout pad each HALF independently (mirror of a padded
    arc is padded), which is what a paired-aware stacker must do — this
    function only orders the real arcs."""
    src, dst = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    e = src.shape[0]
    if e % 2 or np.any(src == dst):
        return None
    big = np.int64(max(int(src.max(initial=0)), int(dst.max(initial=0))) + 1)
    keys = src.astype(np.int64) * big + dst.astype(np.int64)
    if np.unique(keys).shape[0] != e:
        return None
    rkeys = dst.astype(np.int64) * big + src.astype(np.int64)
    if not np.array_equal(np.sort(keys), np.sort(rkeys)):
        return None
    fwd = src < dst
    arcs = np.stack([src[fwd], dst[fwd]])
    if arcs.shape[1] != e // 2:
        return None
    return np.concatenate([arcs, arcs[::-1]], axis=1)
