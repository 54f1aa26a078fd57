"""Device-side augmentation: the host pipeline's train-time transforms as a
jitted function, extending the HBM-resident pipeline to SSL/augmented runs.

Implements the same transforms as data/pipeline.py with jax PRNG:
  - random QR rotation of coordinates (data/utils.py:148-155 semantics);
  - SSL single-residue masking: one random real residue's one-hot set to
    all-ones, its class returned (immmunopred_dataloader.py:104-115);
  - structure masking: k random node rows zeroed unless already SSL-masked
    (immmunopred_dataloader.py:92-102);
  - sequence masking: k random positions in the HLA region set to the 'J'
    one-hot (immmunopred_dataloader.py:78-89).

Randomness streams differ from the host pipeline (jax PRNG vs numpy), so an
augmented device run is statistically — not bitwise — equivalent to a host
run. Distinct-position sampling uses Gumbel top-k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from immunostruct_tpu.structs import GraphBatch, SampleBatch


def random_rotations(key: jax.Array, batch: int) -> jax.Array:
    """[B, 3, 3] Haar-uniform rotations via normalized quaternions.

    Pure elementwise arithmetic (no QR/SVD custom calls, which some TPU
    toolchains cannot lower); a normalized 4D gaussian is a uniform
    quaternion, giving exactly uniform SO(3) — the same distribution as the
    host pipeline's QR-of-gaussian up to reflection handling.
    """
    q = jax.random.normal(key, (batch, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(batch, 3, 3)


def _topk_positions(key: jax.Array, batch: int, length: int, k: int):
    """[B, k] distinct positions per row via Gumbel top-k."""
    noise = jax.random.uniform(key, (batch, length))
    _, idx = jax.lax.top_k(noise, k)
    return idx


def ssl_mask_single(key: jax.Array, node_onehot: jax.Array):
    """Mask one random real residue per graph as all-ones; return classes.

    Real residues have a one-hot row sum of exactly 1; padded rows sum 0.
    Returns (masked_onehot, classes [B] int32; 0 when a graph has no real
    residue, matching the host fallback).
    """
    b, n, c = node_onehot.shape
    real = node_onehot.sum(-1) == 1.0                       # [B, N]
    gumbel = jax.random.gumbel(key, (b, n))
    scores = jnp.where(real, gumbel, -jnp.inf)
    pick = jnp.argmax(scores, axis=1)                       # [B]
    classes = jnp.take_along_axis(
        node_onehot.argmax(-1), pick[:, None], axis=1)[:, 0].astype(jnp.int32)
    any_real = real.any(axis=1)
    classes = jnp.where(any_real, classes, 0)
    row_sel = jax.nn.one_hot(pick, n, dtype=node_onehot.dtype)  # [B, N]
    row_sel = row_sel * any_real[:, None].astype(node_onehot.dtype)
    masked = jnp.where(row_sel[..., None] > 0, 1.0, node_onehot)
    return masked, classes


def ssl_mask_paired(key: jax.Array, onehot_c: jax.Array, onehot_w: jax.Array):
    """Mask same-class residues in a cancer/WT pair; return the class.

    Host semantics (immmunopred_dataloader.py:253-271): pick a residue class
    present in BOTH graphs, mark one random residue of that class in each as
    all-ones. When no common class exists, neither graph is masked and the
    class is 0 (the host fallback).
    """
    k_pick, k_w = jax.random.split(key)
    b, n, c = onehot_c.shape
    real_c = (onehot_c.sum(-1) == 1.0)
    real_w = (onehot_w.sum(-1) == 1.0)
    cls_c = onehot_c.argmax(-1)
    cls_w = onehot_w.argmax(-1)

    def present(cls_idx, real):
        # [B, C] bool: class k has at least one real residue
        onehot_cls = jax.nn.one_hot(cls_idx, c, dtype=jnp.float32)
        return (onehot_cls * real[..., None]).sum(1) > 0

    # pick a CANCER RESIDUE uniformly among residues whose class also exists
    # in WT — the host/reference distribution (a shuffled residue scan,
    # immmunopred_dataloader.py:253-271), so class probability stays
    # proportional to residue frequency, not uniform over classes
    present_w = present(cls_w, real_w)                          # [B, C]
    class_ok = jnp.take_along_axis(present_w, cls_c, axis=1)    # [B, N]
    eligible_c = real_c & class_ok
    g = jax.random.gumbel(k_pick, (b, n))
    pick_c = jnp.argmax(jnp.where(eligible_c, g, -jnp.inf), axis=1)
    has_common = eligible_c.any(axis=1)
    classes = jnp.where(
        has_common,
        jnp.take_along_axis(cls_c, pick_c[:, None], axis=1)[:, 0], 0
    ).astype(jnp.int32)

    row_c = jax.nn.one_hot(pick_c, n, dtype=onehot_c.dtype)
    row_c = row_c * has_common[:, None].astype(onehot_c.dtype)
    masked_c = jnp.where(row_c[..., None] > 0, 1.0, onehot_c)

    # WT side: uniform among residues of the chosen class
    ok_w = real_w & (cls_w == classes[:, None])
    g_w = jax.random.gumbel(k_w, (b, n))
    pick_w = jnp.argmax(jnp.where(ok_w, g_w, -jnp.inf), axis=1)
    row_w = jax.nn.one_hot(pick_w, n, dtype=onehot_w.dtype)
    row_w = row_w * (has_common & ok_w.any(axis=1))[:, None].astype(onehot_w.dtype)
    masked_w = jnp.where(row_w[..., None] > 0, 1.0, onehot_w)
    return masked_c, masked_w, classes


def structure_mask(key: jax.Array, node_onehot: jax.Array, count: int):
    """Zero `count` random node rows unless already SSL-masked (sum > 1)."""
    if count <= 0:
        return node_onehot
    b, n, _ = node_onehot.shape
    cols = _topk_positions(key, b, n, count)                # [B, k]
    sel = jnp.zeros((b, n), bool).at[jnp.arange(b)[:, None], cols].set(True)
    eligible = node_onehot.sum(-1) <= 1.0
    zero_rows = sel & eligible
    return jnp.where(zero_rows[..., None], 0.0, node_onehot)


def sequence_mask(key: jax.Array, seq_onehot: jax.Array, maskable_len: int,
                  count: int):
    """Set `count` random positions in [0, maskable_len) to the 'J' one-hot."""
    if count <= 0 or maskable_len <= 0:
        return seq_onehot
    b, l, a = seq_onehot.shape
    cols = _topk_positions(key, b, maskable_len, count)     # [B, k]
    sel = jnp.zeros((b, l), bool).at[jnp.arange(b)[:, None], cols].set(True)
    pad = jnp.zeros((a,), seq_onehot.dtype).at[a - 1].set(1.0)
    return jnp.where(sel[..., None], pad, seq_onehot)


@partial(jax.jit, static_argnames=("ssl", "structure_pad_count",
                                   "sequence_pad_count", "maskable_len",
                                   "rotate"))
def augment_comparative(batch, key: jax.Array, *, ssl: bool = False,
                        structure_pad_count: int = 0,
                        sequence_pad_count: int = 0, maskable_len: int = 0,
                        rotate: bool = False):
    """Paired transforms: independent rotations per branch
    (util_dataloader.py:38-42), same-class SSL masking, same sequence mask
    positions in both branches (immmunopred_dataloader.py:216-231)."""
    from immunostruct_tpu.structs import ComparativeBatch
    c, w = batch.cancer, batch.wt
    keys = jax.random.split(key, 6)
    onehot_c, onehot_w = c.graph.node_feat, w.graph.node_feat
    coords_c, coords_w = c.graph.coords, w.graph.coords
    aux = c.aux_residue

    if rotate:
        qc = random_rotations(keys[0], coords_c.shape[0]).astype(coords_c.dtype)
        qw = random_rotations(keys[1], coords_w.shape[0]).astype(coords_w.dtype)
        coords_c = jnp.einsum("bnc,bcd->bnd", coords_c, qc)
        coords_w = jnp.einsum("bnc,bcd->bnd", coords_w, qw)
    if ssl:
        onehot_c, onehot_w, aux = ssl_mask_paired(keys[2], onehot_c, onehot_w)
    if structure_pad_count > 0:
        onehot_c = structure_mask(keys[3], onehot_c, structure_pad_count)
        onehot_w = structure_mask(keys[4], onehot_w, structure_pad_count)

    seq_c, seq_w = c.seq_onehot, w.seq_onehot
    if sequence_pad_count > 0 and maskable_len > 0:
        b_, l_, a_ = seq_c.shape
        cols = _topk_positions(keys[5], b_, maskable_len, sequence_pad_count)
        sel = jnp.zeros((b_, l_), bool).at[jnp.arange(b_)[:, None], cols].set(True)
        pad = jnp.zeros((a_,), seq_c.dtype).at[a_ - 1].set(1.0)
        seq_c = jnp.where(sel[..., None], pad, seq_c)
        seq_w = jnp.where(sel[..., None], pad, seq_w)

    def rebuild(s, onehot, coords, seq):
        g = s.graph
        graph = GraphBatch(node_feat=onehot, coords=coords, edge_src=g.edge_src,
                           edge_dst=g.edge_dst, edge_feat=g.edge_feat,
                           edge_mask=g.edge_mask, node_mask=g.node_mask,
                           num_nodes=g.num_nodes)
        return SampleBatch(graph=graph, seq_onehot=seq, props=s.props,
                           target=s.target, aux_residue=aux)

    return ComparativeBatch(cancer=rebuild(c, onehot_c, coords_c, seq_c),
                            wt=rebuild(w, onehot_w, coords_w, seq_w))


@partial(jax.jit, static_argnames=("ssl", "structure_pad_count",
                                   "sequence_pad_count", "maskable_len",
                                   "rotate"))
def augment_batch(batch: SampleBatch, key: jax.Array, *, ssl: bool = False,
                  structure_pad_count: int = 0, sequence_pad_count: int = 0,
                  maskable_len: int = 0, rotate: bool = False) -> SampleBatch:
    """Apply the train-time transforms on device. Returns a new batch whose
    aux_residue carries the SSL class (or the input's aux when ssl=False)."""
    k_rot, k_ssl, k_struct, k_seq = jax.random.split(key, 4)
    g = batch.graph
    coords = g.coords
    onehot = g.node_feat
    aux = batch.aux_residue

    if rotate:
        q = random_rotations(k_rot, coords.shape[0]).astype(coords.dtype)
        coords = jnp.einsum("bnc,bcd->bnd", coords, q)
    if ssl:
        onehot, classes = ssl_mask_single(k_ssl, onehot)
        aux = classes
    if structure_pad_count > 0:
        onehot = structure_mask(k_struct, onehot, structure_pad_count)

    seq = batch.seq_onehot
    if sequence_pad_count > 0:
        seq = sequence_mask(k_seq, seq, maskable_len, sequence_pad_count)

    graph = GraphBatch(node_feat=onehot, coords=coords, edge_src=g.edge_src,
                       edge_dst=g.edge_dst, edge_feat=g.edge_feat,
                       edge_mask=g.edge_mask, node_mask=g.node_mask,
                       num_nodes=g.num_nodes)
    return SampleBatch(graph=graph, seq_onehot=seq, props=batch.props,
                       target=batch.target, aux_residue=aux)
