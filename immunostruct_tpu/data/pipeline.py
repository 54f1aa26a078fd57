"""Host-side batch pipeline: split views, augmentation, device feed.

Replaces SplitDataset + GraphDataLoader + collate
(reference: data/util_dataloader.py:11-102, data/utils.py:160-196,
train_IEDB_wFT.py:86-87) with vectorized numpy batch assembly feeding
jit-ready ``SampleBatch``/``ComparativeBatch`` pytrees.

Reference-parity notes:
- label selection: binary -> immunogenicity, else normalized foreignness
  (util_dataloader.py:82-86); full -> full-chain one-hot, else peptide.
- sequence masking (train, sequence_pad_count > 0): mask positions are drawn
  from the first (L_full - L_pep) *padded* positions — the HLA region
  (immmunopred_dataloader.py:78-89). Comparative masks the same positions in
  cancer and WT (immmunopred_dataloader.py:216-231).
- graph augmentation (random rotation of coordinates, structure masking, SSL
  single-residue masking) only reaches the model on the SSL path: the
  reference's SplitDataset computes an augmented copy but returns the
  original graph in non-SSL branches (util_dataloader.py:82-86 return d[0]).
  Reproduced faithfully; set config.force_graph_augmentation=True to enable
  rotation for all training (documented improvement).
- SSL single-residue masking marks a random real residue's one-hot as
  all-ones and returns its class (immmunopred_dataloader.py:104-115); the
  comparative variant masks residues of the same class in both graphs
  (immmunopred_dataloader.py:253-271).
- ExtendedDataset: small finetune sets are cycled up to a floor length
  (util_dataloader.py:91-102); here ``extend_to`` repeats indices.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from immunostruct_tpu.structs import GraphBatch, SampleBatch, ComparativeBatch
from immunostruct_tpu.data.dataset import ImmunoDataset, ComparativeDataset


def prefetch(iterator, size: int = 2):
    """Double-buffered host prefetch: assemble the next batch (numpy work +
    H2D transfer) on a background thread while the device runs the current
    step — keeps featurization off the critical path (SURVEY.md section 7,
    hard part f)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - re-raised on consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def _random_rotations(rng: np.random.Generator, count: int) -> np.ndarray:
    """Batch of QR-orthogonalized random 3x3 matrices (data/utils.py:148-155)."""
    m = rng.standard_normal((count, 3, 3))
    q, _ = np.linalg.qr(m)
    return q.astype(np.float32)


def _mask_sequence_batch(rng, seq: np.ndarray, maskable_len: int, count: int,
                         cols: Optional[np.ndarray] = None):
    """Mask `count` random positions per row within [0, maskable_len).

    Pass precomputed ``cols`` [B, count] to mask the SAME positions across
    paired sequences (the comparative requirement,
    immmunopred_dataloader.py:216-231).
    """
    if count <= 0 or maskable_len <= 0:
        return seq
    b, _, a = seq.shape
    pad_onehot = np.zeros((a,), np.float32)
    pad_onehot[a - 1] = 1.0  # 'J' is the last alphabet channel
    if cols is None:
        cols = _mask_positions(rng, b, maskable_len, count)
    rows = np.repeat(np.arange(b), count)
    seq = seq.copy()
    seq[rows, cols.reshape(-1)] = pad_onehot
    return seq


def _mask_positions(rng, batch: int, maskable_len: int, count: int) -> np.ndarray:
    """[B, count] distinct positions per row in [0, maskable_len)."""
    return np.argsort(rng.random((batch, maskable_len)), axis=1)[:, :count]


def _mask_structure_batch(rng, onehot: np.ndarray, count: int):
    """Zero `count` random node rows unless already SSL-masked (sum > 1)."""
    if count <= 0:
        return onehot
    b, n, _ = onehot.shape
    cols = np.argsort(rng.random((b, n)), axis=1)[:, :count]
    onehot = onehot.copy()
    for j in range(count):
        idx = cols[:, j]
        rows_sum = onehot[np.arange(b), idx].sum(-1)
        zero_it = rows_sum <= 1
        onehot[np.nonzero(zero_it)[0], idx[zero_it]] = 0.0
    return onehot


def _ssl_mask_single(rng, onehot: np.ndarray, num_nodes: np.ndarray):
    """Mask one random real residue per graph as all-ones; return its class."""
    b, n, c = onehot.shape
    classes = np.full((b,), 0, np.int32)
    onehot = onehot.copy()
    for i in range(b):
        real = np.nonzero(onehot[i].sum(-1) == 1)[0]
        if len(real) == 0:
            continue
        pick = real[rng.integers(0, len(real))]
        classes[i] = int(np.argmax(onehot[i, pick]))
        onehot[i, pick] = 1.0
    return onehot, classes


def _ssl_mask_paired(rng, onehot_c: np.ndarray, onehot_w: np.ndarray):
    """Mask same-class residues in the cancer/WT pair; return the class."""
    b = onehot_c.shape[0]
    classes = np.full((b,), 0, np.int32)
    onehot_c, onehot_w = onehot_c.copy(), onehot_w.copy()
    for i in range(b):
        real_c = np.nonzero(onehot_c[i].sum(-1) == 1)[0]
        real_w_cls = onehot_w[i].argmax(-1)
        real_w_valid = onehot_w[i].sum(-1) == 1
        rng.shuffle(real_c)
        for pick in real_c:
            cls = int(np.argmax(onehot_c[i, pick]))
            cand = np.nonzero(real_w_valid & (real_w_cls == cls))[0]
            if len(cand):
                pick_w = cand[rng.integers(0, len(cand))]
                onehot_c[i, pick] = 1.0
                onehot_w[i, pick_w] = 1.0
                classes[i] = cls
                break
    return onehot_c, onehot_w, classes


class BatchPipeline:
    """Epoch iterator over a split of an ImmunoDataset."""

    def __init__(self, dataset: ImmunoDataset, indices: np.ndarray, *,
                 split: str, binary: bool, full: bool, config,
                 ssl: bool = False, shuffle: Optional[bool] = None,
                 batch_size: Optional[int] = None, extend_to: int = 0,
                 pad_final_batch: bool = False):
        """``pad_final_batch``: repeat samples to fill the trailing partial
        batch so every step shares one compiled shape (one less XLA program;
        slightly re-weights the loss on the final step — off by default for
        reference parity)."""
        self.ds = dataset
        self.indices = np.asarray(indices, np.int64)
        self.pad_final_batch = pad_final_batch
        if extend_to and len(self.indices) < extend_to:
            reps = int(np.ceil(extend_to / len(self.indices)))
            self.indices = np.tile(self.indices, reps)[:extend_to]
        self.split = split
        self.binary = binary
        self.full = full
        self.ssl = ssl
        self.config = config
        self.batch_size = batch_size or config.batch_size
        self.shuffle = (split == "train") if shuffle is None else shuffle
        self._epoch = 0

    def __len__(self):
        return int(np.ceil(len(self.indices) / self.batch_size))

    @property
    def maskable_len(self) -> int:
        return self.ds.seq_full.shape[1] - self.ds.seq_pep.shape[1]

    def _assemble_graph(self, rng, rows: np.ndarray):
        g = self.ds.graphs
        gi = self.ds.graph_idx[rows]
        onehot = g.node_onehot[gi].astype(np.float32)
        coords = g.coords[gi]
        classes = None
        train = self.split == "train"
        augment = train and (self.ssl or self.config.force_graph_augmentation)
        if augment:
            rot = _random_rotations(rng, len(rows))
            coords = np.einsum("bnc,bcd->bnd", coords, rot)
            if self.ssl:
                onehot, classes = _ssl_mask_single(rng, onehot, g.num_nodes[gi])
            if self.config.structure_pad_count > 0:
                onehot = _mask_structure_batch(rng, onehot, self.config.structure_pad_count)
        graph = GraphBatch(
            node_feat=jnp.asarray(onehot), coords=jnp.asarray(coords),
            edge_src=jnp.asarray(g.edge_src[gi]), edge_dst=jnp.asarray(g.edge_dst[gi]),
            edge_feat=jnp.ones((len(rows), g.max_edges, 1), jnp.float32),
            edge_mask=jnp.asarray(g.edge_mask[gi]),
            node_mask=jnp.asarray(g.node_mask[gi]),
            num_nodes=jnp.asarray(g.num_nodes[gi]),
        )
        return graph, classes

    def _assemble(self, rng, rows: np.ndarray) -> SampleBatch:
        graph, classes = self._assemble_graph(rng, rows)
        if self.full:
            seq = self.ds.seq_full[rows]
            if self.split == "train" and self.config.sequence_pad_count > 0:
                seq = _mask_sequence_batch(rng, seq, self.maskable_len,
                                           self.config.sequence_pad_count)
        else:
            seq = self.ds.seq_pep[rows]
        target = self.ds.immuno[rows] if self.binary else self.ds.foreign_norm[rows]
        aux = None
        if self.ssl:
            if classes is None or self.split != "train":
                # val/test pass no-op residues (train_SSL.py:46 passes empties)
                aux = jnp.full((len(rows),), -1, jnp.int32)
            else:
                aux = jnp.asarray(classes)
        # clinical datasets expose a zero-filled copy of their NaN-marked props
        props = getattr(self.ds, "props_filled", self.ds.props)
        return SampleBatch(graph=graph, seq_onehot=jnp.asarray(seq),
                           props=jnp.asarray(props[rows]),
                           target=jnp.asarray(target), aux_residue=aux)

    def epoch(self, epoch_idx: Optional[int] = None) -> Iterator[SampleBatch]:
        e = self._epoch if epoch_idx is None else epoch_idx
        self._epoch = e + 1
        rng = np.random.default_rng((self.config.seed, e, 0x5eed))
        order = rng.permutation(len(self.indices)) if self.shuffle \
            else np.arange(len(self.indices))
        idx = self.indices[order]
        for start in range(0, len(idx), self.batch_size):
            rows = idx[start:start + self.batch_size]
            if self.pad_final_batch and len(rows) < self.batch_size:
                fill = idx[:self.batch_size - len(rows)]
                if len(fill) < self.batch_size - len(rows):
                    fill = np.resize(idx, self.batch_size - len(rows))
                rows = np.concatenate([rows, fill])
            yield self._assemble(rng, rows)

    def __iter__(self):
        return self.epoch()


class ComparativePipeline(BatchPipeline):
    """Paired cancer/WT pipeline yielding ComparativeBatch."""

    def __init__(self, dataset: ComparativeDataset, indices: np.ndarray, **kw):
        self.pair = dataset
        super().__init__(dataset.cancer, indices, **kw)
        self.wt = dataset.wt

    def _assemble(self, rng, rows: np.ndarray) -> ComparativeBatch:
        train = self.split == "train"
        gc_, gw_ = self.ds.graphs, self.wt.graphs
        gi_c, gi_w = self.ds.graph_idx[rows], self.wt.graph_idx[rows]
        onehot_c = gc_.node_onehot[gi_c].astype(np.float32)
        onehot_w = gw_.node_onehot[gi_w].astype(np.float32)
        coords_c, coords_w = gc_.coords[gi_c], gw_.coords[gi_w]
        classes = None
        augment = train and (self.ssl or self.config.force_graph_augmentation)
        if augment:
            # independent rotations per branch (util_dataloader.py:38-42)
            coords_c = np.einsum("bnc,bcd->bnd", coords_c, _random_rotations(rng, len(rows)))
            coords_w = np.einsum("bnc,bcd->bnd", coords_w, _random_rotations(rng, len(rows)))
            if self.ssl:
                onehot_c, onehot_w, classes = _ssl_mask_paired(rng, onehot_c, onehot_w)
            if self.config.structure_pad_count > 0:
                onehot_c = _mask_structure_batch(rng, onehot_c, self.config.structure_pad_count)
                onehot_w = _mask_structure_batch(rng, onehot_w, self.config.structure_pad_count)

        def graph(g, gi, onehot, coords):
            return GraphBatch(
                node_feat=jnp.asarray(onehot), coords=jnp.asarray(coords),
                edge_src=jnp.asarray(g.edge_src[gi]), edge_dst=jnp.asarray(g.edge_dst[gi]),
                edge_feat=jnp.ones((len(rows), g.max_edges, 1), jnp.float32),
                edge_mask=jnp.asarray(g.edge_mask[gi]),
                node_mask=jnp.asarray(g.node_mask[gi]),
                num_nodes=jnp.asarray(g.num_nodes[gi]),
            )

        if self.full:
            seq_c, seq_w = self.ds.seq_full[rows], self.wt.seq_full[rows]
            if train and self.config.sequence_pad_count > 0:
                # same mask positions in both branches
                cols = _mask_positions(rng, len(rows), self.maskable_len,
                                       self.config.sequence_pad_count)
                seq_c = _mask_sequence_batch(rng, seq_c, self.maskable_len,
                                             self.config.sequence_pad_count, cols)
                seq_w = _mask_sequence_batch(rng, seq_w, self.maskable_len,
                                             self.config.sequence_pad_count, cols)
        else:
            seq_c, seq_w = self.ds.seq_pep[rows], self.wt.seq_pep[rows]

        target = self.ds.immuno[rows] if self.binary else self.ds.foreign_norm[rows]
        aux = None
        if self.ssl:
            aux = jnp.asarray(classes) if (classes is not None and train) \
                else jnp.full((len(rows),), -1, jnp.int32)

        target_j = jnp.asarray(target)
        cancer = SampleBatch(graph=graph(gc_, gi_c, onehot_c, coords_c),
                             seq_onehot=jnp.asarray(seq_c),
                             props=jnp.asarray(self.ds.props[rows]),
                             target=target_j, aux_residue=aux)
        wt = SampleBatch(graph=graph(gw_, gi_w, onehot_w, coords_w),
                         seq_onehot=jnp.asarray(seq_w),
                         props=jnp.asarray(self.wt.props[rows]),
                         target=target_j, aux_residue=aux)
        return ComparativeBatch(cancer=cancer, wt=wt)
