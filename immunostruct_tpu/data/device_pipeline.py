"""Device-resident corpus pipeline: zero per-step host work.

The host BatchPipeline assembles every batch in numpy and pays an H2D copy
per step. For the default training configuration (no SSL masking, no
sequence masking, no graph augmentation — which is exactly the reference's
effective non-SSL path, see data/pipeline.py notes) batches are pure row
gathers, so the whole corpus can live in HBM once and batches become a
single on-device gather:

  - one-hots stored uint8 (4x smaller than f32; cast per batch on device),
  - a ~27K-structure corpus at reference shapes is ~1.2 GB — comfortably
    HBM-resident on one v5e chip,
  - per-epoch shuffling stays host-side (tiny index arrays), the gather is
    jitted and feeds the jitted train step directly.

Use DevicePipeline freely (device_augment=True covers augmented/SSL
configurations on device); fall back to
BatchPipeline otherwise (it asserts).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from immunostruct_tpu.structs import GraphBatch, SampleBatch
from immunostruct_tpu.data.dataset import ImmunoDataset


@dataclasses.dataclass
class DeviceCorpus:
    """All rows + unique graphs resident on device."""

    seq: jax.Array          # [M, L, 21] uint8 (full or peptide, chosen at build)
    props: jax.Array        # [M, 2] f32
    target: jax.Array       # [M] f32 (immuno or normalized foreignness)
    graph_idx: jax.Array    # [M] int32
    node_onehot: jax.Array  # [G, N, 20] uint8
    coords: jax.Array       # [G, N, 3] f32
    edge_src: jax.Array     # [G, E] int32
    edge_dst: jax.Array     # [G, E] int32
    edge_mask: jax.Array    # [G, E] bool
    node_mask: jax.Array    # [G, N] bool
    num_nodes: jax.Array    # [G] int32


jax.tree_util.register_dataclass(
    DeviceCorpus,
    data_fields=["seq", "props", "target", "graph_idx", "node_onehot",
                 "coords", "edge_src", "edge_dst", "edge_mask", "node_mask",
                 "num_nodes"],
    meta_fields=[])


# one upload per (dataset, binary, full, device): train/val/test pipelines
# over the same dataset — and successive curriculum stages reusing it —
# share a single HBM-resident corpus instead of each uploading a copy
# (peak-HBM fix: previously up to 5 simultaneous copies across a stage
# transition). Keyed by id(dataset) with a weakref guard (the dataset
# dataclass is unhashable, so no WeakKeyDictionary); dead entries are
# swept on every access so corpora die with their datasets.
import weakref

_CORPUS_CACHE: dict = {}  # id(ds) -> (weakref.ref(ds), {key: corpus})


def _corpus_cache_for(ds) -> dict:
    for k in [k for k, (ref, _) in _CORPUS_CACHE.items() if ref() is None]:
        del _CORPUS_CACHE[k]
    entry = _CORPUS_CACHE.get(id(ds))
    if entry is None or entry[0]() is not ds:
        key = id(ds)
        # eager eviction: drop the entry (and its HBM buffers) the moment
        # the dataset is collected, instead of waiting for the next
        # pipeline construction to sweep it — without this, a multi-GB
        # corpus whose dataset died would stay device-resident for the
        # process lifetime if no further pipelines were ever built
        entry = (weakref.ref(ds, lambda _ref, _k=key: _CORPUS_CACHE.pop(_k, None)),
                 {})
        _CORPUS_CACHE[key] = entry
    return entry[1]


# process-wide ledger of corpora admitted by the CLI's device-data "auto"
# heuristic: id(ds) -> (weakref, bytes). Entries vanish with their datasets
# (same lifetime discipline as _CORPUS_CACHE) so the global budget tracks
# only corpora that can still be device-resident.
_ADMITTED: dict = {}


def note_admitted(ds, nbytes: int) -> None:
    """Record that auto admitted ``nbytes`` of device corpus for ``ds``."""
    key = id(ds)
    _ADMITTED[key] = (
        weakref.ref(ds, lambda _ref, _k=key: _ADMITTED.pop(_k, None)), nbytes)


def admitted_device_bytes() -> int:
    """Total bytes auto has admitted for datasets that are still alive."""
    return sum(n for ref, n in _ADMITTED.values() if ref() is not None)


def estimate_device_bytes(ds, *, full: bool = True) -> int:
    """Bytes build_device_corpus would upload, computed from the SAME
    fields it uploads (sequences and node one-hots go up as uint8).
    Handles paired (comparative) datasets via their cancer/wt halves."""
    if hasattr(ds, "cancer") and hasattr(ds, "wt"):
        return (estimate_device_bytes(ds.cancer, full=full)
                + estimate_device_bytes(ds.wt, full=full))
    seq = ds.seq_full if full else ds.seq_pep
    g = ds.graphs
    m = seq.shape[0]
    return int(
        seq.size                      # uint8 on device
        + m * (2 * 4 + 4 + 4)         # props f32, target f32, graph_idx i32
        + g.node_onehot.size          # uint8 on device
        + g.coords.size * 4
        + g.edge_src.size * 4 + g.edge_dst.size * 4
        + g.edge_mask.size + g.node_mask.size
        + g.num_nodes.size * 4)


def build_device_corpus(ds: ImmunoDataset, *, binary: bool, full: bool,
                        device=None) -> DeviceCorpus:
    # cache the BIG fields (sequences, graphs) per (full, device) only; the
    # target vector is the one [M]-float field that depends on ``binary``,
    # so curriculum stages flipping binary (train_Cancer_wFT stages 2->3)
    # share one corpus upload instead of keeping two resident
    cache_key = (bool(full), id(device))
    per_ds = _corpus_cache_for(ds)
    base = per_ds.get(cache_key)
    if base is None:
        base = _build_device_corpus(ds, binary=binary, full=full,
                                    device=device)
        per_ds[cache_key] = base
    target = ds.immuno if binary else ds.foreign_norm
    return dataclasses.replace(
        base, target=jax.device_put(target, device=device))


def _build_device_corpus(ds: ImmunoDataset, *, binary: bool, full: bool,
                         device=None) -> DeviceCorpus:
    seq = ds.seq_full if full else ds.seq_pep
    target = ds.immuno if binary else ds.foreign_norm
    g = ds.graphs
    put = partial(jax.device_put, device=device)
    return DeviceCorpus(
        seq=put(seq.astype(np.uint8)),
        props=put(getattr(ds, "props_filled", ds.props)),
        target=put(target),
        graph_idx=put(ds.graph_idx),
        node_onehot=put(g.node_onehot),
        coords=put(g.coords),
        edge_src=put(g.edge_src),
        edge_dst=put(g.edge_dst),
        edge_mask=put(g.edge_mask),
        node_mask=put(g.node_mask),
        num_nodes=put(g.num_nodes),
    )


@jax.jit
def gather_batch(corpus: DeviceCorpus, rows: jax.Array) -> SampleBatch:
    """[B] row indices -> SampleBatch, entirely on device."""
    gi = corpus.graph_idx[rows]
    e = corpus.edge_src.shape[1]
    graph = GraphBatch(
        node_feat=corpus.node_onehot[gi].astype(jnp.float32),
        coords=corpus.coords[gi],
        edge_src=corpus.edge_src[gi],
        edge_dst=corpus.edge_dst[gi],
        edge_feat=jnp.ones((rows.shape[0], e, 1), jnp.float32),
        edge_mask=corpus.edge_mask[gi],
        node_mask=corpus.node_mask[gi],
        num_nodes=corpus.num_nodes[gi],
    )
    return SampleBatch(
        graph=graph,
        seq_onehot=corpus.seq[rows].astype(jnp.float32),
        props=corpus.props[rows],
        target=corpus.target[rows],
        aux_residue=None,
    )


class DevicePipeline:
    """BatchPipeline-compatible iterator over a device-resident corpus.

    Augmented/SSL configurations run their transforms on device
    (device_augment=True -> data/device_augment.py inside jit; validated
    on TPU hardware in round 2); without it, construction asserts the
    augmentation flags are off.
    """

    def __init__(self, dataset: ImmunoDataset, indices: np.ndarray, *,
                 split: str, binary: bool, full: bool, config,
                 ssl: bool = False, shuffle: Optional[bool] = None,
                 batch_size: Optional[int] = None, extend_to: int = 0,
                 pad_final_batch: Optional[bool] = None, device=None,
                 device_augment: bool = False):
        # padding duplicates samples, which is fine for SGD but would bias
        # eval metrics: default on for training splits only
        if pad_final_batch is None:
            pad_final_batch = (split == "train")
        # only transforms that actually reach the model need device_augment:
        # graph rotation/masking applies on SSL or forced paths only (the
        # host pipeline's return-original-graph quirk, data/pipeline.py),
        # and sequence masking applies only to full-chain inputs
        wants_augment = (ssl or config.force_graph_augmentation
                         or (config.sequence_pad_count > 0 and full))
        if wants_augment and not device_augment:
            raise ValueError(
                "this configuration needs train-time augmentation; pass "
                "device_augment=True (jax-PRNG transforms on device) or use "
                "the host BatchPipeline")
        self.ssl = ssl
        self.device_augment = device_augment and wants_augment
        self.maskable_len = dataset.seq_full.shape[1] - dataset.seq_pep.shape[1]
        self.full = full
        self.corpus = build_device_corpus(dataset, binary=binary, full=full,
                                          device=device)
        self.indices = np.asarray(indices, np.int64)
        if extend_to and len(self.indices) < extend_to:
            reps = int(np.ceil(extend_to / len(self.indices)))
            self.indices = np.tile(self.indices, reps)[:extend_to]
        self.config = config
        self.split = split
        self.batch_size = batch_size or config.batch_size
        self.shuffle = (split == "train") if shuffle is None else shuffle
        self.pad_final_batch = pad_final_batch
        self._epoch = 0

    def __len__(self):
        return int(np.ceil(len(self.indices) / self.batch_size))

    def _maybe_augment(self, batch: SampleBatch, epoch: int, step: int) -> SampleBatch:
        train = self.split == "train"
        if not train:
            if self.ssl:
                # val/test SSL passes the no-op sentinel (train_SSL.py:46)
                return SampleBatch(graph=batch.graph, seq_onehot=batch.seq_onehot,
                                   props=batch.props, target=batch.target,
                                   aux_residue=jnp.full(
                                       (batch.target.shape[0],), -1, jnp.int32))
            return batch
        if not self.device_augment:
            return batch
        from immunostruct_tpu.data.device_augment import augment_batch
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.key(self.config.seed), epoch), step)
        # graph transforms reach the model on the SSL path only unless forced
        # (host-pipeline/reference parity; see data/pipeline.py notes)
        graph_augment = self.ssl or self.config.force_graph_augmentation
        return augment_batch(
            batch, key, ssl=self.ssl,
            structure_pad_count=self.config.structure_pad_count if graph_augment else 0,
            sequence_pad_count=self.config.sequence_pad_count if self.full else 0,
            maskable_len=self.maskable_len,
            rotate=graph_augment)

    def epoch(self, epoch_idx: Optional[int] = None) -> Iterator[SampleBatch]:
        e = self._epoch if epoch_idx is None else epoch_idx
        self._epoch = e + 1
        rng = np.random.default_rng((self.config.seed, e, 0x5eed))
        order = rng.permutation(len(self.indices)) if self.shuffle \
            else np.arange(len(self.indices))
        idx = self.indices[order]
        for step, start in enumerate(range(0, len(idx), self.batch_size)):
            rows = idx[start:start + self.batch_size]
            if self.pad_final_batch and len(rows) < self.batch_size:
                fill = np.resize(idx, self.batch_size - len(rows))
                rows = np.concatenate([rows, fill])
            batch = gather_batch(self.corpus, jnp.asarray(rows.astype(np.int32)))
            yield self._maybe_augment(batch, e, step)

    def __iter__(self):
        return self.epoch()


class ComparativeDevicePipeline(DevicePipeline):
    """Paired cancer/WT device pipeline yielding ComparativeBatch."""

    def __init__(self, dataset, indices: np.ndarray, **kw):
        from immunostruct_tpu.data.dataset import ComparativeDataset
        assert isinstance(dataset, ComparativeDataset)
        super().__init__(dataset.cancer, indices, **kw)
        binary = kw.get("binary", True)
        full = kw.get("full", True)
        # WT branch scores against the cancer-side target (collate parity)
        self.corpus_wt = build_device_corpus(dataset.wt, binary=binary, full=full,
                                             device=kw.get("device"))

    def _maybe_augment_pair(self, batch, epoch: int, step: int):
        from immunostruct_tpu.structs import ComparativeBatch
        train = self.split == "train"
        if not train:
            if self.ssl:
                sentinel = jnp.full((batch.cancer.target.shape[0],), -1, jnp.int32)

                def with_aux(s):
                    return SampleBatch(graph=s.graph, seq_onehot=s.seq_onehot,
                                       props=s.props, target=s.target,
                                       aux_residue=sentinel)

                return ComparativeBatch(cancer=with_aux(batch.cancer),
                                        wt=with_aux(batch.wt))
            return batch
        if not self.device_augment:
            return batch
        from immunostruct_tpu.data.device_augment import augment_comparative
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.key(self.config.seed), epoch), step)
        graph_augment = self.ssl or self.config.force_graph_augmentation
        return augment_comparative(
            batch, key, ssl=self.ssl,
            structure_pad_count=self.config.structure_pad_count if graph_augment else 0,
            sequence_pad_count=self.config.sequence_pad_count if self.full else 0,
            maskable_len=self.maskable_len,
            rotate=graph_augment)

    def epoch(self, epoch_idx: Optional[int] = None):
        from immunostruct_tpu.structs import ComparativeBatch
        e = self._epoch if epoch_idx is None else epoch_idx
        self._epoch = e + 1
        rng = np.random.default_rng((self.config.seed, e, 0x5eed))
        order = rng.permutation(len(self.indices)) if self.shuffle \
            else np.arange(len(self.indices))
        idx = self.indices[order]
        for step, start in enumerate(range(0, len(idx), self.batch_size)):
            rows = idx[start:start + self.batch_size]
            if self.pad_final_batch and len(rows) < self.batch_size:
                fill = np.resize(idx, self.batch_size - len(rows))
                rows = np.concatenate([rows, fill])
            rows_j = jnp.asarray(rows.astype(np.int32))
            cancer = gather_batch(self.corpus, rows_j)
            wt = gather_batch(self.corpus_wt, rows_j)
            # targets come from the cancer side (immmunopred_dataloader.py:279-285)
            wt = SampleBatch(graph=wt.graph, seq_onehot=wt.seq_onehot,
                             props=wt.props, target=cancer.target,
                             aux_residue=None)
            yield self._maybe_augment_pair(
                ComparativeBatch(cancer=cancer, wt=wt), e, step)
