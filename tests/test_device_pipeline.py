"""Device-resident pipeline: batch equality with the host pipeline and
training integration."""

import jax
import numpy as np
import pytest

from immunostruct_tpu.config import Config
from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset, BatchPipeline
from immunostruct_tpu.data.device_pipeline import DevicePipeline


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("devpipe")
    cfg = Config(batch_size=8, pad_nodes_multiple=4, pad_edges_multiple=16,
                 compute_dtype="float32", aggregation="scatter")
    gd, pp, hp = synthetic_corpus(str(root), num_samples=16, seed=71)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    return cfg, ds


def test_batches_match_host_pipeline(setup):
    cfg, ds = setup
    idx = np.arange(len(ds))
    host = BatchPipeline(ds, idx, split="val", binary=True, full=True,
                         config=cfg, shuffle=False)
    dev = DevicePipeline(ds, idx, split="val", binary=True, full=True,
                         config=cfg, shuffle=False, pad_final_batch=False)
    for hb, db in zip(host.epoch(0), dev.epoch(0)):
        np.testing.assert_array_equal(np.asarray(hb.seq_onehot),
                                      np.asarray(db.seq_onehot))
        np.testing.assert_array_equal(np.asarray(hb.target), np.asarray(db.target))
        np.testing.assert_array_equal(np.asarray(hb.graph.node_feat),
                                      np.asarray(db.graph.node_feat))
        np.testing.assert_array_equal(np.asarray(hb.graph.edge_src),
                                      np.asarray(db.graph.edge_src))
        np.testing.assert_array_equal(np.asarray(hb.graph.edge_mask),
                                      np.asarray(db.graph.edge_mask))
        np.testing.assert_allclose(np.asarray(hb.graph.coords),
                                   np.asarray(db.graph.coords), rtol=1e-6)


def test_same_shuffle_order_as_host(setup):
    cfg, ds = setup
    idx = np.arange(len(ds))
    host = BatchPipeline(ds, idx, split="train", binary=False, full=True, config=cfg)
    dev = DevicePipeline(ds, idx, split="train", binary=False, full=True,
                         config=cfg, pad_final_batch=False)
    th = np.concatenate([np.asarray(b.target) for b in host.epoch(3)])
    td = np.concatenate([np.asarray(b.target) for b in dev.epoch(3)])
    np.testing.assert_array_equal(th, td)


def test_trains(setup, tmp_path):
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    cfg, ds = setup
    idx = np.arange(len(ds))
    dev = DevicePipeline(ds, idx, split="train", binary=True, full=True, config=cfg)
    vae_dim = ds.seq_full.shape[1] * 21
    spec, params = build_model("HybridModel", vae_dim, jax.random.key(0))
    trainer = Trainer(spec, LossConfig(vae_dim, 1.0, sequence=True), binary=True,
                      optimizer=make_optimizer("adam", constant_lr(1e-3)),
                      aggregation="scatter", donate=False)
    state = trainer.init_state(params)
    state, hist = trainer.fit(state, dev, dev, 1, jax.random.key(1), verbose=False)
    assert np.isfinite(hist["train_loss"]).all()


def test_comparative_device_matches_host(tmp_path):
    from immunostruct_tpu.data import synthetic_comparative_corpus, ComparativeDataset, ComparativePipeline
    from immunostruct_tpu.data.device_pipeline import ComparativeDevicePipeline
    cfg = Config(batch_size=8, pad_nodes_multiple=4, pad_edges_multiple=16,
                 compute_dtype="float32", aggregation="scatter")
    dc, dw, pc, pw, hp = synthetic_comparative_corpus(str(tmp_path), num_samples=10, seed=72)
    ds = ComparativeDataset.load(cfg, dc, dw, pc, pw, hp)
    idx = np.arange(len(ds))
    host = ComparativePipeline(ds, idx, split="val", binary=True, full=True,
                               config=cfg, shuffle=False)
    dev = ComparativeDevicePipeline(ds, idx, split="val", binary=True, full=True,
                                    config=cfg, shuffle=False, pad_final_batch=False)
    for hb, db in zip(host.epoch(0), dev.epoch(0)):
        np.testing.assert_array_equal(np.asarray(hb.cancer.target),
                                      np.asarray(db.cancer.target))
        np.testing.assert_array_equal(np.asarray(hb.wt.target),
                                      np.asarray(db.wt.target))
        np.testing.assert_array_equal(np.asarray(hb.wt.seq_onehot),
                                      np.asarray(db.wt.seq_onehot))
        np.testing.assert_array_equal(np.asarray(hb.cancer.graph.node_feat),
                                      np.asarray(db.cancer.graph.node_feat))


def test_rejects_augmentation_flags(setup):
    cfg, ds = setup
    import dataclasses
    cfg2 = dataclasses.replace(cfg, sequence_pad_count=2)
    with pytest.raises(ValueError):
        DevicePipeline(ds, np.arange(4), split="train", binary=True, full=True,
                       config=cfg2)  # augmentation requires device_augment=True


def test_pick_pipeline_auto_and_forced(setup):
    """device_data=None ('auto') picks host off-TPU; True/False force."""
    import dataclasses
    import numpy as np
    from immunostruct_tpu.cli.common import pick_pipeline
    from immunostruct_tpu.data.device_pipeline import estimate_device_bytes
    from immunostruct_tpu.data import BatchPipeline
    from immunostruct_tpu.data.device_pipeline import DevicePipeline

    cfg, ds = setup
    cfg = dataclasses.replace(cfg)
    idx = np.arange(8)
    kw = dict(split="train", binary=True, full=True, config=cfg)

    cfg.device_data = None
    auto = pick_pipeline(cfg, comparative=False, ssl=False)
    pipe = auto(ds, idx, **kw)
    # tests run on CPU (conftest): auto must land on the host pipeline
    assert isinstance(pipe, BatchPipeline)

    cfg.device_data = False
    assert pick_pipeline(cfg, comparative=False, ssl=False) is BatchPipeline

    cfg.device_data = True
    forced = pick_pipeline(cfg, comparative=False, ssl=False)
    pipe = forced(ds, idx, **kw)
    assert isinstance(pipe, DevicePipeline)

    assert estimate_device_bytes(ds) > 0


def test_device_corpus_shared_across_pipelines(setup):
    """Pipelines over the same dataset reuse ONE uploaded corpus (the
    peak-HBM fix: train/val/test + stage transitions previously each
    uploaded a copy)."""
    import numpy as np
    from immunostruct_tpu.data.device_pipeline import DevicePipeline

    cfg, ds = setup
    a = DevicePipeline(ds, np.arange(8), split="train", binary=True,
                       full=True, config=cfg)
    b = DevicePipeline(ds, np.arange(8, 16), split="val", binary=True,
                       full=True, config=cfg)
    # corpora are rebuilt objects sharing the uploaded big fields
    assert a.corpus.node_onehot is b.corpus.node_onehot
    assert a.corpus.seq is b.corpus.seq
    c = DevicePipeline(ds, np.arange(8), split="train", binary=False,
                       full=True, config=cfg)
    # binary flip swaps only the target vector; big fields stay shared
    assert c.corpus.node_onehot is a.corpus.node_onehot
    assert c.corpus.target is not a.corpus.target


def test_estimate_device_bytes_comparative(tmp_path):
    """The auto-gate estimator covers paired (cancer/WT) datasets."""
    from immunostruct_tpu.config import Config
    from immunostruct_tpu.data import (
        synthetic_comparative_corpus, ComparativeDataset,
    )
    from immunostruct_tpu.data.device_pipeline import estimate_device_bytes

    cfg = Config(batch_size=4, pad_nodes_multiple=4, pad_edges_multiple=16,
                 compute_dtype="float32", aggregation="scatter")
    paths = synthetic_comparative_corpus(str(tmp_path), num_samples=8, seed=9)
    ds = ComparativeDataset.load(cfg, *paths)
    total = estimate_device_bytes(ds)
    assert total > 0
    assert total == (estimate_device_bytes(ds.cancer)
                     + estimate_device_bytes(ds.wt))


def test_admitted_bytes_ledger(setup):
    """The auto heuristic's global HBM ledger counts live datasets only
    and releases bytes when the dataset is collected (ADVICE r2)."""
    import copy
    import gc
    from immunostruct_tpu.data.device_pipeline import (
        admitted_device_bytes, note_admitted)

    cfg, ds = setup
    base = admitted_device_bytes()
    ghost = copy.copy(ds)
    note_admitted(ghost, 123)
    note_admitted(ghost, 456)          # re-noting replaces, not adds
    assert admitted_device_bytes() == base + 456
    del ghost
    gc.collect()
    assert admitted_device_bytes() == base


def test_corpus_cache_evicts_on_dataset_death(setup):
    """A dead dataset's corpus cache entry is dropped eagerly via the
    weakref callback, not only on the next cache access (ADVICE r2)."""
    import copy
    import gc
    import numpy as np
    from immunostruct_tpu.data import device_pipeline as dp

    cfg, ds = setup
    ghost = copy.copy(ds)
    dp.DevicePipeline(ghost, np.arange(8), split="train", binary=True,
                      full=True, config=cfg)
    key = id(ghost)
    assert key in dp._CORPUS_CACHE
    del ghost
    gc.collect()
    assert key not in dp._CORPUS_CACHE
