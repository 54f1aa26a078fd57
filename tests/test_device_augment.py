"""Device-side augmentation semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.data.device_augment import (
    random_rotations, ssl_mask_single, structure_mask, sequence_mask,
    augment_batch,
)


def test_rotations_orthogonal(rng):
    q = np.asarray(random_rotations(jax.random.key(0), 5))
    for i in range(5):
        np.testing.assert_allclose(q[i] @ q[i].T, np.eye(3), atol=1e-5)


def test_ssl_mask_single(rng):
    b, n = 4, 10
    onehot = np.zeros((b, n, 20), np.float32)
    for i in range(b):
        real = rng.integers(3, n)
        onehot[i, :real, rng.integers(0, 20)] = 1.0
    masked, classes = ssl_mask_single(jax.random.key(1), jnp.asarray(onehot))
    masked = np.asarray(masked)
    allones = (masked.sum(-1) == 20).sum(-1)
    assert (allones == 1).all()
    # recorded class matches the residue that was masked
    for i in range(b):
        pos = int(np.nonzero(masked[i].sum(-1) == 20)[0][0])
        assert onehot[i, pos].sum() == 1
        assert int(classes[i]) == int(onehot[i, pos].argmax())


def test_structure_mask_skips_ssl_rows(rng):
    b, n, k = 2, 8, 8  # mask every position to make the check deterministic
    onehot = np.zeros((b, n, 20), np.float32)
    onehot[:, :, 3] = 1.0
    onehot[:, 0, :] = 1.0  # SSL-masked row (sum 20 > 1) must survive
    out = np.asarray(structure_mask(jax.random.key(2), jnp.asarray(onehot), k))
    assert (out[:, 0].sum(-1) == 20).all()   # SSL row untouched
    assert (out[:, 1:].sum(-1) == 0).all()   # the rest zeroed


def test_sequence_mask_region(rng):
    b, l, ml, k = 3, 12, 8, 3
    seq = np.zeros((b, l, 21), np.float32)
    seq[:, :, 0] = 1.0
    out = np.asarray(sequence_mask(jax.random.key(3), jnp.asarray(seq), ml, k))
    j_hits = (out[:, :, 20] == 1).sum(-1)
    assert (j_hits == k).all()
    # nothing outside the maskable region is touched
    assert (out[:, ml:, 0] == 1).all()


def test_device_pipeline_ssl(tmp_path):
    from immunostruct_tpu.config import Config
    from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset
    from immunostruct_tpu.data.device_pipeline import DevicePipeline
    cfg = Config(batch_size=8, pad_nodes_multiple=4, pad_edges_multiple=16,
                 compute_dtype="float32", aggregation="scatter")
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=12, seed=91)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    idx = np.arange(len(ds))

    with pytest.raises(ValueError):
        DevicePipeline(ds, idx, split="train", binary=False, full=True,
                       config=cfg, ssl=True)  # needs device_augment

    pipe = DevicePipeline(ds, idx, split="train", binary=False, full=True,
                          config=cfg, ssl=True, device_augment=True)
    b = next(iter(pipe.epoch(0)))
    nf = np.asarray(b.graph.node_feat)
    assert ((nf.sum(-1) == 20).sum(-1) == 1).all()  # one SSL mask per graph
    aux = np.asarray(b.aux_residue)
    assert ((aux >= 0) & (aux < 20)).all()

    val = DevicePipeline(ds, idx, split="val", binary=False, full=True,
                         config=cfg, ssl=True, device_augment=True)
    bv = next(iter(val.epoch(0)))
    assert (np.asarray(bv.aux_residue) == -1).all()


def test_ssl_mask_paired_same_class(rng):
    from immunostruct_tpu.data.device_augment import ssl_mask_paired
    b, n = 3, 8
    oc = np.zeros((b, n, 20), np.float32)
    ow = np.zeros((b, n, 20), np.float32)
    for i in range(b):
        oc[i, np.arange(6), rng.integers(0, 5, 6)] = 1.0
        ow[i, np.arange(6), rng.integers(0, 5, 6)] = 1.0
    mc, mw, cls = ssl_mask_paired(jax.random.key(5), jnp.asarray(oc), jnp.asarray(ow))
    mc, mw = np.asarray(mc), np.asarray(mw)
    for i in range(b):
        pos_c = np.nonzero(mc[i].sum(-1) == 20)[0]
        pos_w = np.nonzero(mw[i].sum(-1) == 20)[0]
        if len(pos_c):  # common class existed
            assert len(pos_c) == 1 and len(pos_w) == 1
            assert int(oc[i, pos_c[0]].argmax()) == int(cls[i])
            assert int(ow[i, pos_w[0]].argmax()) == int(cls[i])


def test_ssl_mask_paired_no_common_class(rng):
    from immunostruct_tpu.data.device_augment import ssl_mask_paired
    oc = np.zeros((1, 4, 20), np.float32)
    ow = np.zeros((1, 4, 20), np.float32)
    oc[0, :, 0] = 1.0   # all class 0
    ow[0, :, 5] = 1.0   # all class 5 -> no overlap
    mc, mw, cls = ssl_mask_paired(jax.random.key(6), jnp.asarray(oc), jnp.asarray(ow))
    assert (np.asarray(mc).sum(-1) <= 1).all()  # nothing masked
    assert (np.asarray(mw).sum(-1) <= 1).all()
    assert int(cls[0]) == 0  # host fallback class


def test_comparative_device_ssl_pipeline(tmp_path):
    from immunostruct_tpu.config import Config
    from immunostruct_tpu.data import synthetic_comparative_corpus, ComparativeDataset
    from immunostruct_tpu.data.device_pipeline import ComparativeDevicePipeline
    cfg = Config(batch_size=8, pad_nodes_multiple=4, pad_edges_multiple=16,
                 compute_dtype="float32", aggregation="scatter")
    dc, dw, pc, pw, hp = synthetic_comparative_corpus(str(tmp_path), num_samples=10, seed=93)
    ds = ComparativeDataset.load(cfg, dc, dw, pc, pw, hp)
    pipe = ComparativeDevicePipeline(ds, np.arange(len(ds)), split="train",
                                     binary=False, full=True, config=cfg,
                                     ssl=True, device_augment=True)
    b = next(iter(pipe.epoch(0)))
    nc = np.asarray(b.cancer.graph.node_feat)
    nw = np.asarray(b.wt.graph.node_feat)
    assert ((nc.sum(-1) == 20).sum(-1) <= 1).all()
    assert ((nw.sum(-1) == 20).sum(-1) <= 1).all()
    aux = np.asarray(b.cancer.aux_residue)
    assert ((aux >= 0) & (aux < 20)).all()


def test_augment_batch_rotation_preserves_distances(tmp_path, rng):
    from immunostruct_tpu.config import Config
    from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset
    from immunostruct_tpu.data.device_pipeline import DevicePipeline
    cfg = Config(batch_size=8, pad_nodes_multiple=4, pad_edges_multiple=16,
                 compute_dtype="float32", aggregation="scatter",
                 force_graph_augmentation=True)
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=8, seed=92)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    plain = DevicePipeline(ds, np.arange(8), split="val", binary=True, full=True,
                           config=cfg, device_augment=True, shuffle=False)
    aug = DevicePipeline(ds, np.arange(8), split="train", binary=True, full=True,
                         config=cfg, device_augment=True, shuffle=False)
    b0 = next(iter(plain.epoch(0)))
    b1 = next(iter(aug.epoch(0)))
    c0, c1 = np.asarray(b0.graph.coords), np.asarray(b1.graph.coords)
    assert not np.allclose(c0, c1)  # rotated
    d0 = np.linalg.norm(c0[:, :1] - c0, axis=-1)
    d1 = np.linalg.norm(c1[:, :1] - c1, axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-3)  # rigid transform
