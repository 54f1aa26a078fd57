"""Shape-fuzz: random corpus sizes / peptide lengths / batch sizes / models
through the full dataset -> pipeline -> forward path. Catches padding and
reshape edge cases that fixed-shape tests miss."""

import jax
import numpy as np
import pytest

from immunostruct_tpu.config import Config
from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset, BatchPipeline
from immunostruct_tpu.models import build_model
from immunostruct_tpu.models.trunk import model_apply


pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_random_configs(seed, tmp_path):
    rng = np.random.default_rng(seed)
    num_samples = int(rng.integers(5, 30))
    batch_size = int(rng.integers(2, 11))
    hla_len = int(rng.integers(20, 80))
    pad_nodes = int(rng.choice([1, 4, 8]))
    pad_edges = int(rng.choice([1, 16, 128]))
    model = str(rng.choice(["HybridModel", "SequenceFpModel", "StructureModel",
                            "HybridModelv2", "DualModel"]))
    full = bool(rng.integers(0, 2))

    cfg = Config(batch_size=batch_size, pad_nodes_multiple=pad_nodes,
                 pad_edges_multiple=pad_edges, compute_dtype="float32",
                 aggregation="scatter")
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=num_samples,
                                  hla_len=hla_len, seed=seed)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    assert len(ds) > 0

    pipe = BatchPipeline(ds, np.arange(len(ds)), split="train", binary=True,
                         full=full, config=cfg)
    vae_dim = (ds.seq_full.shape[1] if full else ds.seq_pep.shape[1]) * 21
    spec, params = build_model(model, vae_dim, jax.random.key(seed))

    total = 0
    for batch in pipe.epoch(0):
        out = model_apply(params, spec, batch.graph, batch.seq_onehot,
                          batch.props, jax.random.key(1), deterministic=True,
                          aggregation="scatter")
        assert np.isfinite(np.asarray(out.logits)).all(), \
            f"non-finite logits: n={num_samples} bs={batch_size} model={model}"
        total += out.logits.shape[0]
    assert total == len(ds)


@pytest.mark.parametrize("seed", [515, 626])
def test_random_configs_fused(seed, tmp_path):
    """Same fuzz through the fused Pallas path (interpret mode on CPU) with
    128-multiple edge pads so the kernel engages; checked against scatter."""
    rng = np.random.default_rng(seed)
    num_samples = int(rng.integers(5, 20))
    batch_size = int(rng.integers(2, 7))
    hla_len = int(rng.integers(20, 60))
    model = str(rng.choice(["HybridModel", "HybridModelv2", "StructureModel"]))

    cfg = Config(batch_size=batch_size, pad_nodes_multiple=8,
                 pad_edges_multiple=128, compute_dtype="float32",
                 aggregation="fused")
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=num_samples,
                                  hla_len=hla_len, seed=seed)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    pipe = BatchPipeline(ds, np.arange(len(ds)), split="train", binary=True,
                         full=True, config=cfg)
    vae_dim = ds.seq_full.shape[1] * 21
    spec, params = build_model(model, vae_dim, jax.random.key(seed))

    for batch in pipe.epoch(0):
        out_f = model_apply(params, spec, batch.graph, batch.seq_onehot,
                            batch.props, jax.random.key(1),
                            deterministic=True, aggregation="fused")
        out_s = model_apply(params, spec, batch.graph, batch.seq_onehot,
                            batch.props, jax.random.key(1),
                            deterministic=True, aggregation="scatter")
        lf, ls = np.asarray(out_f.logits), np.asarray(out_s.logits)
        assert np.isfinite(lf).all()
        np.testing.assert_allclose(lf, ls, rtol=5e-3,
                                   atol=5e-3 * max(1.0, np.abs(ls).max()))
        break  # one batch per config: interpret mode is slow


@pytest.mark.parametrize("seed", [717, 828])
def test_device_pipeline_matches_host_fuzz(seed, tmp_path):
    """Random configs: the (now default-on-TPU) device pipeline yields the
    SAME batches as the host pipeline — same rows, same values."""
    from immunostruct_tpu.data.device_pipeline import DevicePipeline

    rng = np.random.default_rng(seed)
    num_samples = int(rng.integers(6, 24))
    batch_size = int(rng.integers(2, 9))
    hla_len = int(rng.integers(20, 70))
    full = bool(rng.integers(0, 2))
    binary = bool(rng.integers(0, 2))

    cfg = Config(batch_size=batch_size, pad_nodes_multiple=8,
                 pad_edges_multiple=128, compute_dtype="float32",
                 aggregation="scatter")
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=num_samples,
                                  hla_len=hla_len, seed=seed)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    idx = np.arange(len(ds))
    host = BatchPipeline(ds, idx, split="val", binary=binary, full=full,
                         config=cfg, shuffle=False)
    dev = DevicePipeline(ds, idx, split="val", binary=binary, full=full,
                         config=cfg, shuffle=False, pad_final_batch=False)
    n = 0
    for hb, db in zip(host.epoch(0), dev.epoch(0)):
        for a, b in zip(jax.tree.leaves(hb), jax.tree.leaves(db)):
            np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                       np.asarray(b, dtype=np.float32),
                                       rtol=1e-6, atol=1e-6)
        n += 1
    assert n == len(host)
