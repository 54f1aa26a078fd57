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
