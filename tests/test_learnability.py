"""Learnability: on a corpus with planted signal, the two-stage pipeline
recovers it (train AUROC well above chance). This is the strongest
end-to-end evidence the loss/optimizer/pipeline plumbing actually learns,
not just runs.

Two plants:
  - sequence plant (peptide hydrophobic fraction) → SequenceFpModel
  - geometric plant (peptide-tail compactness, coordinates ONLY) →
    StructureModel must recover it and SequenceFpModel must NOT — the
    only in-repo proof the E(n)-equivariant branch carries geometric
    information (reference: immunostruct/models/hybrid_models.py:29-31).
"""

import jax
import numpy as np
import pytest

from immunostruct_tpu.config import Config
from immunostruct_tpu.data import (
    synthetic_corpus, ImmunoDataset, BatchPipeline, seeded_split,
)
from immunostruct_tpu.models import build_model
from immunostruct_tpu.procedures.train import train_model
from immunostruct_tpu.procedures.infer import inference
from immunostruct_tpu.utils.losses import LossConfig, pos_weight_from_counts


pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

def test_sequence_model_learns_planted_signal(tmp_path):
    cfg = Config(batch_size=32, num_epochs=12, pad_nodes_multiple=4,
                 pad_edges_multiple=16, compute_dtype="float32",
                 aggregation="scatter", model="SequenceFpModel",
                 sequence_loss=False, full_sequence=False,
                 model_save_dir=str(tmp_path / "ckpt"))
    cfg.derive_paths()
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=256, seed=61,
                                  planted_signal=True)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    # planted labels must be mixed
    rate = float(np.mean(ds.immuno))
    assert 0.15 < rate < 0.85

    tr, va, te = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
    vae_dim = ds.seq_pep.shape[1] * 21
    spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
    loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                          sequence=False)
    mk = lambda idx, split: BatchPipeline(ds, idx, split=split, binary=True,
                                          full=False, config=cfg)
    params, hist = train_model(cfg, spec, params, mk(tr, "train"), mk(va, "val"),
                               loss_cfg, binary=True, learning_rate=1e-3,
                               stage="finetune", verbose=False)
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    stats = inference(cfg, spec, params, mk(tr, "train"), verbose=False)
    # peptide one-hot fully determines the planted label: expect strong AUROC
    assert stats["roc_auc"] > 0.85, f"train AUROC {stats['roc_auc']:.3f}"
    test_stats = inference(cfg, spec, params, mk(te, "test"),
                           optimal_threshold=stats["optimal_threshold"],
                           verbose=False)
    assert test_stats["roc_auc"] > 0.7, f"test AUROC {test_stats['roc_auc']:.3f}"


def _run_on_geometric_corpus(tmp_path, model_name: str, *, epochs: int,
                             lr: float, aggregation: str = "scatter",
                             num_samples: int = 288, seed: int = 17):
    """Train `model_name` on the coordinates-only plant; return (train, test) stats."""
    cfg = Config(batch_size=32, num_epochs=epochs, pad_nodes_multiple=4,
                 pad_edges_multiple=16, compute_dtype="float32",
                 aggregation=aggregation, model=model_name,
                 sequence_loss=False, full_sequence=False,
                 model_save_dir=str(tmp_path / f"ckpt_{model_name}"))
    cfg.derive_paths()
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=num_samples,
                                  seed=seed, geometric_signal=True)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    rate = float(np.mean(ds.immuno))
    assert 0.3 < rate < 0.7, f"geometric labels should be ~balanced, got {rate}"

    tr, va, te = seeded_split(len(ds), (0.7, 0.1, 0.2), cfg.seed)
    vae_dim = ds.seq_pep.shape[1] * 21
    spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
    loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                          sequence=False)
    mk = lambda idx, split: BatchPipeline(ds, idx, split=split, binary=True,
                                          full=False, config=cfg)
    params, _ = train_model(cfg, spec, params, mk(tr, "train"), mk(va, "val"),
                            loss_cfg, binary=True, learning_rate=lr,
                            stage="finetune", verbose=False)
    stats = inference(cfg, spec, params, mk(tr, "train"), verbose=False)
    test_stats = inference(cfg, spec, params, mk(te, "test"),
                           optimal_threshold=stats["optimal_threshold"],
                           verbose=False)
    return stats, test_stats


def test_structure_model_learns_geometric_signal(tmp_path):
    """Coordinates → EGNN → pooling recovers a label no node statistic carries."""
    stats, test_stats = _run_on_geometric_corpus(
        tmp_path, "StructureModel", epochs=14, lr=1e-3)
    assert stats["roc_auc"] > 0.85, f"train AUROC {stats['roc_auc']:.3f}"
    assert test_stats["roc_auc"] > 0.8, f"test AUROC {test_stats['roc_auc']:.3f}"


def test_sequence_model_blind_to_geometric_signal(tmp_path):
    """The same corpus carries nothing a sequence/property model can use:
    held-out AUROC stays at chance (the negative control that makes the
    structure test meaningful)."""
    _, test_stats = _run_on_geometric_corpus(
        tmp_path, "SequenceFpModel", epochs=14, lr=1e-3)
    assert 0.25 < test_stats["roc_auc"] < 0.72, \
        f"sequence model should be at chance, got {test_stats['roc_auc']:.3f}"
