"""End-to-end procedure tests: two-stage training, comparative + contrastive,
SSL, checkpoint/head-reset transitions, inference metrics, clinical scoring.

These mirror the reference entry-script flows on a tiny synthetic corpus
(BASELINE.json config 1: CPU-runnable sequence+property slice, then the full
multimodal path).
"""

import os

import jax
import numpy as np
import pytest

from immunostruct_tpu.config import Config
from immunostruct_tpu.data import (
    ImmunoDataset, ComparativeDataset, ClinicalDataset, seeded_split,
    BatchPipeline, ComparativePipeline,
    synthetic_corpus, synthetic_comparative_corpus, synthetic_clinical_corpus,
)
from immunostruct_tpu.models import build_model, reset_head
from immunostruct_tpu.procedures.train import train_model, Trainer, make_optimizer
from immunostruct_tpu.procedures.infer import inference, inference_clinical_only
from immunostruct_tpu.utils.losses import LossConfig, pos_weight_from_counts
from immunostruct_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from immunostruct_tpu.utils.schedule import linear_warmup_cosine_annealing


def tiny_config(tmp_path, **kw):
    defaults = dict(batch_size=8, num_epochs=2, pad_nodes_multiple=4,
                    pad_edges_multiple=16, compute_dtype="float32",
                    aggregation="scatter",
                    model_save_dir=str(tmp_path / "ckpt"),
                    figure_save_dir=str(tmp_path / "figs"))
    defaults.update(kw)
    cfg = Config(**defaults)
    cfg.derive_paths()
    return cfg


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return synthetic_corpus(str(root), num_samples=24, seed=11)


def _vae_dim(ds, full):
    return (ds.seq_full.shape[1] if full else ds.seq_pep.shape[1]) * 21


class TestTwoStageTraining:
    def test_pretrain_then_finetune_seqfp(self, corpus, tmp_path):
        """CPU-runnable slice: SequenceFpModel, foreignness -> BCE stages."""
        gd, pp, hp = corpus
        cfg = tiny_config(tmp_path, model="SequenceFpModel", sequence_loss=True,
                          full_sequence=False)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        tr, va, te = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = _vae_dim(ds, cfg.full_sequence)
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(cfg.seed))
        loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                              sequence=cfg.sequence_loss)

        def pipes(binary):
            mk = lambda idx, split: BatchPipeline(
                ds, idx, split=split, binary=binary, full=cfg.full_sequence, config=cfg)
            return mk(tr, "train"), mk(va, "val"), mk(te, "test")

        train_pipe, val_pipe, _ = pipes(binary=False)
        params, hist = train_model(cfg, spec, params, train_pipe, val_pipe,
                                   loss_cfg, binary=False,
                                   learning_rate=cfg.learning_rate_pretrain,
                                   stage="pretrain", verbose=False)
        assert len(hist["train_loss"]) == cfg.num_epochs
        assert np.isfinite(hist["train_loss"]).all()
        assert os.path.exists(cfg.model_save_path_pretrain)

        # stage transition: restore best + re-init head (train_IEDB_wFT.py:95)
        params = load_checkpoint(cfg.model_save_path_pretrain, params)
        params = reset_head(params, spec, jax.random.key(99))

        train_pipe, val_pipe, test_pipe = pipes(binary=True)
        params, hist2 = train_model(cfg, spec, params, train_pipe, val_pipe,
                                    loss_cfg, binary=True,
                                    learning_rate=cfg.learning_rate_finetune,
                                    weight_decay=1e-6, stage="finetune", verbose=False)
        assert os.path.exists(cfg.model_save_path_finetune)

        # threshold transfer: train-split threshold reused on test
        train_stats = inference(cfg, spec, params, train_pipe, verbose=False)
        test_stats = inference(cfg, spec, params, test_pipe,
                               optimal_threshold=train_stats["optimal_threshold"],
                               verbose=False)
        assert 0 <= test_stats["roc_auc"] <= 1
        assert test_stats["optimal_threshold"] == train_stats["optimal_threshold"]

    def test_hybrid_model_trains(self, corpus, tmp_path):
        gd, pp, hp = corpus
        cfg = tiny_config(tmp_path, model="HybridModelv2", sequence_loss=True,
                          full_sequence=True, num_epochs=1)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        tr, va, _ = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = _vae_dim(ds, True)
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
        loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                              sequence=True)
        train_pipe = BatchPipeline(ds, tr, split="train", binary=False, full=True, config=cfg)
        val_pipe = BatchPipeline(ds, va, split="val", binary=False, full=True, config=cfg)
        params, hist = train_model(cfg, spec, params, train_pipe, val_pipe,
                                   loss_cfg, binary=False, learning_rate=1e-3,
                                   verbose=False)
        assert np.isfinite(hist["train_loss"]).all()

    def test_ssl_training(self, corpus, tmp_path):
        gd, pp, hp = corpus
        cfg = tiny_config(tmp_path, model="HybridModelv2_SSL", sequence_loss=True,
                          full_sequence=True, num_epochs=1, self_supervision=True)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        tr, va, _ = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = _vae_dim(ds, True)
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
        loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                              sequence=True, ssl=True)
        train_pipe = BatchPipeline(ds, tr, split="train", binary=False, full=True,
                                   config=cfg, ssl=True)
        val_pipe = BatchPipeline(ds, va, split="val", binary=False, full=True,
                                 config=cfg, ssl=True)
        params, hist = train_model(cfg, spec, params, train_pipe, val_pipe,
                                   loss_cfg, binary=False, learning_rate=1e-3,
                                   verbose=False)
        assert np.isfinite(hist["train_loss"]).all()


class TestComparative:
    def test_comparative_with_contrastive(self, tmp_path):
        dc, dw, pc, pw, hp = synthetic_comparative_corpus(str(tmp_path), num_samples=16, seed=13)
        cfg = tiny_config(tmp_path, model="HybridModelv2_Comparative",
                          sequence_loss=True, full_sequence=True, num_epochs=1,
                          coeff_contrastive=0.1, use_wt_for_downstream=True)
        ds = ComparativeDataset.load(cfg, dc, dw, pc, pw, hp)
        tr, va, _ = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = ds.cancer.seq_full.shape[1] * 21
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0),
                                   use_wt_for_downstream=True)
        loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                              sequence=True)
        train_pipe = ComparativePipeline(ds, tr, split="train", binary=True,
                                         full=True, config=cfg)
        val_pipe = ComparativePipeline(ds, va, split="val", binary=True,
                                       full=True, config=cfg)
        params, hist = train_model(cfg, spec, params, train_pipe, val_pipe,
                                   loss_cfg, binary=True, learning_rate=1e-3,
                                   optimizer_name="adamw", weight_decay=1e-6,
                                   coeff_contrastive=cfg.coeff_contrastive,
                                   lr_schedule=linear_warmup_cosine_annealing(
                                       1e-4, 1, cfg.num_epochs, 1e-6),
                                   verbose=False)
        assert np.isfinite(hist["train_loss"]).all()
        assert "contrastive_projector" in params

        stats = inference(cfg, spec, params, val_pipe, verbose=False)
        assert 0 <= stats["roc_auc"] <= 1

    def test_comparative_ssl(self, tmp_path):
        dc, dw, pc, pw, hp = synthetic_comparative_corpus(str(tmp_path), num_samples=12, seed=14)
        cfg = tiny_config(tmp_path, model="HybridModelv2_Comparative_SSL",
                          sequence_loss=True, full_sequence=True, num_epochs=1,
                          self_supervision=True, use_wt_for_downstream=True)
        ds = ComparativeDataset.load(cfg, dc, dw, pc, pw, hp)
        tr, va, _ = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = ds.cancer.seq_full.shape[1] * 21
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0),
                                   use_wt_for_downstream=True)
        loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                              sequence=True, ssl=True)
        train_pipe = ComparativePipeline(ds, tr, split="train", binary=False,
                                         full=True, config=cfg, ssl=True)
        val_pipe = ComparativePipeline(ds, va, split="val", binary=False,
                                       full=True, config=cfg, ssl=True)
        params, hist = train_model(cfg, spec, params, train_pipe, val_pipe,
                                   loss_cfg, binary=False, learning_rate=1e-3,
                                   verbose=False)
        assert np.isfinite(hist["train_loss"]).all()


class TestClinicalInference:
    def test_clinical_scoring(self, tmp_path):
        import pandas as pd
        gd, sp, cp = synthetic_clinical_corpus(str(tmp_path), num_rows=24,
                                               num_patients=6, seed=15)
        cfg = tiny_config(tmp_path, model="HybridModelv2", full_sequence=True)
        ds = ClinicalDataset.load(cfg, gd, sp)
        vae_dim = ds.seq_full.shape[1] * 21
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
        pipe = BatchPipeline(ds, np.arange(len(ds)), split="infer", binary=True,
                             full=True, config=cfg, shuffle=False)
        clinical = {"pipe": pipe, "valid": ds.valid,
                    "seq_df": pd.read_table(sp), "clin_df": pd.read_table(cp)}
        out = inference_clinical_only(cfg, spec, params, clinical)
        assert 0 <= out["os_p_value"] <= 1
        assert 0 <= out["pfs_p_value"] <= 1


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        spec, params = build_model("SequenceModel", 42 * 21, jax.random.key(0))
        path = str(tmp_path / "m.ckpt")
        save_checkpoint(path, params)
        zeroed = jax.tree.map(lambda x: np.zeros_like(x), params)
        restored = load_checkpoint(path, zeroed)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSchedule:
    def test_warmup_cosine_trace(self):
        sched = linear_warmup_cosine_annealing(1e-3, warmup_epochs=10,
                                               max_epochs=40, warmup_start_lr=1e-5)
        lrs = [float(sched(e)) for e in range(40)]
        assert lrs[0] == pytest.approx(1e-5)
        # linear ramp reaches base lr at warmup end
        assert lrs[10] == pytest.approx(1e-3, rel=1e-6)
        # cosine decays monotonically after warmup
        assert all(a >= b - 1e-12 for a, b in zip(lrs[10:], lrs[11:]))
        assert lrs[-1] < 1e-4

    def test_warmup_constant(self):
        from immunostruct_tpu.utils.schedule import linear_warmup_constant
        sched = linear_warmup_constant(1e-3, warmup_epochs=5,
                                       warmup_start_lr=1e-5)
        lrs = [float(sched(e)) for e in range(10)]
        assert lrs[0] == pytest.approx(1e-5)
        assert all(a < b for a, b in zip(lrs[:4], lrs[1:5]))   # linear ramp
        assert lrs[4] == pytest.approx(1e-3, rel=1e-6)          # ramp top
        assert all(lr == pytest.approx(1e-3) for lr in lrs[5:])  # constant

    def test_warmup_constant_zero_epochs_is_constant(self):
        from immunostruct_tpu.utils.schedule import linear_warmup_constant
        sched = linear_warmup_constant(2e-4, warmup_epochs=0)
        assert [float(sched(e)) for e in range(3)] == pytest.approx([2e-4] * 3)


class TestCollapseGuard:
    """Pretrain-collapse detection (VERDICT r3 item 4): the flagship seed-2
    failure mode is a classifier flatlined at chance AUROC while the VAE
    branch keeps the combined loss moving — so the guard watches per-epoch
    val AUROC, not loss."""

    def test_observe_fires_after_window_at_chance(self):
        from immunostruct_tpu.procedures.train import CollapseGuard
        g = CollapseGuard(window=4, chance_band=0.07, min_epoch=2)
        fired = [g.observe(e, 0.51) for e in range(10)]
        # epochs 0-1 ignored; streak starts at 2, fires once at epoch 5
        assert fired == [False] * 5 + [True] + [False] * 4
        assert g.fired

    def test_observe_streak_resets_on_signal(self):
        from immunostruct_tpu.procedures.train import CollapseGuard
        g = CollapseGuard(window=3, chance_band=0.07, min_epoch=0)
        assert not any(g.observe(e, a) for e, a in
                       enumerate([0.52, 0.50, 0.65, 0.51, 0.49]))
        assert g.observe(5, 0.53)  # third consecutive at-chance epoch

    def test_train_model_reinit_on_collapse(self, corpus, tmp_path,
                                            monkeypatch, capsys):
        """With an always-at-chance guard, train_model restarts the stage
        twice (re-folded inits) and the final attempt warns instead of
        raising."""
        import immunostruct_tpu.procedures.train as train_mod
        from immunostruct_tpu.procedures.train import CollapseGuard

        real_guard = CollapseGuard
        monkeypatch.setattr(
            train_mod, "CollapseGuard",
            lambda raise_on_fire, **kw: real_guard(
                window=1, chance_band=1.0, min_epoch=0,
                raise_on_fire=raise_on_fire, **kw))

        gd, pp, hp = corpus
        cfg = tiny_config(tmp_path, model="SequenceFpModel",
                          sequence_loss=False, reinit_on_collapse=True)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        tr, va, _ = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = _vae_dim(ds, False)
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
        loss_cfg = LossConfig(vae_dim, 1.0, sequence=False)
        mk = lambda idx, split: BatchPipeline(ds, idx, split=split, binary=True,
                                              full=False, config=cfg)
        events = []
        params, hist = train_model(cfg, spec, params, mk(tr, "train"),
                                   mk(va, "val"), loss_cfg, binary=True,
                                   learning_rate=1e-3, stage="pretrain",
                                   verbose=True, log_fn=events.append)
        out = capsys.readouterr().out
        assert out.count("re-initializing") == 2  # attempts 2 and 3
        assert "COLLAPSE GUARD" in out            # final attempt warns
        assert sum(1 for e in events if e.get("collapse_reinit")) == 2
        # the last attempt still completes the full stage
        assert len(hist["train_loss"]) == cfg.num_epochs
        assert "val_auc" in hist

    def test_finetune_stage_watched_warn_only(self, corpus, tmp_path,
                                              monkeypatch, capsys):
        """Since round 5 the guard watches finetune stages too (the seed-2
        collapse surfaced there, benchmarks/RESULTS.md collapse-arms
        table) — but re-init NEVER engages outside pretrain, even with
        --reinit-on-collapse and a guard that always fires: restarting a
        finetune from a re-folded init would discard the pretrained trunk."""
        import immunostruct_tpu.procedures.train as train_mod
        from immunostruct_tpu.procedures.train import CollapseGuard

        real_guard = CollapseGuard
        monkeypatch.setattr(
            train_mod, "CollapseGuard",
            lambda raise_on_fire, **kw: real_guard(
                window=1, chance_band=1.0, min_epoch=0,
                raise_on_fire=raise_on_fire, **kw))
        gd, pp, hp = corpus
        cfg = tiny_config(tmp_path, model="SequenceFpModel",
                          sequence_loss=False, reinit_on_collapse=True)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        tr, va, _ = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = _vae_dim(ds, False)
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
        loss_cfg = LossConfig(vae_dim, 1.0, sequence=False)
        mk = lambda idx, split: BatchPipeline(ds, idx, split=split, binary=True,
                                              full=False, config=cfg)
        _, hist = train_model(cfg, spec, params, mk(tr, "train"), mk(va, "val"),
                              loss_cfg, binary=True, learning_rate=1e-3,
                              stage="finetune", verbose=True)
        out = capsys.readouterr().out
        assert "val_auc" in hist                   # finetune is watched now
        assert "COLLAPSE GUARD" in out             # ... and warns
        assert "re-initializing" not in out        # ... but never restarts
        # the advice must not suggest a flag that is inert outside pretrain
        assert "Consider --reinit-on-collapse" not in out
        assert "pretrain stages only" in out
        assert len(hist["train_loss"]) == cfg.num_epochs

    def test_soft_target_pretrain_watches_median_split_auc(self, corpus, tmp_path):
        """The stage that actually collapsed (foreignness pretrain,
        binary=False) is guarded too: history gains a val_auc trace from
        the median-split rank signal."""
        gd, pp, hp = corpus
        cfg = tiny_config(tmp_path, model="SequenceFpModel", sequence_loss=False)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        tr, va, _ = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        vae_dim = _vae_dim(ds, False)
        spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
        loss_cfg = LossConfig(vae_dim, 1.0, sequence=False)
        mk = lambda idx, split: BatchPipeline(ds, idx, split=split, binary=False,
                                              full=False, config=cfg)
        _, hist = train_model(cfg, spec, params, mk(tr, "train"), mk(va, "val"),
                              loss_cfg, binary=False, learning_rate=1e-3,
                              stage="pretrain", verbose=False)
        assert len(hist["val_auc"]) == cfg.num_epochs
        assert all(0.0 <= a <= 1.0 or np.isnan(a) for a in hist["val_auc"])
