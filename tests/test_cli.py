"""CLI end-to-end tests on synthetic corpora (tiny shapes, 1 epoch)."""

import os

import numpy as np
import pytest

from immunostruct_tpu.data import (
    synthetic_corpus, synthetic_comparative_corpus, synthetic_clinical_corpus,
)


@pytest.fixture(scope="module")
def iedb(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_iedb")
    return str(root), synthetic_corpus(str(root), num_samples=20, seed=31)


def _common(root, extra=()):
    return [
        "--num-epochs", "1", "--batch-size", "8",
        "--compute-dtype", "float32", "--aggregation", "scatter",
        "--model-save-dir", os.path.join(root, "ckpt"),
        "--sequence-loss", "--full-sequence",
        *extra,
    ]


class TestTrainIEDBCLI:
    def test_runs_end_to_end(self, iedb):
        from immunostruct_tpu.cli.train_IEDB_wFT import main
        root, (gd, pp, hp) = iedb
        train_stats, test_stats = main(_common(root) + [
            "--model", "HybridModel",
            "--graph-dir-IEDB", gd, "--property-path-IEDB", pp, "--hla-path", hp,
        ])
        assert 0 <= test_stats["roc_auc"] <= 1
        assert test_stats["optimal_threshold"] == train_stats["optimal_threshold"]

    def test_sequence_model_cpu_slice(self, iedb):
        """BASELINE config 1: sequence+property head, no structure needed."""
        from immunostruct_tpu.cli.train_IEDB_wFT import main
        root, (gd, pp, hp) = iedb
        train_stats, test_stats = main(_common(root) + [
            "--model", "SequenceFpModel",
            "--graph-dir-IEDB", gd, "--property-path-IEDB", pp, "--hla-path", hp,
        ])
        assert np.isfinite(test_stats["roc_auc"])


class TestTrainCancerCLI:
    def test_three_stage_curriculum(self, tmp_path):
        from immunostruct_tpu.cli.train_Cancer_wFT import main
        root = str(tmp_path)
        shared_hla = os.path.join(root, "HLA_shared.csv")
        gd, pp, hp = synthetic_corpus(root, num_samples=16, seed=32,
                                      shared_hla_path=shared_hla)
        dc, dw, pc, pw, hp2 = synthetic_comparative_corpus(
            root, num_samples=12, seed=33, shared_hla_path=shared_hla)
        cgd, sp, cp = synthetic_clinical_corpus(root, num_rows=18, num_patients=5, seed=34)
        train_stats, test_stats = main(_common(root) + [
            "--model", "HybridModelv2_Comparative", "--use-wt-for-downstream",
            "--coeff-contrastive", "0.05",
            "--min-finetuning-batches", "2",
            "--graph-dir-IEDB", gd, "--property-path-IEDB", pp, "--hla-path", hp2,
            "--graph-dir-cancer", dc, "--graph-dir-wildtype", dw,
            "--property-path-cancer", pc, "--property-path-wildtype", pw,
            "--graph-dir-clinical", cgd, "--seq-path-clinical", sp,
            "--clinical-table-path", cp,
            "--figure-save-dir", os.path.join(root, "figs"),
        ])
        assert 0 <= test_stats["roc_auc"] <= 1
        assert "os_p_value" in test_stats and "pfs_p_value" in test_stats

        # comparative batch inference with the produced finetune checkpoint
        from immunostruct_tpu.cli.infer_IEDB_or_Cancer import main as infer_main
        ckpt_dir = os.path.join(root, "ckpt")
        ckpt = next(os.path.join(ckpt_dir, f) for f in sorted(os.listdir(ckpt_dir))
                    if f.endswith("_finetune.ckpt"))
        out = os.path.join(root, "cmp_preds.txt")
        stats = infer_main(_common(root) + [
            "--model", "HybridModelv2_Comparative", "--comparative",
            "--use-wt-for-downstream", "--checkpoint", ckpt,
            "--graph-dir-cancer", dc, "--graph-dir-wildtype", dw,
            "--property-path-cancer", pc, "--property-path-wildtype", pw,
            "--hla-path", hp2, "--output", out,
        ])
        assert os.path.exists(out)
        assert len(open(out).read().strip().splitlines()) == \
            len(stats["predicted_probs"])


class TestCurriculumCLI:
    def test_two_stage_prop_then_immuno(self, iedb, tmp_path):
        from immunostruct_tpu.cli.train_curriculum import main
        root, (gd, pp, hp) = iedb
        train_stats, test_stats = main(_common(str(tmp_path)) + [
            "--model", "HybridModel",
            "--stages", "PropIEDB,ImmunoIEDB",
            "--graph-dir-IEDB", gd, "--property-path-IEDB", pp, "--hla-path", hp,
        ])
        assert 0 <= test_stats["roc_auc"] <= 1

    def test_rejects_unknown_stage(self, iedb, tmp_path):
        from immunostruct_tpu.cli.train_curriculum import main
        root, (gd, pp, hp) = iedb
        with pytest.raises(SystemExit):
            main(_common(str(tmp_path)) + ["--stages", "Bogus"])


class TestInferCLI:
    def test_infer_after_train(self, iedb, tmp_path):
        from immunostruct_tpu.cli.train_IEDB_wFT import main as train_main
        from immunostruct_tpu.cli.infer_IEDB_or_Cancer import main as infer_main
        root, (gd, pp, hp) = iedb
        train_main(_common(root) + [
            "--model", "SequenceModel",
            "--graph-dir-IEDB", gd, "--property-path-IEDB", pp, "--hla-path", hp,
        ])
        ckpt_dir = os.path.join(root, "ckpt")
        ckpt = next(os.path.join(ckpt_dir, f) for f in sorted(os.listdir(ckpt_dir))
                    if f.endswith("_finetune.ckpt") and "SequenceModel" in f)
        out = str(tmp_path / "preds.txt")
        stats = infer_main(_common(root) + [
            "--model", "SequenceModel", "--checkpoint", ckpt,
            "--graph-dir-IEDB", gd, "--property-path-IEDB", pp, "--hla-path", hp,
            "--output", out,
        ])
        assert os.path.exists(out)
        lines = open(out).read().strip().splitlines()
        assert len(lines) == len(stats["predicted_probs"])
        assert len(lines[0].split("\t")) == 3  # prob, label, chain
