"""Profiling timer and metric-logger sinks."""

import json
import time

from immunostruct_tpu.utils.profiling import StepTimer
from immunostruct_tpu.utils.logging import MetricLogger, stats_to_wandb


class TestStepTimer:
    def test_warmup_skipped_and_stats(self):
        t = StepTimer(warmup=2)
        for _ in range(5):
            with t.step():
                time.sleep(0.002)
        s = t.stats()
        assert s["steps"] == 3  # 5 - 2 warmup
        assert s["mean_s"] > 0.001
        assert s["steps_per_sec"] > 0

    def test_empty(self):
        assert StepTimer().stats() == {"steps": 0}


class TestMetricLogger:
    def test_jsonl_sink(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        logger = MetricLogger(jsonl_path=path)
        logger.log({"epoch": 0, "train_loss": 1.5})
        logger.log({"epoch": 1, "train_loss": 1.2})
        logger.finish()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["train_loss"] == 1.5
        assert lines[1]["epoch"] == 1

    def test_stage_log_fn_handles_both_payload_shapes(self, tmp_path):
        """Regression: the collapse-guard event dict (no 'train_loss' key)
        crashed the CLI per-stage lambdas mid-run (flagship seed-3 sweep,
        round 4). stage_log_fn must prefix per-epoch metrics AND pass
        event payloads through."""
        from immunostruct_tpu.utils.logging import stage_log_fn
        path = str(tmp_path / "m.jsonl")
        logger = MetricLogger(jsonl_path=path)
        fn = stage_log_fn(logger, "pretrain")
        fn({"epoch": 0, "train_loss": 1.5, "val_loss": 2.0})
        fn({"epoch": 13, "collapse_detected": True, "val_auc": 0.52})
        fn({"collapse_reinit": True, "attempt": 2})
        logger.finish()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0] == {"pretrain_train_loss": 1.5,
                            "pretrain_val_loss": 2.0}
        # the sink float-coerces values (bool -> 1.0); truthiness is the contract
        assert lines[1]["pretrain_collapse_detected"]
        assert lines[2]["pretrain_collapse_reinit"]

    def test_stats_layout(self):
        stats = {"roc_auc": 0.9, "pr_auc": 0.8, "accuracy": 0.7,
                 "os_p_value": 0.04}
        out = stats_to_wandb("Test", stats)
        assert out["Test ROC AUC"] == 0.9
        assert out["Test Accuracy @0.5"] == 0.7
        assert out["OS p-value"] == 0.04
