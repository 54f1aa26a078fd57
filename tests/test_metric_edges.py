"""Hand-computed edge cases for the metric/survival suite."""

import numpy as np
import pytest

from immunostruct_tpu.procedures.metrics import (
    roc_auc_score, precision_recall_auc, mean_ppvn, find_optimal_threshold,
    evaluate_metrics,
)
from immunostruct_tpu.procedures.clinical import kaplan_meier, logrank_test


class TestMetricEdges:
    def test_tied_scores(self):
        """All predictions identical: AUROC is 0.5 by construction."""
        y = np.array([1, 0, 1, 0], float)
        p = np.full(4, 0.7)
        assert roc_auc_score(y, p) == pytest.approx(0.5)

    def test_perfect_separation(self):
        y = np.array([0, 0, 1, 1], float)
        p = np.array([0.1, 0.2, 0.8, 0.9])
        assert roc_auc_score(y, p) == pytest.approx(1.0)
        assert precision_recall_auc(y, p) == pytest.approx(1.0)
        thr = find_optimal_threshold(y, p)
        assert 0.2 < thr <= 0.8

    def test_inverted_ranking(self):
        y = np.array([1, 1, 0, 0], float)
        p = np.array([0.1, 0.2, 0.8, 0.9])
        assert roc_auc_score(y, p) == pytest.approx(0.0)

    def test_ppvn_hand_computed(self):
        # ranking: pos, neg, pos, neg, pos  -> ppvn = [1, 1/2, 2/3, 2/4, 3/5]
        y = np.array([1, 0, 1, 0, 1], float)
        p = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
        want = np.mean([1.0, 0.5, 2 / 3])  # first num_pos=3 ranks
        assert mean_ppvn(y, p) == pytest.approx(want)

    def test_evaluate_metrics_single_class_does_not_crash(self):
        """Degenerate splits (1-sample test folds) must not raise."""
        y = np.zeros(3)
        p = np.array([0.2, 0.4, 0.6])
        out = evaluate_metrics(y, p, 0.5, verbose=False)
        assert out["recall"] == 0.0
        assert np.isnan(out["ppvn"])  # no positives -> empty PPVn head


class TestSurvivalEdges:
    def test_km_hand_computed(self):
        """Classic example: deaths at t=1 (1 of 4), t=3 (1 of 2); censor at 2.

        S(1) = 3/4; at t=3 at-risk=2 -> S(3) = 3/4 * 1/2 = 3/8.
        """
        times = np.array([1.0, 2.0, 3.0, 4.0])
        events = np.array([1, 0, 1, 0])
        t, s = kaplan_meier(times, events)
        np.testing.assert_allclose(t, [1.0, 3.0])
        np.testing.assert_allclose(s, [0.75, 0.375])

    def test_logrank_single_event(self):
        p = logrank_test([1.0], [2.0], [1], [1])
        assert 0.0 <= p <= 1.0

    def test_logrank_all_censored(self):
        p = logrank_test([1, 2], [3, 4], [0, 0], [0, 0])
        assert p == 1.0  # no events -> no information
