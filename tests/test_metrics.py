"""Metric suite tests, cross-checked against sklearn when available."""

import numpy as np
import pytest

from immunostruct_tpu.procedures.metrics import (
    mean_ppvn, find_optimal_threshold, evaluate_metrics,
    roc_curve, roc_auc_score, precision_recall_curve, precision_recall_auc,
    accuracy_score, precision_score, recall_score, f1_score,
)
from immunostruct_tpu.procedures.clinical import (
    kaplan_meier, logrank_test, clinical_pvalues, convert_patient_code,
)

sklearn = pytest.importorskip("sklearn", reason="sklearn cross-check") \
    if False else None


def _rand_labels(rng, n=200):
    probs = rng.random(n)
    y = (rng.random(n) > 0.5).astype(float)
    y[40:100] = (probs[40:100] > 0.5).astype(float)  # some signal
    return y, probs


class TestMetrics:
    def test_roc_auc_against_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        y, p = _rand_labels(rng)
        assert roc_auc_score(y, p) == pytest.approx(sk.roc_auc_score(y, p), abs=1e-9)

    def test_roc_curve_against_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        y, p = _rand_labels(rng, 50)
        fpr, tpr, thr = roc_curve(y, p)
        sk_fpr, sk_tpr, sk_thr = sk.roc_curve(y, p, drop_intermediate=False)
        np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
        np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)
        np.testing.assert_allclose(thr[1:], sk_thr[1:], atol=1e-12)

    def test_pr_auc_against_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        y, p = _rand_labels(rng)
        prec, rec, _ = sk.precision_recall_curve(y, p)
        want = sk.auc(rec, prec)
        assert precision_recall_auc(y, p) == pytest.approx(want, abs=1e-9)

    def test_binary_metrics_against_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        y, p = _rand_labels(rng)
        pred = p >= 0.5
        assert accuracy_score(y, pred) == pytest.approx(sk.accuracy_score(y, pred))
        assert precision_score(y, pred) == pytest.approx(sk.precision_score(y, pred))
        assert recall_score(y, pred) == pytest.approx(sk.recall_score(y, pred))
        assert f1_score(y, pred) == pytest.approx(sk.f1_score(y, pred))

    def test_ppvn_perfect_ranking(self):
        y = np.array([1, 1, 1, 0, 0, 0], float)
        p = np.array([0.9, 0.8, 0.7, 0.3, 0.2, 0.1])
        assert mean_ppvn(y, p) == pytest.approx(1.0)

    def test_ppvn_topk(self):
        y = np.array([1, 0, 1, 0], float)
        p = np.array([0.9, 0.8, 0.7, 0.1])
        # ranks: 1(pos), 0, 1 -> ppvn = [1, 1/2, 2/3]; num_pos=2 -> mean([1, .5])
        assert mean_ppvn(y, p) == pytest.approx(0.75)
        assert mean_ppvn(y, p, topk=1) == pytest.approx(1.0)

    def test_optimal_threshold_in_unit_interval(self, rng):
        y, p = _rand_labels(rng)
        thr = find_optimal_threshold(y, p)
        assert 0.0 <= thr <= 1.0
        # youden J at thr should be the max over all realizable thresholds
        best = max(
            np.mean(p[y == 1] >= t) - np.mean(p[y == 0] >= t) for t in p)
        got = np.mean(p[y == 1] >= thr) - np.mean(p[y == 0] >= thr)
        assert got == pytest.approx(best, abs=1e-9)

    def test_evaluate_metrics_keys(self, rng):
        y, p = _rand_labels(rng)
        out = evaluate_metrics(y, p, 0.5, verbose=False)
        expected = {"optimal_threshold", "roc_auc", "pr_auc", "accuracy",
                    "accuracy_op", "f1", "f1_op", "precision", "precision_op",
                    "recall", "recall_op", "ppvn", "ppvn_op", "ppv30", "ppv30_op"}
        assert set(out) == expected


class TestClinical:
    def test_patient_code(self):
        assert convert_patient_code("mUC-40") == "BC-40"
        assert convert_patient_code("MM-3") == "Neye-3"
        assert convert_patient_code("XX-1") == "XX-1"

    def test_km_monotone(self, rng):
        times = rng.random(30) * 10
        events = rng.integers(0, 2, 30)
        t, s = kaplan_meier(times, events)
        assert (np.diff(s) <= 1e-12).all()
        assert (s >= 0).all() and (s <= 1).all()

    def test_logrank_identical_groups(self, rng):
        t = rng.random(40) * 10
        e = np.ones(40)
        p = logrank_test(t, t, e, e)
        assert p > 0.99

    def test_logrank_separated_groups(self, rng):
        ta = rng.random(40) * 2        # early events
        tb = 10 + rng.random(40) * 2   # late events
        e = np.ones(40)
        p = logrank_test(ta, tb, e, e)
        assert p < 1e-6

    def test_logrank_against_lifelines_if_available(self, rng):
        lifelines = pytest.importorskip("lifelines")
        from lifelines.statistics import logrank_test as ll_test
        ta, tb = rng.random(30) * 10, rng.random(30) * 12
        ea, eb = rng.integers(0, 2, 30), rng.integers(0, 2, 30)
        want = ll_test(ta, tb, event_observed_A=ea, event_observed_B=eb).p_value
        assert logrank_test(ta, tb, ea, eb) == pytest.approx(want, abs=1e-9)

    def test_clinical_pvalues_pipeline(self, rng):
        import pandas as pd
        patients = [f"mUC-{i}" for i in range(6)]
        seq_df = pd.DataFrame({
            "patient": np.repeat(patients, 5),
        })
        probs = rng.random(30)
        probs[::7] = np.nan
        clin_df = pd.DataFrame({
            "Patient": [f"BC-{i}" for i in range(6)],
            "OS.Time": ["1,5", "2,0", "3,5", "4,0", "5,5", "6,0"],  # comma decimals
            "PFS.Time": [1, 2, 3, 4, 5, 6],
            "OS.Event": [1, 1, 0, 1, 0, 1],
            "PFS.Event": [1, 0, 1, 1, 0, 1],
        })
        os_p, pfs_p = clinical_pvalues(probs, seq_df, clin_df)
        assert 0.0 <= os_p <= 1.0 and 0.0 <= pfs_p <= 1.0
