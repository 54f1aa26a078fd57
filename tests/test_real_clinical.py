"""Real clinical table (reference checkout ships it): parsing invariants +
the full KM/log-rank survival path driven on the actual patient data.

The per-pMHC sequence table (hadrup_cancer_df_29K.txt) is NOT in the
checkout, so predictions are synthetic — but the patient-level machinery
(comma-decimal normalization, per-patient load aggregation, median split,
KM curves, log-rank chi^2) runs on the REAL 70-patient cohort, which pins
the real-world dtypes/ranges the synthetic fixtures can't."""

import os

import numpy as np
import pandas as pd
import pytest

from immunostruct_tpu.procedures.clinical import (
    clinical_pvalues, kaplan_meier, logrank_test, convert_patient_code,
)

REAL_CLINICAL = "/root/reference/data/All_samples_clinical.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(REAL_CLINICAL),
                                reason="reference clinical table not present")


def _clin():
    return pd.read_table(REAL_CLINICAL)


def test_real_table_invariants():
    df = _clin()
    assert len(df) == 70                       # 70 patients (71 lines - header)
    for col in ("Patient", "OS.Time", "OS.Event", "PFS.Time", "PFS.Event"):
        assert col in df.columns
    assert df["Patient"].is_unique
    assert set(df["OS.Event"].unique()) <= {0, 1}
    assert set(df["PFS.Event"].unique()) <= {0, 1}
    times = df["OS.Time"].astype(str).str.replace(",", ".").astype(float)
    assert (times > 0).all()


def test_km_and_logrank_on_real_cohort():
    """KM estimator and log-rank run on the real survival columns."""
    df = _clin()
    times = df["OS.Time"].astype(str).str.replace(",", ".").astype(float).to_numpy()
    events = df["OS.Event"].to_numpy()
    t, s = kaplan_meier(times, events)
    assert (np.diff(s) <= 1e-12).all()         # survival is non-increasing
    assert 0.0 <= s[-1] <= 1.0
    # self-vs-self split: p-value must be ~1 (no difference)
    p = logrank_test(times, times, events, events)
    assert p > 0.99
    # real RECIST response groups should give a finite, valid p-value
    pd_mask = (df["RECIST"] == "PD").to_numpy()
    p2 = logrank_test(times[pd_mask], times[~pd_mask],
                      events[pd_mask], events[~pd_mask])
    assert 0.0 <= p2 <= 1.0


def test_clinical_pvalues_on_real_patients(tmp_path):
    """The full per-patient pipeline on the real cohort: synthetic per-pMHC
    predictions for every patient, real survival endpoints."""
    df = _clin()
    rng = np.random.default_rng(0)
    # reference sequence tables carry cohort-prefixed codes (mUC/MM/RH);
    # convert_patient_code remaps them to the clinical table's style
    inverse = {"BC": "mUC", "Neye": "MM", "RH": "RH"}
    rows = []
    for pat in df["Patient"]:
        prefix, _, number = pat.partition("-")
        code = f"{inverse[prefix]}-{number}" if prefix in inverse else pat
        assert convert_patient_code(code) == pat
        for _ in range(20):                     # 20 pMHCs per patient
            rows.append(code)
    seq_df = pd.DataFrame({"patient": rows})
    probs = rng.random(len(seq_df))
    # a few NaN rows (clinical rows without graphs) must be dropped cleanly
    probs[::97] = np.nan

    csv = str(tmp_path / "clin.csv")
    os_p, pfs_p = clinical_pvalues(probs, seq_df, df, fig_save_path=None,
                                   results_csv=csv)
    assert 0.0 <= os_p <= 1.0 and 0.0 <= pfs_p <= 1.0
    out = pd.read_csv(csv)
    assert len(out) == 70 and "load" in out.columns
    assert (out["load"] > 0).all()
