"""Clinical survival validation (reference: procedures/clinical_validation.py).

Self-contained numpy Kaplan-Meier estimator and two-sample log-rank test
replacing lifelines (clinical_validation.py:7-8, :77-90). The pipeline:

  per-pMHC predicted probabilities -> per-patient summed "immunogenicity
  load" (clinical_validation.py:49-52) -> median split into low/high groups
  (:69-74, both groups include the median row: <= and >=) -> log-rank
  p-values for OS and PFS (:77-90) -> optional KM plot (:103-165).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
import pandas as pd


def convert_patient_code(patient_code: str) -> str:
    """Cohort prefix remap (clinical_validation.py:13-25)."""
    mapping = {"mUC": "BC", "MM": "Neye", "RH": "RH"}
    prefix, _, number = patient_code.partition("-")
    return f"{mapping[prefix]}-{number}" if prefix in mapping else patient_code


def kaplan_meier(times: np.ndarray, events: np.ndarray):
    """KM survival estimate. Returns (unique_event_times, survival_prob)."""
    order = np.argsort(times, kind="stable")
    times, events = np.asarray(times)[order], np.asarray(events)[order]
    uniq = np.unique(times[events.astype(bool)])
    n = len(times)
    surv = []
    s = 1.0
    for t in uniq:
        at_risk = np.sum(times >= t)
        died = np.sum((times == t) & events.astype(bool))
        s *= 1.0 - died / at_risk
        surv.append(s)
    return uniq, np.asarray(surv)


def _chi2_sf_1dof(x: float) -> float:
    """Survival function of chi-square with 1 dof: erfc(sqrt(x/2))."""
    return math.erfc(math.sqrt(max(x, 0.0) / 2.0))


def logrank_test(times_a, times_b, events_a, events_b) -> float:
    """Two-sample log-rank test p-value (lifelines.logrank_test equivalent)."""
    times_a = np.asarray(times_a, float)
    times_b = np.asarray(times_b, float)
    events_a = np.asarray(events_a).astype(bool)
    events_b = np.asarray(events_b).astype(bool)

    all_event_times = np.unique(np.concatenate([times_a[events_a], times_b[events_b]]))
    o_minus_e = 0.0
    var = 0.0
    for t in all_event_times:
        n_a = np.sum(times_a >= t)
        n_b = np.sum(times_b >= t)
        d_a = np.sum((times_a == t) & events_a)
        d_b = np.sum((times_b == t) & events_b)
        n = n_a + n_b
        d = d_a + d_b
        if n < 2 or d == 0:
            continue
        expected_a = d * n_a / n
        v = d * (n_a / n) * (n_b / n) * (n - d) / (n - 1)
        o_minus_e += d_a - expected_a
        var += v
    if var <= 0:
        return 1.0
    chi2 = o_minus_e ** 2 / var
    return _chi2_sf_1dof(chi2)


def clinical_pvalues(predicted_probs: np.ndarray, seq_df: pd.DataFrame,
                     clin_df: pd.DataFrame, fig_save_path: Optional[str] = None,
                     results_csv: Optional[str] = None):
    """Per-patient load aggregation + median split + OS/PFS log-rank p-values.

    ``seq_df`` needs a 'patient' column aligned with ``predicted_probs``;
    ``clin_df`` needs Patient / OS.Time / OS.Event / PFS.Time / PFS.Event.
    Mirrors clinical_validation.py:28-100 (incl. NaN-probability rows being
    dropped before aggregation, and comma-decimal normalization).
    """
    seq_df = seq_df.copy()
    seq_df["patient_ID"] = seq_df["patient"].apply(convert_patient_code)
    seq_df["predicted"] = np.asarray(predicted_probs, float)
    seq_df = seq_df.dropna(subset=["predicted"])

    load = seq_df.groupby("patient_ID")["predicted"].sum().reset_index()
    load = load.sort_values("patient_ID")

    clin_df = clin_df.copy()
    for col in ("PFS.Time", "OS.Time"):
        clin_df[col] = clin_df[col].astype(str).str.replace(",", ".").astype(float)
    clin_df["patient_ID"] = clin_df["Patient"]
    clin_df = clin_df.sort_values("patient_ID")
    clin_df["load"] = load["predicted"].tolist()

    if results_csv:
        os.makedirs(os.path.dirname(results_csv) or ".", exist_ok=True)
        clin_df.to_csv(results_csv)

    median = np.percentile(clin_df["load"], 50)
    low = clin_df[clin_df["load"] <= median]
    high = clin_df[clin_df["load"] >= median]

    os_p = logrank_test(low["OS.Time"], high["OS.Time"],
                        low["OS.Event"], high["OS.Event"])
    pfs_p = logrank_test(low["PFS.Time"], high["PFS.Time"],
                         low["PFS.Event"], high["PFS.Event"])

    if fig_save_path is not None:
        if os_p > 0.1 and pfs_p > 0.1:
            print("Not plotting clinical KM figures: both p-values > 0.1.")
        else:
            plot_clinical_validation(low, high, os_p, pfs_p, fig_save_path)

    return os_p, pfs_p


def plot_clinical_validation(low: pd.DataFrame, high: pd.DataFrame,
                             os_p: float, pfs_p: float, fig_save_path: str):
    """KM curves for OS and PFS, low vs high predicted-immunogenicity load."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping clinical KM plot")
        return

    fig, axes = plt.subplots(1, 2, figsize=(14, 6), dpi=150)
    for ax, (tcol, ecol, p, title) in zip(axes, [
        ("OS.Time", "OS.Event", os_p, "OS Kaplan-Meier"),
        ("PFS.Time", "PFS.Event", pfs_p, "PFS Kaplan-Meier"),
    ]):
        for df, label, color in ((low, "Low Predicted Immunogenicity", "mediumblue"),
                                 (high, "High Predicted Immunogenicity", "firebrick")):
            t, s = kaplan_meier(df[tcol].to_numpy(), df[ecol].to_numpy())
            t = np.r_[0.0, t]
            s = np.r_[1.0, s]
            ax.step(t, s, where="post", label=label, color=color, linewidth=2.5)
        ax.text(0.6, 0.12, f"p-value = {p:.4f}", transform=ax.transAxes)
        ax.set_title(title)
        ax.set_xlabel("Time (months)")
        ax.set_ylabel("Survival Probability")
        ax.legend()
    fig.tight_layout(pad=2)
    os.makedirs(os.path.dirname(fig_save_path) or ".", exist_ok=True)
    fig.savefig(fig_save_path)
    plt.close(fig)
