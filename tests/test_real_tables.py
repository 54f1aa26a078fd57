"""Real-data parity tests against the reference's shipped tables.

The reference tree (read-only at /root/reference) ships the cancer property
table, the 27-allele HLA csv, and the clinical outcomes table. These tests
drive our table layer on the actual files the reference pipeline consumes,
pinning the join/dedup/expansion semantics on real inputs (graph files are
not shipped, so the joins themselves run on synthetic corpora elsewhere).
"""

import os

import numpy as np
import pandas as pd
import pytest

REF_DATA = "/root/reference/data"
CEDAR = os.path.join(REF_DATA, "cedar_data_final_with_mprop1_mprop2_v2.txt")
HLA = os.path.join(REF_DATA, "HLA_27_seqs_csv.csv")
CLINICAL = os.path.join(REF_DATA, "All_samples_clinical.txt")

needs_ref = pytest.mark.skipif(not os.path.exists(CEDAR),
                               reason="reference data not mounted")


@needs_ref
class TestCedarTable:
    def test_pinned_counts(self):
        """Exact invariants of the shipped cedar table — regression guards
        for the parsing/dedup pipeline (measured on the mounted reference)."""
        from immunostruct_tpu.data.tables import (
            parse_property_table, dedup_property_df,
        )
        _, _, imm, pairs = parse_property_table(CEDAR, cancer=True)
        assert len(pairs) == 2800            # no NaN-foreignness drops
        assert len(set(pairs)) == 2710       # 90 duplicate pep_pairs
        assert sum(v == 1 for v in imm.values()) == 520
        df = pd.read_table(CEDAR)
        short = df.dropna(subset="foreign")[
            ["mut_pep", "wt_pep", "allele", "immunogenicity",
             "smoothed_foreign", "Mprop1", "Mprop2"]]
        assert len(dedup_property_df(short)) == 2710

    def test_parse_cancer(self):
        from immunostruct_tpu.data.tables import parse_property_table
        f, fp2, imm, pairs = parse_property_table(CEDAR, cancer=True)
        assert len(pairs) > 2000  # ~2800 rows minus NaN-foreignness drops
        # keys look like peptide + star-formatted allele
        k = pairs[0]
        assert "HLA-" in k and "*" in k and ":" in k
        # labels are binary
        assert set(np.unique(list(imm.values()))) <= {0, 1}
        # properties are finite pairs
        some = next(iter(fp2.values()))
        assert len(some) == 2 and np.isfinite(some).all()

    def test_hla_expansion_covers_table(self):
        from immunostruct_tpu.data.tables import parse_property_table, expand_hla
        _, _, _, pairs = parse_property_table(CEDAR, cancer=True)
        hla_df = pd.read_csv(HLA)
        known = set(hla_df["allele"])
        coverable = [p for p in pairs if ("HLA-" + p.split("HLA-")[1]) in known]
        assert len(coverable) > 0
        mapper = expand_hla(coverable[:50], HLA)
        for pair, (chain, key, pep) in mapper.items():
            assert chain.endswith(pep)
            assert key.startswith(chain[-99:])
            assert len(key.split("_")[-1]) == 5  # sha1 prefix
            # chains are HLA(~274aa for the non-truncated csv) + peptide
            assert len(chain) > len(pep)

    def test_dedup_on_real_rows(self):
        from immunostruct_tpu.data.tables import dedup_property_df
        df = pd.read_table(CEDAR).dropna(subset="foreign")
        short = df[["mut_pep", "wt_pep", "allele", "immunogenicity",
                    "smoothed_foreign", "Mprop1", "Mprop2"]]
        out = dedup_property_df(short)
        assert len(out) <= len(short)
        assert out.groupby(["mut_pep", "wt_pep", "allele"]).size().max() == 1


@needs_ref
class TestClinicalTable:
    def test_pvalues_on_real_outcomes(self):
        """Mirror of the reference's clinical smoke test
        (clinical_validation.py:213-216) with constant predictions."""
        from immunostruct_tpu.procedures.clinical import clinical_pvalues
        clin_df = pd.read_table(CLINICAL)
        patients = clin_df["Patient"].tolist()
        # synth per-pMHC table: 5 rows per patient, reverse-mapped codes
        reverse = {"BC": "mUC", "Neye": "MM", "RH": "RH"}
        raw = []
        for p in patients:
            prefix, _, num = p.partition("-")
            raw.append(f"{reverse.get(prefix, prefix)}-{num}")
        seq_df = pd.DataFrame({"patient": np.repeat(raw, 5)})
        probs = np.ones(len(seq_df))
        os_p, pfs_p = clinical_pvalues(probs, seq_df, clin_df)
        assert 0.0 <= os_p <= 1.0 and 0.0 <= pfs_p <= 1.0

    def test_comma_decimal_normalization(self):
        from immunostruct_tpu.procedures.clinical import clinical_pvalues
        clin_df = pd.read_table(CLINICAL)
        # the shipped table uses dot decimals already; force commas to check
        clin_df["OS.Time"] = clin_df["OS.Time"].astype(str).str.replace(".", ",")
        patients = clin_df["Patient"].tolist()
        seq_df = pd.DataFrame({"patient": patients})
        probs = np.linspace(0, 1, len(patients))
        os_p, pfs_p = clinical_pvalues(probs, seq_df, clin_df)
        assert np.isfinite(os_p) and np.isfinite(pfs_p)
