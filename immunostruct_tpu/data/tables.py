"""Property-table parsing, pep_pair construction, HLA expansion.

Reference semantics (data/preprocess.py:45-145), reproduced bug-for-bug
where the quirk affects which rows survive joins:

- IEDB tables key on ``peptide + allele`` after dropping rows with NaN
  ``Foreignness_Score`` (preprocess.py:56-57).
- Cancer tables drop NaN ``foreign`` and rebuild the allele string as
  ``HLA-A*02:01`` style from the raw ``HLA-A0201`` form (preprocess.py:48-53);
  key is ``mut_pep + allele``.
- Cancer/WT pairing merges on (mut_pep, wt_pep, allele, immunogenicity);
  the reference constructs the WT allele tail from the *cancer* dataframe's
  ``allele2`` column (preprocess.py:78). Because both tables are row-aligned
  on the same peptides in practice the result is identical; we build it from
  the WT table's own allele and document the divergence here.
- Duplicate (mut_pep, wt_pep, allele) rows keep max-foreignness if
  immunogenic else min (preprocess.py:92-130).
- HLA expansion: full chain = 274-aa HLA sequence + peptide; the graph join
  key is ``chain[-99:] + '_' + sha1(chain)[:5]`` (preprocess.py:132-145).
"""

from __future__ import annotations

import functools
import hashlib
from typing import Iterable

import pandas as pd


def get_hash(x: str) -> str:
    """sha1 hex digest (data/utils.py:157-158)."""
    return hashlib.sha1(x.encode()).hexdigest()


def reformat_cancer_allele(allele: pd.Series) -> pd.Series:
    """'HLA-A0201' -> 'HLA-A*02:01' (preprocess.py:51-52)."""
    parts = allele.str.split("-", expand=True)
    tail = parts[1]
    return parts[0] + "-" + tail.str[0] + "*" + tail.str[1:3] + ":" + tail.str[3:]


def parse_property_table(path: str, cancer: bool = False):
    """Returns (foreign_dict, props_dict, immuno_dict, pep_pairs).

    Mirrors preprocess_properties (preprocess.py:45-64).
    """
    df = pd.read_table(path)
    if cancer:
        df = df.dropna(subset="foreign")
        df = df.assign(pep_pair=df["mut_pep"] + reformat_cancer_allele(df["allele"]))
    else:
        df = df.dropna(subset="Foreignness_Score")
        df = df.assign(pep_pair=df["peptide"] + df["allele"])

    f_dict = dict(zip(df["pep_pair"], df["smoothed_foreign"]))
    fp2_dict = dict(zip(df["pep_pair"], zip(df["Mprop1"], df["Mprop2"])))
    imm_dict = dict(zip(df["pep_pair"], df["immunogenicity"]))
    return f_dict, fp2_dict, imm_dict, df["pep_pair"].tolist()


def dedup_property_df(df: pd.DataFrame) -> pd.DataFrame:
    """Deduplicate (mut_pep, wt_pep, allele) keeping the extreme-foreignness
    row per the immunogenicity rule (preprocess.py:92-130)."""
    foreign_key = "smoothed_foreign" if "smoothed_foreign" in df else "foreign"
    group_cols = ["mut_pep", "wt_pep", "allele"]

    imm_per_group = df.groupby(group_cols)["immunogenicity"].nunique()
    if (imm_per_group > 1).any():
        # exact parity: the reference hard-asserts on this too
        # (preprocess.py:99-101 and :115-116), so mixed-immunogenicity
        # duplicate groups abort in both implementations
        raise ValueError("same (mut_pep, wt_pep, allele) with different immunogenicity")

    # tie semantics match the reference's argmax/argmin (preprocess.py:121-124):
    # both keep the FIRST-occurring extreme row, so sort stably toward the
    # extreme and keep 'first' (descending for immunogenic max, ascending
    # for non-immunogenic min) — verified against the executed reference on
    # the real cedar table (tests/test_reference_executed.py)
    imm_rows = df["immunogenicity"] == 1
    imm = (df[imm_rows].sort_values(foreign_key, kind="stable", ascending=False)
           .drop_duplicates(group_cols, keep="first"))
    non = (df[~imm_rows].sort_values(foreign_key, kind="stable")
           .drop_duplicates(group_cols, keep="first"))
    return pd.concat([imm, non]).sort_index()


def parse_property_tables_cancer_wt(path_cancer: str, path_wt: str) -> pd.DataFrame:
    """Paired cancer/WT combined table (preprocess.py:67-90)."""
    dfc = pd.read_table(path_cancer).dropna(subset="foreign")
    dfw = pd.read_table(path_wt).dropna(subset="foreign")

    dfc = dfc.assign(pep_pair_cancer=dfc["mut_pep"] + reformat_cancer_allele(dfc["allele"]))
    dfw = dfw.assign(pep_pair_wt=dfw["wt_pep"] + reformat_cancer_allele(dfw["allele"]))

    short_c = dfc[["mut_pep", "wt_pep", "allele", "immunogenicity", "pep_pair_cancer",
                   "smoothed_foreign", "Mprop1", "Mprop2"]]
    short_w = dfw[["mut_pep", "wt_pep", "allele", "immunogenicity", "foreign",
                   "pep_pair_wt", "Mprop1_wt", "Mprop2_wt"]]
    short_c = dedup_property_df(short_c)
    short_w = dedup_property_df(short_w)

    combined = pd.merge(short_c, short_w, on=["mut_pep", "wt_pep", "allele", "immunogenicity"])
    combined = combined[["mut_pep", "wt_pep", "allele", "immunogenicity",
                         "pep_pair_cancer", "pep_pair_wt", "smoothed_foreign",
                         "Mprop1", "Mprop1_wt", "Mprop2", "Mprop2_wt"]]
    if not (len(short_c) == len(short_w) == len(combined)):
        raise ValueError(
            f"cancer/WT tables misaligned: {len(short_c)} vs {len(short_w)} vs merged {len(combined)}")
    return combined


def find_matching_allele(peptide: str, alleles: Iterable[str],
                         pep_pairs: set) -> object:
    """First allele whose (peptide + allele) key exists in the table
    (reference: data/utils.py:38-43; returns 0 when none match)."""
    for allele in alleles:
        combo = peptide + allele
        if combo in pep_pairs:
            return combo
    return 0


def get_z_peps(expanded_df: pd.DataFrame, seq_df: pd.DataFrame) -> list:
    """Peptides with combo2 == 0 whose table rows are all non-immunogenic
    (reference: data/utils.py:45-52)."""
    z_peps = []
    for pep in seq_df[seq_df["combo2"] == 0]["peptide"].tolist():
        rows = expanded_df[expanded_df["peptide"] == pep]
        if rows["immunogenicity"].sum() == 0:
            z_peps.append(pep)
    return z_peps


@functools.lru_cache(maxsize=8)
def _load_hla_seqs(hla_path: str) -> dict:
    """allele -> 274-aa sequence, cached: ComparativeDataset.load expands
    the cancer and WT mappers back-to-back from the same csv, and the
    flagship CLI loads several datasets against one HLA table."""
    hla_df = pd.read_csv(hla_path)
    return dict(zip(hla_df["allele"], hla_df["seqs"]))


def expand_hla(pep_pairs: Iterable[str], hla_path: str) -> dict:
    """pep_pair -> (full_chain, graph_key, peptide) (preprocess.py:132-145).

    full_chain = HLA sequence + peptide; graph_key = chain[-99:]_sha1[:5].
    """
    hla_seqs = _load_hla_seqs(hla_path)

    name_mapper = {}
    for pair in pep_pairs:
        parts = pair.split("HLA-")
        if len(parts) != 2:
            raise ValueError(
                f"pep_pair {pair!r} has no 'HLA-' allele part — only "
                "HLA-prefixed class-I alleles are supported "
                "(preprocess.py:132-145 assumes the same)")
        pep, hla = parts
        try:
            chain = hla_seqs["HLA-" + hla] + pep
        except KeyError:
            raise ValueError(
                f"allele 'HLA-{hla}' (from pep_pair {pair!r}) is not in "
                f"{hla_path} ({len(hla_seqs)} alleles); extend the HLA "
                "sequence table to cover this corpus") from None
        hashed = get_hash(chain)[:5]
        name_mapper[pair] = (chain, chain[-99:] + "_" + hashed, pep)
    return name_mapper
