"""Real-data end-to-end run: the REAL cedar cancer table through the whole
stack (VERDICT round-1 missing #1/#4).

The reference checkout ships the real tables
(`/root/reference/data/cedar_data_final_with_mprop1_mprop2_v2.txt`, 2,800
rows; `HLA_27_seqs_csv.csv`) but NOT the graph corpora (.pt blobs) nor the
WT/IEDB property tables. This script makes the largest end-to-end run those
artifacts allow:

1. REAL tables: the cedar cancer table drives everything. The WT table is
   reconstructed with the schema the pipeline needs (same peptide pairs and
   labels; WT Mprops fall back to the cancer row's — documented synthesis,
   the WT branch label/foreignness conventions are forced by the dataset
   anyway). An IEDB-schema table is derived the same way for stage 1.
2. SELF-FEATURIZED structures: one PDB per unique real chain (274-aa HLA +
   peptide, the real sequences), CA coordinates from a deterministic
   compact random-walk fold, keyed by the REAL chain hashes
   (`Immuno<chain[-99:]>_<sha1[:5]>`), then featurized by the production
   featurizer (C++ kernel) — so graph topology statistics come from the
   real residue chemistry even though the folds are synthetic.
3. The flagship CLI `train_Cancer_wFT` runs its full 3-stage curriculum on
   the accelerator; metrics land in RESULTS.md.

Usage: python scripts/realdata_e2e.py [--epochs 3] [--workdir /tmp/realdata]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/data"
AA1_TO_3 = None  # filled on import below


def compact_fold(n: int, seed: int) -> np.ndarray:
    """Deterministic self-avoiding-ish random walk: 3.8 A steps confined to
    a protein-sized ball -> realistic CA contact densities."""
    rng = np.random.default_rng(seed)
    radius = 3.0 * n ** (1.0 / 3.0) + 4.0
    pos = np.zeros((n, 3), np.float32)
    cur = np.zeros(3)
    for i in range(1, n):
        step = rng.standard_normal(3)
        # bias back toward the center when outside the ball
        if np.linalg.norm(cur) > radius:
            step = step - 0.5 * cur / np.linalg.norm(cur) * np.linalg.norm(step)
        step = step / np.linalg.norm(step) * 3.8
        cur = cur + step
        pos[i] = cur
    return pos


def write_chain_pdb(path: str, chain: str, seed: int):
    from immunostruct_tpu.data.encoding import AA3_TO_1

    aa1to3 = {v: k for k, v in AA3_TO_1.items()}
    coords = compact_fold(len(chain), seed)
    with open(path, "w") as f:
        serial = 1
        for i, aa in enumerate(chain):
            res3 = aa1to3.get(aa, "GLY")
            x, y, z = coords[i]
            f.write(f"ATOM  {serial:5d}  CA  {res3} A{i + 1:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C\n")
            serial += 1
        f.write("END\n")


def build_tables(workdir: str):
    """Real cedar table -> (cancer, WT-schema, IEDB-schema) table files."""
    df = pd.read_table(os.path.join(REF_DATA, "cedar_data_final_with_mprop1_mprop2_v2.txt"))
    print(f"real cedar table: {len(df)} rows, "
          f"{df['immunogenicity'].sum():.0f} immunogenic")

    cancer_path = os.path.join(workdir, "cancer.tsv")
    df.to_csv(cancer_path, sep="\t", index=False)

    # WT-schema table: the pipeline needs (wt_pep, mut_pep, allele,
    # immunogenicity, foreign, Mprop1_wt, Mprop2_wt). WT Mprops are not in
    # the checkout; fall back to the cancer row's (the WT branch forces
    # label 0 and min-foreignness in the dataset regardless).
    wt = df.copy()
    wt["Mprop1_wt"] = wt["Mprop1"]
    wt["Mprop2_wt"] = wt["Mprop2"]
    wt_path = os.path.join(workdir, "wildtype.tsv")
    wt.to_csv(wt_path, sep="\t", index=False)

    # IEDB-schema table for stage 1: key = peptide + allele (already
    # 'HLA-A*02:01'-style), Foreignness_Score NaN-filter column.
    from immunostruct_tpu.data.tables import reformat_cancer_allele

    iedb = pd.DataFrame({
        "peptide": df["mut_pep"],
        "allele": reformat_cancer_allele(df["allele"]),
        "Foreignness_Score": df["foreign"],
        "smoothed_foreign": df["smoothed_foreign"],
        "Mprop1": df["Mprop1"],
        "Mprop2": df["Mprop2"],
        "immunogenicity": df["immunogenicity"],
    })
    iedb_path = os.path.join(workdir, "iedb.tsv")
    iedb.to_csv(iedb_path, sep="\t", index=False)
    return cancer_path, wt_path, iedb_path


def build_structures(workdir: str, cancer_path: str, wt_path: str,
                     fold_mode: str = "unique"):
    """One self-featurized graph per unique REAL chain, keyed by the real
    chain hash so the production join finds them.

    fold_mode controls the synthetic fold seed per chain — the knob for
    the structure-branch de-confounding experiment (VERDICT r2 item 4):
      'unique'   (default) seed = hash(chain): every chain gets its own
                 fold — a memorizable per-chain fingerprint;
      'shared'   one constant seed: all chains share one fold family, so
                 coordinates carry only length information and
                 fingerprinting is impossible;
      'permuted' seed = hash of a DIFFERENT chain (cyclic shift of the
                 sorted chain list): folds stay per-chain-unique (the
                 fingerprint channel survives) but carry no relationship
                 to the chain's identity beyond that.
    """
    from immunostruct_tpu.data.tables import (
        parse_property_tables_cancer_wt, expand_hla, get_hash,
    )

    hla_path = os.path.join(REF_DATA, "HLA_27_seqs_csv.csv")
    combined = parse_property_tables_cancer_wt(cancer_path, wt_path)
    print(f"combined cancer/WT rows after dedup+merge: {len(combined)}")

    mapper_c = expand_hla(combined["pep_pair_cancer"], hla_path)
    mapper_w = expand_hla(combined["pep_pair_wt"], hla_path)

    chains = {}
    for mapper in (mapper_c, mapper_w):
        for chain, key, pep in mapper.values():
            chains.setdefault(key, chain)

    ordered = sorted(chains)
    if fold_mode == "permuted":
        shift = {k: chains[ordered[(i + 1) % len(ordered)]]
                 for i, k in enumerate(ordered)}
        seed_of = lambda key: int(get_hash(shift[key])[:8], 16)
    elif fold_mode == "shared":
        seed_of = lambda key: 42
    else:
        assert fold_mode == "unique", fold_mode
        seed_of = lambda key: int(get_hash(chains[key])[:8], 16)

    pdb_dir = os.path.join(workdir, "pdbs")
    os.makedirs(pdb_dir, exist_ok=True)
    for key, chain in chains.items():
        write_chain_pdb(os.path.join(pdb_dir, f"Immuno{key}.pdb"), chain,
                        seed=seed_of(key))
    print(f"wrote {len(chains)} unique-chain PDBs (fold_mode={fold_mode})")

    from immunostruct_tpu.featurize import featurize_directory

    graph_dir = os.path.join(workdir, "graphs")
    t0 = time.perf_counter()
    written = featurize_directory(pdb_dir, graph_dir, workers=16)
    dt = time.perf_counter() - t0
    print(f"featurized {len(written)} graphs in {dt:.1f}s "
          f"({len(written) / dt:.0f} structs/s)")
    return graph_dir, hla_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--workdir", default="/tmp/realdata")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing workdir corpus")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    cancer_path = os.path.join(args.workdir, "cancer.tsv")
    wt_path = os.path.join(args.workdir, "wildtype.tsv")
    iedb_path = os.path.join(args.workdir, "iedb.tsv")
    graph_dir = os.path.join(args.workdir, "graphs")
    hla_path = os.path.join(REF_DATA, "HLA_27_seqs_csv.csv")

    if not args.skip_build:
        cancer_path, wt_path, iedb_path = build_tables(args.workdir)
        graph_dir, hla_path = build_structures(args.workdir, cancer_path, wt_path)

    from immunostruct_tpu.cli.train_Cancer_wFT import main as train_main

    t0 = time.perf_counter()
    train_main([
        "--model", "HybridModelv2_Comparative",
        "--use-wt-for-downstream",
        "--coeff-contrastive", "0.1",
        "--num-epochs", str(args.epochs),
        "--batch-size", str(args.batch_size),
        "--sequence-loss",
        "--skip-clinical",
        "--model-save-dir", os.path.join(args.workdir, "ckpt"),
        "--figure-save-dir", os.path.join(args.workdir, "figures"),
        "--graph-dir-IEDB", graph_dir,
        "--graph-dir-cancer", graph_dir,
        "--graph-dir-wildtype", graph_dir,
        "--property-path-IEDB", iedb_path,
        "--property-path-cancer", cancer_path,
        "--property-path-wildtype", wt_path,
        "--hla-path", hla_path,
    ])
    print(f"TOTAL train_Cancer_wFT wall-clock: {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
