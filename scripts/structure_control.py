"""Structure-branch de-confounding experiment (VERDICT round-2 item 4).

On the real cedar tables the multimodal HybridModelv2 scores BELOW the
sequence-only model (test AUROC 0.569 vs 0.636, benchmarks/RESULTS.md).
The standing explanation: each chain's self-featurized stand-in structure
is a UNIQUE random fold — a memorizable per-chain fingerprint that aids
train-set fit and hurts generalization. This script tests that claim with
controls instead of leaving it a conjecture:

  unique    the baseline: fold seed = hash(chain) (fingerprint present)
  shared    one fold family for every chain: fingerprinting impossible —
            if the explanation holds, test AUROC recovers toward the
            sequence-only 0.636
  permuted  every chain gets a DIFFERENT chain's fold: fingerprint channel
            survives, geometry decoupled from identity — should look like
            'unique' under the fingerprint explanation

Each arm runs the canonical train_IEDB_wFT two-stage recipe (multimodal
HybridModelv2, real IEDB-schema cedar table, identical seeds/splits).
Prints one JSON line with the per-arm test metrics.

Usage: python scripts/structure_control.py [--epochs 40] [--workdir ...]
       [--arms unique,shared,permuted]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from scripts.realdata_e2e import build_tables, build_structures  # noqa: E402


def run_arm(workdir: str, arm: str, iedb_path: str, cancer_path: str,
            wt_path: str, hla_path: str, epochs: int, batch_size: int):
    arm_dir = os.path.join(workdir, arm)
    os.makedirs(arm_dir, exist_ok=True)
    graph_dir = os.path.join(arm_dir, "graphs")
    if not os.path.isdir(graph_dir):
        # build_structures featurizes into workdir-local dirs; point it at
        # the arm dir so each arm keeps its own corpus
        graph_dir_built, _ = build_structures(arm_dir, cancer_path, wt_path,
                                              fold_mode=arm)
        assert graph_dir_built == graph_dir, (graph_dir_built, graph_dir)

    from immunostruct_tpu.cli.train_IEDB_wFT import main as train_main

    t0 = time.perf_counter()
    train_stats, test_stats = train_main([
        "--model", "HybridModelv2",
        "--num-epochs", str(epochs),
        "--batch-size", str(batch_size),
        "--sequence-loss",
        "--model-save-dir", os.path.join(arm_dir, "ckpt"),
        "--graph-dir-IEDB", graph_dir,
        "--property-path-IEDB", iedb_path,
        "--hla-path", hla_path,
    ])
    wall = time.perf_counter() - t0
    return {"test_roc_auc": round(test_stats["roc_auc"], 4),
            "test_pr_auc": round(test_stats["pr_auc"], 4),
            "train_roc_auc": round(train_stats["roc_auc"], 4),
            "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--workdir", default="/tmp/structure_control")
    ap.add_argument("--arms", default="unique,shared,permuted")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    cancer_path, wt_path, iedb_path = build_tables(args.workdir)
    hla_path = os.path.join("/root/reference/data", "HLA_27_seqs_csv.csv")

    results = {}
    for arm in args.arms.split(","):
        print(f"=== arm: {arm} ===", file=sys.stderr)
        results[arm] = run_arm(args.workdir, arm, iedb_path, cancer_path,
                               wt_path, hla_path, args.epochs,
                               args.batch_size)
        print(json.dumps({arm: results[arm]}), file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
