"""Run the canonical train_IEDB_wFT recipe at several seeds and summarize.

RESULTS.md's seed-variance section (the 'unique'-arm re-runs) showed the
40+40-epoch recipe's run-to-run spread is ~±0.05 test AUROC with
occasional near-collapse runs — so any AUROC claim needs 3+ seeds. This
script makes that protocol one command for any model on the real-table
corpus built by scripts/realdata_e2e.py / scripts/structure_control.py.

Usage: python scripts/seed_sweep.py --model SequenceFpModel
         [--seeds 1,2,3] [--epochs 40] [--workdir /tmp/structure_control]
       python scripts/seed_sweep.py --recipe cancer --epochs 60
         [--workdir /tmp/realdata]    # flagship 3-stage curriculum
Prints one JSON line: per-seed test metrics + median/min/max.
"""

from __future__ import annotations

import argparse
import json
import statistics
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


HLA_PATH = "/root/reference/data/HLA_27_seqs_csv.csv"


def _run_iedb(args, seed):
    iedb_path = os.path.join(args.workdir, "iedb.tsv")
    graph_dir = os.path.join(args.workdir, "unique", "graphs")
    if not (os.path.isfile(iedb_path) and os.path.isdir(graph_dir)):
        sys.exit(f"real-table corpus not found under {args.workdir}; "
                 "run scripts/structure_control.py (or realdata_e2e.py) first")
    from immunostruct_tpu.cli.train_IEDB_wFT import main as train_main
    argv = [
        "--model", args.model,
        "--num-epochs", str(args.epochs),
        "--batch-size", str(args.batch_size),
        "--seed", str(seed),
        "--sequence-loss",
        "--learning-rate-pretrain", str(args.lr_pretrain),
        "--pretrain-warmup-epochs", str(args.pretrain_warmup_epochs),
        "--model-save-dir", os.path.join(args.workdir,
                                         f"seed{seed}_{args.model}_{args.tag}"),
        "--graph-dir-IEDB", graph_dir,
        "--property-path-IEDB", iedb_path,
        "--hla-path", HLA_PATH,
    ]
    if args.reinit_on_collapse:
        argv.append("--reinit-on-collapse")
    return train_main(argv)


def _run_cancer(args, seed):
    """Flagship 3-stage curriculum on the realdata_e2e.py corpus."""
    graph_dir = os.path.join(args.workdir, "graphs")
    iedb_path = os.path.join(args.workdir, "iedb.tsv")
    cancer_path = os.path.join(args.workdir, "cancer.tsv")
    wt_path = os.path.join(args.workdir, "wildtype.tsv")
    missing = [p for p in (graph_dir, iedb_path, cancer_path, wt_path)
               if not os.path.exists(p)]
    if missing:
        sys.exit(f"real-table corpus incomplete under {args.workdir} "
                 f"(missing {missing}); run scripts/realdata_e2e.py first")
    from immunostruct_tpu.cli.train_Cancer_wFT import main as train_main
    argv = [
        "--model", "HybridModelv2_Comparative",
        "--coeff-contrastive", str(args.coeff_contrastive),
        "--num-epochs", str(args.epochs),
        "--batch-size", str(args.batch_size),
        "--seed", str(seed),
        "--sequence-loss",
        "--skip-clinical",
        "--learning-rate-pretrain", str(args.lr_pretrain),
        "--pretrain-warmup-epochs", str(args.pretrain_warmup_epochs),
        "--model-save-dir", os.path.join(args.workdir,
                                         f"seed{seed}_ckpt_{args.tag}"),
        "--figure-save-dir", os.path.join(args.workdir,
                                          f"seed{seed}_figs_{args.tag}"),
        "--graph-dir-IEDB", graph_dir,
        "--graph-dir-cancer", graph_dir,
        "--graph-dir-wildtype", graph_dir,
        "--property-path-IEDB", iedb_path,
        "--property-path-cancer", cancer_path,
        "--property-path-wildtype", wt_path,
        "--hla-path", HLA_PATH,
    ]
    if args.use_wt_for_downstream:
        argv.append("--use-wt-for-downstream")
    if args.reinit_on_collapse:
        argv.append("--reinit-on-collapse")
    return train_main(argv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", default="iedb", choices=["iedb", "cancer"])
    ap.add_argument("--model", default="SequenceFpModel")
    ap.add_argument("--seeds", default="1,2,3")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--workdir", default=None)
    # experiment arms (VERDICT r4 items 6-7): contrastive on/off,
    # WT-embedding on/off, pretrain LR / warmup / reinit collapse probes
    ap.add_argument("--coeff-contrastive", dest="coeff_contrastive",
                    default=0.1, type=float)
    ap.add_argument("--use-wt-for-downstream", dest="use_wt_for_downstream",
                    action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--lr-pretrain", dest="lr_pretrain", default=1e-3,
                    type=float)
    ap.add_argument("--pretrain-warmup-epochs", dest="pretrain_warmup_epochs",
                    default=0, type=int)
    ap.add_argument("--reinit-on-collapse", dest="reinit_on_collapse",
                    action="store_true")
    ap.add_argument("--tag", default="base",
                    help="arm label; also keeps per-arm checkpoints apart")
    args = ap.parse_args()
    if args.workdir is None:
        args.workdir = ("/tmp/realdata" if args.recipe == "cancer"
                        else "/tmp/structure_control")
    if args.recipe == "cancer" and args.model != "SequenceFpModel":
        sys.exit("--recipe cancer always trains HybridModelv2_Comparative "
                 "(the flagship curriculum); --model applies to the iedb "
                 "recipe only")

    per_seed = {}
    for seed in [int(s) for s in args.seeds.split(",")]:
        if args.recipe == "cancer":
            train_stats, test_stats = _run_cancer(args, seed)
        else:
            train_stats, test_stats = _run_iedb(args, seed)
        per_seed[seed] = {
            "test_roc_auc": round(test_stats["roc_auc"], 4),
            "test_pr_auc": round(test_stats["pr_auc"], 4),
            "train_roc_auc": round(train_stats["roc_auc"], 4),
        }
        print(f"seed {seed}: test AUROC {per_seed[seed]['test_roc_auc']}",
              file=sys.stderr)

    aucs = sorted(v["test_roc_auc"] for v in per_seed.values())
    print(json.dumps({
        "recipe": args.recipe,
        "model": ("HybridModelv2_Comparative" if args.recipe == "cancer"
                  else args.model),
        "tag": args.tag,
        "arm": {"coeff_contrastive": args.coeff_contrastive,
                "use_wt_for_downstream": args.use_wt_for_downstream,
                "lr_pretrain": args.lr_pretrain,
                "pretrain_warmup_epochs": args.pretrain_warmup_epochs,
                "reinit_on_collapse": args.reinit_on_collapse},
        "epochs": args.epochs,
        "per_seed": per_seed,
        # statistics.median averages the two middle values for even seed
        # counts (the partial-extension runs, e.g. --seeds 4,5); the old
        # upper-middle indexing reported the MAX of a 2-seed run as "median"
        "test_roc_auc_median": float(statistics.median(aucs)),
        "test_roc_auc_min": aucs[0], "test_roc_auc_max": aucs[-1],
    }))


if __name__ == "__main__":
    main()
