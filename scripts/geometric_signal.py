"""On-chip geometric learnability run (VERDICT r3 item 3).

Trains StructureModel THROUGH THE PRODUCTION KERNELS (aggregation 'auto'
-> mega on TPU, bf16) on a corpus whose label is a pure coordinate
function (peptide-tail compactness; sequence/properties label-independent
— data/synthetic.py geometric_signal), plus the SequenceFpModel negative
control. CPU-scatter equivalence is pinned by
tests/test_learnability.py::test_structure_model_learns_geometric_signal;
this script is the on-chip leg recorded in benchmarks/RESULTS.md.

Usage: python scripts/geometric_signal.py [--samples 512] [--epochs 14]
       [--cpu]   (CPU forces float32 + scatter)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def run_one(root: str, model_name: str, *, samples: int, epochs: int,
            on_tpu: bool, seed: int = 17):
    import jax
    import numpy as np

    from immunostruct_tpu.config import Config
    from immunostruct_tpu.data import (
        synthetic_corpus, ImmunoDataset, BatchPipeline, seeded_split,
    )
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import train_model
    from immunostruct_tpu.procedures.infer import inference
    from immunostruct_tpu.utils.losses import LossConfig, pos_weight_from_counts

    cfg = Config(batch_size=32, num_epochs=epochs,
                 pad_nodes_multiple=8 if on_tpu else 4,
                 pad_edges_multiple=128 if on_tpu else 16,
                 compute_dtype="bfloat16" if on_tpu else "float32",
                 aggregation="auto" if on_tpu else "scatter",
                 model=model_name, sequence_loss=False, full_sequence=False,
                 model_save_dir=os.path.join(root, f"ckpt_{model_name}"))
    cfg.derive_paths()
    gd, pp, hp = synthetic_corpus(root, num_samples=samples, seed=seed,
                                  geometric_signal=True)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    tr, va, te = seeded_split(len(ds), (0.7, 0.1, 0.2), cfg.seed)
    vae_dim = ds.seq_pep.shape[1] * 21
    spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
    loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                          sequence=False)
    mk = lambda idx, split: BatchPipeline(ds, idx, split=split, binary=True,
                                          full=False, config=cfg)
    params, hist = train_model(cfg, spec, params, mk(tr, "train"),
                               mk(va, "val"), loss_cfg, binary=True,
                               learning_rate=1e-3, stage="finetune",
                               verbose=False)
    train_stats = inference(cfg, spec, params, mk(tr, "train"), verbose=False)
    test_stats = inference(cfg, spec, params, mk(te, "test"),
                           optimal_threshold=train_stats["optimal_threshold"],
                           verbose=False)
    return {
        "model": model_name,
        "label_rate": round(float(np.mean(ds.immuno)), 3),
        "train_auroc": round(float(train_stats["roc_auc"]), 4),
        "test_auroc": round(float(test_stats["roc_auc"]), 4),
        "final_train_loss": round(float(hist["train_loss"][-1]), 4),
        "aggregation": cfg.aggregation,
        "compute_dtype": cfg.compute_dtype,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=14)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    on_tpu = jax.devices()[0].platform == "tpu"

    root = tempfile.mkdtemp(prefix="geomsig_")
    out = {"platform": jax.devices()[0].platform, "samples": args.samples,
           "epochs": args.epochs}
    out["structure"] = run_one(root, "StructureModel", samples=args.samples,
                               epochs=args.epochs, on_tpu=on_tpu)
    out["sequence_control"] = run_one(root, "SequenceFpModel",
                                      samples=args.samples,
                                      epochs=args.epochs, on_tpu=on_tpu)
    ok = (out["structure"]["test_auroc"] > 0.8
          and abs(out["sequence_control"]["test_auroc"] - 0.5) < 0.22)
    out["geometric_signal_recovered_by_structure_only"] = ok
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
