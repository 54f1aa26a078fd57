"""Batch inference entry point (reference: immunostruct/infer_IEDB_or_Cancer.py).

Rebuilds the dataset, recovers the same seeded test fold, loads a finetuned
checkpoint, evaluates, and dumps raw predictions with sequences to
``predictions_PPI.txt`` (probs, labels, chains; reference :102-104).
"""

from __future__ import annotations

import os

import numpy as np

from immunostruct_tpu.cli.common import base_parser, to_config
from immunostruct_tpu.data import (
    ImmunoDataset, ComparativeDataset, BatchPipeline, ComparativePipeline,
    seeded_split,
)
from immunostruct_tpu.models import build_model
from immunostruct_tpu.procedures.infer import inference
from immunostruct_tpu.utils.seeding import seed_everything
from immunostruct_tpu.utils.torch_import import (
    is_torch_checkpoint, load_any_checkpoint, require_exact_reference_padding,
)


def main(argv=None):
    p = base_parser("Batch inference (TPU-native)")
    p.add_argument("--checkpoint", required=True, type=str)
    p.add_argument("--comparative", action="store_true")
    p.add_argument("--use-wt-for-downstream", action="store_true")
    p.add_argument("--graph-dir-IEDB", default="$ROOT/data/graph_pyg_IEDB/", type=str)
    p.add_argument("--graph-dir-cancer", default="$ROOT/data/graph_pyg_Cancer/", type=str)
    p.add_argument("--graph-dir-wildtype", default="$ROOT/data/graph_pyg_Cancer_WT/", type=str)
    p.add_argument("--property-path-IEDB",
                   default="$ROOT/data/complete_score_Mprops_1_2_smoothed_sasa_v2.txt", type=str)
    p.add_argument("--property-path-cancer",
                   default="$ROOT/data/cedar_data_final_with_mprop1_mprop2_v2.txt", type=str)
    p.add_argument("--property-path-wildtype",
                   default="$ROOT/data/cedar_data_final_WILD_TYPE_with_mprop1_mprop2_v2.txt", type=str)
    p.add_argument("--output", default="predictions_PPI.txt", type=str)
    args = p.parse_args(argv)
    config = to_config(args)
    config.derive_paths()
    root_key = seed_everything(config.seed)

    # reference torch checkpoints were trained at exact-corpus-max padding;
    # must decide BEFORE the dataset pads (MIGRATION.md "Padding geometry")
    from_torch = is_torch_checkpoint(args.checkpoint)
    if from_torch:
        require_exact_reference_padding(config)

    if args.comparative:
        dataset = ComparativeDataset.load(
            config, config.graph_dir_cancer, config.graph_dir_wildtype,
            config.property_path_cancer, config.property_path_wildtype,
            config.hla_path)
        seq_source = dataset.cancer
        n = len(dataset)
    else:
        dataset = ImmunoDataset.load(config, config.graph_dir_IEDB,
                                     config.property_path_IEDB, config.hla_path)
        seq_source = dataset
        n = len(dataset)

    # seeded re-split to recover the same test fold (infer_IEDB_or_Cancer.py:86)
    _, _, test_idx = seeded_split(n, (0.8, 0.1, 0.1), config.seed)

    vae_dim = (seq_source.seq_full.shape[1] if config.full_sequence
               else seq_source.seq_pep.shape[1]) * 21
    spec, params = build_model(config.model, vae_dim, root_key,
                               use_wt_for_downstream=args.use_wt_for_downstream)
    params = load_any_checkpoint(args.checkpoint, params, spec)

    if args.comparative:
        pipe = ComparativePipeline(dataset, test_idx, split="test", binary=True,
                                   full=config.full_sequence, config=config)
    else:
        pipe = BatchPipeline(dataset, test_idx, split="test", binary=True,
                             full=config.full_sequence, config=config)

    stats = inference(config, spec, params, pipe, return_raw_preds=True)

    chains = [seq_source.raw_chain[i] for i in test_idx]
    out = np.stack([stats["predicted_probs"].astype(object),
                    stats["true_targets"].astype(object),
                    np.asarray(chains, object)], axis=1)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    np.savetxt(args.output, out, fmt="%s", delimiter="\t")
    print(f"wrote {len(out)} predictions to {args.output}")
    return stats


if __name__ == "__main__":
    main()
