"""Clinical-only inference entry point (reference: immunostruct/infer_clinical_only.py).

Loads a finetuned checkpoint, scores the clinical pMHC table, aggregates
per-patient predicted-immunogenicity load, and reports OS/PFS log-rank
p-values with optional KM figures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from immunostruct_tpu.cli.common import base_parser, to_config
from immunostruct_tpu.data import ClinicalDataset, BatchPipeline
from immunostruct_tpu.models import build_model
from immunostruct_tpu.procedures.infer import inference_clinical_only
from immunostruct_tpu.utils.torch_import import (
    is_torch_checkpoint, load_any_checkpoint, require_exact_reference_padding,
)
from immunostruct_tpu.utils.seeding import seed_everything


def main(argv=None):
    p = base_parser("Clinical-only inference (TPU-native)")
    p.set_defaults(model="HybridModelv2_Comparative")
    p.add_argument("--checkpoint", required=True, type=str)
    p.add_argument("--use-wt-for-downstream", action="store_true")
    p.add_argument("--graph-dir-clinical", default="$ROOT/data/graph_pyg_Clinical/", type=str)
    p.add_argument("--seq-path-clinical", default="$ROOT/data/hadrup_cancer_df_29K.txt", type=str)
    p.add_argument("--clinical-table-path", default="$ROOT/data/All_samples_clinical.txt", type=str)
    p.add_argument("--figure-save-dir", default="$ROOT/figures/clinical/", type=str)
    # model hyperparameters exposed as flags (infer_clinical_only.py:21-26)
    p.add_argument("--gcn-layers", default=5, type=int)
    p.add_argument("--vae-hidden-dim", default=512, type=int)
    p.add_argument("--vae-latent-dim", default=32, type=int)
    p.add_argument("--gat-hidden-channels", default=64, type=int)
    p.add_argument("--property-embedding-dim", default=8, type=int)
    args = p.parse_args(argv)
    config = to_config(args)
    # reference torch checkpoints need exact-corpus-max padding, decided
    # before the dataset pads (MIGRATION.md "Padding geometry")
    if is_torch_checkpoint(args.checkpoint):
        require_exact_reference_padding(config)
    config.derive_paths()
    root_key = seed_everything(config.seed)

    ds = ClinicalDataset.load(config, config.graph_dir_clinical,
                              config.seq_path_clinical)
    vae_dim = (ds.seq_full.shape[1] if config.full_sequence
               else ds.seq_pep.shape[1]) * 21
    spec, params = build_model(
        config.model, vae_dim, root_key,
        use_wt_for_downstream=args.use_wt_for_downstream,
        gcn_layers=config.gcn_layers, vae_hidden_dim=config.vae_hidden_dim,
        vae_latent_dim=config.vae_latent_dim,
        gat_hidden_channels=config.gat_hidden_channels,
        property_embedding_dim=config.property_embedding_dim)
    params = load_any_checkpoint(args.checkpoint, params, spec)

    pipe = BatchPipeline(ds, np.arange(len(ds)), split="infer", binary=True,
                         full=config.full_sequence, config=config, shuffle=False)
    clinical = {"pipe": pipe, "valid": ds.valid,
                "seq_df": pd.read_table(config.seq_path_clinical),
                "clin_df": pd.read_table(config.clinical_table_path)}
    out = inference_clinical_only(config, spec, params, clinical,
                                  fig_save_folder=config.fig_save_folder)
    return out


if __name__ == "__main__":
    main()
