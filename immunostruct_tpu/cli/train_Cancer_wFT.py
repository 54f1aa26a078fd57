"""Cancer 3-stage comparative curriculum entry point (the flagship).

Mirrors reference: immunostruct/train_Cancer_wFT.py —
  stage 1: IEDB foreignness pretrain (plain forward),
  stage 2: comparative cancer-foreignness pretrain (twin forward),
  stage 3: comparative immunogenicity-BCE finetune with warmup-cosine LR and
           ExtendedDataset oversampling floor,
then comparative inference incl. clinical OS/PFS survival validation.
"""

from __future__ import annotations

import jax
import numpy as np
import pandas as pd

from immunostruct_tpu.cli.common import (
    base_parser, check_seq_dims, pick_pipeline, to_config,
)
from immunostruct_tpu.data import (
    ImmunoDataset, ComparativeDataset, ClinicalDataset,
    BatchPipeline, seeded_split,
)
from immunostruct_tpu.models import build_model, reset_head
from immunostruct_tpu.procedures.train import train_model
from immunostruct_tpu.procedures.infer import inference
from immunostruct_tpu.utils.checkpoint import load_checkpoint
from immunostruct_tpu.utils.losses import LossConfig, pos_weight_from_counts
from immunostruct_tpu.utils.logging import MetricLogger, stage_log_fn, stats_to_wandb
from immunostruct_tpu.utils.schedule import linear_warmup_cosine_annealing
from immunostruct_tpu.utils.seeding import seed_everything


def main(argv=None):
    p = base_parser("Cancer comparative curriculum (TPU-native)")
    p.set_defaults(model="HybridModelv2_Comparative", batch_size=128)
    p.add_argument("--use-wt-for-downstream", action="store_true")
    p.add_argument("--min-finetuning-batches", default=64, type=int)
    p.add_argument("--coeff-contrastive", default=0.0, type=float)
    p.add_argument("--figure-save-dir", default="$ROOT/figures/run/", type=str)
    p.add_argument("--graph-dir-IEDB", default="$ROOT/data/graph_pyg_IEDB/", type=str)
    p.add_argument("--graph-dir-cancer", default="$ROOT/data/graph_pyg_Cancer/", type=str)
    p.add_argument("--graph-dir-wildtype", default="$ROOT/data/graph_pyg_Cancer_WT/", type=str)
    p.add_argument("--graph-dir-clinical", default="$ROOT/data/graph_pyg_Clinical/", type=str)
    p.add_argument("--property-path-IEDB",
                   default="$ROOT/data/complete_score_Mprops_1_2_smoothed_sasa_v2.txt", type=str)
    p.add_argument("--property-path-cancer",
                   default="$ROOT/data/cedar_data_final_with_mprop1_mprop2_v2.txt", type=str)
    p.add_argument("--property-path-wildtype",
                   default="$ROOT/data/cedar_data_final_WILD_TYPE_with_mprop1_mprop2_v2.txt", type=str)
    p.add_argument("--seq-path-clinical", default="$ROOT/data/hadrup_cancer_df_29K.txt", type=str)
    p.add_argument("--clinical-table-path", default="$ROOT/data/All_samples_clinical.txt", type=str)
    p.add_argument("--skip-clinical", action="store_true")
    args = p.parse_args(argv)
    config = to_config(args)
    config.derive_paths()

    logger = MetricLogger(project="ImmunoPred-Cancer-Paper-2", entity=config.wandb_username,
                          name=f"Comparative:{config.model}-seed{config.seed}",
                          config=vars(args),
                          jsonl_path=config.model_save_path_pretrain + ".metrics.jsonl")
    root_key = seed_everything(config.seed)
    ssl = config.self_supervision

    # -- datasets ---------------------------------------------------------------
    dataset_pt1 = ImmunoDataset.load(config, config.graph_dir_IEDB,
                                     config.property_path_IEDB, config.hla_path)
    dataset_pt2 = ComparativeDataset.load(
        config, config.graph_dir_cancer, config.graph_dir_wildtype,
        config.property_path_cancer, config.property_path_wildtype, config.hla_path)
    clinical_ds = None
    if not args.skip_clinical:
        clinical_ds = ClinicalDataset.load(config, config.graph_dir_clinical,
                                           config.seq_path_clinical)

    tr1, va1, te1 = seeded_split(len(dataset_pt1), (0.8, 0.1, 0.1), config.seed)
    tr2, va2, te2 = seeded_split(len(dataset_pt2), (0.8, 0.1, 0.1), config.seed)
    print("Stage 1 train/val/test:", len(tr1), len(va1), len(te1))
    print("Stage 2/3 train/val/test:", len(tr2), len(va2), len(te2))

    vae_dim = (dataset_pt1.seq_full.shape[1] if config.full_sequence
               else dataset_pt1.seq_pep.shape[1]) * 21
    check_seq_dims(vae_dim, config.full_sequence, IEDB=dataset_pt1,
                   comparative=dataset_pt2, clinical=clinical_ds)
    spec, params = build_model(config.model, vae_dim, root_key,
                               use_wt_for_downstream=config.use_wt_for_downstream)

    # -- stage 1: IEDB foreignness pretrain (plain forward) ----------------------
    loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(dataset_pt1.class_weights),
                          sequence=config.sequence_loss, ssl=ssl)
    Pipe1 = pick_pipeline(config, comparative=False, ssl=ssl)
    mk1 = lambda idx, split: Pipe1(
        dataset_pt1, idx, split=split, binary=False, full=config.full_sequence,
        config=config, ssl=ssl)
    # optional stage-1 warmup probe (--pretrain-warmup-epochs; the
    # reference's pretrain stages run at constant LR)
    pretrain_schedule = None
    if config.pretrain_warmup_epochs > 0:
        from immunostruct_tpu.utils.schedule import linear_warmup_constant
        pretrain_schedule = linear_warmup_constant(
            config.learning_rate_pretrain, config.pretrain_warmup_epochs,
            warmup_start_lr=config.learning_rate_pretrain / 100)
    params, _ = train_model(config, spec, params, mk1(tr1, "train"), mk1(va1, "val"),
                            loss_cfg, binary=False,
                            learning_rate=config.learning_rate_pretrain,
                            lr_schedule=pretrain_schedule,
                            optimizer_name="adamw", weight_decay=config.weight_decay,
                            stage="pretrain", resume_tag="stage1",
                            log_fn=stage_log_fn(logger, "pretrain"))
    print("DONE PRE-TRAINING Stage 1")

    params = load_checkpoint(config.model_save_path_pretrain, params)
    params = reset_head(params, spec, jax.random.fold_in(root_key, 0xA))

    # -- stage 2: comparative cancer-foreignness pretrain ------------------------
    loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(dataset_pt2.class_weights),
                          sequence=config.sequence_loss, ssl=ssl)
    Pipe2 = pick_pipeline(config, comparative=True, ssl=ssl)
    mk2 = lambda idx, split, binary, **kw: Pipe2(
        dataset_pt2, idx, split=split, binary=binary, full=config.full_sequence,
        config=config, ssl=ssl, **kw)
    params, _ = train_model(config, spec, params, mk2(tr2, "train", False),
                            mk2(va2, "val", False), loss_cfg, binary=False,
                            learning_rate=config.learning_rate_pretrain,
                            lr_schedule=pretrain_schedule,
                            optimizer_name="adamw", weight_decay=config.weight_decay,
                            stage="pretrain", resume_tag="stage2",
                            coeff_contrastive=config.coeff_contrastive,
                            log_fn=stage_log_fn(logger, "pretrain2"))
    print("DONE PRE-TRAINING Stage 2")

    params_like = params
    restored = load_checkpoint(config.model_save_path_pretrain, params_like)
    params = reset_head(restored, spec, jax.random.fold_in(root_key, 0xB))

    # -- stage 3: comparative immunogenicity finetune ----------------------------
    schedule = linear_warmup_cosine_annealing(
        config.learning_rate_finetune, warmup_epochs=config.num_epochs // 4,
        max_epochs=config.num_epochs,
        warmup_start_lr=config.learning_rate_finetune / 100)
    extend_to = config.min_finetuning_batches * config.batch_size
    train_pipe = mk2(tr2, "train", True, extend_to=extend_to)
    val_pipe = mk2(va2, "val", True)
    test_pipe = mk2(te2, "test", True)
    params, _ = train_model(config, spec, params, train_pipe, val_pipe, loss_cfg,
                            binary=True, learning_rate=config.learning_rate_finetune,
                            optimizer_name="adamw", weight_decay=config.weight_decay,
                            lr_schedule=schedule, stage="finetune",
                            coeff_contrastive=config.coeff_contrastive,
                            log_fn=stage_log_fn(logger, "finetune"))
    print("DONE FINE TUNING")

    params = load_checkpoint(config.model_save_path_finetune, params)

    # -- evaluation incl. clinical survival validation ---------------------------
    clinical = None
    if clinical_ds is not None:
        clinical_pipe = BatchPipeline(
            clinical_ds, np.arange(len(clinical_ds)), split="infer", binary=True,
            full=config.full_sequence, config=config, shuffle=False)
        clinical = {"pipe": clinical_pipe, "valid": clinical_ds.valid,
                    "seq_df": pd.read_table(config.seq_path_clinical),
                    "clin_df": pd.read_table(config.clinical_table_path)}

    # threshold derivation on an un-padded, un-extended view of the train
    # split (the training pipe is oversampled via extend_to and may pad);
    # host pipeline: avoids pinning extra HBM corpus copies under --device-data
    from immunostruct_tpu.data import ComparativePipeline
    thresh_pipe = ComparativePipeline(
        dataset_pt2, tr2, split="eval_train", binary=True,
        full=config.full_sequence, config=config, ssl=ssl)
    train_stats = inference(config, spec, params, thresh_pipe)
    test_stats = inference(config, spec, params, test_pipe,
                           optimal_threshold=train_stats["optimal_threshold"],
                           clinical=clinical,
                           fig_save_folder=config.fig_save_folder)

    logger.log(stats_to_wandb("Train", train_stats))
    logger.log(stats_to_wandb("Test", test_stats))
    logger.finish()
    return train_stats, test_stats


if __name__ == "__main__":
    main()
