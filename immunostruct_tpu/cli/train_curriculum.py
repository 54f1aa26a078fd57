"""Generic staged-curriculum entry point.

Generalizes the reference's 13 legacy scripts under old_scripts/ (every
pretrain->finetune combination of {PropIEDB, ImmunoIEDB, PropCancer,
ImmunoCancer} x {plain, comparative}; see SURVEY.md section 2 "Legacy
curricula") into one composable CLI:

  --stages PropIEDB,PropCancer,ImmunoCancer --comparative
    == old_scripts/train_comparative_PropIEDB_PropCancer_ImmunoCancer.py
  --stages PropIEDB,ImmunoIEDB
    == train_IEDB_wFT.py's two stages

Stage names: Prop* trains the foreignness regression (binary=False),
Immuno* trains the weighted BCE (binary=True); *IEDB uses the IEDB dataset,
*Cancer the cancer corpus (comparative pairs when --comparative). Between
stages the best checkpoint is reloaded and the classifier head re-initialized
(new_head=True semantics). The final stage checkpoints to the finetune path
and gets the warmup-cosine schedule.
"""

from __future__ import annotations

import jax

from immunostruct_tpu.cli.common import base_parser, check_seq_dims, to_config
from immunostruct_tpu.data import (
    ImmunoDataset, ComparativeDataset, BatchPipeline, ComparativePipeline,
    seeded_split,
)
from immunostruct_tpu.models import build_model, reset_head
from immunostruct_tpu.procedures.train import train_model
from immunostruct_tpu.procedures.infer import inference
from immunostruct_tpu.utils.checkpoint import load_checkpoint
from immunostruct_tpu.utils.losses import LossConfig, pos_weight_from_counts
from immunostruct_tpu.utils.logging import MetricLogger, stage_log_fn, stats_to_wandb
from immunostruct_tpu.utils.schedule import linear_warmup_cosine_annealing
from immunostruct_tpu.utils.seeding import seed_everything

VALID_STAGES = {"PropIEDB", "ImmunoIEDB", "PropCancer", "ImmunoCancer"}


def main(argv=None):
    p = base_parser("Staged curriculum trainer (TPU-native)")
    p.add_argument("--stages", default="PropIEDB,ImmunoIEDB", type=str)
    p.add_argument("--comparative", action="store_true",
                   help="use cancer/WT comparative pairs for *Cancer stages")
    p.add_argument("--use-wt-for-downstream", action="store_true")
    p.add_argument("--coeff-contrastive", default=0.0, type=float)
    p.add_argument("--min-finetuning-batches", default=64, type=int)
    p.add_argument("--split-fractions", default="0.8,0.1,0.1", type=str)
    p.add_argument("--graph-dir-IEDB", default="$ROOT/data/graph_pyg_IEDB/", type=str)
    p.add_argument("--graph-dir-cancer", default="$ROOT/data/graph_pyg_Cancer/", type=str)
    p.add_argument("--graph-dir-wildtype", default="$ROOT/data/graph_pyg_Cancer_WT/", type=str)
    p.add_argument("--property-path-IEDB",
                   default="$ROOT/data/complete_score_Mprops_1_2_smoothed_sasa_v2.txt", type=str)
    p.add_argument("--property-path-cancer",
                   default="$ROOT/data/cedar_data_final_with_mprop1_mprop2_v2.txt", type=str)
    p.add_argument("--property-path-wildtype",
                   default="$ROOT/data/cedar_data_final_WILD_TYPE_with_mprop1_mprop2_v2.txt", type=str)
    args = p.parse_args(argv)
    config = to_config(args)
    config.derive_paths()

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    for s in stages:
        if s not in VALID_STAGES:
            raise SystemExit(f"unknown stage '{s}'; valid: {sorted(VALID_STAGES)}")
    fractions = tuple(float(x) for x in args.split_fractions.split(","))

    logger = MetricLogger(project="ImmunoPred-Curriculum", entity=config.wandb_username,
                          name=f"{args.stages}:{config.model}-seed{config.seed}",
                          config=vars(args),
                          jsonl_path=config.model_save_path_pretrain + ".metrics.jsonl")
    root_key = seed_everything(config.seed)
    ssl = config.self_supervision

    # datasets loaded lazily per stage family and cached
    cache: dict = {}

    def get_dataset(kind: str):
        if kind in cache:
            return cache[kind]
        if kind == "IEDB":
            ds = ImmunoDataset.load(config, config.graph_dir_IEDB,
                                    config.property_path_IEDB, config.hla_path)
        elif kind == "Cancer" and args.comparative:
            ds = ComparativeDataset.load(
                config, config.graph_dir_cancer, config.graph_dir_wildtype,
                config.property_path_cancer, config.property_path_wildtype,
                config.hla_path)
        else:
            ds = ImmunoDataset.load(config, config.graph_dir_cancer,
                                    config.property_path_cancer, config.hla_path)
        cache[kind] = (ds, seeded_split(len(ds), fractions, config.seed))
        return cache[kind]

    spec = params = None
    vae_dim = None
    train_pipe = test_pipe = None

    for i, stage in enumerate(stages):
        kind = "IEDB" if stage.endswith("IEDB") else "Cancer"
        binary = stage.startswith("Immuno")
        is_last = i == len(stages) - 1
        ds, (tr, va, te) = get_dataset(kind)
        comparative = kind == "Cancer" and args.comparative

        seq_source = ds.cancer if comparative else ds
        if vae_dim is None:
            vae_dim = (seq_source.seq_full.shape[1] if config.full_sequence
                       else seq_source.seq_pep.shape[1]) * 21
            spec, params = build_model(
                config.model, vae_dim, root_key,
                use_wt_for_downstream=args.use_wt_for_downstream)
        # later stages may bring a differently-padded corpus; fail fast
        # instead of shape-erroring inside jit when the stage starts
        check_seq_dims(vae_dim, config.full_sequence, **{stage: ds})

        loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                              sequence=config.sequence_loss, ssl=ssl)
        Pipe = ComparativePipeline if comparative else BatchPipeline
        extend_to = (config.min_finetuning_batches * config.batch_size
                     if (is_last and binary) else 0)
        train_pipe = Pipe(ds, tr, split="train", binary=binary,
                          full=config.full_sequence, config=config, ssl=ssl,
                          extend_to=extend_to)
        val_pipe = Pipe(ds, va, split="val", binary=binary,
                        full=config.full_sequence, config=config, ssl=ssl)
        test_pipe = Pipe(ds, te, split="test", binary=binary,
                         full=config.full_sequence, config=config, ssl=ssl)

        schedule = None
        lr = config.learning_rate_pretrain
        if is_last:
            lr = config.learning_rate_finetune
            schedule = linear_warmup_cosine_annealing(
                lr, warmup_epochs=config.num_epochs // 4,
                max_epochs=config.num_epochs, warmup_start_lr=lr / 100)
        elif config.pretrain_warmup_epochs > 0:
            # the --pretrain-warmup-epochs collapse-mitigation probe applies
            # to every pretrain stage, as in the two main entry CLIs
            from immunostruct_tpu.utils.schedule import linear_warmup_constant
            schedule = linear_warmup_constant(
                lr, config.pretrain_warmup_epochs, warmup_start_lr=lr / 100)

        print(f"=== stage {i + 1}/{len(stages)}: {stage} "
              f"(binary={binary}, comparative={comparative}) ===")
        params, _ = train_model(
            config, spec, params, train_pipe, val_pipe, loss_cfg, binary=binary,
            learning_rate=lr, optimizer_name="adamw",
            weight_decay=config.weight_decay, lr_schedule=schedule,
            stage="finetune" if is_last else "pretrain",
            resume_tag=f"stage{i + 1}",
            coeff_contrastive=config.coeff_contrastive if comparative else 0.0,
            log_fn=stage_log_fn(logger, stage))

        ckpt = (config.model_save_path_finetune if is_last
                else config.model_save_path_pretrain)
        params = load_checkpoint(ckpt, params)
        if not is_last:
            params = reset_head(params, spec, jax.random.fold_in(root_key, i))

    # un-extended, un-padded train view for threshold derivation (host
    # pipeline: no extra HBM corpus copy under --device-data)
    HostPipe = ComparativePipeline if comparative else BatchPipeline
    thresh_pipe = HostPipe(ds, tr, split="eval_train", binary=binary,
                           full=config.full_sequence, config=config, ssl=ssl)
    train_stats = inference(config, spec, params, thresh_pipe)
    test_stats = inference(config, spec, params, test_pipe,
                           optimal_threshold=train_stats["optimal_threshold"])
    logger.log(stats_to_wandb("Train", train_stats))
    logger.log(stats_to_wandb("Test", test_stats))
    logger.finish()
    return train_stats, test_stats


if __name__ == "__main__":
    main()
