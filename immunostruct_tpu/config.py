"""Configuration: one dataclass covering the reference's argparse flag surface.

The reference threads a mutated argparse.Namespace through every layer
(reference: immunostruct/train_IEDB_wFT.py:16-45, train_Cancer_wFT.py:15-57).
Here the same surface is a frozen-by-convention dataclass with explicit
derived-path helpers and ``$ROOT`` expansion
(reference: immunostruct/utils/update_paths.py:6-24).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

# Repo root (the directory that contains this package).
ROOT_DIR = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))


@dataclasses.dataclass
class Config:
    # -- model ---------------------------------------------------------------
    model: str = "HybridModelv2"
    use_wt_for_downstream: bool = False
    self_supervision: bool = False
    # architecture hyperparameters (reference: models/hybrid_models.py:11-19)
    gcn_layers: int = 5              # +1 input layer -> 6 EGNN convs total
    vae_hidden_dim: int = 512
    vae_latent_dim: int = 32
    gat_hidden_channels: int = 64
    property_embedding_dim: int = 8
    self_attention_heads: int = 1
    combined_attention_heads: int = 8
    mlp_features: int = 32

    # -- optimization ----------------------------------------------------------
    learning_rate_pretrain: float = 1e-3
    learning_rate_finetune: float = 1e-4
    num_epochs: int = 40
    batch_size: int = 150
    weight_decay: float = 1e-6
    coeff_contrastive: float = 0.0
    min_finetuning_batches: int = 64

    # -- data ------------------------------------------------------------------
    full_sequence: bool = False
    sequence_loss: bool = False
    feature_size: int = 23           # 20 one-hot + 3 coords after join
    coord_size: int = 3
    sequence_pad_count: int = 0      # train-time sequence masking count
    structure_pad_count: int = 0     # train-time structure masking count
    force_graph_augmentation: bool = False  # rotation for non-SSL training too
    num_workers: int = 0             # kept for CLI parity; host pipeline is vectorized

    # paths (``$ROOT`` expands to the repo root)
    model_save_dir: str = "$ROOT/results/PropIEDB_ImmunoIEDB/"
    figure_save_dir: str = "$ROOT/figures/"
    graph_dir_IEDB: str = "$ROOT/data/graph_pyg_IEDB/"
    graph_dir_cancer: str = "$ROOT/data/graph_pyg_Cancer/"
    graph_dir_wildtype: str = "$ROOT/data/graph_pyg_Cancer_WT/"
    graph_dir_clinical: str = "$ROOT/data/graph_pyg_Clinical/"
    property_path_IEDB: str = "$ROOT/data/complete_score_Mprops_1_2_smoothed_sasa_v2.txt"
    property_path_cancer: str = "$ROOT/data/cedar_data_final_with_mprop1_mprop2_v2.txt"
    property_path_wildtype: str = "$ROOT/data/cedar_data_final_WILD_TYPE_with_mprop1_mprop2_v2.txt"
    seq_path_clinical: str = "$ROOT/data/hadrup_cancer_df_29K.txt"
    clinical_table_path: str = "$ROOT/data/All_samples_clinical.txt"
    hla_path: str = "$ROOT/data/HLA_27_seqs_csv.csv"

    # -- reproducibility / logging ----------------------------------------------
    seed: int = 1
    wandb_username: Optional[str] = None
    wandb_project: Optional[str] = None

    # -- TPU-specific knobs (no reference equivalent: new capability) -----------
    compute_dtype: str = "bfloat16"  # activations dtype in the hot path
    param_dtype: str = "float32"
    pad_nodes_multiple: int = 8      # round corpus max_nodes up for tiling
    pad_edges_multiple: int = 128    # round corpus max_edges up for tiling
    mesh_shape: str = "data"         # 1-D data-parallel mesh by default
    data_parallel: bool = False      # shard batches over all local devices
    donate_state: bool = True
    aggregation: str = "auto"        # 'auto'|'fused'|'onehot'|'scatter'|'pallas' EGNN aggregation
    resume: bool = False             # within-stage resume from .resume snapshots
    # HBM-resident corpus + on-device batching: True forces it, False
    # forces the host pipeline, None = "auto" (device pipeline when
    # training single-chip on TPU and the corpus fits; cli/common.py)
    device_data: object = None
    grad_accum_steps: int = 1        # scanned microbatches per optimizer step
    # lax.scan over the identical EGNN convs: True/False force, None = auto
    # (on for short TPU runs where the ~100 s unrolled-compile delta would
    # dominate wall-clock; procedures/train.py::resolve_scan_layers)
    scan_layers: object = None
    # comparative twin passes stacked into one 2B forward: True/False force,
    # None = auto (on for TPU; models/trunk.py::model_apply_comparative)
    stack_twins: object = None
    # explicit opt-in: contrastive statistics per microbatch under grad accum
    allow_microbatch_contrastive: bool = False
    # pretrain-collapse guard (observed: flagship seed-2 pretrain flatlined
    # at chance with all-negative predictions, benchmarks/RESULTS.md
    # seed-variance section). Detection always warns; reinit_on_collapse
    # additionally restarts the stage from a re-folded init (max 2 retries).
    collapse_detection: bool = True
    reinit_on_collapse: bool = False
    # linear LR warmup (lr/100 -> lr) over this many epochs at the start of
    # each pretrain stage; 0 keeps the reference's constant-LR pretrain.
    # Recipe-level collapse-mitigation probe (VERDICT r4 item 6).
    pretrain_warmup_epochs: int = 0

    # derived (filled by `derive_paths`)
    model_save_path_pretrain: str = ""
    model_save_path_finetune: str = ""
    fig_save_folder: str = ""

    def derive_paths(self, stage_tag: str = "") -> "Config":
        """Build checkpoint paths from a hyperparameter-encoding string.

        Mirrors reference: train_IEDB_wFT.py:41-45 / train_Cancer_wFT.py:50-57.
        """
        model_str = (
            f"{self.model}-wtds_{self.use_wt_for_downstream}"
            f"-lr_pt_{self.learning_rate_pretrain}-lr_ft_{self.learning_rate_finetune}"
            f"-cc_{self.coeff_contrastive}-ssl_{self.self_supervision}"
            f"-ep_{self.num_epochs}-bs_{self.batch_size}-fseq_{self.full_sequence}"
            f"-seql_{self.sequence_loss}-fs_{self.feature_size}-cs_{self.coord_size}"
            f"-seed_{self.seed}"
        )
        if stage_tag:
            model_str = f"{stage_tag}:{model_str}"
        self.model_save_path_pretrain = os.path.join(self.model_save_dir, model_str + "_pretrain.ckpt")
        self.model_save_path_finetune = os.path.join(self.model_save_dir, model_str + "_finetune.ckpt")
        self.fig_save_folder = os.path.join(self.figure_save_dir, model_str)
        return self

    @property
    def vae_input_dim(self) -> int:
        """Flattened one-hot sequence width; set after data shapes are known."""
        raise AttributeError(
            "vae_input_dim depends on corpus max lengths; use "
            "`sequence_input_dim(max_full_len, max_pep_len, config.full_sequence)`."
        )


def sequence_input_dim(max_full_len: int, max_pep_len: int, full_sequence: bool,
                       alphabet_size: int = 21) -> int:
    """283*21 for full sequence, 11*21 for peptide (reference: train_IEDB_wFT.py:60)."""
    return (max_full_len if full_sequence else max_pep_len) * alphabet_size


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: repeat runs (and repeated shapes
    across stages) skip recompilation. Called by every CLI and bench."""
    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "immunostruct_tpu_jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax without the knobs
        pass


def update_paths(config: Config, root: str = ROOT_DIR) -> Config:
    """Expand ``$ROOT`` in all string fields (reference: utils/update_paths.py:6-24)."""
    for field in dataclasses.fields(config):
        value = getattr(config, field.name)
        if isinstance(value, str) and "$ROOT" in value:
            setattr(config, field.name, value.replace("$ROOT", root))
    return config
