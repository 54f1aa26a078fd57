"""Shared CLI plumbing: argparse surface mirroring the reference entry
scripts (train_IEDB_wFT.py:16-36, train_Cancer_wFT.py:15-45)."""

from __future__ import annotations

import argparse

from immunostruct_tpu.config import Config, update_paths, enable_compilation_cache


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--model", default="StructureModel", type=str)
    p.add_argument("--learning-rate-pretrain", default=1e-3, type=float)
    p.add_argument("--learning-rate-finetune", default=1e-4, type=float)
    p.add_argument("--num-epochs", default=40, type=int)
    p.add_argument("--batch-size", default=150, type=int)
    p.add_argument("--num-workers", default=4, type=int)
    p.add_argument("--full-sequence", action="store_true")
    p.add_argument("--sequence-loss", action="store_true")
    p.add_argument("--feature-size", default=23, type=int)
    p.add_argument("--coord-size", default=3, type=int)
    p.add_argument("--model-save-dir", default="$ROOT/results/run/", type=str)
    p.add_argument("--hla-path", default="$ROOT/data/HLA_27_seqs_csv.csv", type=str)
    p.add_argument("--seed", default=1, type=int)
    p.add_argument("--wandb-username", default=None, type=str)
    p.add_argument("--sequence-pad-count", default=0, type=int)
    p.add_argument("--structure-pad-count", default=0, type=int)
    p.add_argument("--self-supervision", action="store_true")
    # TPU-native knobs (new)
    p.add_argument("--compute-dtype", default="bfloat16", type=str)
    p.add_argument("--aggregation", default="auto",
                   choices=["auto", "mega", "fused", "onehot", "onehot_remat",
                            "scatter", "pallas"],
                   help="EGNN message aggregation: 'mega' (whole layer in "
                        "one Pallas kernel from raw edge indices — no "
                        "edge-space HBM tensors), 'fused' (one-hot einsum "
                        "gathers + the Pallas edge-program kernel), "
                        "'onehot' (pure-XLA one-hot matmuls), 'onehot_remat' "
                        "(less temp HBM), 'scatter' (CPU default), 'pallas' "
                        "(superseded per-op kernels), 'auto' picks the "
                        "fastest measured TPU path / 'scatter' elsewhere")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all local devices")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted stage from its .resume snapshot")
    p.add_argument("--device-data", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="keep the corpus HBM-resident and batch on device "
                        "(no per-step host work; augmented/SSL transforms "
                        "run on device). Default: auto — on when training "
                        "on a TPU without --data-parallel and the corpus "
                        "fits comfortably in HBM. --no-device-data forces "
                        "the host pipeline. Note: auto keeps the host "
                        "pipeline's partial trailing train batch, while an "
                        "explicit --device-data keeps the device pipeline's "
                        "documented default of padding it with duplicated "
                        "rows — flipping auto to explicit changes trailing-"
                        "batch numerics")
    p.add_argument("--grad-accum-steps", default=1, type=int,
                   help="scanned microbatches per optimizer step (batch-size "
                        "must be divisible; keeps per-chunk working sets at "
                        "the v5e sweet spot for large effective batches)")
    p.add_argument("--scan-layers", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="roll the identical EGNN hidden convs into lax.scan "
                        "(~8x smaller HLO -> ~100 s faster first compile "
                        "through the remote-compile tunnel, at +16%% step "
                        "time). Default: auto — on for short TPU runs "
                        "(num_epochs x steps/epoch below ~20k) where the "
                        "unrolled compile would dominate wall-clock; "
                        "--no-scan-layers forces unrolled for soaks")
    p.add_argument("--stack-twins", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="run the comparative cancer/WT twin forwards as ONE "
                        "2B-stacked pass (shared weights make the math "
                        "identical; only the train-mode eps/dropout RNG "
                        "stream differs). Default: auto — on for TPU")
    p.add_argument("--allow-microbatch-contrastive", action="store_true",
                   help="opt into per-microbatch contrastive statistics when "
                        "combining --coeff-contrastive with "
                        "--grad-accum-steps > 1 (otherwise an error)")
    p.add_argument("--collapse-detection", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="watch pretrain val AUROC and warn loudly if the "
                        "classifier flatlines at chance (the seed-sensitive "
                        "pretrain failure, benchmarks/RESULTS.md)")
    p.add_argument("--reinit-on-collapse", action="store_true",
                   help="when the collapse guard fires, restart the pretrain "
                        "stage from a re-folded init (up to 2 retries)")
    p.add_argument("--pretrain-warmup-epochs", default=0, type=int,
                   help="linear LR warmup (from lr/100) over this many "
                        "epochs at the START of each pretrain stage, then "
                        "constant at --learning-rate-pretrain. 0 = the "
                        "reference's constant-LR pretrain. A recipe-level "
                        "mitigation probe for the seed-sensitive pretrain "
                        "collapse (benchmarks/RESULTS.md)")
    return p


def pick_pipeline(config, comparative: bool, ssl: bool):
    """Host BatchPipeline or HBM-resident Device*Pipeline.

    device_data=True forces the device pipeline, False forces host, and
    the default "auto" (flag left unset) picks the device pipeline when
    training single-chip on a TPU and the corpus fits comfortably in HBM —
    the train step is ~5x faster than the host pipeline can feed it
    (benchmarks/RESULTS.md), so device residency is the production
    default. Augmented/SSL configurations run the transforms ON DEVICE
    (data/device_augment.py: jax-PRNG rotations + maskings inside jit)."""
    import functools

    from immunostruct_tpu.data import BatchPipeline, ComparativePipeline

    host_cls = ComparativePipeline if comparative else BatchPipeline
    dd = getattr(config, "device_data", None)
    if dd is None:
        dd = "auto"
    if dd != "auto":
        dd = bool(dd)   # accept 0/1/np.bool_ etc. as explicit forcing
    if dd is False:
        return host_cls

    from immunostruct_tpu.data.device_pipeline import (
        DevicePipeline, ComparativeDevicePipeline,
    )
    wants_augment = (
        ssl or config.force_graph_augmentation
        or (config.sequence_pad_count > 0 and config.full_sequence))
    cls = ComparativeDevicePipeline if comparative else DevicePipeline
    dev_factory = (functools.partial(cls, device_augment=True)
                   if wants_augment else cls)
    if dd is True:
        return dev_factory

    # auto: decide per-dataset at construction time, with GLOBAL accounting
    # of admitted bytes — the flagship holds several corpora at once (IEDB
    # + both comparative halves + clinical), and per-dataset budgets alone
    # could admit a combined footprint past single-chip HBM
    def auto_factory(dataset, indices, **kw):
        import jax

        if (jax.devices()[0].platform != "tpu"
                or getattr(config, "data_parallel", False)
                or jax.process_count() > 1):
            return host_cls(dataset, indices, **kw)
        # leave headroom for params/activations/compiler scratch; admitted
        # corpora are tracked process-wide against a total budget (uploads
        # are shared per dataset via build_device_corpus's cache, so each
        # live dataset counts once)
        from immunostruct_tpu.data.device_pipeline import (
            estimate_device_bytes, admitted_device_bytes, note_admitted)
        per_ds_budget = int(2.5 * (1 << 30))
        total_budget = int(8 * (1 << 30))
        need = estimate_device_bytes(dataset, full=kw.get("full", True))
        if need > per_ds_budget or admitted_device_bytes() + need > total_budget:
            print("device-data auto: corpus "
                  f"({need / (1 << 30):.2f} GiB, "
                  f"{admitted_device_bytes() / (1 << 30):.2f} GiB already "
                  "admitted) exceeds the HBM budget; using the host pipeline")
            return host_cls(dataset, indices, **kw)
        # reference-parity batching when auto-selected: the device
        # pipeline's own default pads the trailing partial TRAIN batch
        # with duplicated rows (SGD-friendly, but a numerics change the
        # user never asked for). Auto keeps the host pipeline's partial
        # final batch; explicit --device-data keeps the documented
        # padding default.
        kw.setdefault("pad_final_batch", False)
        try:
            pipe = dev_factory(dataset, indices, **kw)
        except (ValueError, AssertionError) as e:
            # configurations the device pipeline declines fall back loudly,
            # with the reason — a silent fallback would disguise genuine
            # construction bugs as a quiet perf regression
            print("device-data auto: falling back to the host pipeline "
                  f"for this configuration ({type(e).__name__}: {e})")
            return host_cls(dataset, indices, **kw)
        note_admitted(dataset, need)
        return pipe

    return auto_factory


def to_config(args: argparse.Namespace, **extra) -> Config:
    known = {f.name for f in Config.__dataclass_fields__.values()}
    kv = {k: v for k, v in vars(args).items() if k in known}
    kv.update(extra)
    cfg = Config(**kv)
    update_paths(cfg)
    enable_compilation_cache()
    return cfg


def check_seq_dims(vae_dim: int, full: bool, **named_datasets) -> None:
    """Fail fast on cross-corpus sequence-padding mismatches.

    The model's VAE flattens sequences to a FIXED L*21 input
    (models/trunk.py flattens to vae_dim), but each corpus pads to ITS OWN
    max chain length (dataset.py one_hot_encode_batch over that corpus's
    chains). A later curriculum stage or twin branch whose corpus pads
    longer/shorter would otherwise shape-error deep inside jit only when
    that stage starts — potentially hours into a run. Pass every dataset
    the run will touch (plain, comparative, clinical); Nones are skipped.
    """
    sides = []
    for name, ds in named_datasets.items():
        if ds is None:
            continue
        if hasattr(ds, "cancer"):  # ComparativeDataset twins share the VAE
            sides += [(f"{name}.cancer", ds.cancer), (f"{name}.wt", ds.wt)]
        else:
            sides.append((name, ds))
    for name, ds in sides:
        seq = ds.seq_full if full else ds.seq_pep
        dim = seq.shape[1] * 21
        if dim != vae_dim:
            raise ValueError(
                f"sequence-dim mismatch: dataset '{name}' pads "
                f"{'full chains' if full else 'peptides'} to {seq.shape[1]} "
                f"tokens ({dim} flattened) but the model's VAE was built "
                f"for vae_dim={vae_dim}. All corpora in one run must pad "
                "to the model's length — re-featurize/re-pad the corpus or "
                "set --sequence-pad-count/--structure-pad-count so the "
                "lengths agree (failing now instead of inside jit at "
                "stage start).")
