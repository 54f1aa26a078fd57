"""Inference engines (reference: procedures/infer.py:9-103, infer_SSL.py,
clinical_validation.py:167-211).

Collects sigmoid probabilities over a pipeline with a jitted forward,
derives/reuses the Youden-optimal threshold, and computes the full metric
suite. The clinical path NaN-masks rows whose features were placeholders and
hands per-patient aggregation to procedures/clinical.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from immunostruct_tpu.models.trunk import ModelSpec, model_apply, model_apply_comparative
from immunostruct_tpu.structs import ComparativeBatch
from immunostruct_tpu.procedures.metrics import evaluate_metrics, find_optimal_threshold


@functools.lru_cache(maxsize=32)
def _cached_fwd(spec: ModelSpec, aggregation: str, compute_dtype,
                scan_layers: bool):
    """One jitted forward per (spec, aggregation, dtype, scan_layers).

    inference() is called several times per CLI run (train split for the
    threshold, then test, then clinical); a fresh @jax.jit closure per call
    would discard the jit cache and re-pay the multi-second full-model XLA
    compile each time. ModelSpec is frozen/hashable by design.
    """
    @jax.jit
    def fwd(p, batch, key):
        if isinstance(batch, ComparativeBatch):
            c, w = batch.cancer, batch.wt
            _, _, logits = model_apply_comparative(
                p, spec, (c.graph, w.graph), (c.seq_onehot, w.seq_onehot),
                (c.props, w.props), key, deterministic=True,
                aggregation=aggregation, compute_dtype=compute_dtype,
                scan_layers=scan_layers)
            return jax.nn.sigmoid(logits.reshape(-1)), c.target
        out = model_apply(p, spec, batch.graph, batch.seq_onehot, batch.props,
                          key, deterministic=True, aggregation=aggregation,
                          compute_dtype=compute_dtype, scan_layers=scan_layers)
        return jax.nn.sigmoid(out.logits.reshape(-1)), batch.target

    return fwd


def _collect_probs(spec: ModelSpec, params: dict, pipe, rng: jax.Array,
                   aggregation: str, compute_dtype,
                   scan_layers: bool = False) -> tuple[np.ndarray, np.ndarray]:
    fwd = _cached_fwd(spec, aggregation, compute_dtype, scan_layers)
    probs, targets = [], []
    for i, batch in enumerate(pipe.epoch(0)):
        p, t = fwd(params, batch, jax.random.fold_in(rng, i))
        probs.append(np.asarray(p))
        targets.append(np.asarray(t))
    return np.concatenate(probs), np.concatenate(targets)


def inference(config, spec: ModelSpec, params: dict, pipe, *,
              rng: Optional[jax.Array] = None,
              optimal_threshold: Optional[float] = None,
              return_raw_preds: bool = False,
              clinical=None, fig_save_folder: Optional[str] = None,
              verbose: bool = True) -> dict:
    """Metric evaluation over a (possibly comparative) pipeline.

    Threshold semantics match the reference: when None, derive Youden's
    optimum from THIS split and return it for reuse on the test split
    (train_IEDB_wFT.py:127-129).
    """
    rng = rng if rng is not None else jax.random.key(config.seed + 0x1f)
    probs, targets = _collect_probs(spec, params, pipe, rng,
                                    config.aggregation,
                                    jnp.dtype(config.compute_dtype),
                                    getattr(config, "scan_layers", False))
    if optimal_threshold is None:
        optimal_threshold = find_optimal_threshold(targets, probs)
    out = evaluate_metrics(targets, probs, optimal_threshold, verbose=verbose)
    if return_raw_preds:
        out["predicted_probs"] = probs
        out["true_targets"] = targets
    if clinical is not None:
        out.update(inference_clinical_only(
            config, spec, params, clinical, rng=rng,
            fig_save_folder=fig_save_folder, verbose=verbose))
    return out


# aliases, reference API surface parity (infer.py:9,:53 + infer_SSL.py:9,:53):
# comparative-ness follows the pipeline type; SSL models share the same
# forward (node predictions are simply unused at inference)
inference_comparative = inference
inference_SSL = inference
inference_comparative_SSL = inference


def inference_clinical_only(config, spec: ModelSpec, params: dict, clinical, *,
                            rng: Optional[jax.Array] = None,
                            fig_save_folder: Optional[str] = None,
                            verbose: bool = True) -> dict:
    """Clinical scoring -> per-patient load -> OS/PFS p-values.

    ``clinical`` is a dict with keys:
      pipe       : BatchPipeline over the ClinicalDataset rows
      valid      : bool mask of rows with real features
      seq_df     : clinical sequence table (needs 'patient')
      clin_df    : outcomes table (Patient / OS.* / PFS.*)

    Rows with placeholder features get NaN probabilities and are excluded
    from the aggregation (clinical_validation.py:196-197).
    """
    from immunostruct_tpu.procedures.clinical import clinical_pvalues

    rng = rng if rng is not None else jax.random.key(config.seed + 0x2f)
    pipe = clinical["pipe"]
    # placeholder NaN features would poison the jitted forward; run on
    # zero-filled copies and NaN-mask afterwards
    probs, _ = _collect_probs(spec, params, pipe, rng, config.aggregation,
                              jnp.dtype(config.compute_dtype),
                              getattr(config, "scan_layers", False))
    probs = probs.astype(float)
    probs[~clinical["valid"]] = np.nan

    fig_path = None
    if fig_save_folder:
        import os
        fig_path = os.path.join(fig_save_folder, "clinical_p_value.png")
    os_p, pfs_p = clinical_pvalues(probs, clinical["seq_df"], clinical["clin_df"],
                                   fig_save_path=fig_path)
    if verbose:
        print(f"OS p-value: {os_p:.4f}\nPFS p-value: {pfs_p:.4f}")
    return {"os_p_value": os_p, "pfs_p_value": pfs_p}
