"""Loss suite (reference: immunostruct/utils/loss.py:5-61).

Exact formula parity:
  regression stage: 2*MSE(pred, foreignness) [+ 0.5*recon-MSE + 0.5*KLD]
  binary stage:     5*weighted-BCE          [+ 0.1*recon     + 0.1*KLD]
  SSL variants add a masked-residue cross-entropy term.

``pos_weight = N_neg / N_pos`` from the label Counter (loss.py:11) scales
positive-example BCE terms, matching torch BCEWithLogitsLoss semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    vae_input_dim: int
    pos_weight: float          # N_neg / N_pos
    sequence: bool = True      # include recon + KLD terms (--sequence-loss)
    ssl: bool = False


def _recon_kld(recon, x_flat, mu, logvar):
    mse = jnp.mean((recon - x_flat) ** 2)
    kld = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return mse, kld


def _ssl_term(node_logits: Optional[jax.Array], residue: Optional[jax.Array]):
    """Cross-entropy over the 20 amino-acid classes for the masked residue.

    The reference skips the term when no prediction tensor is passed (val
    loops pass empties, train_SSL.py:46); here the caller passes residue=None
    to skip, or a weight mask via residue >= 0.
    """
    if node_logits is None or residue is None:
        return 0.0
    logp = jax.nn.log_softmax(node_logits.astype(jnp.float32), axis=-1)
    valid = (residue >= 0)
    residue = jnp.clip(residue, 0, logp.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, residue[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def regression_loss(cfg: LossConfig, recon, x_flat, mu, logvar, pred, target,
                    node_logits=None, residue=None):
    reg = jnp.mean((pred.reshape(-1).astype(jnp.float32) - target.reshape(-1)) ** 2)
    ssl = _ssl_term(node_logits, residue) if cfg.ssl else 0.0
    if cfg.sequence:
        mse, kld = _recon_kld(recon.astype(jnp.float32),
                              x_flat.reshape(-1, cfg.vae_input_dim), mu, logvar)
        return 2.0 * reg + 0.5 * mse + 0.5 * kld + ssl
    return reg + ssl


def bce_loss(cfg: LossConfig, recon, x_flat, mu, logvar, pred, target,
             node_logits=None, residue=None):
    logits = pred.reshape(-1).astype(jnp.float32)
    y = target.reshape(-1).astype(jnp.float32)
    # weighted BCE-with-logits: -[w*y*log(sig) + (1-y)*log(1-sig)]
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    bce = jnp.mean(-(cfg.pos_weight * y * log_sig + (1.0 - y) * log_one_minus))
    ssl = _ssl_term(node_logits, residue) if cfg.ssl else 0.0
    if cfg.sequence:
        mse, kld = _recon_kld(recon.astype(jnp.float32),
                              x_flat.reshape(-1, cfg.vae_input_dim), mu, logvar)
        return 5.0 * bce + 0.1 * mse + 0.1 * kld + ssl
    return bce + ssl


def make_loss_fn(cfg: LossConfig, binary: bool):
    """Pick the stage loss (binary=True -> BCE; else foreignness regression),
    mirroring SplitDataset's label selection (util_dataloader.py:82-86)."""
    return (lambda *a, **k: bce_loss(cfg, *a, **k)) if binary \
        else (lambda *a, **k: regression_loss(cfg, *a, **k))


def pos_weight_from_counts(class_counts: dict) -> float:
    """Counter({0.0: N_neg, 1.0: N_pos}) -> N_neg/N_pos (loss.py:11)."""
    return float(class_counts.get(0, class_counts.get(0.0, 1.0))) / \
        float(class_counts.get(1, class_counts.get(1.0, 1.0)))


def plot_losses(train_losses, val_losses, save_path: Optional[str] = None):
    """Loss-curve plot (reference: utils/loss.py:64-72); headless-safe."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping loss plot")
        return
    fig = plt.figure(figsize=(10, 5))
    plt.plot(train_losses, label="Train Loss")
    plt.plot(val_losses, label="Validation Loss")
    plt.title("Training and Validation Losses")
    plt.xlabel("Epochs")
    plt.ylabel("Loss")
    plt.legend()
    if save_path:
        fig.savefig(save_path)
    plt.close(fig)
