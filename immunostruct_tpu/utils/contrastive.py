"""Paired cancer/WT contrastive loss (reference: utils/contrastive.py:6-83).

Barlow-Twins-flavored objective over projected cancer/WT embedding pairs:
  - unit-variance hinge on both projections,
  - pair-similarity matrix pushed to I on immunogenic rows / 0 otherwise,
  - cross-correlation matrix pushed to I,
  - off-diagonals down-weighted by lambda (1e-2).

Design improvement over the reference: the projector parameters live in the
*optimized* pytree (the reference instantiates the projector inside the
train loop so its params never reach the optimizer; train.py:76 + the
module-local projector at contrastive.py:27-32). Here the projector is part
of model params under key 'contrastive_projector'.

jit note: the reference gates on ``len(unique(y)) == 2`` in Python
(contrastive.py:38-43) — returns 0 for continuous pretraining targets or
single-class batches. Under jit this becomes a data-dependent mask:
  gate = all(y in {0,1}) AND any(y==1) AND any(y==0)
which matches the reference's behavior on every realizable input (a batch of
continuous foreignness scores fails the binary check; a one-class binary
batch fails the diversity check).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from immunostruct_tpu.ops.nnp import linear_init


def paired_contrastive_init(key: jax.Array, embedding_dim: int = 104,
                            z_dim: int = 128, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": linear_init(k1, embedding_dim, z_dim, bias=False, dtype=dtype),
        "bn_scale": jnp.ones((z_dim,), dtype),
        "bn_bias": jnp.zeros((z_dim,), dtype),
        "fc2": linear_init(k3, z_dim, z_dim, bias=False, dtype=dtype),
    }


def _project(params: dict, e: jax.Array) -> jax.Array:
    z = e @ params["fc1"]["w"]
    # batch-norm with batch statistics (train-mode semantics)
    mean = jnp.mean(z, axis=0, keepdims=True)
    var = jnp.var(z, axis=0, keepdims=True)
    z = (z - mean) / jnp.sqrt(var + 1e-5)
    z = z * params["bn_scale"] + params["bn_bias"]
    z = jax.nn.relu(z)
    return z @ params["fc2"]["w"]


def paired_contrastive_loss(params: dict, embedding_cancer: jax.Array,
                            embedding_wt: jax.Array, target: jax.Array,
                            lambda_off_diag: float = 1e-2) -> jax.Array:
    """Returns the gated contrastive loss (0 when the batch can't contrast)."""
    y = target.reshape(-1).astype(jnp.float32)
    is_binary = jnp.all((y == 0.0) | (y == 1.0))
    has_both = jnp.any(y == 1.0) & jnp.any(y == 0.0)
    gate = (is_binary & has_both).astype(jnp.float32)

    # threshold against the batch mean, as the reference does (contrastive.py:39)
    is_immunogenic = y > jnp.mean(y)

    z_c = _project(params, embedding_cancer.astype(jnp.float32))
    z_w = _project(params, embedding_wt.astype(jnp.float32))
    b, z_dim = z_c.shape

    z_c = z_c - jnp.mean(z_c, axis=0)
    z_w = z_w - jnp.mean(z_w, axis=0)

    std_c = jnp.sqrt(jnp.var(z_c, axis=0, ddof=1) + 1e-4)
    std_w = jnp.sqrt(jnp.var(z_w, axis=0, ddof=1) + 1e-4)
    std_loss = jnp.mean(jax.nn.relu(1.0 - std_c)) / 2 + jnp.mean(jax.nn.relu(1.0 - std_w)) / 2

    pair_sim = (z_c @ z_w.T) / z_dim                      # [B, B]
    cross_corr = (z_c.T @ z_w) / b                        # [Z, Z]

    eye_b = jnp.eye(b)
    pair_ideal = eye_b * is_immunogenic[:, None].astype(jnp.float32)
    pair_diff = (pair_sim - pair_ideal) ** 2
    pair_diff = jnp.where(eye_b > 0, pair_diff, pair_diff * lambda_off_diag)

    eye_z = jnp.eye(z_dim)
    corr_diff = (cross_corr - eye_z) ** 2
    corr_diff = jnp.where(eye_z > 0, corr_diff, corr_diff * lambda_off_diag)

    loss = jnp.sum(pair_diff) + jnp.sum(corr_diff) + std_loss
    return gate * loss
