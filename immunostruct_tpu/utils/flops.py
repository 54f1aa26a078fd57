"""Analytic FLOPs model for the fused training step + MFU accounting.

Counts the *mathematical* model FLOPs — what the architecture fundamentally
requires (reference forward: immunostruct/models/hybrid_models.py:315-359)
— independent of implementation choices. Notably the EGNN message
aggregation is counted as a segment-sum (E*(C) adds), NOT as the one-hot
[B,N,E] matmul the TPU path may execute; the matmul is an implementation
strategy whose extra work shows up in XLA's as-compiled counts
(``xla_cost``) but not in model FLOPs. Reporting both separates "how fast
is the model" (MFU) from "how much work did the compiler choose to do"
(hardware utilization).

Conventions: a Linear of in->out costs 2*in*out FLOPs per position
(multiply + add); backward is counted as 2x forward (standard practice,
e.g. the PaLM/Chinchilla appendix accounting); optimizer update ~10
FLOPs/param (Adam).
"""

from __future__ import annotations

from typing import Optional

from immunostruct_tpu.models.trunk import ModelSpec


def _linear(positions: int, d_in: int, d_out: int) -> float:
    return 2.0 * positions * d_in * d_out


def egnn_layer_flops(n: int, e: int, f_in: int, h: int, edge_feat: int = 1) -> float:
    """One EGNN layer (ops/egnn.py math; DGL EGNNConv semantics)."""
    fl = 0.0
    # radial + x_hat: x_diff (3), square+sum (6), sqrt+div (~8)
    fl += e * 17.0
    fl += _linear(e, 2 * f_in + 1 + edge_feat, h) + _linear(e, h, h)  # edge MLP
    fl += e * 2 * h                                  # 2x SiLU
    fl += _linear(e, h, h) + _linear(e, h, 1)        # coord MLP
    fl += e * h                                      # SiLU
    fl += e * 3.0                                    # msg_x = cw * x_hat
    fl += e * (h + 3.0)                              # segment-sum aggregation
    fl += _linear(n, f_in + h, h) + _linear(n, h, h)  # node MLP
    fl += n * h                                      # SiLU
    fl += n * 3.0                                    # coord update add
    return fl


def attention_flops(length: int, d_model: int, d_in: Optional[int] = None) -> float:
    """Q/K/V/out projections + scores + weighted sum (any head count:
    FLOPs are head-count invariant at fixed d_model)."""
    d_in = d_in if d_in is not None else d_model
    fl = 3 * _linear(length, d_in, d_model) + _linear(length, d_model, d_model)
    fl += 2.0 * length * length * d_model            # QK^T
    fl += 5.0 * length * length                      # softmax
    fl += 2.0 * length * length * d_model            # weights @ V
    return fl


def forward_flops_per_sample(spec: ModelSpec, n_nodes: int, n_edges: int,
                             vae_input_dim: int) -> float:
    """Model FLOPs of ONE branch forward for one sample."""
    fl = 0.0
    h = spec.gat_hidden_channels
    if spec.use_structure:
        fl += egnn_layer_flops(n_nodes, n_edges, 20, h)
        fl += spec.gcn_layers * egnn_layer_flops(n_nodes, n_edges, h, h)
        fl += attention_flops(n_nodes, h)
        fl += n_nodes * h * (2 if spec.mean_max_pool else 1)   # pool
    if spec.use_sequence:
        d = vae_input_dim
        fl += _linear(1, d, spec.vae_hidden_dim)
        fl += 2 * _linear(1, spec.vae_hidden_dim, spec.vae_latent_dim)
        fl += 6.0 * spec.vae_latent_dim               # reparameterize
        dec_in = spec.vae_latent_dim
        if spec.use_property:
            dec_in += spec.property_embedding_dim
        if spec.raw_property_concat:
            dec_in += 2
        fl += _linear(1, dec_in, spec.vae_hidden_dim)
        fl += _linear(1, spec.vae_hidden_dim, d)
        if spec.use_property:
            fl += _linear(1, 2, 32) + _linear(1, 32, spec.property_embedding_dim)
    if spec.combined_attention_dim > 0:
        # MHA over the fused vector as a length-D sequence of scalars
        fl += attention_flops(spec.embedding_dim, spec.combined_attention_dim,
                              d_in=1)
    fl += _linear(1, spec.classifier_input_dim, spec.mlp_features)
    if spec.ssl:
        fl += _linear(1, spec.mlp_features, 1) + _linear(1, spec.mlp_features, 20)
    else:
        fl += _linear(1, spec.mlp_features, 1)
    return fl


def loss_flops_per_sample(spec: ModelSpec, vae_input_dim: int) -> float:
    fl = 20.0                                         # BCE/MSE on the logit
    if spec.use_sequence:
        fl += 3.0 * vae_input_dim                     # recon MSE
        fl += 8.0 * spec.vae_latent_dim               # KLD
    return fl


def param_count(params) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def train_step_flops(spec: ModelSpec, batch_size: int, n_nodes: int,
                     n_edges: int, vae_input_dim: int,
                     n_params: int = 0) -> float:
    """Model FLOPs of one fused train step (fwd + bwd ~= 3x fwd + Adam)."""
    branches = 2 if spec.comparative else 1
    per_sample = branches * (
        forward_flops_per_sample(spec, n_nodes, n_edges, vae_input_dim)
        + loss_flops_per_sample(spec, vae_input_dim))
    return 3.0 * batch_size * per_sample + 10.0 * n_params


# -- hardware peaks ----------------------------------------------------------

# dense peak matmul throughput per chip, FLOP/s
TPU_PEAK_FLOPS = {
    # (platform/device-kind substring) -> {dtype: peak}
    "v5 lite": {"bfloat16": 197e12, "float32": 98.5e12},   # v5e
    "v5e": {"bfloat16": 197e12, "float32": 98.5e12},
    "v5p": {"bfloat16": 459e12, "float32": 229.5e12},
    "v4": {"bfloat16": 275e12, "float32": 137.5e12},
    "v6e": {"bfloat16": 918e12, "float32": 459e12},
    "v6 lite": {"bfloat16": 918e12, "float32": 459e12},
}


def peak_flops(device, dtype: str = "bfloat16") -> Optional[float]:
    """Per-chip peak for a jax device, or None when unknown (CPU etc.)."""
    kind = getattr(device, "device_kind", "") or ""
    kind = kind.lower()
    for key, peaks in TPU_PEAK_FLOPS.items():
        if key in kind:
            return peaks.get(dtype)
    if getattr(device, "platform", "") == "tpu":
        # unknown TPU generation: assume v5e-class so MFU is conservative
        return TPU_PEAK_FLOPS["v5e"].get(dtype)
    return None


def xla_cost(fn, *args) -> dict:
    """As-compiled cost analysis of a callable at given args.

    Accepts a plain function OR an already-jitted one (it is reused as-is,
    so an executable the caller has already compiled is not recompiled).
    Returns {'flops': ..., 'bytes accessed': ...} (keys XLA provides;
    empty dict when the backend exposes none). The single unwrap point for
    the backend's list-vs-dict quirk — bench.py and scripts/ call this.
    """
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
    except Exception:  # noqa: BLE001 - backends without cost analysis
        return {}
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return dict(cost) if cost else {}


def xla_memory(fn, *args):
    """memory_analysis of a (possibly jitted) callable; None if absent."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    try:
        return jitted.lower(*args).compile().memory_analysis()
    except Exception:  # noqa: BLE001
        return None
