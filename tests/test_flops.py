"""FLOPs model validation: the analytic counts agree with XLA's as-compiled
cost analysis where the program is the naive dense algorithm, and correctly
LOWER-bound it where the TPU implementation does extra work (one-hot
aggregation matmul)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.models import build_model, model_map
from immunostruct_tpu.models.trunk import model_apply
from immunostruct_tpu.utils.flops import (
    forward_flops_per_sample, train_step_flops, param_count, peak_flops,
    xla_cost,
)
from tests.test_models import tiny_graph_batch, B, N, E, L, VAE_DIM


def _inputs(rng):
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    return graph, seq, props


def test_sequence_model_matches_xla(rng):
    """Pure dense VAE model: analytic == XLA within tolerance (XLA counts
    2*m*n*k for dots; elementwise/transcendental accounting differs a bit)."""
    spec, params = build_model("SequenceFpModel", VAE_DIM, jax.random.key(0))
    _, seq, props = _inputs(rng)

    def fwd(params, seq, props):
        return model_apply(params, spec, None, seq, props, jax.random.key(1),
                           deterministic=True).logits

    cost = xla_cost(fwd, params, seq, props)
    if "flops" not in cost:
        pytest.skip("backend exposes no cost analysis")
    analytic = B * forward_flops_per_sample(spec, 0, 0, VAE_DIM)
    ratio = cost["flops"] / analytic
    assert 0.5 < ratio < 1.6, (cost["flops"], analytic)


def test_hybrid_onehot_executes_at_least_model_flops(rng):
    """The one-hot aggregation strategy does MORE work than the mathematical
    segment-sum: as-compiled flops must dominate the model count."""
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))
    graph, seq, props = _inputs(rng)

    def fwd(params, graph, seq, props):
        return model_apply(params, spec, graph, seq, props, jax.random.key(1),
                           deterministic=True, aggregation="onehot").logits

    cost = xla_cost(fwd, params, graph, seq, props)
    if "flops" not in cost:
        pytest.skip("backend exposes no cost analysis")
    analytic = B * forward_flops_per_sample(
        spec, graph.node_feat.shape[1], graph.edge_src.shape[1], VAE_DIM)
    # one-hot matmul adds 2*N*E*(H+3) per layer, roughly tripling the EGNN
    # cost at these shapes
    assert cost["flops"] > analytic, (cost["flops"], analytic)
    # ... but stays within an order of magnitude (sanity on the model count)
    assert cost["flops"] < 20 * analytic, (cost["flops"], analytic)


def test_train_step_scaling():
    spec = model_map["HybridModelv2"]
    one = train_step_flops(spec, 1, N, E, VAE_DIM)
    many = train_step_flops(spec, 64, N, E, VAE_DIM)
    assert many == pytest.approx(64 * one, rel=1e-9)
    fwd = forward_flops_per_sample(spec, N, E, VAE_DIM)
    assert one == pytest.approx(3 * fwd, rel=0.01)  # loss term is small
    comp = model_map["HybridModelv2_Comparative"]
    assert train_step_flops(comp, 1, N, E, VAE_DIM) > 1.9 * one


def test_param_count(rng):
    _, params = build_model("SequenceModel", VAE_DIM, jax.random.key(0))
    n = param_count(params)
    spec = model_map["SequenceModel"]
    d, h, z = VAE_DIM, spec.vae_hidden_dim, spec.vae_latent_dim
    expect_vae = (d * h + h) + 2 * (h * z + z) + (z * h + h) + (h * d + d)
    assert n > expect_vae  # plus classifier
    assert n < expect_vae * 1.1


def test_peak_flops_lookup():
    class Dev:
        device_kind = "TPU v5 lite"
        platform = "tpu"

    assert peak_flops(Dev()) == 197e12
    assert peak_flops(Dev(), "float32") == 98.5e12

    class Cpu:
        device_kind = "cpu"
        platform = "cpu"

    assert peak_flops(Cpu()) is None
