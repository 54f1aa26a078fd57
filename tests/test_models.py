"""Shape/behavior tests for the 14-model registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.models import (
    model_map, build_model, model_apply, model_apply_comparative, reset_head,
)
from immunostruct_tpu.structs import make_graph_batch
from tests.reference_impl import random_graph

B, N, E, L = 4, 16, 64, 12
VAE_DIM = L * 21


def tiny_graph_batch(rng, b=B, n=N, e=E):
    feats, coords, edges = [], [], []
    for _ in range(b):
        nodes = int(rng.integers(n // 2, n))
        h, x, src, dst = random_graph(rng, nodes, e // 2)
        onehot = np.zeros((nodes, 20), np.float32)
        onehot[np.arange(nodes), rng.integers(0, 20, nodes)] = 1.0
        feats.append(onehot)
        coords.append(x)
        edges.append(np.stack([src, dst]))
    return make_graph_batch(feats, coords, edges, max_nodes=n, max_edges=e,
                            nodes_multiple=1, edges_multiple=1)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    return graph, seq, props


@pytest.mark.parametrize("name", sorted(model_map))
def test_forward_shapes(name, batch):
    graph, seq, props = batch
    spec, params = build_model(name, VAE_DIM, jax.random.key(0))
    out = model_apply(params, spec, graph, seq, props, jax.random.key(1),
                      deterministic=True, aggregation="scatter")
    assert out.logits.shape == (B, 1)
    if spec.use_sequence:
        assert out.recon.shape == (B, VAE_DIM)
        assert out.mu.shape == (B, spec.vae_latent_dim)
        assert out.logvar.shape == (B, spec.vae_latent_dim)
    else:
        assert out.recon is None
    if spec.ssl:
        assert out.node_logits.shape == (B, 20)
    assert out.embedding.shape == (B, spec.embedding_dim)


@pytest.mark.parametrize("name", [n for n in sorted(model_map) if model_map[n].comparative])
def test_comparative_forward(name, batch):
    graph, seq, props = batch
    spec, params = build_model(name, VAE_DIM, jax.random.key(0),
                               use_wt_for_downstream=True)
    out_c, out_w, logits = model_apply_comparative(
        params, spec, (graph, graph), (seq, seq), (props, props),
        jax.random.key(1), deterministic=True, aggregation="scatter")
    assert logits.shape == (B, 1)
    assert out_c.embedding.shape == (B, spec.embedding_dim)
    assert spec.classifier_input_dim == 2 * spec.embedding_dim

    # without wt for downstream the classifier consumes only the cancer branch
    spec2, params2 = build_model(name, VAE_DIM, jax.random.key(0),
                                 use_wt_for_downstream=False)
    assert spec2.classifier_input_dim == spec2.embedding_dim
    _, _, logits2 = model_apply_comparative(
        params2, spec2, (graph, graph), (seq, seq), (props, props),
        jax.random.key(1), deterministic=True, aggregation="scatter")
    assert logits2.shape == (B, 1)


def test_embedding_dims_match_reference():
    """Fusion widths: 104 for hybrid (64+32+8), 96 for dual (64+32),
    34 for SequenceFp (32+2), 64/128 for structure models."""
    assert model_map["HybridModelv2"].embedding_dim == 104
    assert model_map["HybridModel"].embedding_dim == 104
    assert model_map["DualModel"].embedding_dim == 96
    assert model_map["SequenceModel"].embedding_dim == 32
    assert model_map["SequenceFpModel"].embedding_dim == 34
    assert model_map["StructureModel"].embedding_dim == 64
    assert model_map["StructureModelv2"].embedding_dim == 128
    assert model_map["HybridModelv2_Comparative"].classifier_input_dim == 208


def test_reset_head_changes_only_head(batch):
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))
    new_params = reset_head(params, spec, jax.random.key(42))
    # trunk params identical
    for key in ["gcn", "vae", "property_embedding", "node_attn", "combined_attention"]:
        a = jax.tree.leaves(params[key])
        b = jax.tree.leaves(new_params[key])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # classifier re-initialized
    old = np.asarray(params["classifier"]["trunk"]["w"])
    new = np.asarray(new_params["classifier"]["trunk"]["w"])
    assert np.abs(old - new).max() > 1e-6


def test_reset_head_ssl_keeps_node_predictor(batch):
    spec, params = build_model("HybridModelv2_SSL", VAE_DIM, jax.random.key(0))
    new_params = reset_head(params, spec, jax.random.key(42))
    np.testing.assert_array_equal(
        np.asarray(params["classifier"]["trunk"]["w"]),
        np.asarray(new_params["classifier"]["trunk"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(params["classifier"]["node_predictor_head"]["w"]),
        np.asarray(new_params["classifier"]["node_predictor_head"]["w"]))
    assert np.abs(np.asarray(params["classifier"]["classifier_head"]["w"]) -
                  np.asarray(new_params["classifier"]["classifier_head"]["w"])).max() > 1e-6


def test_comparative_pretrain_hotfix(batch):
    """Plain forward on a comparative model duplicates the embedding to fill
    the 2x classifier (comparative_models.py:159-163)."""
    graph, seq, props = batch
    spec, params = build_model("HybridModel_Comparative", VAE_DIM, jax.random.key(0),
                               use_wt_for_downstream=True)
    out = model_apply(params, spec, graph, seq, props, jax.random.key(1),
                      deterministic=True, aggregation="scatter")
    assert out.logits.shape == (B, 1)


def test_deterministic_eval_is_reproducible(batch):
    graph, seq, props = batch
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))
    out1 = model_apply(params, spec, graph, seq, props, jax.random.key(5),
                       deterministic=True, aggregation="scatter")
    out2 = model_apply(params, spec, graph, seq, props, jax.random.key(5),
                       deterministic=True, aggregation="scatter")
    np.testing.assert_array_equal(np.asarray(out1.logits), np.asarray(out2.logits))


def test_jit_compiles(batch):
    graph, seq, props = batch
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))

    @jax.jit
    def fwd(p, g, s, pr, key):
        return model_apply(p, spec, g, s, pr, key, deterministic=True,
                           aggregation="onehot").logits

    logits = fwd(params, graph, seq, props, jax.random.key(1))
    assert logits.shape == (B, 1)


@pytest.mark.parametrize(
    "name", [n for n in sorted(model_map) if model_map[n].comparative])
def test_stack_twins_matches_twin_passes(name, batch):
    """stack_twins=True (one 2B forward) equals the two-pass path exactly
    once the only noise source is pinned: the VAE eps is sampled even under
    deterministic=True (mirroring the reference's eval-time randn_like), so
    logvar is forced to -80 (std ~= 0, z = mu) to make the comparison
    noise-free (model_apply_comparative docstring)."""
    graph, seq, props = batch
    rng = np.random.default_rng(3)
    graph2 = tiny_graph_batch(rng)
    seq2 = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props2 = jnp.asarray(rng.random((B, 2)).astype(np.float32))

    spec, params = build_model(name, VAE_DIM, jax.random.key(0))
    if spec.use_sequence:  # pin the VAE noise: logvar == -80 everywhere
        params["vae"]["fc22"]["w"] = jnp.zeros_like(
            params["vae"]["fc22"]["w"])
        params["vae"]["fc22"]["b"] = jnp.full_like(
            params["vae"]["fc22"]["b"], -80.0)
    kw = dict(deterministic=True, aggregation="scatter")
    out_c, out_w, logits = model_apply_comparative(
        params, spec, (graph, graph2), (seq, seq2), (props, props2),
        jax.random.key(1), stack_twins=False, **kw)
    out_c2, out_w2, logits2 = model_apply_comparative(
        params, spec, (graph, graph2), (seq, seq2), (props, props2),
        jax.random.key(1), stack_twins=True, **kw)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)
    for a, b in ((out_c, out_c2), (out_w, out_w2)):
        np.testing.assert_allclose(np.asarray(b.embedding),
                                   np.asarray(a.embedding),
                                   rtol=1e-5, atol=1e-5)
        if a.recon is not None:
            np.testing.assert_allclose(np.asarray(b.recon),
                                       np.asarray(a.recon),
                                       rtol=1e-5, atol=1e-5)


def test_stack_twins_train_mode_finite_and_close(batch):
    """Train mode: the stacked path draws a different eps/dropout stream, so
    outputs differ — but mu/logvar (noise-free) must still agree."""
    graph, seq, props = batch
    spec, params = build_model("HybridModelv2_Comparative", VAE_DIM,
                               jax.random.key(0))
    kw = dict(deterministic=False, aggregation="scatter")
    out_c, _, logits = model_apply_comparative(
        params, spec, (graph, graph), (seq, seq), (props, props),
        jax.random.key(5), stack_twins=False, **kw)
    out_c2, _, logits2 = model_apply_comparative(
        params, spec, (graph, graph), (seq, seq), (props, props),
        jax.random.key(5), stack_twins=True, **kw)
    assert np.isfinite(np.asarray(logits2)).all()
    np.testing.assert_allclose(np.asarray(out_c2.mu), np.asarray(out_c.mu),
                               rtol=1e-5, atol=1e-5)


def test_auto_resolves_to_onehot_for_deterministic_forward(monkeypatch):
    """Forward-only 'auto' must resolve to the pure-XLA 'onehot' path on
    TPU (measured fastest for inference — mega's win is a training-only
    residual economy, benchmarks/RESULTS.md). Simulated here by patching
    the TPU probe: if the resolution regressed to 'mega', the un-
    interpreted pallas_call would fail on CPU; numerics must match
    scatter."""
    import numpy as np
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.models.trunk import model_apply
    from immunostruct_tpu.ops import egnn as eg

    rng = np.random.default_rng(5)
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))

    monkeypatch.setattr(eg, "_on_tpu", lambda: True)
    import immunostruct_tpu.models.trunk  # resolution imports _on_tpu lazily
    out_auto = model_apply(params, spec, graph, seq, props, jax.random.key(7),
                           deterministic=True, aggregation="auto")
    out_scatter = model_apply(params, spec, graph, seq, props,
                              jax.random.key(7), deterministic=True,
                              aggregation="scatter")
    np.testing.assert_allclose(np.asarray(out_auto.logits),
                               np.asarray(out_scatter.logits),
                               rtol=5e-4, atol=5e-5)
