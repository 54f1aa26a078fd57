"""scan_layers: scanned hidden convs match the unrolled stack exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from immunostruct_tpu.ops.egnn import egnn_stack_init, egnn_stack_apply
from immunostruct_tpu.models import build_model
from immunostruct_tpu.models.trunk import model_apply
from tests.reference_impl import random_graph
from tests.test_models import tiny_graph_batch, B, L, VAE_DIM


def test_scan_matches_unrolled(rng):
    b, n, e = 2, 10, 32
    hs, xs, srcs, dsts = zip(*[random_graph(rng, n, e) for _ in range(b)])
    h = jnp.asarray(np.stack(hs))
    x = jnp.asarray(np.stack(xs))
    src = jnp.asarray(np.stack(srcs))
    dst = jnp.asarray(np.stack(dsts))
    ef = jnp.ones((b, e, 1))
    em = jnp.ones((b, e), bool)
    params = egnn_stack_init(jax.random.key(0), 5, 20, 16)

    h1, x1 = egnn_stack_apply(params, h, x, src, dst, ef, em,
                              aggregation="scatter", scan_layers=False)
    h2, x2 = egnn_stack_apply(params, h, x, src, dst, ef, em,
                              aggregation="scatter", scan_layers=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)


def test_model_forward_scan_matches(rng):
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))
    out1 = model_apply(params, spec, graph, seq, props, jax.random.key(1),
                       deterministic=True, aggregation="scatter",
                       scan_layers=False)
    out2 = model_apply(params, spec, graph, seq, props, jax.random.key(1),
                       deterministic=True, aggregation="scatter",
                       scan_layers=True)
    np.testing.assert_allclose(np.asarray(out1.logits), np.asarray(out2.logits),
                               rtol=1e-5, atol=1e-6)


def test_scan_grads_match(rng):
    b, n, e = 1, 8, 16
    h_, x_, src, dst = random_graph(rng, n, e)
    h = jnp.asarray(h_)[None]
    x = jnp.asarray(x_)[None]
    ef = jnp.ones((1, e, 1))
    em = jnp.ones((1, e), bool)
    params = egnn_stack_init(jax.random.key(2), 3, 20, 8)

    def loss(p, scan):
        ho, xo = egnn_stack_apply(p, h, x, jnp.asarray(src)[None],
                                  jnp.asarray(dst)[None], ef, em,
                                  aggregation="scatter", scan_layers=scan)
        return jnp.sum(ho ** 2) + jnp.sum(xo ** 2)

    g1 = jax.grad(lambda p: loss(p, False))(params)
    g2 = jax.grad(lambda p: loss(p, True))(params)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_resolve_scan_layers_auto(monkeypatch):
    """Tri-state --scan-layers (VERDICT r2 item 8): explicit values force;
    auto turns the scan on only for short TPU runs with an EGNN stack."""
    import types
    import jax
    from immunostruct_tpu.config import Config
    from immunostruct_tpu.models.trunk import ModelSpec
    from immunostruct_tpu.procedures.train import (
        resolve_scan_layers, SCAN_LAYERS_AUTO_MAX_STEPS)

    hybrid = ModelSpec()
    seq_only = ModelSpec(name="SequenceModel", use_structure=False)

    cfg = Config(num_epochs=40)
    # explicit forcing wins regardless of platform/steps
    cfg.scan_layers = True
    assert resolve_scan_layers(cfg, hybrid, 10) is True
    cfg.scan_layers = False
    assert resolve_scan_layers(cfg, hybrid, 10) is False

    # auto on CPU (the test platform): always unrolled
    cfg.scan_layers = None
    assert resolve_scan_layers(cfg, hybrid, 10) is False

    # auto on (faked) TPU: on for short runs, off for soaks and for
    # models without an EGNN stack
    fake_dev = types.SimpleNamespace(platform="tpu")
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [fake_dev])
    assert resolve_scan_layers(cfg, hybrid, 10) is True
    assert resolve_scan_layers(
        cfg, hybrid, SCAN_LAYERS_AUTO_MAX_STEPS // 40 + 1) is False
    assert resolve_scan_layers(cfg, seq_only, 10) is False
