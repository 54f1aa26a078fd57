"""Serving export: StableHLO round-trip + numerical equality."""

import jax
import numpy as np
import pytest

from immunostruct_tpu.models import build_model
from immunostruct_tpu.models.trunk import model_apply
from immunostruct_tpu.utils.export import (
    export_inference_fn, save_exported, load_exported,
)
from tests.test_models import tiny_graph_batch, B, N, E, L, VAE_DIM


def test_export_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))

    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))
    exported = export_inference_fn(spec, params, (graph, seq, props),
                                   aggregation="onehot")
    path = str(tmp_path / "model.stablehlo")
    save_exported(exported, path)
    loaded = load_exported(path)

    got = loaded.call(graph, seq, props)
    want = jax.nn.sigmoid(model_apply(
        params, spec, graph, seq, props, jax.random.key(0),
        deterministic=True, aggregation="onehot").logits.reshape(-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
