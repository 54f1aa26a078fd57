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


def test_int8_quantization_accuracy_and_size(tmp_path, rng):
    """Weight-only int8: probabilities stay within a small delta of full
    precision and the artifact weights shrink ~4x."""
    import jax.numpy as jnp
    from immunostruct_tpu.utils.quantize import (
        fake_quant_int8, quantize_int8, dequantize_int8, quantized_size_bytes,
    )

    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))

    # quantize/dequantize roundtrip error bounded by scale/2 per element
    w = np.asarray(params["vae"]["fc1"]["w"])
    q, s = quantize_int8(w)
    assert q.dtype == np.int8
    # half-a-quantum bound, with float32 rounding headroom
    bound = np.broadcast_to(s[None, :] * 0.502 + 1e-8, w.shape)
    np.testing.assert_array_less(np.abs(dequantize_int8(q, s) - w), bound)

    qparams = fake_quant_int8(params)
    # biases untouched, weights changed
    np.testing.assert_array_equal(np.asarray(qparams["vae"]["fc1"]["b"]),
                                  np.asarray(params["vae"]["fc1"]["b"]))
    assert not np.array_equal(np.asarray(qparams["vae"]["fc1"]["w"]), w)

    def probs(p):
        return np.asarray(jax.nn.sigmoid(model_apply(
            p, spec, graph, seq, props, jax.random.key(0),
            deterministic=True, aggregation="scatter").logits.reshape(-1)))

    dprob = np.abs(probs(params) - probs(qparams))
    assert float(dprob.max()) < 0.05  # int8 weights: small prob shift

    f32_bytes, int8_bytes = quantized_size_bytes(params)
    assert int8_bytes < 0.3 * f32_bytes  # ~4x smaller (scales add a little)


def test_serve_batch_oneshot(tmp_path, rng):
    """The filesystem batch server answers a request via the exported
    artifact with the same probabilities as a direct call."""
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, str(tmp_path.parents[0]))  # no-op, keeps path sane
    from scripts.serve_batch import write_example, main as serve_main

    batch, nodes, edges, seq_len = 8, 32, 128, 64
    spec, params = build_model("HybridModelv2", seq_len * 21, jax.random.key(0))

    req = str(tmp_path / "req.npz")
    write_example(req, batch, nodes, edges, seq_len)
    from scripts.serve_batch import request_to_args
    graph, seq, props = request_to_args(req)

    exported = export_inference_fn(spec, params, (graph, seq, props),
                                   aggregation="onehot")
    art = str(tmp_path / "model.shlo")
    save_exported(exported, art)

    serve_main(["--artifact", art, "--oneshot", req])
    got = np.load(str(tmp_path / "req.probs.npy"))
    want = np.asarray(exported.call(graph, seq, props))
    np.testing.assert_allclose(got, want, rtol=1e-6)
