"""Golden-value regression pins: fixed seeds + fixed inputs -> fixed logits.

Guards future refactors against silent numerical drift (init scheme, layer
order, aggregation, dtype policy). Values were produced by this code on CPU
f32 at commit time; a legitimate change to init or forward semantics must
update them consciously.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.models import build_model
from immunostruct_tpu.models.trunk import model_apply
from tests.test_models import tiny_graph_batch, B, L, VAE_DIM

GOLDEN = {
    "HybridModelv2": [0.140876, 0.140348, 0.136962, 0.139974],
    "HybridModel": [0.082158, 0.130159, 0.061452, 0.152124],
    "SequenceFpModel": [0.423772, 0.248095, 0.218282, -0.000597],
    "StructureModel": [0.156918, 0.156861, 0.156855, 0.156844],
}


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(123)
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    return graph, seq, props


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_logits(name, inputs):
    graph, seq, props = inputs
    spec, params = build_model(name, VAE_DIM, jax.random.key(42))
    out = model_apply(params, spec, graph, seq, props, jax.random.key(7),
                      deterministic=True, aggregation="scatter")
    got = np.asarray(out.logits).reshape(-1)
    np.testing.assert_allclose(got, GOLDEN[name], rtol=2e-4, atol=2e-5)
