"""Mixed-precision policy: bf16 compute path stays finite and close to f32."""

import jax
import jax.numpy as jnp
import numpy as np

from immunostruct_tpu.models import build_model
from immunostruct_tpu.models.trunk import model_apply
from tests.test_models import tiny_graph_batch, B, L, VAE_DIM


def test_bf16_forward_close_to_f32(rng):
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))

    out32 = model_apply(params, spec, graph, seq, props, jax.random.key(1),
                        deterministic=True, aggregation="scatter",
                        compute_dtype=jnp.float32)
    out16 = model_apply(params, spec, graph, seq, props, jax.random.key(1),
                        deterministic=True, aggregation="scatter",
                        compute_dtype=jnp.bfloat16)
    a, b = np.asarray(out32.logits), np.asarray(out16.logits)
    assert np.isfinite(b).all()
    # bf16 has ~3 decimal digits; logits should agree to coarse tolerance
    np.testing.assert_allclose(a, b, rtol=0.15, atol=0.15)


def test_bf16_grads_finite(rng):
    graph = tiny_graph_batch(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    target = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(0))

    from immunostruct_tpu.utils.losses import LossConfig, bce_loss
    cfg = LossConfig(VAE_DIM, 1.0, sequence=True)

    def loss_fn(p):
        out = model_apply(p, spec, graph, seq, props, jax.random.key(1),
                          deterministic=True, aggregation="scatter",
                          compute_dtype=jnp.bfloat16)
        return bce_loss(cfg, out.recon, seq, out.mu, out.logvar,
                        out.logits, target)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pad_final_batch_single_shape(tmp_path, rng):
    from immunostruct_tpu.config import Config
    from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset, BatchPipeline
    cfg = Config(batch_size=8, pad_nodes_multiple=4, pad_edges_multiple=16)
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=13, seed=41)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    n = len(ds)
    pipe = BatchPipeline(ds, np.arange(n), split="train", binary=True, full=True,
                         config=cfg, pad_final_batch=True)
    sizes = {b.target.shape[0] for b in pipe.epoch(0)}
    assert sizes == {8}
