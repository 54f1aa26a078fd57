"""Model export for serving: StableHLO via jax.export.

Serializes the flagship inference function (deterministic forward ->
sigmoid probabilities) into a portable artifact loadable by any
jax.export-compatible runtime without the Python model code — the
production-serving path the reference lacks.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def export_inference_fn(spec, params, example_batch, *,
                        aggregation: str = "onehot",
                        compute_dtype=jnp.float32):
    """Returns a jax.export.Exported for `probs = f(graph, seq, props)`.

    The PRNG key is folded in as a constant: inference dropout is disabled
    and the VAE samples with a fixed key (the reference also samples at
    eval; a fixed key makes the exported artifact deterministic).
    """
    from jax import export as jexport
    from immunostruct_tpu.models.trunk import model_apply

    key = jax.random.key(0)

    def serve(graph, seq, props):
        out = model_apply(params, spec, graph, seq, props, key,
                          deterministic=True, aggregation=aggregation,
                          compute_dtype=compute_dtype)
        return jax.nn.sigmoid(out.logits.reshape(-1))

    graph, seq, props = example_batch
    args_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (graph, seq, props))
    return jexport.export(jax.jit(serve))(*args_shapes)


def save_exported(exported, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path: str):
    from jax import export as jexport
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
