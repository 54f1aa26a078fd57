"""Serving-path inference throughput at reference shapes.

Measures the deterministic forward (probabilities) of HybridModelv2 at
batch 128 / 288 nodes / 2560 edges — the per-chip pMHC scoring rate for
batch inference and clinical scoring workloads.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np


def main(batch=128, nodes=288, edges=2560, seq_len=284):
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.models.trunk import model_apply
    from scripts.perf_sweep import build_batch

    b = build_batch(batch, nodes, edges, seq_len)
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    spec, params = build_model("HybridModelv2", seq_len * 21, jax.random.key(0))

    @jax.jit
    def infer(params, graph, seq, props, key):
        out = model_apply(params, spec, graph, seq, props, key,
                          deterministic=True, aggregation="auto",
                          compute_dtype=dtype)
        return jax.nn.sigmoid(out.logits.reshape(-1))

    key = jax.random.key(1)
    probs = infer(params, b.graph, b.seq_onehot, b.props, key)
    jax.block_until_ready(probs)

    steps = 50 if platform == "tpu" else 3
    best = float("inf")
    for _ in range(5 if platform == "tpu" else 1):
        t0 = time.perf_counter()
        for _ in range(steps):
            probs = infer(params, b.graph, b.seq_onehot, b.props, key)
        jax.block_until_ready(probs)
        best = min(best, time.perf_counter() - t0)

    sps = batch * steps / best
    print(json.dumps({"metric": "infer_samples_per_sec_per_chip",
                      "value": round(sps, 1), "unit": "pMHC/s",
                      "platform": platform}))


if __name__ == "__main__":
    main()
