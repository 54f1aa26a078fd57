"""Perf sweep: EGNN aggregation strategy x compute dtype on the live chip.

Measures the full HybridModelv2 train step at reference shapes for each
(aggregation, dtype) combination; prints one line per config to stderr and
a summary JSON to stdout. Used to pick bench.py defaults.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))


def build_batch(batch, nodes, edges, seq_len, paired=False):
    """``paired=True`` lays the random edges out in the v9 mirror-paired
    order (slot k + E/2 = reverse of slot k, no self loops) — a valid
    input for EVERY kernel variant (it is just an edge ordering), and
    the layout MEGA_PAIRED requires (ops/pallas_mega.py)."""
    import jax.numpy as jnp
    from immunostruct_tpu.structs import GraphBatch, SampleBatch

    rng = np.random.default_rng(0)
    onehot = np.zeros((batch, nodes, 20), np.float32)
    for b in range(batch):
        onehot[b, np.arange(nodes), rng.integers(0, 20, nodes)] = 1.0
    if paired:
        half = edges // 2
        s0 = rng.integers(0, nodes, (batch, half)).astype(np.int32)
        d0 = ((s0 + rng.integers(1, nodes, (batch, half))) % nodes
              ).astype(np.int32)
        esrc = np.concatenate([s0, d0], axis=1)
        edst = np.concatenate([d0, s0], axis=1)
    else:
        esrc = rng.integers(0, nodes, (batch, edges)).astype(np.int32)
        edst = rng.integers(0, nodes, (batch, edges)).astype(np.int32)
    graph = GraphBatch(
        node_feat=jnp.asarray(onehot),
        coords=jnp.asarray(rng.standard_normal((batch, nodes, 3)).astype(np.float32)),
        edge_src=jnp.asarray(esrc),
        edge_dst=jnp.asarray(edst),
        edge_feat=jnp.ones((batch, edges, 1), jnp.float32),
        edge_mask=jnp.ones((batch, edges), bool),
        node_mask=jnp.ones((batch, nodes), bool),
        num_nodes=jnp.full((batch,), nodes, jnp.int32),
    )
    seq = jnp.asarray(rng.random((batch, seq_len, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((batch, 2)).astype(np.float32))
    target = jnp.asarray((rng.random(batch) > 0.5).astype(np.float32))
    return SampleBatch(graph=graph, seq_onehot=seq, props=props,
                      target=target, aux_residue=None)


def measure(aggregation, dtype_name, batch_size=128, nodes=288, edges=2560,
            seq_len=284, steps=30):
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    batch = build_batch(batch_size, nodes, edges, seq_len)
    vae_dim = seq_len * 21
    spec, params = build_model("HybridModelv2", vae_dim, jax.random.key(0))
    trainer = Trainer(spec, LossConfig(vae_dim, 1.0, sequence=True), binary=True,
                      optimizer=make_optimizer("adam", constant_lr(1e-3)),
                      aggregation=aggregation,
                      compute_dtype=jnp.dtype(dtype_name), donate=True)
    state = trainer.init_state(params)
    key = jax.random.key(1)
    state, loss = trainer._train_step(state, batch, key)
    float(loss)  # value fetch: block_until_ready is unreliable here (RESULTS.md)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = trainer._train_step(state, batch, key)
    float(loss)
    dt = time.perf_counter() - t0
    sps = batch_size * steps / dt
    print(f"agg={aggregation:8s} dtype={dtype_name:9s} "
          f"step={dt / steps * 1e3:7.2f}ms  {sps:10.0f} samples/s  loss={float(loss):.3f}",
          file=sys.stderr)
    return sps


def main():
    results = {}
    for agg in ("pallas", "onehot", "scatter"):
        for dt in ("bfloat16", "float32"):
            try:
                results[f"{agg}/{dt}"] = round(measure(agg, dt), 1)
            except Exception as e:  # noqa: BLE001
                results[f"{agg}/{dt}"] = f"error: {e}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
