"""Probe: is the wall-vs-device-span gap per-dispatch overhead?

Round-5 occupancy (benchmarks/occupancy_r05_e1408.txt) measured device
span 7.08 ms/step against a raced wall time of 7.82 ms/step — a ~0.74 ms
(~9%) gap. Round 2 measured chained-dispatch == in-scan at 15.3 ms/step
(RESULTS.md methodology section), i.e. no recoverable dispatch overhead
back then; at today's 2x-faster step the question is worth re-asking at
both bench shapes.

Three timed modes per shape, identical math:
  chained   - one host dispatch per step (the bench.py protocol)
  scan      - K steps inside ONE jitted lax.scan dispatch, constant batch
              (state-chained, so no elision), the round-2 control
  scan_pool - same scan but each step gathers its batch from a P-batch
              device-resident pool (the epoch-in-one-dispatch production
              shape; prices the per-step batch gather)

If scan beats chained by ~the occupancy gap, an epoch-scan execution mode
recovers real throughput; if they tie (as in round 2), the gap is
device-side program overhead the profiler span does not attribute, and
the floor stands as recorded.

Usage: python scripts/probe_dispatch_gap.py [--edges 1408,2560] [--steps 40]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", default="1408,2560")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--pool", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from immunostruct_tpu.data.synthetic import random_sample_batch
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    BATCH, NODES, SEQ_LEN = 128, 288, 284
    vae_dim = SEQ_LEN * 21
    platform = jax.devices()[0].platform
    compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    K, W, P = args.steps, args.windows, args.pool

    results = {}
    for edges in [int(e) for e in args.edges.split(",")]:
        spec, params = build_model("HybridModelv2", vae_dim, jax.random.key(0))
        trainer = Trainer(
            spec, LossConfig(vae_dim, pos_weight=1.0, sequence=True),
            binary=True, optimizer=make_optimizer("adam", constant_lr(1e-3)),
            aggregation="auto", compute_dtype=compute_dtype, donate=True)
        key = jax.random.key(1)
        batch = random_sample_batch(BATCH, NODES, edges, SEQ_LEN, seed=0)
        pool = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[random_sample_batch(BATCH, NODES, edges, SEQ_LEN, seed=s)
              for s in range(P)])

        # --- chained (bench protocol) ---
        state = trainer.init_state(params)
        for _ in range(3):
            state, loss = trainer._train_step(state, batch, key)
        float(loss)
        chained = []
        for _ in range(W):
            t0 = time.perf_counter()
            for _ in range(K):
                state, loss = trainer._train_step(state, batch, key)
            float(loss)
            chained.append((time.perf_counter() - t0) / K * 1e3)
        del state

        # --- scan: K steps in one dispatch, constant batch ---
        def scan_steps(state, batch, rng):
            def body(st, _):
                st, loss = trainer._train_step_impl(st, batch, rng)
                return st, loss
            state, losses = jax.lax.scan(body, state, None, length=K)
            return state, losses[-1]

        scan_jit = jax.jit(scan_steps, donate_argnums=(0,))
        _, params2 = build_model("HybridModelv2", vae_dim, jax.random.key(0))
        state = trainer.init_state(params2)
        state, loss = scan_jit(state, batch, key)
        float(loss)
        scanned = []
        for _ in range(W):
            t0 = time.perf_counter()
            state, loss = scan_jit(state, batch, key)
            float(loss)
            scanned.append((time.perf_counter() - t0) / K * 1e3)
        del state

        # --- scan_pool: per-step batch gathered from a device pool ---
        def scan_pool_steps(state, pool, rng):
            def body(st, i):
                b = jax.tree.map(lambda x: x[i % P], pool)
                st, loss = trainer._train_step_impl(st, b, rng)
                return st, loss
            state, losses = jax.lax.scan(body, state, jnp.arange(K))
            return state, losses[-1]

        pool_jit = jax.jit(scan_pool_steps, donate_argnums=(0,))
        _, params3 = build_model("HybridModelv2", vae_dim, jax.random.key(0))
        state = trainer.init_state(params3)
        state, loss = pool_jit(state, pool, key)
        float(loss)
        pooled = []
        for _ in range(W):
            t0 = time.perf_counter()
            state, loss = pool_jit(state, pool, key)
            float(loss)
            pooled.append((time.perf_counter() - t0) / K * 1e3)
        del state

        results[f"E={edges}"] = {
            "chained_ms_p50": round(statistics.median(chained), 3),
            "scan_ms_p50": round(statistics.median(scanned), 3),
            "scan_pool_ms_p50": round(statistics.median(pooled), 3),
            "chained_all": [round(x, 3) for x in chained],
            "scan_all": [round(x, 3) for x in scanned],
            "scan_pool_all": [round(x, 3) for x in pooled],
        }
        print(json.dumps({f"E={edges}": results[f"E={edges}"]}), flush=True)

    print(json.dumps({"probe": "dispatch_gap", "steps": K, "windows": W,
                      "pool": P, "results": results}))


if __name__ == "__main__":
    main()
