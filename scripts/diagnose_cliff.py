"""Root-cause probes for step-time accounting and the B>=256 XLA cliff.

Round-1 left two open questions (VERDICT #1):
  (a) is the measured ~1.2 ms/step at B=128 consistent with what the chip
      can physically do (the as-compiled FLOPs would exceed bf16 peak)?
  (b) why does the train step collapse ~100x between B=128 and B=256?

This script answers both with direct measurements on the live chip:
  1. matmul peak probes (square bf16) — what peak does THIS harness see;
  2. shaped probes — the edge-MLP matmul and the one-hot aggregation
     einsum at bench shapes, timed alone;
  3. full-step sweep over batch x aggregation strategy with XLA
     cost_analysis (flops, bytes) and memory_analysis (temp HBM) per
     config.

Writes benchmarks/cliff_diagnosis.json and prints a table.
Run: timeout 3600 python scripts/diagnose_cliff.py [--quick]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = 288
EDGES = 2560
SEQ_LEN = 284


def _fetch(out):
    """Value-fetch barrier: through the remote-dispatch tunnel
    ``block_until_ready`` is sometimes a no-op; converting (part of) the
    result to host values is the only reliable execution barrier."""
    import jax
    import numpy as np

    leaf = jax.tree.leaves(out)[-1]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def _median_ms(fn, args, steps=50, windows=3, chain=None):
    """Median window ms/step with honest (value-fetch) barriers.

    ``chain``: optional (next_args, out) -> args function so successive
    calls form a data dependency (defeats any dispatch caching of identical
    calls AND forces serial execution)."""
    out = fn(*args)  # compile
    _fetch(out)
    dts = []
    for _ in range(windows):
        a = args
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
            if chain is not None:
                a = chain(a, out)
        _fetch(out)
        dts.append((time.perf_counter() - t0) / steps * 1e3)
    return statistics.median(dts)


def _cost(jitted, *args):
    from immunostruct_tpu.utils.flops import xla_cost, xla_memory

    try:
        cost = xla_cost(jitted, *args)
        mem = xla_memory(jitted, *args)
        return {
            "xla_gflops": round(float(cost.get("flops", 0)) / 1e9, 2) if cost else None,
            "xla_gb": round(float(cost.get("bytes accessed", 0)) / 1e9, 3) if cost else None,
            "temp_mb": round(getattr(mem, "temp_size_in_bytes", 0) / 1e6, 1) if mem else None,
            "output_mb": round(getattr(mem, "output_size_in_bytes", 0) / 1e6, 1) if mem else None,
        }
    except Exception as e:  # noqa: BLE001
        return {"cost_error": str(e)[:120]}


def probe_matmuls(results, iters=64):
    """Device-true rates: K serially-chained iterations inside ONE jitted
    lax.scan, timed with a value-fetch barrier — immune to dispatch caching
    and to unreliable host-side barriers."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    def timed(f, args, flops_per_iter, tag):
        out = f(*args)
        _fetch(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            _fetch(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        tf = flops_per_iter / (ms / 1e3) / 1e12
        results[tag] = {"ms_per_iter": round(ms, 4), "tflops": round(tf, 1)}
        print(f"{tag}: {ms:.4f} ms/iter -> {tf:.1f} TF/s")

    for m in (2048, 4096):
        a0 = (np.random.default_rng(0).standard_normal((m, m)) / m).astype(np.float32)

        @partial(jax.jit, static_argnums=())
        def sq(a):
            def body(c, _):
                c = c @ c
                # renormalize so values stay finite over many iterations
                return c / (jnp.max(jnp.abs(c)) + 1e-6), None
            c, _ = jax.lax.scan(body, a, None, length=iters)
            return c

        timed(sq, (jnp.asarray(a0, jnp.bfloat16),), 2 * m ** 3, f"probe_square_{m}")

    # edge-MLP shape at B=128: [B*E,130]@[130,64] then [B*E,64]@[64,130]
    be = 128 * EDGES
    a0 = jnp.asarray(np.random.default_rng(1).standard_normal((be, 130)) * 0.01,
                     jnp.bfloat16)
    w1 = jnp.asarray(np.random.default_rng(2).standard_normal((130, 64)) * 0.1,
                     jnp.bfloat16)
    w2 = jnp.asarray(np.random.default_rng(3).standard_normal((64, 130)) * 0.1,
                     jnp.bfloat16)

    @jax.jit
    def mlp(a, w1, w2):
        def body(c, _):
            y = c @ w1
            c = c + y @ w2
            return c / (jnp.max(jnp.abs(c)) + 1e-6), None
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return c

    timed(mlp, (a0, w1, w2), 2 * 2 * be * 130 * 64, "probe_edge_mlp_chain")

    # aggregation einsum + gather at bench shapes, B=128, C=67
    bsz, c = 128, 67
    dst = jnp.asarray(np.random.default_rng(0).integers(
        0, NODES, (bsz, EDGES)).astype(np.int32))
    msgs0 = jnp.asarray(
        np.random.default_rng(4).standard_normal((bsz, EDGES, c)) * 0.01,
        jnp.bfloat16)

    @jax.jit
    def agg_chain(dst, msgs):
        onehot = jax.nn.one_hot(dst, NODES, dtype=jnp.bfloat16, axis=1)

        def body(m, _):
            out = jnp.einsum("bne,bec->bnc", onehot, m,
                             preferred_element_type=jnp.float32)
            m = m + jnp.take_along_axis(
                out, dst[..., None], axis=1).astype(m.dtype)
            return m / (jnp.max(jnp.abs(m)) + 1e-6), None

        m, _ = jax.lax.scan(body, msgs, None, length=iters)
        return m

    timed(agg_chain, (dst, msgs0), 2 * bsz * NODES * EDGES * c,
          "probe_onehot_agg_chain")


def build_batch(bsz):
    import jax.numpy as jnp
    from immunostruct_tpu.structs import GraphBatch, SampleBatch

    rng = np.random.default_rng(0)
    onehot = np.zeros((bsz, NODES, 20), np.float32)
    onehot[:, np.arange(NODES), rng.integers(0, 20, (bsz, NODES))] = 1.0
    graph = GraphBatch(
        node_feat=jnp.asarray(onehot),
        coords=jnp.asarray(rng.standard_normal((bsz, NODES, 3)).astype(np.float32)),
        edge_src=jnp.asarray(rng.integers(0, NODES, (bsz, EDGES)).astype(np.int32)),
        edge_dst=jnp.asarray(rng.integers(0, NODES, (bsz, EDGES)).astype(np.int32)),
        edge_feat=jnp.ones((bsz, EDGES, 1), jnp.float32),
        edge_mask=jnp.ones((bsz, EDGES), bool),
        node_mask=jnp.ones((bsz, NODES), bool),
        num_nodes=jnp.full((bsz,), NODES, jnp.int32),
    )
    seq = jnp.asarray(rng.random((bsz, SEQ_LEN, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((bsz, 2)).astype(np.float32))
    target = jnp.asarray((rng.random(bsz) > 0.5).astype(np.float32))
    return SampleBatch(graph=graph, seq_onehot=seq, props=props,
                       target=target, aux_residue=None)


def step_config(model_name, bsz, aggregation, train=True):
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.models.trunk import model_apply
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    batch = build_batch(bsz)
    vae_dim = SEQ_LEN * 21
    spec, params = build_model(model_name, vae_dim, jax.random.key(0))
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32

    if not train:
        def fwd(params, graph, seq, props, prev):
            # chain prev logits into the input so successive calls are
            # data-dependent (defeats dispatch caching, forces serial exec)
            props = props + 1e-12 * jnp.mean(prev)
            return model_apply(params, spec, graph, seq, props,
                               jax.random.key(1), deterministic=True,
                               aggregation=aggregation,
                               compute_dtype=dtype).logits

        f = jax.jit(fwd)
        prev = jnp.zeros((bsz, 1))
        args = (params, batch.graph, batch.seq_onehot, batch.props, prev)
        chain = lambda a, out: a[:4] + (out,)  # noqa: E731
        ms = _median_ms(f, args, steps=20, chain=chain)
        return {"ms": round(ms, 3), **_cost(f, *args)}

    trainer = Trainer(spec, LossConfig(vae_dim, 1.0, sequence=spec.use_sequence),
                      binary=True,
                      optimizer=make_optimizer("adam", constant_lr(1e-3)),
                      aggregation=aggregation, compute_dtype=dtype,
                      donate=False)
    state = trainer.init_state(params)
    key = jax.random.key(1)

    # chain the state so steps are serially data-dependent
    chain = lambda a, out: (out[0], a[1], a[2])  # noqa: E731
    ms = _median_ms(trainer._train_step, (state, batch, key), steps=30,
                    chain=chain)
    return {"ms": round(ms, 3),
            "samples_per_sec": round(bsz / (ms / 1e3)),
            **_cost(trainer._train_step, state, batch, key)}


def main():
    quick = "--quick" in sys.argv
    import jax

    results = {"device": str(jax.devices()[0])}
    print("== matmul probes ==")
    probe_matmuls(results)

    print("== full-step sweep ==")
    configs = [
        ("HybridModelv2", 128, "onehot", True),
        ("HybridModelv2", 256, "onehot", True),
        ("HybridModelv2", 256, "onehot", False),   # fwd-only: cliff in fwd or bwd?
        ("HybridModelv2", 128, "onehot_remat", True),
        ("HybridModelv2", 256, "onehot_remat", True),
        ("SequenceFpModel", 256, "onehot", True),  # no EGNN: cliff elsewhere?
    ]
    if not quick:
        configs += [
            ("HybridModelv2", 256, "scatter", True),
            ("HybridModelv2", 512, "onehot_remat", True),
            ("HybridModelv2", 64, "onehot", True),
        ]
    for model, bsz, agg, train in configs:
        tag = f"{model}_B{bsz}_{agg}_{'train' if train else 'fwd'}"
        t0 = time.perf_counter()
        try:
            r = step_config(model, bsz, agg, train)
        except Exception as e:  # noqa: BLE001
            r = {"error": str(e)[:200]}
        r["compile_s"] = round(time.perf_counter() - t0, 1)
        results[tag] = r
        print(tag, json.dumps(r))

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "benchmarks", "cliff_diagnosis.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
