"""End-to-end epoch throughput: host pipeline vs device-resident pipeline.

Trains HybridModelv2 over a synthetic corpus at near-reference shapes and
times full epochs (batch assembly + H2D + step) after a warmup epoch, for
both the numpy host pipeline (with prefetch) and the HBM-resident pipeline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np


def main(num_samples=2048, epochs=3, batch_size=128):
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.config import Config, enable_compilation_cache
    enable_compilation_cache()
    from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset, BatchPipeline
    from immunostruct_tpu.data.device_pipeline import DevicePipeline
    from immunostruct_tpu.data.pipeline import prefetch
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    platform = jax.devices()[0].platform
    root = "/tmp/immunostruct_pipe_bench"
    os.makedirs(root, exist_ok=True)
    cfg = Config(batch_size=batch_size, model="HybridModelv2",
                 full_sequence=True, sequence_loss=True,
                 compute_dtype="bfloat16" if platform == "tpu" else "float32",
                 aggregation="auto")
    # hla_len 250 + peptide ~10 gives ~260-node graphs, near the real 283
    gd, pp, hp = synthetic_corpus(root, num_samples=num_samples, seed=9,
                                  hla_len=250)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    n = len(ds)
    vae_dim = ds.seq_full.shape[1] * 21
    spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
    trainer = Trainer(spec, LossConfig(vae_dim, 1.0, sequence=True), binary=True,
                      optimizer=make_optimizer("adam", constant_lr(1e-3)),
                      aggregation=cfg.aggregation,
                      compute_dtype=jnp.dtype(cfg.compute_dtype), donate=False)
    key = jax.random.key(1)
    results = {"platform": platform, "corpus": n,
               "nodes": int(ds.graphs.max_nodes), "edges": int(ds.graphs.max_edges)}

    for label, make_pipe in (
        ("host", lambda: BatchPipeline(ds, np.arange(n), split="train", binary=True,
                                       full=True, config=cfg, pad_final_batch=True)),
        ("device", lambda: DevicePipeline(ds, np.arange(n), split="train", binary=True,
                                          full=True, config=cfg)),
    ):
        pipe = make_pipe()
        state = trainer.init_state(params)
        # warmup epoch (compiles)
        for batch in pipe.epoch(0):
            state, loss = trainer._train_step(state, batch, key)
        float(loss)  # value fetch barrier (RESULTS.md methodology)
        t0 = time.perf_counter()
        for e in range(1, epochs):
            src = prefetch(pipe.epoch(e)) if label == "host" else pipe.epoch(e)
            for batch in src:
                state, loss = trainer._train_step(state, batch, key)
        float(loss)
        dt = time.perf_counter() - t0
        sps = n * (epochs - 1) / dt
        results[f"{label}_samples_per_sec"] = round(sps, 1)
        print(f"{label}: {sps:.0f} samples/s end-to-end", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
