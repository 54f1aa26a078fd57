"""Benchmark all five BASELINE.json workload configs.

  1. sequence+property head (SequenceFpModel), batch 64      [CPU-runnable]
  2. structure-only GNN (StructureModel), padded graph batches
  3. full multimodal IEDB pretrain step (HybridModelv2)
  4. cancer comparative finetune step with contrastive
     (HybridModelv2_Comparative, twin forward)
  5. end-to-end clinical path: PDB->graph featurization rate +
     clinical scoring (inference) rate

Prints one JSON object with train/infer samples-per-second per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np


def timeit_median(f, steps, repeats):
    """Median window rate with value-fetch barriers (block_until_ready is
    not a reliable barrier through this dispatch path; see RESULTS.md)."""
    import statistics

    import jax
    import numpy as np

    def fetch(r):
        np.asarray(jax.device_get(jax.tree.leaves(r)[-1])).ravel()[:1]

    fetch(f())
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            r = f()
        fetch(r)
        dts.append(time.perf_counter() - t0)
    return steps / statistics.median(dts)


def main():
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.models.trunk import model_apply, model_apply_comparative
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.structs import ComparativeBatch
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr
    from scripts.perf_sweep import build_batch

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    steps = 20 if on_tpu else 2
    repeats = 3 if on_tpu else 1
    results = {"platform": platform}

    def train_rate(model, batch, batch_size, comparative=False, coeff=0.0,
                   sequence_loss=True):
        vae_dim = batch.seq_onehot.shape[1] * 21 if not comparative \
            else batch.cancer.seq_onehot.shape[1] * 21
        spec, params = build_model(model, vae_dim, jax.random.key(0))
        trainer = Trainer(spec, LossConfig(vae_dim, 1.0, sequence=sequence_loss),
                          binary=True,
                          optimizer=make_optimizer("adam", constant_lr(1e-3)),
                          aggregation="auto", compute_dtype=dtype,
                          coeff_contrastive=coeff, donate=False)
        state = trainer.init_state(params)
        key = jax.random.key(1)
        holder = {"state": state}

        def step():
            holder["state"], loss = trainer._train_step(holder["state"], batch, key)
            return loss

        return timeit_median(step, steps, repeats) * batch_size

    # config 1: sequence+property, batch 64 (CPU-runnable; no graphs consumed)
    b1 = build_batch(64, 16, 128, 284)
    results["1_seq_prop_train_sps"] = round(train_rate("SequenceFpModel", b1, 64), 1)

    # config 2: structure-only GNN at reference graph shapes
    b2 = build_batch(128, 288, 2560, 284)
    results["2_structure_train_sps"] = round(
        train_rate("StructureModel", b2, 128, sequence_loss=False), 1)

    # config 3: full multimodal IEDB pretrain step
    results["3_multimodal_train_sps"] = round(train_rate("HybridModelv2", b2, 128), 1)

    # config 4: comparative contrastive finetune (twin forward)
    cb = ComparativeBatch(cancer=b2, wt=b2)
    results["4_comparative_train_sps"] = round(
        train_rate("HybridModelv2_Comparative", cb, 128, comparative=True, coeff=0.1), 1)

    # config 5a: featurization rate (structures/s, native path)
    from immunostruct_tpu.featurize.native import native_available
    if native_available():
        import tempfile
        from scripts.bench_featurizer import write_pdb
        from immunostruct_tpu.featurize import featurize_directory
        rng = np.random.default_rng(0)
        src = tempfile.mkdtemp()
        for i in range(50):
            write_pdb(os.path.join(src, f"sImmuno{i}.pdb"), 460, rng)
        out = tempfile.mkdtemp()
        t0 = time.perf_counter()
        written = featurize_directory(src, out, workers=1, use_native=True)
        results["5a_featurize_structs_per_sec"] = round(len(written) / (time.perf_counter() - t0), 1)

    # config 5b: clinical scoring = plain inference forward
    spec, params = build_model("HybridModelv2_Comparative", 284 * 21,
                               jax.random.key(0), use_wt_for_downstream=True)

    @jax.jit
    def clinical_fwd(p, graph, seq, props, key):
        # clinical path scores with the plain forward + duplicated-embedding
        # hot fix (comparative_models.py:159-163)
        out = model_apply(p, spec, graph, seq, props, key, deterministic=True,
                          aggregation="auto", compute_dtype=dtype)
        return jax.nn.sigmoid(out.logits)

    key = jax.random.key(2)
    results["5b_clinical_infer_sps"] = round(timeit_median(
        lambda: clinical_fwd(params, b2.graph, b2.seq_onehot, b2.props, key),
        steps, repeats) * 128, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
