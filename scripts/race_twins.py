"""Race stack_twins=True vs False on the comparative+contrastive step —
the flagship stage-3 configuration (train_Cancer_wFT.py:145-173 recipe),
measured under the same interleaved-window protocol as race_mega.py.

Usage: python scripts/race_twins.py [--edges 2560] [--windows 3] [--steps 50]
       [--aggregation auto]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from scripts.perf_sweep import build_batch  # noqa: E402
from scripts.race_mega import warm_process  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2560)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--burnin", type=int, default=25)
    ap.add_argument("--aggregation", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.structs import ComparativeBatch
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    b = build_batch(args.batch, 288, args.edges, 284)
    cbatch = ComparativeBatch(cancer=b, wt=b)
    vae_dim = 284 * 21
    key = jax.random.key(1)

    print(f"platform={jax.devices()[0].platform} edges={args.edges} "
          f"agg={args.aggregation}", file=sys.stderr)
    warm_process()

    runs = {}
    for name, stacked in (("stacked", True), ("twin", False)):
        spec, params = build_model("HybridModelv2_Comparative", vae_dim,
                                   jax.random.key(0))
        trainer = Trainer(spec, LossConfig(vae_dim, 1.0, sequence=True),
                          binary=True,
                          optimizer=make_optimizer("adam", constant_lr(1e-3)),
                          aggregation=args.aggregation,
                          compute_dtype=jnp.dtype("bfloat16"),
                          coeff_contrastive=0.1, donate=True,
                          stack_twins=stacked)
        t0 = time.perf_counter()
        state = trainer.init_state(params)
        state, loss = trainer._train_step(state, cbatch, key)
        print(f"{name}: compiled+first step {time.perf_counter() - t0:.1f}s "
              f"loss={float(loss):.4f}", file=sys.stderr)
        runs[name] = {"trainer": trainer, "state": state, "windows_ms": []}

    for name, r in runs.items():
        for _ in range(args.burnin):
            r["state"], loss = r["trainer"]._train_step(r["state"], cbatch, key)
        float(loss)

    for w in range(args.windows):
        for name, r in runs.items():
            t0 = time.perf_counter()
            for _ in range(args.steps):
                r["state"], loss = r["trainer"]._train_step(
                    r["state"], cbatch, key)
            float(loss)
            ms = (time.perf_counter() - t0) / args.steps * 1e3
            r["windows_ms"].append(round(ms, 3))
            print(f"window {w} {name}: {ms:.2f} ms/step", file=sys.stderr)

    out = {}
    for name, r in runs.items():
        ms = sorted(r["windows_ms"])
        p50 = ms[len(ms) // 2] if len(ms) % 2 else (
            (ms[len(ms) // 2 - 1] + ms[len(ms) // 2]) / 2)
        out[name] = {"windows_ms": r["windows_ms"], "p50_ms": round(p50, 3),
                     "samples_per_sec_p50": round(args.batch / (p50 / 1e3), 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
