"""Batch-size scaling of the flagship train step at both bench edge shapes.

Motivation (round 3): at the realistic featurizer edge pad E=1408 the
~1.5 ms batch-independent tail (node MLP / attention / VAE / Adam /
weight packing) is ~20% of the 7.5 ms step, so growing the per-chip
batch amortizes it and raises samples/sec — the per-sample curve that
was flat at the conservative E=2560 shape is NOT flat at E=1408. This
script measures it under the honest protocol (warm process, burn-in,
interleaved windows, value-fetch barriers; benchmarks/RESULTS.md
"measurement methodology").

Usage: python scripts/batch_scaling.py [--batches 128,256,512]
       [--edges 2560,1408] [--windows 3] [--steps 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

from scripts.perf_sweep import build_batch  # noqa: E402
from scripts.race_mega import make_trainer, warm_process  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--edges", default="2560,1408")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--burnin", type=int, default=20)
    args = ap.parse_args()

    import jax

    vae_dim = 284 * 21
    key = jax.random.key(1)
    print(f"platform={jax.devices()[0].platform}", file=sys.stderr)
    warm_process()
    print("process warmed", file=sys.stderr)

    runs = {}
    for e in [int(x) for x in args.edges.split(",")]:
        for b in [int(x) for x in args.batches.split(",")]:
            name = f"B{b}_E{e}"
            batch = build_batch(b, 288, e, 284)
            t0 = time.perf_counter()
            try:
                trainer, state = make_trainer("auto", vae_dim)
                state, loss = trainer._train_step(state, batch, key)
                l0 = float(loss)
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: FAILED: {exc}", file=sys.stderr)
                continue
            print(f"{name}: compiled+first step in "
                  f"{time.perf_counter() - t0:.1f}s loss={l0:.4f}",
                  file=sys.stderr)
            runs[name] = {"trainer": trainer, "state": state, "batch": batch,
                          "b": b, "windows_ms": []}

    for name, r in runs.items():
        loss = None
        for _ in range(args.burnin):
            r["state"], loss = r["trainer"]._train_step(
                r["state"], r["batch"], key)
        if loss is not None:
            float(loss)  # value-fetch barrier ending the burn-in

    for w in range(args.windows):
        for name, r in runs.items():
            t0 = time.perf_counter()
            for _ in range(args.steps):
                r["state"], loss = r["trainer"]._train_step(
                    r["state"], r["batch"], key)
            float(loss)
            ms = (time.perf_counter() - t0) / args.steps * 1e3
            r["windows_ms"].append(round(ms, 3))
            print(f"window {w} {name}: {ms:.2f} ms/step "
                  f"({r['b'] / ms * 1e3:.0f} samples/s)", file=sys.stderr)

    out = {}
    for name, r in runs.items():
        ws = sorted(r["windows_ms"])
        p50 = ws[len(ws) // 2]
        out[name] = {"windows_ms": r["windows_ms"], "p50_ms": p50,
                     "samples_per_sec_p50": round(r["b"] / p50 * 1e3, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
