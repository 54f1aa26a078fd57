"""Race aggregation='mega' against 'fused' (and optionally others) on the
live chip, under the honest-measurement protocol (benchmarks/RESULTS.md):

- the process is WARMED on a throwaway program first (the first jitted
  program of a process runs ~8x slow for ~a minute through this tunnel);
- each variant is burned in ~30 steps before any timing;
- variants run in INTERLEAVED windows repeated several times, so pool-share
  drift affects all variants equally;
- every window ends with a VALUE FETCH (float(loss)), the only reliable
  execution barrier here.

Usage: python scripts/race_mega.py [--variants mega,fused] [--edges 2560]
       [--windows 4] [--steps 60] [--smoke]
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


def make_trainer(aggregation, vae_dim):
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    spec, params = build_model("HybridModelv2", vae_dim, jax.random.key(0))
    trainer = Trainer(spec, LossConfig(vae_dim, 1.0, sequence=True),
                      binary=True,
                      optimizer=make_optimizer("adam", constant_lr(1e-3)),
                      aggregation=aggregation,
                      compute_dtype=jnp.dtype("bfloat16"), donate=True)
    return trainer, trainer.init_state(params)


def warm_process():
    """Throwaway program soaking up the first-program slowdown."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def burn(x):
        def body(c, _):
            return jnp.tanh(c @ c), None
        out, _ = jax.lax.scan(body, x, None, length=8)
        return out

    x = jnp.ones((1024, 1024), jnp.bfloat16)
    for _ in range(40):
        x = burn(x)
    float(jnp.sum(x.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="mega,fused")
    ap.add_argument("--edges", type=int, default=2560)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--burnin", type=int, default=30)
    ap.add_argument("--smoke", action="store_true",
                    help="compile + one step per variant, no timing")
    args = ap.parse_args()

    import jax
    variants = args.variants.split(",")
    vae_dim = 284 * 21
    batch = build_batch(args.batch, 288, args.edges, 284)
    key = jax.random.key(1)

    print(f"platform={jax.devices()[0].platform} "
          f"edges={args.edges}", file=sys.stderr)
    warm_process()
    print("process warmed", file=sys.stderr)

    runs = {}
    for v in variants:
        t0 = time.perf_counter()
        trainer, state = make_trainer(v, vae_dim)
        state, loss = trainer._train_step(state, batch, key)
        l0 = float(loss)
        print(f"{v}: compiled+first step in "
              f"{time.perf_counter() - t0:.1f}s loss={l0:.4f}",
              file=sys.stderr)
        runs[v] = {"trainer": trainer, "state": state, "loss0": l0,
                   "windows_ms": []}

    if args.smoke:
        print(json.dumps({v: {"loss0": r["loss0"]} for v, r in runs.items()}))
        return

    for v, r in runs.items():
        for _ in range(args.burnin):
            r["state"], loss = r["trainer"]._train_step(r["state"], batch, key)
        float(loss)

    for w in range(args.windows):
        for v, r in runs.items():
            t0 = time.perf_counter()
            for _ in range(args.steps):
                r["state"], loss = r["trainer"]._train_step(
                    r["state"], batch, key)
            float(loss)
            ms = (time.perf_counter() - t0) / args.steps * 1e3
            r["windows_ms"].append(round(ms, 3))
            print(f"window {w} {v}: {ms:.2f} ms/step", file=sys.stderr)

    out = {}
    for v, r in runs.items():
        ms = sorted(r["windows_ms"])
        p50 = ms[len(ms) // 2] if len(ms) % 2 else (
            (ms[len(ms) // 2 - 1] + ms[len(ms) // 2]) / 2)
        out[v] = {"windows_ms": r["windows_ms"], "p50_ms": round(p50, 3),
                  "best_ms": ms[0],
                  "samples_per_sec_p50": round(args.batch / (p50 / 1e3), 1),
                  "final_loss": float(
                      np.asarray(r["loss0"], dtype=np.float64))}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
