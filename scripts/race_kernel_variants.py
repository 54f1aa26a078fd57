"""Race mega-kernel micro-variants (ops/pallas_mega.py module flags) in
ONE process under the honest-measurement protocol (warm process, burn-in,
interleaved windows, value-fetch barriers). Each variant sets the flags
BEFORE building its Trainer, so its jitted step traces the corresponding
kernel; 'fused' runs as the cross-session control.

Usage: python scripts/race_kernel_variants.py [--edges 2560]
       [--variants base,diff16,cast,stacked,fused] [--windows 3] [--steps 50]

Variant names (see VARIANTS + set_flags): base / diff16 / cast / stacked
(mega one-hot + backward-einsum micro-forms), inkernel (v7 whole-backward
kernel), dboth (v7a aggregation-transpose-in-kernel), stack (whole-stack
kernel, ops/experimental/pallas_stack.py), split / concat (node-MLP first-matmul
formulations), inner2 / inner4 (v8 sub-tiled forward: VPU one-hot builds
overlap MXU dots across unrolled sub-tiles), tinner2 / tinner4 (v8b:
same sub-tiling for the backward tail kernel), combo22 / combo44 (both
kernels sub-tiled), skipprobe (TIMING ONLY,
wrong numerics: one-hot builds replaced by a constant), paired (v9
mirror-paired edge layout: half the one-hot builds + one xd dot/geometry
for both directions — needs --paired-batch), fused (the pallas_edge
control).
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

# flag sets per variant name:
# (ONEHOT_DIRECT_CAST, DIFF_BF16, BWD_STACKED, BWD_INKERNEL_NODES)
VARIANTS = {
    "base": (False, False, False, False),
    "diff16": (False, True, False, False),
    "cast": (True, True, False, False),
    "stacked": (False, True, True, False),
    "inkernel": (False, True, False, True),
    "dboth": (False, True, False, False),
    "split": (False, True, False, False),
    "concat": (False, True, False, False),
}


def _subtile_factors(v: str) -> tuple[int, int]:
    """(MEGA_INNER, MEGA_TAIL_INNER) for 'innerN' / 'tinnerN' / 'comboNM'
    / 'comboNxM' variant names; (1, 1) for everything else. Any factor
    whose sub-tile is not a 128-multiple falls back to 1 inside the
    kernel (e.g. inner2 at E=1408: 704 is not a 128-multiple — the only
    valid factor there is 11)."""
    import re
    if m := re.fullmatch(r"inner(\d+)", v):
        return int(m.group(1)), 1
    if m := re.fullmatch(r"tinner(\d+)", v):
        return 1, int(m.group(1))
    if m := re.fullmatch(r"combo(\d+)x(\d+)", v):
        return int(m.group(1)), int(m.group(2))
    if m := re.fullmatch(r"combo(\d)(\d)", v):
        return int(m.group(1)), int(m.group(2))
    return 1, 1


def set_flags(pm, v):
    """Reset EVERY raceable flag to the production default, then apply the
    variant's deviation — called for every variant including 'fused', so
    no variant inherits another's globals (order-independence)."""
    from immunostruct_tpu.ops import egnn as _eg
    from immunostruct_tpu.ops.experimental import pallas_stack as pstk
    (pm.ONEHOT_DIRECT_CAST, pm.DIFF_BF16, pm.BWD_STACKED,
     pm.BWD_INKERNEL_NODES) = VARIANTS.get(v, VARIANTS["diff16"])
    pm.ONEHOT_SKIP_PROBE = v == "skipprobe"
    pm.MEGA_INNER, pm.MEGA_TAIL_INNER = _subtile_factors(v)
    pm.BWD_DBOTH_INKERNEL = v == "dboth"
    # 'paired' needs the mirror-paired batch: pass --paired-batch so ALL
    # variants consume the same (valid) layout and stay comparable
    pm.MEGA_PAIRED = v == "paired"
    pstk.STACK_ENABLE = v == "stack"
    # production default is the concat node MLP (egnn.NODE_SPLIT_DOT doc)
    _eg.NODE_SPLIT_DOT = v == "split"
    # 'stack' = whole-stack kernel (ops/experimental/pallas_stack.py); every other
    # mega variant forces the per-layer kernel
    pstk.STACK_ENABLE = v == "stack"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2560)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--burnin", type=int, default=25)
    ap.add_argument("--variants", default="base,diff16,cast,stacked,fused")
    ap.add_argument("--paired-batch", action="store_true",
                    help="lay the synthetic edges out mirror-paired "
                         "(required for the 'paired' variant; valid for "
                         "all variants)")
    args = ap.parse_args()

    import jax
    from immunostruct_tpu.ops import pallas_mega as pm

    vae_dim = 284 * 21
    batch = build_batch(args.batch, 288, args.edges, 284,
                        paired=args.paired_batch)
    if "paired" in args.variants.split(",") and not args.paired_batch:
        sys.exit("the 'paired' variant requires --paired-batch "
                 "(MEGA_PAIRED assumes the mirror-pair data invariant)")
    key = jax.random.key(1)

    print(f"platform={jax.devices()[0].platform} edges={args.edges}",
          file=sys.stderr)
    warm_process()
    print("process warmed", file=sys.stderr)

    runs = {}
    for v in args.variants.split(","):
        agg = "fused" if v == "fused" else "mega"
        set_flags(pm, v)
        t0 = time.perf_counter()
        try:
            trainer, state = make_trainer(agg, vae_dim)
            state, loss = trainer._train_step(state, batch, key)
            l0 = float(loss)
        except Exception as exc:  # noqa: BLE001 - variant may not compile
            print(f"{v}: FAILED to compile/run: {exc}", file=sys.stderr)
            continue
        print(f"{v}: compiled+first step in {time.perf_counter() - t0:.1f}s "
              f"loss={l0:.4f}", file=sys.stderr)
        runs[v] = {"trainer": trainer, "state": state, "loss0": l0,
                   "windows_ms": []}

    for v, r in runs.items():
        loss = None
        for _ in range(args.burnin):
            r["state"], loss = r["trainer"]._train_step(r["state"], batch, key)
        if loss is not None:
            float(loss)  # value-fetch barrier ending the burn-in

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
        ws = sorted(r["windows_ms"])
        out[v] = {"windows_ms": r["windows_ms"],
                  "p50_ms": ws[len(ws) // 2], "best_ms": ws[0],
                  "loss0": round(r["loss0"], 6)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
