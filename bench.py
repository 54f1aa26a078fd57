"""Benchmark: flagship training throughput on the local accelerator.

Measures the fully-fused HybridModelv2 training step (EGNN x6 + node
attention + VAE + fusion attention + weighted loss + backward + Adam) at
reference-realistic shapes: batch 128 (train_Cancer_wFT.py:21), 288 padded
nodes (283-node pMHC graphs rounded to tiling, SURVEY.md section 3.3),
2560 padded directed edges (~9 average degree contact graphs), full
283*21-style one-hot sequences.

Methodology (round 2, VERDICT #1): fixed windows of WINDOW_STEPS steps,
REPEATS windows; the HEADLINE value is the MEDIAN window rate (not
best-of). Each window ends with a VALUE FETCH of the final loss, not
``block_until_ready``: through this environment's remote-dispatch tunnel
``block_until_ready`` is sometimes a no-op (measured: a "blocked" window
at 1.2 ms/step followed by a 105 s drain on the first value fetch), so
fetching the scalar is the only honest execution barrier. Windows are long
(100 steps) to amortize the ~30 ms fetch roundtrip. p50/p95 step times,
the analytic model FLOPs (utils/flops.py — segment-sum math, not the
one-hot implementation), XLA's as-compiled FLOPs, and MFU against the
chip's bf16 peak are reported alongside in the same JSON line.
NOTE: the tunnel TPU is pool-shared; observed honest step times at these
shapes ranged 3.5-160 ms across hours (pool load), and an in-jit scan of
pure 2048^3 bf16 matmuls measured 4.9-6.7 TF/s during congestion (peak
197) — device-side time-sharing, not dispatch overhead. Every bench run
therefore self-calibrates: a known-FLOPs matmul scan estimates the pool
share available to this run (``pool_share_est``), reported alongside the
raw numbers plus contention-corrected equivalents (clearly labeled).
benchmarks/RESULTS.md records the cross-run distribution.

Prints ONE JSON line:
  {"metric": "train_samples_per_sec_per_chip", "value": N,
   "unit": "pMHC/s", "vs_baseline": N, ...accounting keys...}

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}). The denominator is a documented estimate
of the reference stack's single-GPU training throughput at the same shapes
(DGL EGNNConv x6 + torch, batch 128): ~2000 pMHC/s. The BASELINE.json
north star asks for >= 10x, i.e. vs_baseline >= 10.

Since round 3 the point estimate is anchored by a measured interval
(scripts/bench_torch_baseline.py, results in benchmarks/torch_baseline.json):
a MEASURED torch-CPU step of the re-derived reference model (the
reference's own CPU fallback — an absolute floor) and a computed A100
f32-FLOPs + DGL-edge-intermediate HBM roofline with zero overheads (an
absolute ceiling, ~8.1k pMHC/s). The 2000/s point sits inside; the JSON
reports vs_baseline against the point AND the guaranteed lower bound
against the ceiling (vs_baseline_vs_roofline_ceiling).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

ASSUMED_REFERENCE_SAMPLES_PER_SEC = 2000.0  # point est; see baseline_interval


def baseline_interval(samples_per_sec: float) -> dict:
    """Anchor keys from benchmarks/torch_baseline.json (see module
    docstring). Absent file -> derivation keys only."""
    import os

    path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                        "benchmarks", "torch_baseline.json")
    out = {"baseline_point_est": ASSUMED_REFERENCE_SAMPLES_PER_SEC}
    try:
        with open(path) as f:
            anchor = json.load(f)
    except OSError:
        return out
    out["baseline_bound_low_cpu_measured"] = anchor["reference_bound_low"]
    out["baseline_bound_high_a100_roofline"] = anchor["reference_bound_high"]
    out["vs_baseline_vs_roofline_ceiling"] = round(
        samples_per_sec / anchor["reference_bound_high"], 3)
    out["baseline_derivation"] = anchor["derivation"]
    return out

BATCH = 128
NODES = 288
EDGES = 2560
SEQ_LEN = 284  # ~283-token chains

# Secondary shape: corpora produced by THIS repo's featurizer on the real
# cedar chains pad to ~1280-1408 directed edges (~4.4 avg degree at CA
# granularity; scripts/realdata_e2e.py). The headline stays at the
# conservative round-1 assumption above; the realistic-shape rate is
# reported alongside, clearly labeled.
EDGES_REALISTIC = 1408


def build_inputs(edges: int = EDGES):
    from immunostruct_tpu.data.synthetic import random_sample_batch

    return random_sample_batch(BATCH, NODES, edges, SEQ_LEN, seed=0)


_SHARE_PROBES = {}


def _share_probe(m: int, iters: int):
    """Jitted m^3-matmul scan of a given length, cached so repeated share
    measurements reuse one compiled program per length."""
    import jax
    import jax.numpy as jnp

    key = (m, iters)
    if key not in _SHARE_PROBES:

        @jax.jit
        def scan_mm(a):
            def body(c, _):
                c = c @ c
                return c / (jnp.max(jnp.abs(c)) + 1e-6), None

            c, _ = jax.lax.scan(body, a, None, length=iters)
            # scalar output: the honest barrier must not pay an O(m^2)
            # device-to-host transfer that would bias the timing
            return jnp.sum(c)

        _SHARE_PROBES[key] = scan_mm
    return _SHARE_PROBES[key]


def measure_pool_share(peak: float, m: int = 2048,
                       iters_short: int = 64, iters_long: int = 576) -> float:
    """Estimated fraction of the chip available to this process.

    Times in-jit lax.scan matmul chains of two lengths and uses the
    DIFFERENCE t(long) - t(short): the constant per-call costs (dispatch,
    tunnel roundtrip, scalar fetch) cancel, leaving pure device compute for
    (iters_long - iters_short) iterations. ~1.0 on an uncontended chip.
    Single-length timing would floor the estimate at
    compute/(compute + ~30ms roundtrip) regardless of actual load."""
    import statistics

    a0 = _probe_input(m)
    short, long_ = _share_probe(m, iters_short), _share_probe(m, iters_long)
    float(short(a0))  # compile + warm
    float(long_(a0))
    deltas = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(short(a0))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long_(a0))
        t_long = time.perf_counter() - t0
        deltas.append(max(t_long - t_short, 1e-9))
    dt = statistics.median(deltas)
    measured = 2 * m ** 3 * (iters_long - iters_short) / dt
    return min(measured / peak, 1.0)


def _probe_input(m: int):
    import jax.numpy as jnp

    return jnp.asarray(
        (np.random.default_rng(0).standard_normal((m, m)) / m), jnp.bfloat16)


def main():
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.flops import (
        train_step_flops, param_count, peak_flops,
    )
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    batch = build_inputs()
    vae_dim = SEQ_LEN * 21
    spec, params = build_model("HybridModelv2", vae_dim, jax.random.key(0))
    loss_cfg = LossConfig(vae_dim, pos_weight=1.0, sequence=True)
    optimizer = make_optimizer("adam", constant_lr(1e-3))

    device = jax.devices()[0]
    platform = device.platform
    compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32

    # the tunnel chip is pool-shared: calibrate the available share and wait
    # (bounded) for a quieter window before measuring, so the recorded
    # numbers reflect the chip more than the neighbors
    peak_cal = peak_flops(device, "bfloat16") if platform == "tpu" else None
    share = None
    if peak_cal:
        for attempt in range(8):
            share = measure_pool_share(peak_cal)
            if share >= 0.5:
                break
            print(f"# pool_share={share:.4f} (attempt {attempt + 1}/8), "
                  "waiting for a quieter window...", flush=True)
            time.sleep(60)
    trainer = Trainer(spec, loss_cfg, binary=True, optimizer=optimizer,
                      aggregation="auto", compute_dtype=compute_dtype,
                      donate=True)
    state = trainer.init_state(params)
    n_params = param_count(state.params)
    key = jax.random.key(1)

    # warmup/compile (+2 extra steps to flush first-dispatch effects);
    # float() is the honest barrier (see module docstring)
    for _ in range(3):
        state, loss = trainer._train_step(state, batch, key)
    float(loss)

    # as-compiled cost analysis from the SAME executable (no extra compile)
    from immunostruct_tpu.utils.flops import xla_cost
    cost = xla_cost(trainer._train_step, state, batch, key)
    xla_flops = float(cost.get("flops", 0.0)) or None
    xla_bytes = float(cost.get("bytes accessed", 0.0)) or None

    window_steps = 100 if platform == "tpu" else 3
    repeats = 5 if platform == "tpu" else 2
    window_dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(window_steps):
            state, loss = trainer._train_step(state, batch, key)
        float(loss)  # value fetch: the only reliable execution barrier here
        window_dts.append(time.perf_counter() - t0)

    step_ms = sorted(dt / window_steps * 1e3 for dt in window_dts)
    p50 = statistics.median(step_ms)
    p95 = step_ms[min(len(step_ms) - 1, int(round(0.95 * (len(step_ms) - 1))))]
    best = step_ms[0]
    samples_per_sec = BATCH / (p50 / 1e3)

    model_flops = train_step_flops(spec, BATCH, NODES, EDGES, vae_dim,
                                   n_params=n_params)
    peak = peak_flops(device, "bfloat16" if platform == "tpu" else "float32")
    achieved = model_flops / (p50 / 1e3)

    # re-calibrate after the PRIMARY window (before the secondary-shape run, whose recompile would sample contention at an unrelated time); correct by the mean of both
    if peak_cal:
        share_after = measure_pool_share(peak_cal)
        share = (share + share_after) / 2.0

    # production-recipe step (VERDICT r3 item 5): the flagship cancer
    # finetune trains HybridModelv2_Comparative with the contrastive term
    # (train_Cancer_wFT.py:145-173) — twin forwards over cancer/WT pairs.
    # Driver-visible so README's recipe throughput claim is harness-checked.
    comparative_pps = None
    comparative_ms = None
    if platform == "tpu":
        from immunostruct_tpu.structs import ComparativeBatch
        spec_c, params_c = build_model("HybridModelv2_Comparative", vae_dim,
                                       jax.random.key(0))
        trainer_c = Trainer(spec_c, loss_cfg, binary=True,
                            optimizer=make_optimizer("adam", constant_lr(1e-3)),
                            aggregation="auto", compute_dtype=compute_dtype,
                            coeff_contrastive=0.1, donate=True)
        state_c = trainer_c.init_state(params_c)
        cbatch = ComparativeBatch(cancer=batch, wt=build_inputs())
        for _ in range(3):
            state_c, loss_c = trainer_c._train_step(state_c, cbatch, key)
        float(loss_c)
        cdts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(40):
                state_c, loss_c = trainer_c._train_step(state_c, cbatch, key)
            float(loss_c)
            cdts.append(time.perf_counter() - t0)
        comparative_ms = statistics.median(cdts) / 40 * 1e3
        comparative_pps = BATCH / (comparative_ms / 1e3)
        del state_c, trainer_c

    # secondary: the same step at realistic corpus edge counts (shorter
    # window; labeled clearly in the output)
    realistic_sps = None
    realistic_ms = None
    if platform == "tpu":
        batch_r = build_inputs(EDGES_REALISTIC)
        # the primary windows DONATED the original state (and with it the
        # param buffers); rebuild fresh params for the secondary run
        _, params_r = build_model("HybridModelv2", vae_dim, jax.random.key(0))
        state_r = trainer.init_state(params_r)
        for _ in range(3):
            state_r, loss_r = trainer._train_step(state_r, batch_r, key)
        float(loss_r)
        # median of 3 windows, same protocol as the primary metric: a
        # single window on the pool-shared tunnel chip can land in a
        # contended moment and skew the reading by 30%+ (observed r5)
        rdts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(40):
                state_r, loss_r = trainer._train_step(state_r, batch_r, key)
            float(loss_r)
            rdts.append(time.perf_counter() - t0)
        realistic_ms = statistics.median(rdts) / 40 * 1e3
        realistic_sps = BATCH / (realistic_ms / 1e3)


    out = {
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "pMHC/s",
        "vs_baseline": round(samples_per_sec / ASSUMED_REFERENCE_SAMPLES_PER_SEC, 3),
        "ms_per_step_p50": round(p50, 3),
        "ms_per_step_p95": round(p95, 3),
        "ms_per_step_best": round(best, 3),
        "windows": repeats,
        "window_steps": window_steps,
        "batch": BATCH,
        "model_tflops_per_step": round(model_flops / 1e12, 4),
        "model_tflops_per_sec": round(achieved / 1e12, 2),
        "mfu_pct": round(100.0 * achieved / peak, 2) if peak else None,
        "xla_tflops_per_step": (round(xla_flops / 1e12, 4)
                                if xla_flops is not None else None),
        "xla_gb_accessed_per_step": (round(xla_bytes / 1e9, 3)
                                     if xla_bytes is not None else None),
        # pool-shared tunnel chip: estimated fraction of the chip this run
        # actually got (in-jit matmul-scan calibration), and what the raw
        # numbers extrapolate to on an uncontended chip. Clearly labeled
        # estimates, NOT measurements.
        "pool_share_est": round(share, 4) if share is not None else None,
        "samples_per_sec_uncontended_est": (
            round(samples_per_sec / share, 1) if share else None),
        "mfu_pct_uncontended_est": (
            round(100.0 * achieved / (peak * share), 2)
            if (peak and share) else None),
        # secondary, clearly-labeled shape: edge pad this repo's featurizer
        # produces on the real cedar chains (E=1408 vs the conservative
        # headline E=2560)
        "samples_per_sec_realistic_edges": (
            round(realistic_sps, 1) if realistic_sps else None),
        "ms_per_step_realistic_edges": (
            round(realistic_ms, 3) if realistic_ms else None),
        "realistic_edges": EDGES_REALISTIC if realistic_sps else None,
        "vs_baseline_realistic_edges": (
            round(realistic_sps / ASSUMED_REFERENCE_SAMPLES_PER_SEC, 3)
            if realistic_sps else None),
        # the flagship recipe's own step (comparative twin + contrastive,
        # B=128 cancer/WT pairs at the conservative shape)
        "pairs_per_sec_comparative": (
            round(comparative_pps, 1) if comparative_pps else None),
        "ms_per_step_comparative": (
            round(comparative_ms, 3) if comparative_ms else None),
        "n_params": n_params,
        "device": getattr(device, "device_kind", platform),
    }
    out.update(baseline_interval(samples_per_sec))
    print(json.dumps(out))


def _device_reachable(timeout_s: int = 300) -> bool:
    """Probe the backend in a SUBPROCESS with a hard timeout: the tunnel's
    TPU pool has measured multi-hour outages (round 3) during which any
    device call blocks forever in-process, so the probe must be killable."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices()[0]"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    if not _device_reachable():
        print(json.dumps({
            "metric": "train_samples_per_sec_per_chip", "value": 0,
            "unit": "pMHC/s", "vs_baseline": 0,
            "error": "accelerator backend unreachable (TPU pool outage); "
                     "see benchmarks/RESULTS.md for the last good run",
        }))
        sys.exit(1)
    main()
