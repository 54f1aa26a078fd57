"""Profile the flagship train step: device-time per source line.

    python -m immunostruct_tpu.cli.profile_step [--model HybridModelv2]
        [--batch 128] [--nodes 288] [--edges 2560] [--aggregation auto]
        [--steps 10] [--logdir /tmp/immuno_profile]

Prints a table of ms/step attributed to the Python source lines whose
dots landed in each XLA fusion, plus bucketed categories for copies /
Pallas kernels / everything else. This is the tool that drove the round-3
kernel work (benchmarks/RESULTS.md).

No reference equivalent — the reference has no profiling (SURVEY.md
section 5); this is TPU-native observability built on jax.profiler +
optimized-HLO metadata (utils/attribution.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="HybridModelv2")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nodes", type=int, default=288)
    ap.add_argument("--edges", type=int, default=2560)
    ap.add_argument("--seq-len", type=int, default=284)
    ap.add_argument("--aggregation", default="auto")
    ap.add_argument("--compute-dtype", default=None,
                    help="default: bfloat16 on TPU, float32 elsewhere")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/immuno_profile")
    ap.add_argument("--comparative", action="store_true",
                    help="profile the flagship stage-3 twin step (cancer/WT "
                         "ComparativeBatch through forward_comparative; "
                         "appends _Comparative to --model if needed)")
    ap.add_argument("--coeff-contrastive", default=0.0, type=float,
                    help="include the paired contrastive term in the "
                         "profiled comparative step")
    ap.add_argument("--inference", action="store_true",
                    help="profile the deterministic forward (serving path: "
                         "model_apply + sigmoid) instead of the train step — "
                         "e.g. --inference --batch 1 attributes the "
                         "single-sample serving latency floor")
    ap.add_argument("--occupancy", action="store_true",
                    help="also print device-idle analysis: busy vs span per "
                         "step and the largest inter-op bubbles (the "
                         "overlap-gap evidence, benchmarks/RESULTS.md)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.attribution import profile_fn
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    from immunostruct_tpu.data.synthetic import (
        random_comparative_batch, random_sample_batch,
    )

    b, n, e = args.batch, args.nodes, args.edges
    comparative = args.comparative or "Comparative" in args.model
    if args.inference and comparative:
        ap.error("--inference profiles the single deterministic forward; "
                 "it cannot be combined with --comparative or a "
                 "*_Comparative model")
    if comparative and "Comparative" not in args.model:
        args.model += "_Comparative"
    batch = (random_comparative_batch(b, n, e, args.seq_len, seed=0)
             if comparative else
             random_sample_batch(b, n, e, args.seq_len, seed=0))

    platform = jax.devices()[0].platform
    dtype = jnp.dtype(args.compute_dtype) if args.compute_dtype else (
        jnp.bfloat16 if platform == "tpu" else jnp.float32)
    vae_dim = args.seq_len * 21
    spec, params = build_model(args.model, vae_dim, jax.random.key(0))
    key = jax.random.key(1)

    if args.inference:
        # no Trainer/optimizer here: the serving path carries no Adam
        # moments, and allocating them would double the device footprint
        # of a latency-attribution run for nothing
        from immunostruct_tpu.models.trunk import model_apply

        # carry = (prev_probs, params): profile_fn's thread_state feeds
        # out[0] back as args[0], and chaining prev probs into props keeps
        # repeated dispatches data-dependent (same trick as bench_infer)
        def fwd(carry):
            prev, p = carry
            props = batch.props + 1e-12 * jnp.mean(prev)
            out = model_apply(p, spec, batch.graph, batch.seq_onehot,
                              props, key, deterministic=True,
                              aggregation=args.aggregation,
                              compute_dtype=dtype)
            probs = jax.nn.sigmoid(out.logits.reshape(-1))
            return (probs, p), probs

        stepj = jax.jit(fwd)
        rows = profile_fn(stepj, ((jnp.zeros((b,)), params),),
                          args.logdir, steps=args.steps, warmup=args.warmup,
                          thread_state=True)
    else:
        trainer = Trainer(
            spec, LossConfig(vae_dim, pos_weight=1.0, sequence=True),
            binary=True,
            optimizer=make_optimizer("adam", constant_lr(1e-3)),
            coeff_contrastive=args.coeff_contrastive,
            aggregation=args.aggregation, compute_dtype=dtype,
            donate=False)
        state = trainer.init_state(params)
        stepj = jax.jit(lambda s: trainer._train_step(s, batch, key))
        rows = profile_fn(stepj, (state,), args.logdir,
                          steps=args.steps, warmup=args.warmup,
                          thread_state=True)
    total = sum(ms for ms, _ in rows)
    print(f"# model={args.model} aggregation={args.aggregation} "
          f"platform={platform} B={b} N={n} E={e} "
          f"mode={'inference' if args.inference else 'train'} "
          f"device_total={total:.2f} ms/step")
    for ms, label in rows[:args.top]:
        print(f"{ms:9.3f} ms/step  {label}")

    if args.occupancy:
        # serialization analysis of the same trace (VERDICT r3 item 2:
        # how much of the step is device-idle bubbles between ops?)
        import os

        from immunostruct_tpu.utils.attribution import (
            load_trace_timeline, occupancy,
        )
        tl = load_trace_timeline(os.path.join(args.logdir,
                                              "_attribution_run"))
        occ = occupancy(tl, args.steps)
        print(f"# occupancy: span={occ['span_ms']:.2f} ms/step "
              f"busy={occ['busy_ms']:.2f} idle={occ['idle_ms']:.2f} "
              f"({occ['idle_frac']:.1%} idle)")
        for gap_ms, after, before in occ["gaps"]:
            print(f"  gap {gap_ms:7.3f} ms  after {after}  ->  {before}")


if __name__ == "__main__":
    main()
