"""Export a trained checkpoint as a StableHLO serving artifact.

Usage:
  python -m immunostruct_tpu.cli.export_model --checkpoint ft.ckpt \
      --model HybridModelv2 --output model.stablehlo \
      --batch-size 128 --max-nodes 288 --max-edges 2560 --seq-len 284
"""

from __future__ import annotations


from immunostruct_tpu.cli.common import base_parser, to_config
from immunostruct_tpu.models import build_model
from immunostruct_tpu.utils.checkpoint import load_checkpoint
from immunostruct_tpu.utils.export import export_inference_fn, save_exported


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from immunostruct_tpu.structs import GraphBatch

    p = base_parser("Export inference function to StableHLO")
    p.add_argument("--checkpoint", required=True, type=str)
    p.add_argument("--output", required=True, type=str)
    p.add_argument("--use-wt-for-downstream", action="store_true")
    p.add_argument("--max-nodes", default=288, type=int)
    p.add_argument("--max-edges", default=2560, type=int)
    p.add_argument("--seq-len", default=284, type=int)
    p.add_argument("--int8", action="store_true",
                   help="weight-only int8 (per-out-channel symmetric) fake-"
                        "quantized weights baked into the artifact; see "
                        "utils/quantize.py for the accuracy methodology")
    args = p.parse_args(argv)
    config = to_config(args)

    b, n, e, l = config.batch_size, args.max_nodes, args.max_edges, args.seq_len
    graph = GraphBatch(
        node_feat=jnp.zeros((b, n, 20), jnp.float32),
        coords=jnp.zeros((b, n, 3), jnp.float32),
        edge_src=jnp.zeros((b, e), jnp.int32),
        edge_dst=jnp.zeros((b, e), jnp.int32),
        edge_feat=jnp.ones((b, e, 1), jnp.float32),
        edge_mask=jnp.zeros((b, e), bool),
        node_mask=jnp.zeros((b, n), bool),
        num_nodes=jnp.zeros((b,), jnp.int32),
    )
    seq = jnp.zeros((b, l, 21), jnp.float32)
    props = jnp.zeros((b, 2), jnp.float32)

    spec, params = build_model(config.model, l * 21, jax.random.key(config.seed),
                               use_wt_for_downstream=args.use_wt_for_downstream)
    params = load_checkpoint(args.checkpoint, params)
    if args.int8:
        from immunostruct_tpu.utils.quantize import fake_quant_int8
        params = fake_quant_int8(params)

    exported = export_inference_fn(
        spec, params, (graph, seq, props), aggregation=config.aggregation,
        compute_dtype=jnp.dtype(config.compute_dtype))
    save_exported(exported, args.output)
    print(f"exported {config.model} -> {args.output} "
          f"(batch={b}, nodes={n}, edges={e}, seq_len={l})")


if __name__ == "__main__":
    main()
