"""export_model CLI: checkpoint -> StableHLO artifact -> callable."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from immunostruct_tpu.models import build_model
from immunostruct_tpu.utils.checkpoint import save_checkpoint
from immunostruct_tpu.utils.export import load_exported
from immunostruct_tpu.cli.export_model import main
from immunostruct_tpu.structs import GraphBatch


def test_export_cli_roundtrip(tmp_path):
    b, n, e, l = 4, 16, 128, 12
    spec, params = build_model("HybridModel", l * 21, jax.random.key(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params)
    out = str(tmp_path / "m.stablehlo")

    main(["--model", "HybridModel", "--checkpoint", ckpt, "--output", out,
          "--batch-size", str(b), "--max-nodes", str(n), "--max-edges", str(e),
          "--seq-len", str(l), "--compute-dtype", "float32",
          "--aggregation", "scatter"])
    assert os.path.exists(out)

    loaded = load_exported(out)
    rng = np.random.default_rng(0)
    graph = GraphBatch(
        node_feat=jnp.zeros((b, n, 20), jnp.float32),
        coords=jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)),
        edge_src=jnp.zeros((b, e), jnp.int32),
        edge_dst=jnp.zeros((b, e), jnp.int32),
        edge_feat=jnp.ones((b, e, 1), jnp.float32),
        edge_mask=jnp.zeros((b, e), bool),
        node_mask=jnp.zeros((b, n), bool),
        num_nodes=jnp.zeros((b,), jnp.int32),
    )
    seq = jnp.asarray(rng.random((b, l, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((b, 2)).astype(np.float32))
    probs = np.asarray(loaded.call(graph, seq, props))
    assert probs.shape == (b,)
    assert ((probs >= 0) & (probs <= 1)).all()
