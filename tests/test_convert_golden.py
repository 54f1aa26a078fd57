"""Converted-graph golden fixture: .pt -> convert_graphs -> stack -> forward.

Pins the FULL legacy-corpus ingestion chain against committed logits:
hand-built torch `.pt` graphs in the reference's on-disk layout
(SimpleNamespace with x [n, 22] incl. the 2 trailing h-bond columns,
coords, edge_index — what `immunostruct/data/utils.py` pickles) run
through `cli/convert_graphs`, the native loader, `GraphCorpus.stack`
padding, and a seeded StructureModel forward. Any drift in conversion,
h-bond column trimming, padding, or forward numerics moves these values.

Closes the last reachable step of reference-corpus parity while the
reference's actual graph blobs remain absent from its checkout
(ROADMAP #5): everything except the blobs themselves is pinned.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from immunostruct_tpu.cli.convert_graphs import main as convert_main
from immunostruct_tpu.data.graphs import load_graph_dir
from immunostruct_tpu.models import build_model
from immunostruct_tpu.models.trunk import model_apply
from immunostruct_tpu.structs import make_graph_batch

# produced by this chain on CPU f32 at commit time (same contract as
# tests/test_golden.py)
GOLDEN_LOGITS = [0.156805, 0.157136, 0.157511]


def _write_pt_corpus(src):
    rng = np.random.default_rng(777)
    names = []
    for i in range(3):
        n = 8 + 2 * i
        onehot = np.zeros((n, 20), np.float32)
        onehot[np.arange(n), rng.integers(0, 20, n)] = 1.0
        hbond = rng.random((n, 2)).astype(np.float32)  # must be DROPPED
        x = torch.tensor(np.concatenate([onehot, hbond], axis=1))
        coords = torch.tensor(rng.standard_normal((n, 3)).astype(np.float32))
        ei = torch.tensor(rng.integers(0, n, (2, 4 * n)))
        name = f"chain{i}ImmunoKEY{i}"
        g = SimpleNamespace(name=name, x=x, coords=coords, edge_index=ei)
        torch.save(g, src / f"g{i}.pt")
        names.append(name)
    return names


def test_converted_corpus_forward_golden(tmp_path):
    src = tmp_path / "pt"
    dst = tmp_path / "npz"
    src.mkdir()
    _write_pt_corpus(src)
    convert_main(["--src", str(src), "--dst", str(dst)])

    corpus = load_graph_dir(str(dst))
    assert sorted(corpus.keys) == ["KEY0", "KEY1", "KEY2"]
    assert corpus.node_onehot[0].shape[1] == 20  # h-bond columns trimmed

    graph = make_graph_batch(corpus.node_onehot, corpus.coords,
                             corpus.edge_index, max_nodes=16, max_edges=128)
    spec, params = build_model("StructureModel", 284 * 21,
                               jax.random.key(42))
    out = model_apply(params, spec, graph, None, None, jax.random.key(7),
                      deterministic=True, aggregation="scatter")
    got = np.asarray(out.logits, np.float64).reshape(-1)
    np.testing.assert_allclose(got, GOLDEN_LOGITS, rtol=2e-4, atol=2e-5)
