"""Legacy .pt graph conversion round-trip into the native loader."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from immunostruct_tpu.cli.convert_graphs import main
from immunostruct_tpu.data.graphs import load_graph_dir


def test_pt_roundtrip(tmp_path, rng):
    src = tmp_path / "pt"
    dst = tmp_path / "npz"
    src.mkdir()
    want = {}
    for i in range(3):
        x = torch.randn(6, 22)
        coords = torch.randn(6, 3)
        ei = torch.randint(0, 6, (2, 10))
        g = SimpleNamespace(name=f"tImmunoKEY{i}", x=x, coords=coords,
                            edge_index=ei)
        torch.save(g, src / f"g{i}.pt")
        want[f"KEY{i}"] = (x.numpy(), coords.numpy(), ei.numpy())

    main(["--src", str(src), "--dst", str(dst)])
    corpus = load_graph_dir(str(dst))
    assert sorted(corpus.keys) == ["KEY0", "KEY1", "KEY2"]
    for key, feats, coords, ei in zip(corpus.keys, corpus.node_onehot,
                                      corpus.coords, corpus.edge_index):
        wx, wc, wei = want[key]
        # loader cuts the trailing 2 h-bond columns
        np.testing.assert_allclose(feats, wx[:, :-2], rtol=1e-6)
        np.testing.assert_allclose(coords, wc, rtol=1e-6)
        np.testing.assert_array_equal(ei, wei)


def test_broken_pt_is_skipped(tmp_path):
    src = tmp_path / "pt"
    dst = tmp_path / "npz"
    src.mkdir()
    (src / "bad.pt").write_bytes(b"not a torch file")
    g = SimpleNamespace(name="okImmunoK", x=torch.randn(3, 22),
                        coords=torch.randn(3, 3),
                        edge_index=torch.randint(0, 3, (2, 4)))
    torch.save(g, src / "ok.pt")
    main(["--src", str(src), "--dst", str(dst)])
    assert sorted(os.listdir(dst)) == ["ok.npz"]
