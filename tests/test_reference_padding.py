"""Reference-checkpoint padding geometry: exact-corpus-max padding is
REQUIRED to reproduce reference logits with imported torch checkpoints.

The reference pads graphs to the exact corpus max node count
(reference: immunostruct/data/preprocess.py:343-349), and two of its ops are
padding-count sensitive by design parity:
  - ``global_mean_pool`` divides by the padded node count
    (hybrid_models.py:97),
  - the node-attention softmax spans all padded rows
    (hybrid_models.py:326-327).
So an imported checkpoint evaluated at a rounded-up N (pad_nodes_multiple=8)
produces DIFFERENT logits than at the exact reference N. These tests pin
(a) that sensitivity, (b) exact-geometry forward parity against the
independent torch re-derivation with imported reference-layout weights, and
(c) the checkpoint-format sniffing + config override used by the CLIs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from immunostruct_tpu.models import model_map, build_model
from immunostruct_tpu.models.trunk import model_apply
from immunostruct_tpu.structs import make_graph_batch
from immunostruct_tpu.utils.torch_import import (
    import_torch_state_dict, is_torch_checkpoint, load_any_checkpoint,
    require_exact_reference_padding,
)
from tests.reference_impl import random_graph
from tests.test_torch_import import fake_state_dict

B, E, L = 4, 40, 12
N_EXACT = 13   # deliberately not a multiple of 8
N_ROUNDED = 16
VAE_DIM = L * 21


def _raw_graphs(rng):
    feats, coords, edges = [], [], []
    for _ in range(B):
        nodes = int(rng.integers(9, N_EXACT + 1))
        h, x, src, dst = random_graph(rng, nodes, E // 2)
        onehot = np.zeros((nodes, 20), np.float32)
        onehot[np.arange(nodes), rng.integers(0, 20, nodes)] = 1.0
        feats.append(onehot)
        coords.append(x)
        edges.append(np.stack([src, dst]))
    return feats, coords, edges


def _imported_params(rng):
    spec = model_map["HybridModelv2"]
    sd = fake_state_dict(spec, VAE_DIM, rng)
    return spec, import_torch_state_dict(sd, spec)


def test_padded_n_changes_logits(rng):
    """The same corpus stacked at exact N=13 vs rounded N=16 yields
    materially different logits under imported weights — the mismatch
    VERDICT round 1 flagged; this is why the CLIs force exact padding."""
    feats, coords, edges = _raw_graphs(rng)
    g_exact = make_graph_batch(feats, coords, edges, max_nodes=N_EXACT,
                               max_edges=E, nodes_multiple=1, edges_multiple=1)
    g_round = make_graph_batch(feats, coords, edges, max_nodes=N_EXACT,
                               max_edges=E, nodes_multiple=N_ROUNDED,
                               edges_multiple=1)
    assert g_exact.node_feat.shape[1] == N_EXACT
    assert g_round.node_feat.shape[1] == N_ROUNDED

    spec, params = _imported_params(rng)
    seq = jnp.asarray(rng.random((B, L, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    key = jax.random.key(3)
    out_exact = model_apply(params, spec, g_exact, seq, props, key,
                            deterministic=True, aggregation="scatter")
    out_round = model_apply(params, spec, g_round, seq, props, key,
                            deterministic=True, aggregation="scatter")
    # mean-pool divides by 13 vs 16 and the attention softmax sees 3 extra
    # rows: the logits must differ (if they ever agree, the padding-parity
    # semantics were silently changed)
    assert float(np.max(np.abs(np.asarray(out_exact.logits)
                               - np.asarray(out_round.logits)))) > 1e-4


def test_imported_forward_matches_torch_at_exact_padding(rng):
    """Golden parity: imported reference-layout weights + exact padding
    reproduce the independent torch re-derivation end-to-end."""
    torch = pytest.importorskip("torch")
    from immunostruct_tpu.models.trunk import _reparameterize
    from tests.test_torch_full_model import (
        t, t_linear, torch_egnn_layer, torch_mha,
    )

    feats, coords, edges = _raw_graphs(rng)
    graph = make_graph_batch(feats, coords, edges, max_nodes=N_EXACT,
                             max_edges=E, nodes_multiple=1, edges_multiple=1)
    spec, params = _imported_params(rng)
    seq = rng.random((B, L, 21)).astype(np.float32)
    props = rng.random((B, 2)).astype(np.float32)
    key = jax.random.key(5)
    out = model_apply(params, spec, graph, jnp.asarray(seq),
                      jnp.asarray(props), key, deterministic=True,
                      aggregation="scatter")

    h = t(np.asarray(graph.node_feat)[..., :20])
    x = t(np.asarray(graph.coords))
    src = torch.from_numpy(np.array(graph.edge_src, dtype=np.int64, copy=True))
    dst = torch.from_numpy(np.array(graph.edge_dst, dtype=np.int64, copy=True))
    mask = torch.from_numpy(np.array(graph.edge_mask, copy=True))
    for layer in params["gcn"]:
        h, x = torch_egnn_layer(layer, h, x, src, dst, mask)
    attn = torch_mha(params["node_attn"], h, n_head=1)
    pooled = attn.mean(dim=1)          # divides by the EXACT padded N

    pe = torch.relu(t_linear(params["property_embedding"][0], t(props)))
    pe = torch.relu(t_linear(params["property_embedding"][1], pe))

    k_item, _ = jax.random.split(key)
    k_eps, _ = jax.random.split(k_item)
    h1 = torch.relu(t_linear(params["vae"]["fc1"], t(seq.reshape(B, -1))))
    mu = t_linear(params["vae"]["fc21"], h1)
    logvar = t_linear(params["vae"]["fc22"], h1)
    eps = np.asarray(_reparameterize(k_eps, jnp.zeros((B, 32)), jnp.zeros((B, 32))))
    z = mu + torch.from_numpy(np.array(eps, copy=True)) * torch.exp(0.5 * logvar)
    z_vae = torch.cat([z, pe], dim=1)

    combined = torch.cat([pooled, z_vae], dim=1)
    c = torch_mha(params["combined_attention"], combined.unsqueeze(2), n_head=8)
    fused = c.mean(dim=2)
    hid = torch.relu(t_linear(params["classifier"]["trunk"], fused))
    logits = t_linear(params["classifier"]["out"], hid)

    np.testing.assert_allclose(np.asarray(out.logits), logits.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_checkpoint_sniffing_and_loading(rng, tmp_path):
    torch = pytest.importorskip("torch")
    from immunostruct_tpu.utils.checkpoint import save_checkpoint

    spec = model_map["SequenceFpModel"]
    sd = fake_state_dict(spec, VAE_DIM, rng)
    pt_path = os.path.join(tmp_path, "ref_finetune.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pt_path)

    _, native = build_model("SequenceFpModel", VAE_DIM, jax.random.key(0))
    npz_path = os.path.join(tmp_path, "native.ckpt")
    save_checkpoint(npz_path, native)

    assert is_torch_checkpoint(pt_path)
    assert not is_torch_checkpoint(npz_path)

    from_pt = load_any_checkpoint(pt_path, native, spec, verbose=False)
    want = import_torch_state_dict(sd, spec)
    for a, b in zip(jax.tree.leaves(from_pt), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from_npz = load_any_checkpoint(npz_path, native, spec, verbose=False)
    for a, b in zip(jax.tree.leaves(from_npz), jax.tree.leaves(native)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_require_exact_reference_padding_mutates_config():
    from immunostruct_tpu.config import Config

    cfg = Config()
    assert cfg.pad_nodes_multiple == 8
    require_exact_reference_padding(cfg)
    assert cfg.pad_nodes_multiple == 1
