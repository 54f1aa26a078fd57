"""Full-model cross-framework check: HybridModelv2 forward re-derived in
torch (EGNN message passing included) matches the JAX trunk end-to-end.

This is an independent re-implementation of the architecture from its
published equations (EGNN: Satorras et al. / DGL EGNNConv semantics) using
torch primitives, fed with OUR parameters — the strongest available
substitute for running the actual reference (DGL is not installed).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from immunostruct_tpu.models import build_model
from immunostruct_tpu.models.trunk import model_apply, _reparameterize
from tests.test_models import tiny_graph_batch, B, N, E, L, VAE_DIM


def t(x):
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def t_linear(p, x):
    return torch.nn.functional.linear(x, t(p["w"]).T,
                                      t(p["b"]) if "b" in p else None)


def torch_egnn_layer(p, h, x, src, dst, mask):
    """One EGNN layer in torch: gather -> SiLU MLPs -> masked scatter-add."""
    b, n, _ = h.shape
    silu = torch.nn.functional.silu
    h_src = torch.gather(h, 1, src.unsqueeze(-1).expand(-1, -1, h.shape[-1]))
    h_dst = torch.gather(h, 1, dst.unsqueeze(-1).expand(-1, -1, h.shape[-1]))
    x_src = torch.gather(x, 1, src.unsqueeze(-1).expand(-1, -1, 3))
    x_dst = torch.gather(x, 1, dst.unsqueeze(-1).expand(-1, -1, 3))

    x_diff = x_src - x_dst
    radial = (x_diff ** 2).sum(-1, keepdim=True)
    radial_safe = torch.where(radial > 0, radial, torch.ones_like(radial))
    x_hat = x_diff / (radial_safe.sqrt() + 1e-30)

    edge_feat = torch.ones(b, src.shape[1], 1)
    f = torch.cat([h_src, h_dst, radial, edge_feat], dim=-1)
    m = silu(t_linear(p["edge_mlp"][1], silu(t_linear(p["edge_mlp"][0], f))))
    cw = t_linear(p["coord_mlp"][1], silu(t_linear(p["coord_mlp"][0], m)))
    msg_x = cw * x_hat

    mk = mask.unsqueeze(-1).float()
    h_agg = torch.zeros(b, n, m.shape[-1])
    h_agg.scatter_add_(1, dst.unsqueeze(-1).expand(-1, -1, m.shape[-1]), m * mk)
    x_agg = torch.zeros(b, n, 3)
    x_agg.scatter_add_(1, dst.unsqueeze(-1).expand(-1, -1, 3), msg_x * mk)

    h_out = t_linear(p["node_mlp"][1],
                     silu(t_linear(p["node_mlp"][0], torch.cat([h, h_agg], -1))))
    return h_out, x + x_agg


def torch_mha(p, x, n_head):
    q, k, v = t_linear(p["w_q"], x), t_linear(p["w_k"], x), t_linear(p["w_v"], x)
    b, l, d = q.shape
    dh = d // n_head

    def split(z):
        return z.view(b, l, n_head, dh).transpose(1, 2)

    q, k, v = split(q), split(k), split(v)
    w = torch.softmax((q @ k.transpose(2, 3)) / (dh ** 0.5), dim=-1)
    out = (w @ v).transpose(1, 2).contiguous().view(b, l, d)
    return t_linear(p["w_concat"], out)


def test_hybridv2_full_forward_matches_torch(rng):
    graph = tiny_graph_batch(rng)
    seq = rng.random((B, L, 21)).astype(np.float32)
    props = rng.random((B, 2)).astype(np.float32)

    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(11))
    key = jax.random.key(13)
    out = model_apply(params, spec, graph, jnp.asarray(seq), jnp.asarray(props),
                      key, deterministic=True, aggregation="scatter")

    # ---- torch re-derivation -------------------------------------------------
    h = t(np.asarray(graph.node_feat)[..., :20])
    x = t(np.asarray(graph.coords))
    src = torch.from_numpy(np.array(graph.edge_src, dtype=np.int64, copy=True))
    dst = torch.from_numpy(np.array(graph.edge_dst, dtype=np.int64, copy=True))
    mask = torch.from_numpy(np.array(graph.edge_mask, copy=True))

    for layer in params["gcn"]:
        h, x = torch_egnn_layer(layer, h, x, src, dst, mask)

    attn = torch_mha(params["node_attn"], h, n_head=1)
    pooled = attn.mean(dim=1)                      # includes padding rows

    # property branch (eval mode: dropout off)
    pe = torch.relu(t_linear(params["property_embedding"][0], t(props)))
    pe = torch.relu(t_linear(params["property_embedding"][1], pe))

    # VAE with the same eps the trunk drew (key split order: item -> eps)
    k_item, _ = jax.random.split(key)
    k_eps, _ = jax.random.split(k_item)
    h1 = torch.relu(t_linear(params["vae"]["fc1"], t(seq.reshape(B, -1))))
    mu = t_linear(params["vae"]["fc21"], h1)
    logvar = t_linear(params["vae"]["fc22"], h1)
    eps = np.asarray(_reparameterize(k_eps, jnp.zeros((B, 32)), jnp.zeros((B, 32))))
    z = mu + torch.from_numpy(np.array(eps, copy=True)) * torch.exp(0.5 * logvar)
    z_vae = torch.cat([z, pe], dim=1)

    combined = torch.cat([pooled, z_vae], dim=1)   # [B, 104]
    c = torch_mha(params["combined_attention"], combined.unsqueeze(2), n_head=8)
    fused = c.mean(dim=2)                          # [B, 104]
    hid = torch.relu(t_linear(params["classifier"]["trunk"], fused))
    logits = t_linear(params["classifier"]["out"], hid)

    np.testing.assert_allclose(np.asarray(out.mu), mu.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.logits), logits.numpy(),
                               rtol=2e-3, atol=2e-4)
