"""Independent torch cross-checks of the non-graph branches.

Re-derives the reference's sequence VAE, property MLP, classifier, and
attention layers with torch.nn.functional primitives (from the architecture
description, not the reference code), loads OUR parameters into them, and
compares outputs. Catches silent layout divergences (weight transposition,
MHA head-split order, fusion-attention axes) that shape tests cannot.
Skipped when torch is unavailable.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from immunostruct_tpu.models import build_model, model_map
from immunostruct_tpu.ops.attention import (
    self_attention_init, self_attention_apply, mha_init, mha_apply,
)


def t(x):
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def t_linear(p, x):
    return torch.nn.functional.linear(x, t(p["w"]).T,
                                      t(p["b"]) if "b" in p else None)


class TestAttentionVsTorch:
    def test_self_attention(self, rng):
        d, b, l = 16, 3, 7
        params = self_attention_init(jax.random.key(0), d)
        x = rng.standard_normal((b, l, d)).astype(np.float32)

        got, got_w = self_attention_apply(params, jnp.asarray(x))

        xt = t(x)
        q = t_linear(params["query"], xt)
        k = t_linear(params["key"], xt)
        v = t_linear(params["value"], xt)
        scores = q @ k.transpose(-2, -1) / (d ** 0.5)
        w = torch.softmax(scores, dim=-1)
        want = w @ v
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_w), w.numpy(), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("n_head,input_dim,l", [(8, None, 6), (8, 1, 104), (2, None, 5)])
    def test_mha_head_split_order(self, rng, n_head, input_dim, l):
        d = 16
        params = mha_init(jax.random.key(1), d, n_head, input_dim=input_dim)
        in_d = input_dim or d
        b = 2
        x = rng.standard_normal((b, l, in_d)).astype(np.float32)

        got, _ = mha_apply(params, jnp.asarray(x), n_head=n_head)

        xt = t(x)
        q = t_linear(params["w_q"], xt)
        k = t_linear(params["w_k"], xt)
        v = t_linear(params["w_v"], xt)
        d_head = d // n_head

        def split(z):  # torch layout: view(b, l, h, dh).transpose(1, 2)
            return z.view(b, l, n_head, d_head).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        scores = (q @ k.transpose(2, 3)) / (d_head ** 0.5)
        w = torch.softmax(scores, dim=-1)
        out = (w @ v).transpose(1, 2).contiguous().view(b, l, d)
        want = t_linear(params["w_concat"], out)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


class TestSequenceBranchVsTorch:
    def test_sequencefp_forward(self, rng):
        """Full SequenceFpModel forward vs a torch re-derivation
        (ablation_models.py:68-125 architecture): VAE encode ->
        reparameterize(eps=0 via logvar->-inf trick avoided; compare mu path
        by matching the sampled eps) -> concat props -> decode + classify."""
        from immunostruct_tpu.models.trunk import model_apply, _reparameterize
        l = 12
        vae_dim = l * 21
        spec, params = build_model("SequenceFpModel", vae_dim, jax.random.key(2))
        b = 4
        seq = rng.random((b, l, 21)).astype(np.float32)
        props = rng.random((b, 2)).astype(np.float32)

        key = jax.random.key(3)
        out = model_apply(params, spec, None, jnp.asarray(seq), jnp.asarray(props),
                          key, deterministic=True)

        # reproduce the same eps the trunk drew
        k_item, _ = jax.random.split(key)
        k_eps, _ = jax.random.split(k_item)
        mu_j = out.mu
        std = jnp.exp(0.5 * out.logvar)
        eps = (_reparameterize(k_eps, jnp.zeros_like(mu_j), jnp.zeros_like(mu_j))
               )  # N(0,1) sample with the same key
        z = np.asarray(mu_j) + np.asarray(eps) * np.asarray(std)

        xt = t(seq.reshape(b, -1))
        h1 = torch.relu(t_linear(params["vae"]["fc1"], xt))
        mu = t_linear(params["vae"]["fc21"], h1)
        logvar = t_linear(params["vae"]["fc22"], h1)
        np.testing.assert_allclose(np.asarray(out.mu), mu.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.logvar), logvar.numpy(), rtol=1e-4, atol=1e-5)

        z_t = torch.cat([torch.from_numpy(z), t(props)], dim=1)
        h3 = torch.relu(t_linear(params["vae"]["fc3"], z_t))
        recon = t_linear(params["vae"]["fc4"], h3)
        np.testing.assert_allclose(np.asarray(out.recon), recon.numpy(),
                                   rtol=1e-4, atol=1e-4)

        hid = torch.relu(t_linear(params["classifier"]["trunk"], z_t))
        logits = t_linear(params["classifier"]["out"], hid)
        np.testing.assert_allclose(np.asarray(out.logits), logits.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_property_embedding(self, rng):
        """2 -> 32 -> ReLU -> 8 -> ReLU MLP (hybrid_models.py:46-52)."""
        from immunostruct_tpu.models.trunk import _property_branch
        spec, params = build_model("HybridModelv2", 12 * 21, jax.random.key(4))
        props = rng.random((5, 2)).astype(np.float32)
        got = _property_branch(params["property_embedding"], jnp.asarray(props),
                               None, True, 0.1)
        h = torch.relu(t_linear(params["property_embedding"][0], t(props)))
        want = torch.relu(t_linear(params["property_embedding"][1], h))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)
