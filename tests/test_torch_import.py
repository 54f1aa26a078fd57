"""Torch checkpoint import: synthetic reference-layout state_dicts round-trip
into param pytrees with the exact shapes model_init produces."""

import jax
import numpy as np
import pytest

from immunostruct_tpu.models import model_map, model_init
from immunostruct_tpu.utils.torch_import import import_torch_state_dict

VAE_DIM = 12 * 21


def fake_state_dict(spec, vae_dim, rng):
    """Build a reference-layout state_dict (numpy) for a given spec."""
    sd = {}

    def lin(prefix, in_dim, out_dim, bias=True):
        # scaled like torch's default init so deep stacks (6 EGNN layers)
        # stay finite when the imported weights are run forward
        scale = 1.0 / np.sqrt(in_dim)
        sd[f"{prefix}.weight"] = (scale * rng.standard_normal(
            (out_dim, in_dim))).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = (scale * rng.standard_normal(
                (out_dim,))).astype(np.float32)

    g = spec.gat_hidden_channels
    if spec.use_structure:
        in_size = 20
        for i in range(spec.gcn_layers + 1):
            p = f"GCN_layers.{i}"
            lin(f"{p}.edge_mlp.0", in_size * 2 + 2, g)
            lin(f"{p}.edge_mlp.2", g, g)
            lin(f"{p}.node_mlp.0", in_size + g, g)
            lin(f"{p}.node_mlp.2", g, g)
            lin(f"{p}.coord_mlp.0", g, g)
            lin(f"{p}.coord_mlp.2", g, 1, bias=False)
            in_size = g
        if spec.node_attention == "self":
            for name in ("query", "key", "value"):
                lin(f"self_attention.{name}", g, g)
        else:
            for name in ("w_q", "w_k", "w_v", "w_concat"):
                lin(f"self_attention.{name}", g, g)

    if spec.use_sequence:
        lin("vae_fc1", vae_dim, spec.vae_hidden_dim)
        lin("vae_fc21", spec.vae_hidden_dim, spec.vae_latent_dim)
        lin("vae_fc22", spec.vae_hidden_dim, spec.vae_latent_dim)
        dec_in = spec.vae_latent_dim
        if spec.use_property:
            dec_in += spec.property_embedding_dim
        if spec.raw_property_concat:
            dec_in += 2
        lin("vae_fc3", dec_in, spec.vae_hidden_dim)
        lin("vae_fc4", spec.vae_hidden_dim, vae_dim)

    if spec.use_property and spec.use_sequence:
        lin("property_embedding.0", 2, 32)
        lin("property_embedding.3", 32, spec.property_embedding_dim)

    if spec.combined_attention_dim > 0:
        for name in ("w_q", "w_k", "w_v", "w_concat"):
            lin(f"combined_attention.{name}",
                1 if name != "w_concat" else spec.combined_attention_dim,
                spec.combined_attention_dim)

    lin("classifier.1", spec.classifier_input_dim, spec.mlp_features)
    if spec.ssl:
        lin("classifier_head", spec.mlp_features, 1)
        lin("node_predictor_head", spec.mlp_features, 20)
    else:
        lin("classifier.4", spec.mlp_features, 1)
    return sd


@pytest.mark.parametrize("name", ["HybridModelv2", "HybridModel_SSL",
                                  "SequenceFpModel", "StructureModel",
                                  "HybridModelv2_Comparative", "DualModel"])
def test_import_shapes_match_init(name, rng):
    spec = model_map[name]
    sd = fake_state_dict(spec, VAE_DIM, rng)
    imported = import_torch_state_dict(sd, spec)
    native = model_init(jax.random.key(0), spec, VAE_DIM)

    flat_i = jax.tree.flatten_with_path(imported)[0]
    flat_n = dict(jax.tree.flatten_with_path(native)[0])
    assert len(flat_i) == len(flat_n)
    for path, leaf in flat_i:
        assert np.asarray(leaf).shape == np.asarray(flat_n[path]).shape, path


def test_weights_are_transposed(rng):
    spec = model_map["SequenceModel"]
    sd = fake_state_dict(spec, VAE_DIM, rng)
    imported = import_torch_state_dict(sd, spec)
    np.testing.assert_array_equal(
        np.asarray(imported["vae"]["fc1"]["w"]), sd["vae_fc1.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(imported["classifier"]["out"]["b"]), sd["classifier.4.bias"])


def test_imported_params_run_forward(rng):
    import jax.numpy as jnp
    from immunostruct_tpu.models.trunk import model_apply
    spec = model_map["SequenceFpModel"]
    sd = fake_state_dict(spec, VAE_DIM, rng)
    params = import_torch_state_dict(sd, spec)
    seq = jnp.asarray(rng.random((4, 12, 21)).astype(np.float32))
    props = jnp.asarray(rng.random((4, 2)).astype(np.float32))
    out = model_apply(params, spec, None, seq, props, jax.random.key(0),
                      deterministic=True)
    assert out.logits.shape == (4, 1)
