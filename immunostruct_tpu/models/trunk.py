"""The ImmunoStruct trunk: one parameterized forward covering the model zoo.

Every reference model (immunostruct/models/{hybrid,ablation,comparative}_models.py)
is the same trunk with components toggled:

  structure branch : 6x EGNN -> node attention (single-head or MHA) -> pool
  sequence branch  : VAE encoder -> reparameterize -> z
  property branch  : 2 -> 32 -> dropout -> property_embedding_dim MLP
  fusion           : concat -> optional "combined attention" (v2) -> classifier
  heads            : single classifier, or trunk + classifier_head +
                     node_predictor_head (SSL variants)
  comparative      : twin forward over (cancer, wt), concat embeddings
                     (2x fusion width) when use_wt_for_downstream

The ``ModelSpec`` below encodes exactly which pieces a registry name uses;
see models/zoo.py for the 14 instantiations and their reference citations.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from immunostruct_tpu.structs import GraphBatch
from immunostruct_tpu.ops.nnp import linear_init, linear_apply, dropout
from immunostruct_tpu.ops.attention import (
    self_attention_init, self_attention_apply, mha_init, mha_apply,
)
from immunostruct_tpu.ops.pooling import mean_pool, max_pool
from immunostruct_tpu.ops.egnn import egnn_stack_init, egnn_stack_apply

NUM_AMINO_ACIDS = 20


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture description (hashable; safe as a jit static arg)."""

    name: str = "HybridModelv2"
    # branches
    use_structure: bool = True
    use_sequence: bool = True          # VAE branch
    use_property: bool = True          # property-embedding MLP (2->32->8)
    raw_property_concat: bool = False  # SequenceFpModel: append raw 2 props to z
    # structure branch
    gcn_layers: int = 5                # hidden convs; +1 input conv
    gat_hidden_channels: int = 64
    node_attention: str = "self"       # 'self' | 'mha'
    self_attention_heads: int = 1
    mean_max_pool: bool = False        # StructureModelv2: mean (+) max readout
    # sequence branch
    vae_hidden_dim: int = 512
    vae_latent_dim: int = 32
    property_embedding_dim: int = 8
    # fusion
    combined_attention_dim: int = 0    # 0 = no fusion attention (v1 models)
    combined_attention_heads: int = 8
    # heads
    ssl: bool = False                  # split trunk + classifier/node heads
    mlp_features: int = 32
    comparative: bool = False
    use_wt_for_downstream: bool = True
    dropout_rate: float = 0.1

    @property
    def embedding_dim(self) -> int:
        """Width of the fused per-item embedding entering the classifier."""
        dim = 0
        if self.use_structure:
            dim += self.gat_hidden_channels * (2 if self.mean_max_pool else 1)
        if self.use_sequence:
            dim += self.vae_latent_dim
            if self.use_property:
                dim += self.property_embedding_dim
            if self.raw_property_concat:
                dim += 2
        return dim

    @property
    def classifier_input_dim(self) -> int:
        if self.comparative and self.use_wt_for_downstream:
            return self.embedding_dim * 2
        return self.embedding_dim


class ModelOutput(NamedTuple):
    recon: Optional[jax.Array]       # sequence reconstruction (or None)
    mu: Optional[jax.Array]
    logvar: Optional[jax.Array]
    logits: jax.Array                # [B, 1]
    node_logits: Optional[jax.Array]  # SSL amino-acid prediction [B, 20]
    embedding: Optional[jax.Array]   # fused per-item embedding (contrastive)
    attention: Optional[jax.Array]   # node attention weights


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _classifier_init(key: jax.Array, spec: ModelSpec, dtype=jnp.float32) -> dict:
    """Fused-embedding classifier (reference: hybrid_models.py:54-61).

    Plain models:   Linear(D, 32) -> ReLU -> Dropout -> Linear(32, 1)
    SSL models:     Linear(D, 32) -> ReLU -> Dropout  (trunk)
                    + classifier_head Linear(32, 1)
                    + node_predictor_head Linear(32, 20)
    """
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"trunk": linear_init(k1, spec.classifier_input_dim, spec.mlp_features, dtype=dtype)}
    if spec.ssl:
        params["classifier_head"] = linear_init(k2, spec.mlp_features, 1, dtype=dtype)
        params["node_predictor_head"] = linear_init(k3, spec.mlp_features, NUM_AMINO_ACIDS, dtype=dtype)
    else:
        params["out"] = linear_init(k2, spec.mlp_features, 1, dtype=dtype)
    return params


def model_init(key: jax.Array, spec: ModelSpec, vae_input_dim: int,
               dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 10)
    params: dict = {}

    if spec.use_structure:
        params["gcn"] = egnn_stack_init(keys[0], spec.gcn_layers, NUM_AMINO_ACIDS,
                                        spec.gat_hidden_channels, edge_feat_size=1,
                                        dtype=dtype)
        if spec.node_attention == "self":
            params["node_attn"] = self_attention_init(keys[1], spec.gat_hidden_channels, dtype=dtype)
        else:
            params["node_attn"] = mha_init(keys[1], spec.gat_hidden_channels,
                                           spec.self_attention_heads, dtype=dtype)

    if spec.use_sequence:
        k = jax.random.split(keys[2], 5)
        dec_in = spec.vae_latent_dim
        if spec.use_property:
            dec_in += spec.property_embedding_dim
        if spec.raw_property_concat:
            dec_in += 2
        params["vae"] = {
            "fc1": linear_init(k[0], vae_input_dim, spec.vae_hidden_dim, dtype=dtype),
            "fc21": linear_init(k[1], spec.vae_hidden_dim, spec.vae_latent_dim, dtype=dtype),
            "fc22": linear_init(k[2], spec.vae_hidden_dim, spec.vae_latent_dim, dtype=dtype),
            "fc3": linear_init(k[3], dec_in, spec.vae_hidden_dim, dtype=dtype),
            "fc4": linear_init(k[4], spec.vae_hidden_dim, vae_input_dim, dtype=dtype),
        }

    if spec.use_property and spec.use_sequence:
        k = jax.random.split(keys[3], 2)
        params["property_embedding"] = [
            linear_init(k[0], 2, 32, dtype=dtype),
            linear_init(k[1], 32, spec.property_embedding_dim, dtype=dtype),
        ]

    if spec.combined_attention_dim > 0:
        params["combined_attention"] = mha_init(
            keys[4], spec.combined_attention_dim, spec.combined_attention_heads,
            input_dim=1, dtype=dtype)

    params["classifier"] = _classifier_init(keys[5], spec, dtype=dtype)
    return params


def reset_head(params: dict, spec: ModelSpec, key: jax.Array,
               dtype=jnp.float32) -> dict:
    """Re-initialize the classifier for stage transitions.

    Mirrors ``load_trained(new_head=True)``: plain models re-init the whole
    classifier (hybrid_models.py:76-79); SSL models re-init only
    ``classifier_head`` (hybrid_models.py:191-194).
    """
    params = dict(params)
    if spec.ssl:
        classifier = dict(params["classifier"])
        classifier["classifier_head"] = linear_init(key, spec.mlp_features, 1, dtype=dtype)
        params["classifier"] = classifier
    else:
        params["classifier"] = _classifier_init(key, spec, dtype=dtype)
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _structure_branch(params: dict, spec: ModelSpec, graph: GraphBatch,
                      aggregation: str, compute_dtype, scan_layers: bool = False,
                      mp=None):
    h = graph.node_feat[..., :NUM_AMINO_ACIDS].astype(compute_dtype)
    x = graph.coords.astype(compute_dtype)
    if mp is not None and mp.pp_axis is not None and len(params["gcn"]) > 1:
        h, _ = _egnn_stack_gpipe(params["gcn"], h, x, graph, aggregation, mp)
    else:
        h, _ = egnn_stack_apply(params["gcn"], h, x, graph.edge_src,
                                graph.edge_dst, graph.edge_feat,
                                graph.edge_mask, aggregation=aggregation,
                                scan_layers=scan_layers)
    if spec.node_attention == "self":
        attn_out, attn_w = self_attention_apply(params["node_attn"], h)
    else:
        attn_out, attn_w = mha_apply(params["node_attn"], h,
                                     n_head=spec.self_attention_heads)
    if spec.mean_max_pool:
        pooled = jnp.concatenate([mean_pool(attn_out), max_pool(attn_out)], axis=-1)
    else:
        pooled = mean_pool(attn_out)
    return pooled, attn_w


def _egnn_stack_gpipe(layers, h, x, graph: GraphBatch, aggregation: str, mp):
    """Hidden EGNN convs as a GPipe pipeline over mp.pp_axis (the natural
    shape-homogeneous stage stack, parallel/pipeline.py); the input conv
    (different in-dim) runs locally first. Edge data rides as gpipe aux.
    Must execute inside shard_map over the pipe axis."""
    from immunostruct_tpu.parallel.mp import pad_pipeline_stages
    from immunostruct_tpu.parallel.pipeline import gpipe_apply
    from immunostruct_tpu.ops.egnn import egnn_apply

    h, x = egnn_apply(layers[0], h, x, graph.edge_src, graph.edge_dst,
                      graph.edge_feat, graph.edge_mask,
                      aggregation=aggregation)
    n_stages = jax.lax.axis_size(mp.pp_axis)   # static inside shard_map
    stacked, on = pad_pipeline_stages(layers[1:], int(n_stages))
    aux = (graph.edge_src, graph.edge_dst, graph.edge_feat, graph.edge_mask)

    def layer_fn(stage, hx, aux_t):
        params_s, on_s = stage
        h_, x_ = hx[..., :-3], hx[..., -3:]
        src, dst, ef, em = aux_t
        h2, x2 = egnn_apply(params_s, h_, x_, src, dst, ef, em,
                            aggregation=aggregation)
        out = jnp.concatenate([h2, x2], axis=-1)
        return jnp.where(on_s > 0, out, hx)          # pad stages = identity

    hx = jnp.concatenate([h, x], axis=-1)
    hx = gpipe_apply(layer_fn, (stacked, on), hx, mp.pp_microbatches,
                     axis_name=mp.pp_axis, aux=aux)
    return hx[..., :-3], hx[..., -3:]


def _vae_encode(params: dict, seq_flat: jax.Array, mp=None):
    if mp is not None and mp.tp_axis is not None:
        from immunostruct_tpu.parallel.tensor import (
            column_parallel_apply, row_parallel_apply)
        h1 = jax.nn.relu(column_parallel_apply(
            params["fc1"]["w"], params["fc1"].get("b"), seq_flat, mp.tp_axis))
        mu = row_parallel_apply(params["fc21"]["w"], params["fc21"].get("b"),
                                h1, mp.tp_axis)
        logvar = row_parallel_apply(params["fc22"]["w"],
                                    params["fc22"].get("b"), h1, mp.tp_axis)
        return mu, logvar
    h1 = jax.nn.relu(linear_apply(params["fc1"], seq_flat))
    return linear_apply(params["fc21"], h1), linear_apply(params["fc22"], h1)


def _vae_decode(params: dict, z: jax.Array, mp=None):
    if mp is not None and mp.tp_axis is not None:
        from immunostruct_tpu.parallel.tensor import (
            column_parallel_apply, row_parallel_apply)
        h3 = jax.nn.relu(column_parallel_apply(
            params["fc3"]["w"], params["fc3"].get("b"), z,
            mp.tp_axis)).astype(z.dtype)
        return row_parallel_apply(params["fc4"]["w"], params["fc4"].get("b"),
                                  h3, mp.tp_axis)
    h3 = jax.nn.relu(linear_apply(params["fc3"], z)).astype(z.dtype)
    return linear_apply(params["fc4"], h3)


def _reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array):
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, dtype=std.dtype)
    return mu + eps * std


def _property_branch(params: dict, props: jax.Array, key, deterministic: bool,
                     rate: float):
    h = jax.nn.relu(linear_apply(params[0], props))
    h = dropout(key, h, rate, deterministic)
    return jax.nn.relu(linear_apply(params[1], h))


def forward_item(params: dict, spec: ModelSpec, graph: Optional[GraphBatch],
                 seq_onehot: Optional[jax.Array], props: Optional[jax.Array],
                 rng: jax.Array, deterministic: bool = False,
                 aggregation: str = "auto", compute_dtype=jnp.float32,
                 scan_layers: bool = False, mp=None):
    """Single-branch forward shared by plain and comparative paths.

    Returns (embedding, recon, mu, logvar, attn_weights). ``embedding`` is
    [pool | z_vae] — the per-item fused vector (comparative_models.py:87-115).
    """
    if aggregation == "auto" and deterministic:
        # Forward-only (inference / eval): the mega kernel's win is a
        # TRAINING economy (2 saved residuals + hybrid backward); with no
        # backward, XLA's fully-fused one-hot einsums are fastest —
        # measured 4.13 ('onehot') vs 4.27 ('fused') vs 5.01 ('mega')
        # ms/fwd at bench shapes, interleaved (benchmarks/RESULTS.md).
        from immunostruct_tpu.ops.egnn import _on_tpu
        if _on_tpu():
            aggregation = "onehot"
    k_eps, k_drop = jax.random.split(rng)

    pooled, attn_w, recon, mu, logvar = None, None, None, None, None
    pieces = []

    if spec.use_structure:
        pooled, attn_w = _structure_branch(params, spec, graph, aggregation,
                                           compute_dtype, scan_layers, mp=mp)
        pieces.append(pooled)

    if spec.use_sequence:
        b = seq_onehot.shape[0]
        seq_flat = seq_onehot.reshape(b, -1).astype(compute_dtype)
        mu, logvar = _vae_encode(params["vae"], seq_flat, mp=mp)
        z = _reparameterize(k_eps, mu, logvar)
        if spec.use_property:
            prop_emb = _property_branch(params["property_embedding"],
                                        props.astype(compute_dtype),
                                        k_drop, deterministic, spec.dropout_rate)
            z = jnp.concatenate([z, prop_emb], axis=-1)
        if spec.raw_property_concat:
            z = jnp.concatenate([z, props.astype(z.dtype)], axis=-1)
        recon = _vae_decode(params["vae"], z, mp=mp)
        pieces.append(z)

    embedding = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else pieces[0]
    return embedding, recon, mu, logvar, attn_w


def _classify(params: dict, spec: ModelSpec, combined: jax.Array,
              rng: jax.Array, deterministic: bool):
    """Optional fusion attention + classifier MLP."""
    if spec.combined_attention_dim > 0:
        # Treat the fused D-dim vector as a length-D sequence of scalars
        # (hybrid_models.py:344-347): [B, D] -> [B, D, 1] -> MHA -> mean(dim 2).
        c = combined[..., None]
        c, _ = mha_apply(params["combined_attention"], c,
                         n_head=spec.combined_attention_heads)
        combined = jnp.mean(c, axis=2)

    cls = params["classifier"]
    h = jax.nn.relu(linear_apply(cls["trunk"], combined))
    h = dropout(rng, h, spec.dropout_rate, deterministic)
    if spec.ssl:
        logits = linear_apply(cls["classifier_head"], h)
        node_logits = linear_apply(cls["node_predictor_head"], h)
        return logits, node_logits
    return linear_apply(cls["out"], h), None


def model_apply(params: dict, spec: ModelSpec, graph: Optional[GraphBatch],
                seq_onehot: Optional[jax.Array], props: Optional[jax.Array],
                rng: jax.Array, deterministic: bool = False,
                aggregation: str = "auto", compute_dtype=jnp.float32,
                scan_layers: bool = False, mp=None) -> ModelOutput:
    """Plain (non-comparative) forward.

    For comparative specs this is the pretraining path: the item embedding is
    duplicated to fill the 2x-wide classifier ("hot fix",
    comparative_models.py:159-163).
    """
    k_item, k_cls = jax.random.split(rng)
    embedding, recon, mu, logvar, attn_w = forward_item(
        params, spec, graph, seq_onehot, props, k_item, deterministic,
        aggregation, compute_dtype, scan_layers, mp=mp)

    combined = embedding
    if spec.comparative and spec.use_wt_for_downstream:
        combined = jnp.concatenate([embedding, embedding], axis=-1)

    logits, node_logits = _classify(params, spec, combined, k_cls, deterministic)
    return ModelOutput(recon=recon, mu=mu, logvar=logvar,
                       logits=logits.astype(jnp.float32), node_logits=node_logits,
                       embedding=embedding, attention=attn_w)


def model_apply_comparative(
    params: dict, spec: ModelSpec,
    graph_pair, seq_pair, props_pair,
    rng: jax.Array, deterministic: bool = False,
    aggregation: str = "auto", compute_dtype=jnp.float32,
    scan_layers: bool = False, stack_twins: bool = False, mp=None,
):
    """Twin forward over (cancer, wt) with shared weights.

    Returns (ModelOutput_cancer, ModelOutput_wt, logits). The logits are
    computed from the concatenated pair embedding when use_wt_for_downstream
    (comparative_models.py:117-146); both per-item outputs carry their own
    recon/mu/logvar for the averaged twin loss (procedures/train.py:107-114).

    stack_twins: run ONE forward_item over the cancer/wt halves stacked on
    the batch axis (shared weights make the math identical) instead of two
    B-sized passes — one EGNN/attention/VAE dispatch at 2B with better MXU
    utilization and half the fixed per-pass overheads. All noise-free
    computation is exactly the two-pass values (verified to roundoff with
    the VAE noise pinned, tests/test_models.py); only the eps/dropout
    DRAWS differ (one 2B-key draw vs two B-key draws) — same distribution,
    different stream, matching the reference's use of the global torch RNG
    across its twin passes. (Note the VAE eps is sampled even under
    deterministic=True, mirroring the reference's eval-time randn_like.)
    """
    if stack_twins:
        k_item, k_cls = jax.random.split(rng)
        b = seq_pair[0].shape[0] if seq_pair[0] is not None \
            else graph_pair[0].node_feat.shape[0]
        cat = lambda p: None if p[0] is None else jax.tree.map(
            lambda a, w: jnp.concatenate([a, w], axis=0), p[0], p[1])
        emb, recon, mu, logvar, attn = forward_item(
            params, spec, cat(graph_pair), cat(seq_pair), cat(props_pair),
            k_item, deterministic, aggregation, compute_dtype, scan_layers,
            mp=mp)
        halves = lambda t: (None, None) if t is None else (t[:b], t[b:])
        emb_c, emb_w = halves(emb)
        recon_c, recon_w = halves(recon)
        mu_c, mu_w = halves(mu)
        logvar_c, logvar_w = halves(logvar)
        attn_c, attn_w = halves(attn)
    else:
        k_c, k_w, k_cls = jax.random.split(rng, 3)
        emb_c, recon_c, mu_c, logvar_c, attn_c = forward_item(
            params, spec, graph_pair[0], seq_pair[0], props_pair[0], k_c,
            deterministic, aggregation, compute_dtype, scan_layers, mp=mp)
        emb_w, recon_w, mu_w, logvar_w, attn_w = forward_item(
            params, spec, graph_pair[1], seq_pair[1], props_pair[1], k_w,
            deterministic, aggregation, compute_dtype, scan_layers, mp=mp)

    if spec.use_wt_for_downstream:
        combined = jnp.concatenate([emb_c, emb_w], axis=-1)
    else:
        combined = emb_c

    logits, node_logits = _classify(params, spec, combined, k_cls, deterministic)
    logits = logits.astype(jnp.float32)

    out_c = ModelOutput(recon=recon_c, mu=mu_c, logvar=logvar_c, logits=logits,
                        node_logits=node_logits, embedding=emb_c, attention=attn_c)
    out_w = ModelOutput(recon=recon_w, mu=mu_w, logvar=logvar_w, logits=logits,
                        node_logits=node_logits, embedding=emb_w, attention=attn_w)
    return out_c, out_w, logits
