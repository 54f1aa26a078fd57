"""Attention primitives.

Two variants, matching the reference's layer zoo
(reference: immunostruct/models/layers.py):

- ``self_attention``: single-head QKV without output projection
  (layers.py:6-22, used by HybridModel/DualModel).
- ``mha``: multi-head attention with split/concat head layout and an output
  projection (layers.py:51-106). Supports ``input_dim != feature_dim`` for
  the reference's "fusion attention" trick where a d-dim fused vector is
  treated as a length-d sequence of scalars (layers.py:58-59, used at
  hybrid_models.py:275 and comparative_models.py:389).

All shapes are static; attention is dense (N <= ~300 node tokens, so the
O(N^2) matmuls are tiny and MXU-friendly — no flash/blockwise machinery is
warranted; see SURVEY.md section 5 "long-context" scoping note).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from immunostruct_tpu.ops.nnp import linear_init, linear_apply


def self_attention_init(key: jax.Array, feature_dim: int, dtype=jnp.float32) -> dict:
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "query": linear_init(kq, feature_dim, feature_dim, dtype=dtype),
        "key": linear_init(kk, feature_dim, feature_dim, dtype=dtype),
        "value": linear_init(kv, feature_dim, feature_dim, dtype=dtype),
    }


def self_attention_apply(params: dict, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: [B, L, D] -> (output [B, L, D], weights [B, L, L])."""
    q = linear_apply(params["query"], x)
    k = linear_apply(params["key"], x)
    v = linear_apply(params["value"], x)
    scale = 1.0 / (k.shape[-1] ** 0.5)
    scores = jnp.einsum("bld,bmd->blm", q, k, preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("blm,bmd->bld", weights, v, preferred_element_type=jnp.float32)
    return out.astype(x.dtype), weights


def mha_init(key: jax.Array, feature_dim: int, n_head: int,
             input_dim: Optional[int] = None, dtype=jnp.float32) -> dict:
    assert feature_dim % n_head == 0, "feature_dim must be divisible by n_head"
    input_dim = input_dim or feature_dim
    kq, kk, kv, kc = jax.random.split(key, 4)
    return {
        "w_q": linear_init(kq, input_dim, feature_dim, dtype=dtype),
        "w_k": linear_init(kk, input_dim, feature_dim, dtype=dtype),
        "w_v": linear_init(kv, input_dim, feature_dim, dtype=dtype),
        "w_concat": linear_init(kc, feature_dim, feature_dim, dtype=dtype),
    }


def mha_apply(params: dict, x: jax.Array, n_head: int = 1,
              mask: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """x: [B, L, input_dim] -> (output [B, L, feature_dim], weights [B, H, L, L]).

    ``n_head`` is static (not stored in the param pytree, so it never becomes
    a tracer under jit). Masked positions are filled with -10000 before
    softmax, matching layers.py:39-40.
    """
    q = linear_apply(params["w_q"], x)
    k = linear_apply(params["w_k"], x)
    v = linear_apply(params["w_v"], x)

    b, l, d = q.shape
    d_head = d // n_head

    def split(t):
        return t.reshape(b, l, n_head, d_head).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scale = 1.0 / (d_head ** 0.5)
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask == 0, -10000.0, scores)
    weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bhmd->bhld", weights, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, l, d)
    out = linear_apply(params["w_concat"], out)
    return out, weights
