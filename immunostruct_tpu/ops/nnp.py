"""Minimal functional NN primitives over plain-dict param pytrees.

Design: params are nested dicts of jnp arrays; every module is an
``*_init(key, ...) -> params`` plus an ``*_apply(params, x, ...) -> y`` pure
function. This keeps checkpointing, head-reinit surgery
(reference: models/hybrid_models.py:76-79 ``load_trained(new_head=True)``)
and sharding annotations trivial.

Initialization follows the torch ``nn.Linear`` default
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so parameter
scales match the reference implementation's training dynamics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

DEFAULT_PARAM_DTYPE = jnp.float32


def linear_init(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                dtype=DEFAULT_PARAM_DTYPE) -> dict:
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    params = {"w": jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return params


def linear_apply(params: dict, x: jax.Array, precision=None) -> jax.Array:
    y = jnp.dot(x, params["w"].astype(x.dtype), precision=precision,
                preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def mlp_init(key: jax.Array, dims: Sequence[int], bias: bool = True,
             final_bias: Optional[bool] = None, dtype=DEFAULT_PARAM_DTYPE) -> list:
    """Init a stack of linears: dims = [in, h1, ..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, k in enumerate(keys):
        use_bias = bias if (i < len(dims) - 2 or final_bias is None) else final_bias
        layers.append(linear_init(k, dims[i], dims[i + 1], bias=use_bias, dtype=dtype))
    return layers


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    """Inverted dropout; no-op when deterministic (eval) or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
