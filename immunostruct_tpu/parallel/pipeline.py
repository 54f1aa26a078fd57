"""Pipeline parallelism: a GPipe schedule over a named ``pipe`` mesh axis.

Like parallel/tensor.py, this exists for framework completeness past the
flagship's scale: the reference has no intra-model parallelism
(SURVEY.md section 2.3) and a ~6M-param model needs none — data
parallelism is the production configuration. These primitives let a
stack of shape-homogeneous layers (the natural target here is the EGNN
hidden-conv stack, whose layers are identical in shape —
ops/egnn.py ``egnn_stack_init``) run split across devices when a model
outgrows one chip's HBM.

Design (SPMD, inside ``shard_map`` over axis ``pipe``):

- stage s of S holds layer-parameter slice s of a [S, ...]-stacked pytree
  (sliced per device via ``axis_index`` — the stored/checkpointed layout
  stays the plain stacked array);
- the classic GPipe schedule runs S + M - 1 ticks for M microbatches: at
  tick t, stage s applies its layer to microbatch t - s, then every
  activation hops one stage via a ring ``ppermute`` (ICI
  neighbor-to-neighbor traffic, no all-to-all);
- bubbles execute on zeros (shapes stay static; results masked out);
- JAX autodiff differentiates straight through the schedule — the
  transpose of ``ppermute`` is the reverse permutation — so one
  ``jax.grad`` gives pipeline-parallel backward with no hand-written
  adjoint.

Equivalence with the plain sequential stack (forward and gradients) is
pinned by tests/test_pipeline_parallel.py on the 8-virtual-device mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def stage_params(stacked, axis_name: str = "pipe"):
    """Slice this device's stage from a [S, ...]-stacked param pytree."""
    i = jax.lax.axis_index(axis_name)

    def take(x):
        return jax.lax.dynamic_index_in_dim(x, i, axis=0, keepdims=False)

    return jax.tree.map(take, stacked)


def gpipe_apply(layer_fn: Callable, stacked_params, x: jax.Array,
                n_microbatches: int, axis_name: str = "pipe",
                aux=None) -> jax.Array:
    """Run ``layer_fn`` S times (one stage per device) over ``x``.

    layer_fn(params_s, act) -> act with IDENTICAL activation shapes in and
    out (shape-homogeneous stages). x: [B, ...] replicated input with
    B % n_microbatches == 0. Returns the replicated [B, ...] output equal
    to the sequential composition of all S stages. Must be called inside
    ``shard_map`` over ``axis_name``.

    aux: optional pytree of [B, ...] arrays of per-example side data every
    stage needs for the microbatch it is currently processing (e.g. the
    EGNN edge lists/masks, which are data, not activations — they do not
    hop with the pipeline). When given, layer_fn is called as
    ``layer_fn(params_s, act, aux_microbatch)``: at tick t, stage s
    receives aux rows of microbatch t - s (clipped during bubbles, whose
    outputs are masked anyway).
    """
    s_count = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    my_params = stage_params(stacked_params, axis_name)

    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    mb = b // n_microbatches
    micro = x.reshape((n_microbatches, mb) + x.shape[1:])
    aux_micro = jax.tree.map(
        lambda a: a.reshape((n_microbatches, mb) + a.shape[1:]), aux)
    zeros = jnp.zeros_like(micro[0])
    ticks = s_count + n_microbatches - 1
    perm = [(i, (i + 1) % s_count) for i in range(s_count)]

    def tick(carry, t):
        act = carry                                    # resident activation
        # stage 0 ingests microbatch t (while t < M); later stages use the
        # activation received from their left neighbor
        feed = jnp.where(t < n_microbatches,
                         micro[jnp.clip(t, 0, n_microbatches - 1)], zeros)
        cur = jnp.where(idx == 0, feed, act)
        if aux is None:
            out = layer_fn(my_params, cur)
        else:
            m_here = jnp.clip(t - idx, 0, n_microbatches - 1)
            aux_t = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, m_here, axis=0,
                                                       keepdims=False),
                aux_micro)
            out = layer_fn(my_params, cur, aux_t)
        # the LAST stage's output for microbatch m = t - (S-1) is final;
        # capture it (masked elsewhere), then hop every activation right
        m = t - (s_count - 1)
        is_final = jnp.logical_and(idx == s_count - 1,
                                   jnp.logical_and(m >= 0,
                                                   m < n_microbatches))
        final = jnp.where(is_final, out, zeros)
        recv = jax.lax.ppermute(out, axis_name, perm)
        return recv, final

    # the carry becomes device-varying after the first ppermute; mark the
    # initial zeros as varying over the pipe axis so scan's type check of
    # carry-in vs carry-out agrees
    init = jax.lax.pcast(zeros, (axis_name,), to="varying")
    _, finals = jax.lax.scan(tick, init, jnp.arange(ticks))
    # finals: [ticks, mb, ...]; microbatch m finished at tick m + S - 1 on
    # the last stage only. Slice the valid window and broadcast to every
    # stage with a psum (all other stages contributed zeros).
    window = jax.lax.dynamic_slice_in_dim(finals, s_count - 1,
                                          n_microbatches, axis=0)
    window = jax.lax.psum(window, axis_name)
    return window.reshape((b,) + x.shape[1:])
