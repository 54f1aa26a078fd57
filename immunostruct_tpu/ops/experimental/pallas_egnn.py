"""Fused EGNN layer as ONE Pallas TPU kernel (forward).

Motivation (benchmarks/RESULTS.md round 2): after the all-matmul rewrite
the train step is bound by HBM traffic — re-reading the materialized
[B,N,E] one-hot matrices and streaming ~70 [B,E,C] intermediates between
XLA fusions. This kernel runs an ENTIRE EGNN layer per batch item in one
pass: one-hot tiles are built in VMEM (iota compare), gathers/aggregation
are MXU dots against those tiles, and every edge-space intermediate
(h_src, h_dst, x_diff, messages) lives only in VMEM for the duration of
one 512-edge tile. HBM traffic per layer drops to h/x in + h'/x' out +
weights (~0.1 MB/item) instead of ~6 MB/item.

Scope: FORWARD only — used for the inference/serving path
(`aggregation='fused'` in ops/egnn.py routes here when
``deterministic`` forwards run on TPU and shapes qualify); training keeps
the XLA all-matmul path whose backward is already matmul-only. A custom
VJP with an in-kernel recompute backward is the recorded follow-up
(ROADMAP #1).

Assumptions (asserted by the wrapper):
- edge_feat is all-ones (every pipeline in this framework and the
  reference's to_dgl build 1-dim constant edge features);
- E is a multiple of 128 (the pipelines pad edges to 128-multiples).

Math matches ops/egnn.py::egnn_apply exactly (same guards); parity is
pinned in tests/test_pallas_egnn.py against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def _pick_tile(e: int) -> int:
    for tile in (_TILE, 256, 128):
        if e % tile == 0:
            return tile
    return 0


def _fused_layer_kernel(src_ref, dst_ref, mask_ref, h_ref, x_ref,
                        we1_ref, be1_ref, we2_ref, be2_ref,
                        wc1_ref, bc1_ref, wc2_ref,
                        wn1_ref, bn1_ref, wn2_ref, bn2_ref,
                        hout_ref, xout_ref, acc_ref, accx_ref,
                        *, tile: int, f_in: int):
    n = h_ref.shape[1]
    e = src_ref.shape[2]
    h = h_ref[0]                       # [N, F]
    x = x_ref[0]                       # [N, 3]

    we1 = we1_ref[:]                   # [2F+2, H]
    w_src = we1[:f_in, :]
    w_dst = we1[f_in:2 * f_in, :]
    w_rad = we1[2 * f_in:2 * f_in + 1, :]          # [1, H]
    # edge_feat == 1: its weight row folds into the bias
    bias1 = be1_ref[:] + we1[2 * f_in + 1:2 * f_in + 2, :]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    accx_ref[...] = jnp.zeros_like(accx_ref)

    def body(t, _):
        idx_s = src_ref[0, :, pl.ds(t * tile, tile)]       # [1, TE]
        idx_d = dst_ref[0, :, pl.ds(t * tile, tile)]
        mk = mask_ref[0, :, pl.ds(t * tile, tile)]         # [1, TE]

        iota = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 0)
        gts = (iota == idx_s).astype(h.dtype) * mk.astype(h.dtype)  # [N, TE]
        gtd = (iota == idx_d).astype(h.dtype) * mk.astype(h.dtype)

        cn = (((0,), (0,)), ((), ()))   # contract over N
        h_src = jax.lax.dot_general(gts, h, cn,
                                    preferred_element_type=jnp.float32)
        h_dst = jax.lax.dot_general(gtd, h, cn,
                                    preferred_element_type=jnp.float32)
        x_diff = jax.lax.dot_general(gts - gtd, x.astype(h.dtype), cn,
                                     preferred_element_type=jnp.float32)

        radial = jnp.sum(x_diff * x_diff, axis=-1, keepdims=True)  # [TE, 1] f32
        radial_safe = jnp.where(radial > 0, radial, 1.0)
        x_hat = x_diff / (jnp.sqrt(radial_safe) + 1e-30)

        # edge MLP (concat avoided by weight splits)
        z1 = (jnp.dot(h_src.astype(h.dtype), w_src,
                      preferred_element_type=jnp.float32)
              + jnp.dot(h_dst.astype(h.dtype), w_dst,
                        preferred_element_type=jnp.float32)
              + radial.astype(h.dtype) * w_rad.astype(jnp.float32)
              + bias1.astype(jnp.float32))
        m1 = jax.nn.silu(z1).astype(h.dtype)
        z2 = jnp.dot(m1, we2_ref[:], preferred_element_type=jnp.float32) \
            + be2_ref[:].astype(jnp.float32)
        m = jax.nn.silu(z2).astype(h.dtype)                # [TE, H]

        zc1 = jnp.dot(m, wc1_ref[:], preferred_element_type=jnp.float32) \
            + bc1_ref[:].astype(jnp.float32)
        c1 = jax.nn.silu(zc1).astype(h.dtype)
        cw = jnp.dot(c1, wc2_ref[:], preferred_element_type=jnp.float32)  # [TE,1]
        msg_x = (cw * x_hat).astype(h.dtype)               # [TE, 3]

        ct = (((1,), (0,)), ((), ()))   # contract over TE
        acc_ref[...] += jax.lax.dot_general(gtd, m, ct,
                                            preferred_element_type=jnp.float32)
        accx_ref[...] += jax.lax.dot_general(gtd, msg_x, ct,
                                             preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, e // tile, body, 0)

    wn1 = wn1_ref[:]                   # [F+H, H]
    zn = (jnp.dot(h, wn1[:f_in, :], preferred_element_type=jnp.float32)
          + jnp.dot(acc_ref[...].astype(h.dtype), wn1[f_in:, :],
                    preferred_element_type=jnp.float32)
          + bn1_ref[:].astype(jnp.float32))
    a = jax.nn.silu(zn).astype(h.dtype)
    hout_ref[0] = (jnp.dot(a, wn2_ref[:], preferred_element_type=jnp.float32)
                   + bn2_ref[:].astype(jnp.float32)).astype(hout_ref.dtype)
    xout_ref[0] = (x.astype(jnp.float32) + accx_ref[...]).astype(xout_ref.dtype)


def _as2d(b):
    return b.reshape(1, -1)


def fused_egnn_layer(params: dict, h: jax.Array, x: jax.Array,
                     edge_src: jax.Array, edge_dst: jax.Array,
                     edge_mask: jax.Array, interpret: bool = False):
    """One EGNN layer, fully fused. h [B,N,F], x [B,N,3] -> (h' [B,N,Hout],
    x' [B,N,3]). Forward only (no defined VJP)."""
    b, n, f_in = h.shape
    e = edge_src.shape[1]
    tile = _pick_tile(e)
    assert tile, f"edge count {e} not a multiple of 128"

    we1, be1 = params["edge_mlp"][0]["w"], params["edge_mlp"][0]["b"]
    we2, be2 = params["edge_mlp"][1]["w"], params["edge_mlp"][1]["b"]
    wc1, bc1 = params["coord_mlp"][0]["w"], params["coord_mlp"][0]["b"]
    wc2 = params["coord_mlp"][1]["w"]
    wn1, bn1 = params["node_mlp"][0]["w"], params["node_mlp"][0]["b"]
    wn2, bn2 = params["node_mlp"][1]["w"], params["node_mlp"][1]["b"]
    hidden = we1.shape[1]
    h_out = wn2.shape[1]
    assert we1.shape[0] == 2 * f_in + 2, "edge_feat must be 1-dim (all-ones)"

    dtype = h.dtype
    cast = lambda a: a.astype(dtype)  # noqa: E731
    idx3 = edge_src.reshape(b, 1, e)
    dst3 = edge_dst.reshape(b, 1, e)
    mask3 = edge_mask.astype(dtype).reshape(b, 1, e)

    batch_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    weights = [cast(we1), _as2d(cast(be1)), cast(we2), _as2d(cast(be2)),
               cast(wc1), _as2d(cast(bc1)), cast(wc2),
               cast(wn1), _as2d(cast(bn1)), cast(wn2), _as2d(cast(bn2))]

    return pl.pallas_call(
        functools.partial(_fused_layer_kernel, tile=tile, f_in=f_in),
        grid=(b,),
        in_specs=[batch_spec((1, e)), batch_spec((1, e)), batch_spec((1, e)),
                  batch_spec((n, f_in)), batch_spec((n, 3))]
        + [const_spec(w.shape) for w in weights],
        out_specs=[batch_spec((n, h_out)), batch_spec((n, 3))],
        out_shape=[jax.ShapeDtypeStruct((b, n, h_out), dtype),
                   jax.ShapeDtypeStruct((b, n, 3), x.dtype)],
        scratch_shapes=[pltpu.VMEM((n, hidden), jnp.float32),
                        pltpu.VMEM((n, 3), jnp.float32)],
        interpret=interpret,
    )(idx3, dst3, mask3, h, x, *weights)


def fused_egnn_stack(layers: list, h: jax.Array, x: jax.Array,
                     edge_src: jax.Array, edge_dst: jax.Array,
                     edge_mask: jax.Array, interpret: bool = False):
    """Forward-only fused stack (inference path)."""
    for params in layers:
        h, x = fused_egnn_layer(params, h, x, edge_src, edge_dst, edge_mask,
                                interpret=interpret)
    return h, x
