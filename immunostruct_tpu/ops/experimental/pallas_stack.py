"""Whole-stack EGNN kernel: ALL conv layers in one Pallas program.

MEASURED NEGATIVE RESULT — kept in-tree, flag-gated off (STACK_ENABLE
below has the numbers). Retained because it is the complete, parity-
tested answer to the obvious "why rebuild the one-hots every layer?"
question, and because reproducing its measurement requires the kernel.

Why it was built: the per-layer mega kernel (ops/pallas_mega.py) rebuilds
the two [N,T] one-hot tiles in VMEM for every layer — 6 builds/step. A
timing probe that replaces the builds with a constant (ONEHOT_SKIP_PROBE,
scripts/race_kernel_variants.py 'skipprobe') measured the rebuild cost at
**1.52 ms/step** at bench shapes (11.26 -> 9.74 ms) — the single biggest
recoverable cost left in the round-3 profile. This kernel builds the
one-hots ONCE per batch item and runs the ENTIRE conv stack — edge half,
node MLP, coordinate update — inside one grid cell, with h and x resident
in VMEM between layers:

    per grid cell (batch item i; the whole edge set is ONE tile):
      S_src/S_dst/Sdiff   built once
      for l in 0..L-1:      (unrolled; layer-0 panels differ in F)
        pa, pb   = h @ W1a_l, h @ W1b_l          node-level L1, MXU
        ga/gb/xd = gathers through S_src/S_dst/Sdiff        MXU
        a1 .. msg = edge-MLP chain (pallas_edge math)
        agg      = S_dst @ [m ++ msg_x]          aggregation, MXU
        h        = node_mlp([h ++ agg_h])        tiny [N,.] dots
        x        = x + agg_x
        (a1_l, xd_l, agg_l, h_l, x_l streamed out for the backward)

The backward is UNCHANGED structurally: per layer (reversed), the node
MLP half runs as an XLA jax.vjp from the saved (h_in, agg) and the edge
half reuses the per-layer hybrid backward (pallas_mega._edge_half_bwd:
XLA one-hot einsum transposes + the Pallas tail kernel) — that hybrid
beat all-in-kernel backward variants three times (v1-v3, v7;
benchmarks/RESULTS.md), so only the forward changes here.

Constraints: the whole edge set must fit ONE VMEM tile (stack_supported;
true at both bench shapes), edge_feat size 1, >= 2 layers with identical
hidden shapes. Unsupported shapes fall back to the per-layer mega path
in ops/egnn.py.

Numerics: identical op order/dtypes per layer to the per-layer mega path
(one extra bf16 round nowhere); parity-tested in tests/test_pallas_stack.py.

Reference role: the 6x DGL EGNNConv stack
(immunostruct/models/hybrid_models.py:29-31, :89-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from immunostruct_tpu.ops.pallas_edge import (
    _chain_from_a1, _geometry,
    _W1R, _W1E, _B1,
)
from immunostruct_tpu.ops.pallas_mega import (
    _onehots, _gather, _edge_half_bwd,
)


# Trace-time switch (scripts/race_kernel_variants.py races 'stack'
# against the per-layer path by flipping it). MEASURED NEGATIVE at bench
# shapes — default OFF: the whole-stack kernel raced 12.53 ms p50 vs the
# per-layer mega path's 11.27 (4 interleaved windows). The 1.25 ms of
# saved one-hot rebuilds is outweighed by (a) the node MLP running as
# 128 per-item [N,128]x[128,H] dots instead of one batch-wide XLA matmul
# and (b) the monolithic ~12.5 MB cell pipelining worse than six small
# double-buffered cells. Together with the 'fused' path (one-hots
# materialized in HBM, read per layer — ties the rebuild) this brackets
# the rebuild tax measured by ONEHOT_SKIP_PROBE (1.5 ms/step): every
# architectural route to recover it loses more elsewhere.
STACK_ENABLE = False


def stack_supported(e: int, n: int, hid: int, num_layers: int,
                    edge_feat_size: int) -> bool:
    """Whole edge set in one VMEM tile + shapes the kernel handles."""
    if not STACK_ENABLE:
        return False
    if edge_feat_size != 1 or num_layers < 2 or e % 128:
        return False
    # per-edge VMEM: one-hots + diff (3x [N,T] bf16 = 6n B), the chain's
    # ~9 [H,T] f32 buffers, and the streamed a1/xd output blocks
    per_edge = 36 * max(hid, 8) + 6 * n + 2 * num_layers * (hid + 3) + 16
    return e <= 12 * 1024 * 1024 // per_edge


def _whole(shp):
    return pl.BlockSpec(shp, lambda i, _s=shp: tuple(0 for _ in _s),
                        memory_space=pltpu.VMEM)


def _stack_fwd_kernel(src_ref, dst_ref, ef_ref, h0_ref, x0_ref,
                      w1ab0_ref, w20_ref, wc10_ref, small0_ref,
                      nm0w0_ref, nm0b0_ref, nm1w0_ref, nm1b0_ref,
                      w1abH_ref, w2H_ref, wc1H_ref, smallH_ref,
                      nm0wH_ref, nm0bH_ref, nm1wH_ref, nm1bH_ref,
                      hs_ref, xs_ref, aggs_ref, a1s_ref, xds_ref,
                      *, hid: int, f0: int, num_layers: int):
    dtype = h0_ref.dtype
    n = h0_ref.shape[1]
    s_src, s_dst = _onehots(src_ref, dst_ref, n, dtype)
    sdiff = s_src - s_dst            # exact: one-hot values are {-1,0,1}
    h = h0_ref[0]
    x = x0_ref[0]
    ef = ef_ref[0]

    for layer in range(num_layers):
        if layer == 0:
            f = f0
            w1ab = w1ab0_ref[...].astype(dtype)
            w2, wc1 = w20_ref[...], wc10_ref[...]
            smf = small0_ref[...].astype(jnp.float32)
            nm0w, nm0b = nm0w0_ref[...], nm0b0_ref[...]
            nm1w, nm1b = nm1w0_ref[...], nm1b0_ref[...]
        else:
            f = hid
            w1ab = w1abH_ref[layer - 1].astype(dtype)
            w2, wc1 = w2H_ref[layer - 1], wc1H_ref[layer - 1]
            smf = smallH_ref[layer - 1].astype(jnp.float32)
            nm0w, nm0b = nm0wH_ref[layer - 1], nm0bH_ref[layer - 1]
            nm1w, nm1b = nm1wH_ref[layer - 1], nm1bH_ref[layer - 1]

        # ---- edge half (pallas_mega._mega_fwd_kernel math) ----
        pa = jax.lax.dot_general(
            h, w1ab[:f], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
        pb = jax.lax.dot_general(
            h, w1ab[f:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
        ga = _gather(pa, s_src, dtype)                      # [H, T]
        gb = _gather(pb, s_dst, dtype)
        xd = _gather(x, sdiff, dtype)                       # [3, T]
        rad_b, radf, inv_s = _geometry(xd)
        a1 = (ga.astype(jnp.float32) + gb.astype(jnp.float32)
              + smf[:, _W1R:_W1R + 1] * rad_b.astype(jnp.float32)
              + smf[:, _W1E:_W1E + 1] * ef.astype(jnp.float32)
              + smf[:, _B1:_B1 + 1])
        ch = _chain_from_a1(a1, w2, wc1, smf, dtype)
        x_hat = xd.astype(jnp.float32) * inv_s
        msgx = (ch.cw.astype(dtype).astype(jnp.float32) * x_hat).astype(dtype)
        both = jnp.concatenate([ch.m, msgx], axis=0)        # [H+3, T]
        agg = jax.lax.dot_general(                          # [N, H+3]
            s_dst, both, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

        a1s_ref[0, layer] = ch.a1.astype(dtype)
        xds_ref[0, layer] = xd
        aggs_ref[0, layer] = agg

        # ---- node update (egnn._node_update math: linear_apply order) ----
        h_agg, x_agg = agg[:, :hid], agg[:, hid:]
        cat = jnp.concatenate([h, h_agg], axis=-1)          # [N, F+H]
        p1 = (jax.lax.dot_general(
            cat, nm0w.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + nm0b.astype(jnp.float32))
        # silu computed in f32 (like every chain sigmoid here): Mosaic
        # cannot broadcast the f32 constants inside a bf16 sigmoid
        # ("vector.broadcast f32 -> bf16 vector" verify failure); one
        # extra bf16 round vs the XLA path's silu(bf16) —
        # tolerance-level (tests/test_pallas_stack.py)
        hmid = (p1 * jax.nn.sigmoid(p1)).astype(dtype)
        h = (jax.lax.dot_general(
            hmid, nm1w.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + nm1b.astype(jnp.float32)).astype(dtype)
        x = x + x_agg

        hs_ref[0, layer] = h
        xs_ref[0, layer] = x


def _stack_fwd_call(src, dst, emask, ef, h0, x0, l0, hs, interpret):
    b, n, f0 = h0.shape
    e = src.shape[1]
    hid = l0["w2"].shape[1]
    num_layers = 1 + hs["w2"].shape[0]
    src3 = jnp.where(emask, src, n).reshape(b, 1, e)
    dst3 = jnp.where(emask, dst, n).reshape(b, 1, e)
    ef3 = jnp.swapaxes(ef, 1, 2).astype(h0.dtype)           # [B, 1, E]
    row = pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    def node(c):
        return pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def stacked(c):
        return pl.BlockSpec((1, num_layers, n, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def edge_stacked(c):
        return pl.BlockSpec((1, num_layers, c, e), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    weights = [l0["w1ab"], l0["w2"], l0["wc1"], l0["small"],
               l0["nm0"]["w"], l0["nm0"]["b"].reshape(1, -1),
               l0["nm1"]["w"], l0["nm1"]["b"].reshape(1, -1),
               hs["w1ab"], hs["w2"], hs["wc1"], hs["small"],
               hs["nm0"]["w"], hs["nm0"]["b"][:, None, :],
               hs["nm1"]["w"], hs["nm1"]["b"][:, None, :]]
    in_specs = [row, row, row, node(f0), node(3)] + [
        _whole(w.shape) for w in weights]
    out_specs = [stacked(hid), stacked(3), stacked(hid + 3),
                 edge_stacked(hid), edge_stacked(3)]
    out_shape = [
        jax.ShapeDtypeStruct((b, num_layers, n, hid), h0.dtype),
        jax.ShapeDtypeStruct((b, num_layers, n, 3), h0.dtype),
        jax.ShapeDtypeStruct((b, num_layers, n, hid + 3), h0.dtype),
        jax.ShapeDtypeStruct((b, num_layers, hid, e), h0.dtype),
        jax.ShapeDtypeStruct((b, num_layers, 3, e), h0.dtype),
    ]
    return pl.pallas_call(
        functools.partial(_stack_fwd_kernel, hid=hid, f0=f0,
                          num_layers=num_layers),
        grid=(b,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(src3, dst3, ef3, h0, x0, *weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def edge_mega_stack(src, dst, emask, ef, h0, x0, l0, hs,
                    interpret: bool = False):
    """Full EGNN conv stack in one kernel. Returns (h_final, x_final).

    src/dst: [B,E] int32; emask: [B,E] bool; ef: [B,E,1]; h0: [B,N,F0]
    and x0: [B,N,3] in the compute dtype. l0: layer-0 params
    {w1ab,w2,wc1,small,nm0{w,b},nm1{w,b}} (pallas_edge.pack_params panel
    layout + the node MLP pair); hs: the identical hidden layers' params
    stacked on a leading [L-1] axis, same keys."""
    hs_out, xs_out, *_ = _stack_fwd_call(src, dst, emask, ef, h0, x0,
                                         l0, hs, interpret)
    return hs_out[:, -1], xs_out[:, -1]


def _stack_fwd(src, dst, emask, ef, h0, x0, l0, hs, interpret):
    hs_out, xs_out, aggs, a1s, xds = _stack_fwd_call(
        src, dst, emask, ef, h0, x0, l0, hs, interpret)
    res = (src, dst, emask, ef, h0, x0, l0, hs, hs_out, xs_out, aggs,
           a1s, xds)
    return (hs_out[:, -1], xs_out[:, -1]), res


def _node_update_ref(h_in, x_in, agg, nm0, nm1, hid):
    """egnn._node_update, parameterized for jax.vjp (exact-autodiff
    backward of the node half — no hand-derived formulas to drift)."""
    from immunostruct_tpu.ops.nnp import linear_apply
    hn = jnp.concatenate([h_in, agg[..., :hid]], axis=-1)
    hn = linear_apply(nm0, hn)
    hn = jax.nn.silu(hn)
    hn = linear_apply(nm1, hn)
    return hn, x_in + agg[..., hid:].astype(x_in.dtype)


def _stack_bwd(interpret, res, g):
    (src, dst, emask, ef, h0, x0, l0, hs, hs_out, xs_out, aggs,
     a1s, xds) = res
    hid = l0["w2"].shape[1]
    num_layers = 1 + hs["w2"].shape[0]
    d_h, d_x = g
    d_ef = None
    d_l0 = None
    d_hs_layers = []
    for layer in reversed(range(num_layers)):
        h_in = h0 if layer == 0 else hs_out[:, layer - 1]
        x_in = x0 if layer == 0 else xs_out[:, layer - 1]
        agg = aggs[:, layer]
        if layer == 0:
            p = l0
        else:
            p = jax.tree.map(lambda a: a[layer - 1], hs)
        # node half: exact autodiff of the reference node update
        _, vjp = jax.vjp(
            functools.partial(_node_update_ref, hid=hid),
            h_in, x_in, agg, p["nm0"], p["nm1"])
        d_h_in, d_x_in, d_agg, d_nm0, d_nm1 = vjp((d_h, d_x))
        # edge half: the measured-fastest hybrid backward (pallas_mega)
        d_ef_l, d_he, d_xe, dw1ab, dw2, dwc1, dsmall = _edge_half_bwd(
            src, dst, emask, ef, h_in, x_in, p["w1ab"], p["w2"],
            p["wc1"], p["small"], a1s[:, layer], xds[:, layer],
            d_agg, interpret)
        d_h = d_h_in + d_he.astype(d_h_in.dtype)
        d_x = d_x_in + d_xe.astype(d_x_in.dtype)
        d_ef = d_ef_l if d_ef is None else d_ef + d_ef_l
        d_p = {"w1ab": dw1ab.astype(p["w1ab"].dtype),
               "w2": dw2.astype(p["w2"].dtype),
               "wc1": dwc1.astype(p["wc1"].dtype),
               "small": dsmall.astype(p["small"].dtype),
               "nm0": d_nm0, "nm1": d_nm1}
        if layer == 0:
            d_l0 = d_p
        else:
            d_hs_layers.append(d_p)
    d_hs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0),
                        *reversed(d_hs_layers))
    return (None, None, None, d_ef.astype(ef.dtype), d_h.astype(h0.dtype),
            d_x.astype(x0.dtype), d_l0, d_hs)


edge_mega_stack.defvjp(_stack_fwd, _stack_bwd)


def pack_layer(layer: dict) -> dict:
    """One conv layer's params -> the stack kernel's panel dict."""
    from immunostruct_tpu.ops.pallas_edge import pack_params
    w1ab, w2, wc1, small = pack_params(layer["edge_mlp"],
                                       layer["coord_mlp"])
    return {"w1ab": w1ab, "w2": w2, "wc1": wc1, "small": small,
            "nm0": layer["node_mlp"][0], "nm1": layer["node_mlp"][1]}


def apply_stack(layers: list, h, x, edge_src, edge_dst, edge_feat,
                edge_mask, interpret: bool):
    """egnn_stack_apply fast path: whole conv stack in one kernel."""
    l0 = pack_layer(layers[0])
    hs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0),
                      *[pack_layer(ly) for ly in layers[1:]])
    return edge_mega_stack(edge_src, edge_dst, edge_mask, edge_feat,
                           h, x.astype(h.dtype), l0, hs, interpret)
