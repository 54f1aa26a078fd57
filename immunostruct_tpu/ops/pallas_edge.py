"""Fused EGNN edge-program Pallas kernel (edge MLP + coord update in VMEM).

Motivation (measured, round 3; benchmarks/RESULTS.md): with the one-hot
gather/aggregation einsums already running at 60-76% MXU utilization, the
profiled train step spends most of its remaining time in the edge-space
*chain* around them — the reference's ``edge_mlp`` + ``coord_mlp`` and the
radial/coordinate arithmetic (DGL EGNNConv internals; reference:
immunostruct/models/hybrid_models.py:29-31) — not in matmul FLOPs: XLA
materializes every intermediate ([B,E,2F+2] concat input, hidden [B,E,H]
activations, radial/x_hat/msg_x tensors), saves them for the backward
pass (activation copies), and runs the silu/radial backward as separate
bandwidth-bound reduce fusions.

This kernel runs the whole edge program per tile inside VMEM:

    radial = ||x_diff||^2 ;  x_hat = x_diff / (sqrt(radial_safe) + 1e-30)
    a1 = [hs ++ hd] @ W1ab + radial * w1r + ef * w1e + b1    (edge MLP L1,
         the concat split algebraically; hs/hd stacked on the contraction
         axis so the dot runs at K = 2F = 128)
    m  = silu(silu(a1) @ W2 + b2)                            (edge MLP L2)
    cw = silu(m @ Wc1 + bc1) @ wc2                           (coord MLP)
    out = [m ++ cw * x_hat]                                  ([B, H+3, E])

emitting exactly the tensor the dst-aggregation einsum consumes. The
backward pass RECOMPUTES the chain from the gathered inputs (in-kernel
rematerialization), so no edge-space activation is ever stored in HBM;
weight gradients accumulate in f32 in revisited output blocks across the
sequential grid.

Layout: edge tensors are LOGICALLY transposed — [B, C, E] with the edge
axis minor — which matches the physical layout XLA assigns to edge-space
tensors in this program (lane dimension = E) and keeps every VPU op at
full 128-lane utilization. The caller's gather einsums emit this shape
natively ("bne,bnc->bce").

Numerics mirror ops/nnp.linear_apply (dots accumulate in f32, bias adds in
f32, results cast to the compute dtype between layers); silu and the
radial/x_hat arithmetic run in f32 (Mosaic cannot lower bf16 logistic, and
f32 is the more accurate choice — cross-mode parity is tested to
bf16-roundoff tolerances).

Used by ops/egnn.py aggregation='fused'. CPU/tests run interpret mode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# columns of the packed "small" parameter matrix [H, 6] (column-packed so
# the kernel reads [H,1] columns without sublane/lane shape casts)
_W1R, _W1E, _B1, _B2, _BC1, _WC2 = range(6)


def pick_tile(e: int, hid: int = 64) -> int:
    """Largest 128-multiple tile dividing E within VMEM budget, 0 if none.

    Bigger tiles measured faster (fewer grid cells -> better DMA/compute
    amortization: 11.8 vs 12.4 ms/step at bench shapes for T=2560 vs 1280).
    Budget: ~18 live [H,T]-f32-equivalent buffers at ~70 bytes per H-row
    element (see the accounting below), kept under ~12 MB of VMEM.
    """
    # ~18 simultaneously-live [H,T] f32-equivalent buffers in the BACKWARD
    # kernel (6 f32 chain tensors + activations + gradient temps + the
    # double-buffered edge blocks): 70 bytes per H-row element keeps the
    # worst case under ~12 MB of the ~16 MB VMEM. Ceiling validated on
    # hardware at T=2560/H=64 (11.5 MB); T=3456 would not fit.
    budget = 12 * 1024 * 1024 // (max(hid, 8) * 70)
    best = 0
    t = 128
    while t <= e:
        if e % t == 0 and t <= budget:
            best = t
        t += 128
    return best


def _silu_grad(x, s):
    """d silu / dx from the pre-activation x and its saved sigmoid s."""
    return s * (1.0 + x * (1.0 - s))


def _dotT(w, x, dtype):
    """[I,O]^T @ [I,T] -> [O,T] with f32 accumulation."""
    return jax.lax.dot_general(
        w.astype(dtype), x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_noT(w, x, dtype):
    """[O,I] @ [I,T] -> [O,T] (w used untransposed) with f32 accumulation."""
    return jax.lax.dot_general(
        w.astype(dtype), x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _geometry(xd):
    """radial (f32 [1,T], bf16-rounded to mirror the XLA path), safe 1/s."""
    xdf = xd.astype(jnp.float32)
    rad = jnp.sum(xdf * xdf, axis=0, keepdims=True)
    rad_b = rad.astype(xd.dtype)                          # matches XLA bf16 sum
    radf = rad_b.astype(jnp.float32)
    safe = jnp.where(radf > 0, radf, 1.0)
    inv_s = 1.0 / (jnp.sqrt(safe) + 1e-30)
    return rad_b, radf, inv_s


class _Chain(NamedTuple):
    """Forward-recompute intermediates: f32 pre-activations a1/p2/p3 and
    their sigmoids s1/s2/s3 (reused by the backward's silu-grad so
    transcendentals are computed once); activations a1s/m/c1 ALREADY cast
    to the compute dtype; cw in f32."""

    a1: object; s1: object; a1s: object
    p2: object; s2: object; m: object
    p3: object; s3: object; c1: object
    cw: object


def _chain_from_a1(a1, w2, wc1, smf, dtype) -> "_Chain":
    """Chain tail from the L1 pre-activation a1 (f32 [H,T])."""
    s1 = jax.nn.sigmoid(a1)
    a1s = (a1 * s1).astype(dtype)
    p2 = _dotT(w2, a1s, dtype) + smf[:, _B2:_B2 + 1]
    s2 = jax.nn.sigmoid(p2)
    m = (p2 * s2).astype(dtype)
    p3 = _dotT(wc1, m, dtype) + smf[:, _BC1:_BC1 + 1]
    s3 = jax.nn.sigmoid(p3)
    c1 = (p3 * s3).astype(dtype)
    cw = jnp.sum(c1.astype(jnp.float32) * smf[:, _WC2:_WC2 + 1],
                 axis=0, keepdims=True)                   # [1,T] f32
    return _Chain(a1, s1, a1s, p2, s2, m, p3, s3, c1, cw)


def _chain_fwd(hsd, rad_b, ef, w1ab, w2, wc1, small, dtype) -> "_Chain":
    """Shared forward recompute (see _Chain)."""
    smf = small.astype(jnp.float32)
    a1 = (_dotT(w1ab, hsd, dtype)
          + smf[:, _W1R:_W1R + 1] * rad_b.astype(jnp.float32)
          + smf[:, _W1E:_W1E + 1] * ef.astype(jnp.float32)
          + smf[:, _B1:_B1 + 1])
    return _chain_from_a1(a1, w2, wc1, smf, dtype)


def _fwd_kernel(hsx_ref, hdx_ref, ef_ref,
                w1ab_ref, w2_ref, wc1_ref, small_ref,
                out_ref, *, f_in: int):
    dtype = hsx_ref.dtype
    hsx, hdx = hsx_ref[0], hdx_ref[0]
    xd = hsx[f_in:] - hdx[f_in:]                          # [3,T]
    rad_b, _, inv_s = _geometry(xd)
    hsd = jnp.concatenate([hsx[:f_in], hdx[:f_in]], axis=0)
    ch = _chain_fwd(
        hsd, rad_b, ef_ref[0], w1ab_ref[...], w2_ref[...], wc1_ref[...],
        small_ref[...], dtype)
    x_hat = xd.astype(jnp.float32) * inv_s
    msgx = (ch.cw.astype(dtype).astype(jnp.float32) * x_hat).astype(dtype)
    out_ref[0] = jnp.concatenate([ch.m, msgx], axis=0)


def _bwd_kernel(hsx_ref, hdx_ref, ef_ref,
                w1ab_ref, w2_ref, wc1_ref, small_ref,
                dout_ref,
                dhsx_ref, dhdx_ref, def_ref,
                dw1ab_ref, dw2_ref, dwc1_ref, dsmall_ref, *, f_in: int):
    dtype = hsx_ref.dtype
    hid = w2_ref.shape[1]
    hsx, hdx = hsx_ref[0], hdx_ref[0]
    xd = hsx[f_in:] - hdx[f_in:]                          # [3,T]
    ef = ef_ref[0]
    rad_b, radf, inv_s = _geometry(xd)
    hsd = jnp.concatenate([hsx[:f_in], hdx[:f_in]], axis=0)
    a1, s1, a1s, p2, s2, m, p3, s3, c1, cw = _chain_fwd(
        hsd, rad_b, ef, w1ab_ref[...], w2_ref[...], wc1_ref[...],
        small_ref[...], dtype)  # unpacked: every field is used below

    smf = small_ref[...].astype(jnp.float32)
    xdf = xd.astype(jnp.float32)
    x_hat = xdf * inv_s                                    # [3,T] f32
    cw_b = cw.astype(dtype).astype(jnp.float32)            # mirrors fwd round

    d_out = dout_ref[0]
    d_m_in = d_out[:hid]                                   # [H,T]
    d_msgx = d_out[hid:].astype(jnp.float32)               # [3,T]

    # msgx = cw_b * x_hat
    d_cw = jnp.sum(d_msgx * x_hat, axis=0, keepdims=True)  # [1,T]
    d_xhat = d_msgx * cw_b                                 # [3,T]

    # coord/edge MLP chain backward (recomputed activations + sigmoids)
    d_c1 = smf[:, _WC2:_WC2 + 1] * d_cw                    # [H,T]
    d_p3 = (d_c1 * _silu_grad(p3, s3)).astype(dtype)
    d_m = d_m_in.astype(jnp.float32) + _dot_noT(wc1_ref[...], d_p3, dtype)
    d_p2 = (d_m * _silu_grad(p2, s2)).astype(dtype)
    d_a1s = _dot_noT(w2_ref[...], d_p2, dtype)
    d_a1 = (d_a1s * _silu_grad(a1, s1)).astype(dtype)
    d_a1f = d_a1.astype(jnp.float32)

    d_hsd = _dot_noT(w1ab_ref[...], d_a1, dtype).astype(dtype)  # [2F,T]

    # geometry backward:
    #   x_hat = xd * inv_s,  inv_s = 1/(sqrt(safe)+eps),  safe = where(r>0,r,1)
    #   d_xd += d_xhat*inv_s + xd*d_inv_s ; d_inv_s via d_s = -inv_s^2*d_(1/..)
    d_rad_chain = jnp.sum(smf[:, _W1R:_W1R + 1] * d_a1f, axis=0,
                          keepdims=True)                   # [1,T] (raw radial)
    sum_dxh_xd = jnp.sum(d_xhat * xdf, axis=0, keepdims=True)
    sqrt_safe = jnp.sqrt(jnp.where(radf > 0, radf, 1.0))
    # d(inv_s)/d(safe) = -0.5 * inv_s^2 / sqrt(safe)
    d_safe = sum_dxh_xd * (-0.5) * inv_s * inv_s / sqrt_safe
    d_rad = d_rad_chain + jnp.where(radf > 0, d_safe, 0.0)
    d_xd = (d_xhat * inv_s + 2.0 * xdf * d_rad).astype(dtype)

    # xd = hsx[F:] - hdx[F:]: fold the coordinate grads into the two
    # gathered-bundle cotangents
    dhsx_ref[0] = jnp.concatenate([d_hsd[:f_in], d_xd], axis=0)
    dhdx_ref[0] = jnp.concatenate([d_hsd[f_in:], -d_xd], axis=0)
    def_ref[0] = jnp.sum(smf[:, _W1E:_W1E + 1] * d_a1f, axis=0,
                         keepdims=True).astype(dtype)

    # ---- weight grads: f32 accumulation in revisited output blocks ----
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw1ab_ref[...] = jnp.zeros_like(dw1ab_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dwc1_ref[...] = jnp.zeros_like(dwc1_ref)
        dsmall_ref[...] = jnp.zeros_like(dsmall_ref)

    def outerT(x, dy):
        # x [I,T], dy [O,T] -> [I,O] contraction over lanes
        return jax.lax.dot_general(
            x, dy, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dw1ab_ref[...] += outerT(hsd, d_a1)
    dw2_ref[...] += outerT(a1s, d_p2)
    dwc1_ref[...] += outerT(m, d_p3)
    # bias/rank-1 grads as MXU dots against stacked rows (measured
    # equivalent to VPU lane reductions at bench shapes; kept on the MXU
    # to leave VPU headroom)
    ones = jnp.ones_like(d_cw)                             # [1,T] f32
    lhs3 = jnp.concatenate([rad_b.astype(jnp.float32),
                            ef.astype(jnp.float32), ones], axis=0)  # [3,T]
    d3 = outerT(d_a1f, lhs3)                               # [H,3]
    db2 = outerT(d_p2.astype(jnp.float32), ones)           # [H,1]
    dbc1 = outerT(d_p3.astype(jnp.float32), ones)
    dwc2 = outerT(c1.astype(jnp.float32), d_cw)
    dsmall_ref[...] += jnp.concatenate([d3, db2, dbc1, dwc2], axis=1)


def _edge_spec(c, t):
    return pl.BlockSpec((1, c, t), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)


def _whole_spec(shp):
    return pl.BlockSpec(shp, lambda i, j, _s=shp: tuple(0 for _ in _s),
                        memory_space=pltpu.VMEM)


def _call_setup(hsx, w1ab, w2, wc1, small, max_tile: int = 0):
    """Shared grid/spec preamble for both kernel launches.

    max_tile caps the tile below pick_tile's VMEM ceiling: the BACKWARD
    kernel's ~18 live buffers at T=2560 fill ~11.5 MB of VMEM, leaving no
    room to double-buffer the edge blocks — DMA then serializes with
    compute (measured ~2.2x the kernel's traffic+MXU floor). A smaller
    backward tile restores the overlap headroom."""
    b, f3, e = hsx.shape
    hid = w2.shape[1]
    t = pick_tile(e, hid)
    assert t, f"edge count {e} has no 128-multiple tile"
    if max_tile and t > max_tile:
        capped = pick_tile(min(e, max_tile), hid)
        t = capped if capped and e % capped == 0 else t
    in_specs = [_edge_spec(f3, t), _edge_spec(f3, t), _edge_spec(1, t)] + [
        _whole_spec(w.shape) for w in (w1ab, w2, wc1, small)]
    return b, f3, e, f3 - 3, hid, t, (b, e // t), in_specs


def _fwd_call(hsx, hdx, ef, w1ab, w2, wc1, small, interpret):
    b, f3, e, f_in, hid, t, grid, in_specs = _call_setup(
        hsx, w1ab, w2, wc1, small)
    out_specs = _edge_spec(hid + 3, t)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, f_in=f_in),
        grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b, hid + 3, e), hsx.dtype),
        interpret=interpret,
    )(hsx, hdx, ef, w1ab, w2, wc1, small)


# Backward-tile cap: 1280 measured SLOWER than the full-E tile at bench
# shapes (11.97 vs 11.40 ms/step, round-3 re-test) — the ~0.7 us/grid-cell
# fixed overhead of the extra cells outweighs any DMA-overlap gain from
# the freed VMEM. Disabled (0); kept as the documented knob.
_BWD_MAX_TILE = 0


def _bwd_call(hsx, hdx, ef, w1ab, w2, wc1, small, dout, interpret):
    b, f3, e, f_in, hid, t, grid, in_specs = _call_setup(
        hsx, w1ab, w2, wc1, small, max_tile=_BWD_MAX_TILE)
    in_specs = in_specs + [_edge_spec(hid + 3, t)]
    out_specs = [_edge_spec(f3, t), _edge_spec(f3, t), _edge_spec(1, t)] + [
        _whole_spec(w.shape) for w in (w1ab, w2, wc1, small)]
    out_shape = [
        jax.ShapeDtypeStruct((b, f3, e), hsx.dtype),
        jax.ShapeDtypeStruct((b, f3, e), hsx.dtype),
        jax.ShapeDtypeStruct((b, 1, e), hsx.dtype),
        jax.ShapeDtypeStruct(w1ab.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        jax.ShapeDtypeStruct(wc1.shape, jnp.float32),
        jax.ShapeDtypeStruct(small.shape, jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, f_in=f_in),
        grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        interpret=interpret,
    )(hsx, hdx, ef, w1ab, w2, wc1, small, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def edge_program(hsx, hdx, ef, w1ab, w2, wc1, small,
                 interpret: bool = False):
    """Fused EGNN edge program over gathered [h ++ x] bundles.

    hsx/hdx: [B,F+3,E] gathered node-feature+coordinate bundles
    (transposed edge layout; rows 0..F-1 features, F..F+2 coordinates) —
    the kernel derives x_diff = hsx[F:] - hdx[F:] internally, so no
    separate coordinate gather or diff one-hot matrix is needed;
    ef: [B,1,E] edge features; w1ab: [2F,H] rows 0..2F-1 of the reference
    edge-MLP L1 weight; w2/wc1: [H,H]; small: [H,6] column-packed
    (w1r, w1e, b1, b2, bc1, wc2).
    Returns [B, H+3, E]: rows 0..H-1 the messages m, rows H..H+2 the
    coordinate messages cw * x_hat — exactly the dst-aggregation operand.
    """
    return _fwd_call(hsx, hdx, ef, w1ab, w2, wc1, small, interpret)


def _edge_program_fwd(hsx, hdx, ef, w1ab, w2, wc1, small, interpret):
    out = edge_program(hsx, hdx, ef, w1ab, w2, wc1, small, interpret)
    return out, (hsx, hdx, ef, w1ab, w2, wc1, small)


def _edge_program_bwd(interpret, res, g):
    hsx, hdx, ef, w1ab, w2, wc1, small = res
    outs = _bwd_call(hsx, hdx, ef, w1ab, w2, wc1, small,
                     g.astype(hsx.dtype), interpret)
    dhsx, dhdx, def_, dw1ab, dw2, dwc1, dsmall = outs
    return (dhsx, dhdx, def_,
            dw1ab.astype(w1ab.dtype), dw2.astype(w2.dtype),
            dwc1.astype(wc1.dtype), dsmall.astype(small.dtype))


edge_program.defvjp(_edge_program_fwd, _edge_program_bwd)


def pack_params(edge_mlp: list, coord_mlp: list):
    """Split reference-layout params into the kernel's operand set.

    edge_mlp: [{w:[2F+2,H],b:[H]}, {w:[H,H],b:[H]}]
    coord_mlp: [{w:[H,H],b:[H]}, {w:[H,1]}] (final layer bias-free)
    Weights stay in their master dtype (f32): the kernel casts to the
    compute dtype at use — matching linear_apply — so weight grads flow
    back to the caller at full master precision.
    """
    w1 = edge_mlp[0]["w"]
    f2 = w1.shape[0] - 2
    small = jnp.stack([
        w1[f2], w1[f2 + 1], edge_mlp[0]["b"], edge_mlp[1]["b"],
        coord_mlp[0]["b"], coord_mlp[1]["w"][:, 0],
    ], axis=1).astype(jnp.float32)                        # [H, 6]
    return w1[:f2], edge_mlp[1]["w"], coord_mlp[0]["w"], small
