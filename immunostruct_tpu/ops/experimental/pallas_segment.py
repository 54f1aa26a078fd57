"""Pallas TPU kernels for segment gather/scatter as fused one-hot matmuls.

Motivation (measured, scripts/perf_sweep.py): EGNN aggregation on TPU is
fastest as a batched one-hot matmul (80x over scatter-add), but the XLA
formulation materializes the [B, N, E] one-hot scatter matrix in HBM
(~190 MB bf16 at reference shapes) and re-reads it for every layer and for
the backward pass. These kernels build the one-hot blocks on-chip in VMEM
tiles (a broadcasted-iota compare) and feed them straight into the MXU, so
the only HBM traffic is the messages themselves.

Two modes, sharing one tile structure:
  scatter:  out[n, :] = sum_{e: idx[e]==n} mask[e] * m[e, :]      (E -> N)
  gather:   out[e, :] = mask[e] * h[idx[e], :]                    (N -> E)

They are each other's transpose, which makes the custom VJPs exact:
  d/dm scatter = gather(idx, mask, d_out)
  d/dh gather  = scatter(idx, mask, d_out)

Shapes: idx/mask [B, E] (E a multiple of 128), m [B, E, C] or h [B, N, C].
Used by ops/egnn.py when aggregation='pallas' (TPU only; tests run the
interpreter path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(e: int) -> int:
    for tile in (512, 256, 128):
        if e % tile == 0:
            return tile
    return 0  # caller falls back to XLA


# idx/mask arrive as [B, 1, E] rows: the kernels build the TRANSPOSED
# one-hot G^T [N, TE] directly from a [1, TE] row via a sublane broadcast
# against a 2-D iota — no reshapes/shape-casts, which Mosaic cannot lower
# across the (sublane, lane) boundary (round-1's [rows,128]->[TE] flatten
# failed with "infer-vector-layout: unsupported shape cast" on hardware).
_LANE = 128


def _read_row(ref, t, tile):
    return ref[0, :, pl.ds(t * tile, tile)]          # [1, TE]


def _onehot_t_block(idx_t, mask_t, n, dtype):
    """[1, TE] indices/mask -> G^T [N, TE] (sublane-broadcast compare)."""
    node_iota = jax.lax.broadcasted_iota(jnp.int32, (n, idx_t.shape[1]), 0)
    g = (node_iota == idx_t).astype(dtype)           # [N, TE]
    return g * mask_t.astype(dtype)


def _scatter_kernel(idx_ref, mask_ref, m_ref, out_ref, acc_ref, *, tile: int):
    e = m_ref.shape[1]
    n = out_ref.shape[1]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(t, _):
        idx_t = _read_row(idx_ref, t, tile)
        mask_t = _read_row(mask_ref, t, tile)
        gt = _onehot_t_block(idx_t, mask_t, n, m_ref.dtype)   # [N, TE]
        m_t = m_ref[0, pl.ds(t * tile, tile), :]              # [TE, C]
        acc_ref[...] += jax.lax.dot_general(
            gt, m_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [N, C]
        return 0

    jax.lax.fori_loop(0, e // tile, body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _gather_kernel(idx_ref, mask_ref, h_ref, out_ref, *, tile: int):
    e = out_ref.shape[1]
    n = h_ref.shape[1]

    def body(t, _):
        idx_t = _read_row(idx_ref, t, tile)
        mask_t = _read_row(mask_ref, t, tile)
        gt = _onehot_t_block(idx_t, mask_t, n, h_ref.dtype)   # [N, TE]
        # gather = (G^T)^T @ h, contracted over N
        out_ref[0, pl.ds(t * tile, tile), :] = jax.lax.dot_general(
            gt, h_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, e // tile, body, 0)


def _lanes(idx, mask, dtype):
    """Reshape [B, E] index/mask arrays to [B, 1, E] row layout."""
    b, e = idx.shape
    return (idx.reshape(b, 1, e), mask.astype(dtype).reshape(b, 1, e))


def _scatter_call(idx, mask, m, num_nodes: int, interpret: bool):
    b, e = idx.shape
    c = m.shape[-1]
    tile = _pick_tile(e)
    assert tile, f"edge count {e} not a multiple of 128"
    idx3, mask3 = _lanes(idx, mask, m.dtype)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, tile=tile),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_nodes, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_nodes, c), m.dtype),
        scratch_shapes=[pltpu.VMEM((num_nodes, c), jnp.float32)],
        interpret=interpret,
    )(idx3, mask3, m)


def _gather_call(idx, mask, h, interpret: bool):
    b, e = idx.shape
    n, c = h.shape[1], h.shape[2]
    tile = _pick_tile(e)
    assert tile, f"edge count {e} not a multiple of 128"
    idx3, mask3 = _lanes(idx, mask, h.dtype)
    return pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, e, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e, c), h.dtype),
        interpret=interpret,
    )(idx3, mask3, h)


# --------------------------------------------------------------------------
# public ops with exact custom VJPs
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def segment_scatter(idx, mask, m, num_nodes: int, interpret: bool = False):
    """out[b, n] = sum over masked edges with idx==n of m[b, e]."""
    return _scatter_call(idx, mask.astype(m.dtype), m, num_nodes, interpret)


def _segment_scatter_fwd(idx, mask, m, num_nodes, interpret):
    return segment_scatter(idx, mask, m, num_nodes, interpret), (idx, mask)


def _segment_scatter_bwd(num_nodes, interpret, res, g):
    idx, mask = res
    dm = _gather_call(idx, mask.astype(g.dtype), g, interpret)
    return None, None, dm


segment_scatter.defvjp(_segment_scatter_fwd, _segment_scatter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_gather(idx, mask, h, interpret: bool = False):
    """out[b, e] = mask[b, e] * h[b, idx[b, e]]."""
    return _gather_call(idx, mask.astype(h.dtype), h, interpret)


def _segment_gather_fwd(idx, mask, h, interpret):
    return segment_gather(idx, mask, h, interpret), (idx, mask, h.shape[1])


def _segment_gather_bwd(interpret, res, g):
    idx, mask, n = res
    dh = _scatter_call(idx, mask.astype(g.dtype), g, n, interpret)
    return None, None, dh


segment_gather.defvjp(_segment_gather_fwd, _segment_gather_bwd)
