"""Weight quantization for the serving path.

Weight-only int8, per-output-channel symmetric scales — the standard
serving recipe for small models. At these model sizes (~6M params) the
inference step is activation/bandwidth-bound, so int8 weights are about
artifact size (4x smaller checkpoints) and accuracy headroom, not speed;
``scripts/bench_infer.py`` measures BOTH the throughput (expected ~flat)
and the accuracy delta so the tradeoff is recorded rather than assumed.

``fake_quant_int8`` rounds every linear weight through int8 and back to
f32 — numerically identical to dequantize-at-load serving, so the measured
probability/logit deltas are exactly what a quantized artifact would
produce.
"""

from __future__ import annotations

import numpy as np


def _is_weight(path_leaf) -> bool:
    # linear weights are rank-2 arrays stored under key 'w'
    path, leaf = path_leaf
    last = path[-1]
    key = getattr(last, "key", None)
    return key == "w" and getattr(leaf, "ndim", 0) == 2


def quantize_int8(w: np.ndarray):
    """[in, out] f32 -> (int8 [in, out], f32 scale [out])."""
    w = np.asarray(w, np.float32)
    scale = np.max(np.abs(w), axis=0) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dequantize_int8(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale


def fake_quant_int8(params):
    """Round every linear weight through int8 (per-out-channel symmetric);
    biases and non-weight leaves pass through unchanged."""
    import jax

    def one(path, leaf):
        if _is_weight((path, leaf)):
            q, s = quantize_int8(np.asarray(leaf))
            return dequantize_int8(q, s)
        return leaf

    return jax.tree_util.tree_map_with_path(one, params)


def quantized_size_bytes(params) -> tuple[int, int]:
    """(float32 size, int8-weights size) of the parameter pytree."""
    import jax

    f32 = 0
    q = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        n = int(np.prod(leaf.shape)) if leaf.ndim else 1
        f32 += 4 * n
        if _is_weight((path, leaf)):
            q += n + 4 * leaf.shape[-1]   # int8 weights + f32 scales
        else:
            q += 4 * n
    return f32, q
