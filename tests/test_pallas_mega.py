"""Parity tests for the mega-fused EGNN kernel (interpret mode).

aggregation='mega' (ops/pallas_mega.py: in-VMEM one-hots + gather + edge
program + aggregation in one kernel) must match the 'onehot' and 'fused'
paths — same math, different residency — for forward values and for
gradients wrt every parameter and input. Tolerances are f32-roundoff
scale, as tests/test_pallas_edge.py.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from immunostruct_tpu.ops import egnn as eg
from immunostruct_tpu.ops.pallas_mega import mega_pick_tile


pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

def _toy(b=3, n=24, e=128, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((b, n, 20)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    esrc = jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32))
    edst = jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32))
    efeat = jnp.asarray(rng.standard_normal((b, e, 1)).astype(np.float32))
    emask = jnp.asarray(rng.random((b, e)) > 0.25)
    params = eg.egnn_stack_init(jax.random.key(seed), 3, 20, 64)
    return params, h, x, esrc, edst, efeat, emask


def _loss(params, h, x, esrc, edst, efeat, emask, agg, scan=False):
    hn, xn = eg.egnn_stack_apply(params, h, x, esrc, edst, efeat, emask,
                                 aggregation=agg, scan_layers=scan)
    return jnp.sum(hn ** 2) * 1e-3 + jnp.sum(xn ** 2) * 1e-3


def test_mega_matches_onehot_forward_and_grads():
    params, *args = _toy()
    l_one, g_one = jax.value_and_grad(_loss)(params, *args, "onehot")
    l_mega, g_mega = jax.value_and_grad(_loss)(params, *args, "mega")
    assert np.isfinite(float(l_mega))
    np.testing.assert_allclose(float(l_mega), float(l_one),
                               rtol=5e-4, atol=5e-5)
    ref_scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_one))
    for a, b in zip(jax.tree.leaves(g_one), jax.tree.leaves(g_mega)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3 * ref_scale)


def test_mega_matches_scatter_values():
    params, *args = _toy(seed=3)
    np.testing.assert_allclose(float(_loss(params, *args, "mega")),
                               float(_loss(params, *args, "scatter")),
                               rtol=5e-4, atol=5e-5)


def test_mega_grad_wrt_inputs_matches():
    params, h, x, esrc, edst, efeat, emask = _toy(seed=5)

    def loss_hx(h, x, agg):
        return _loss(params, h, x, esrc, edst, efeat, emask, agg)

    gh1, gx1 = jax.grad(loss_hx, argnums=(0, 1))(h, x, "onehot")
    gh2, gx2 = jax.grad(loss_hx, argnums=(0, 1))(h, x, "mega")
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-3, atol=1e-4)


def test_mega_multi_tile_accumulation():
    """E spanning several tiles: per-tile partial aggregates must sum
    exactly (revisited-output accumulation across the inner grid axis,
    and the f32 multi-tile out_dtype switch in _mega_fwd_call). At
    (n=136, e=3456) the fwd tile is 1152 — genuinely 3 tiles (an
    earlier version of this test used e=512, which the budget covers in
    ONE tile, silently skipping the accumulate branch)."""
    params, *args = _toy(b=2, n=136, e=3456, seed=7)
    n = 136
    assert 0 < mega_pick_tile(3456, n, backward=False) < 3456
    l_one, g_one = jax.value_and_grad(_loss)(params, *args, "onehot")
    l_mega, g_mega = jax.value_and_grad(_loss)(params, *args, "mega")
    np.testing.assert_allclose(float(l_mega), float(l_one),
                               rtol=5e-4, atol=5e-5)
    ref_scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_one))
    for a, b in zip(jax.tree.leaves(g_one), jax.tree.leaves(g_mega)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3 * ref_scale)


def test_mega_with_scan_layers_matches():
    params, *args = _toy(seed=9)
    l_plain = _loss(params, *args, "mega", scan=False)
    l_scan = _loss(params, *args, "mega", scan=True)
    np.testing.assert_allclose(float(l_scan), float(l_plain),
                               rtol=1e-5, atol=1e-7)


def test_mega_fallback_on_unsupported_shapes():
    """Non-128-multiple edge pads warn and fall back to 'fused'/'onehot'."""
    import warnings
    params, h, x, esrc, edst, efeat, emask = _toy(e=100, seed=11)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        l = _loss(params, h, x, esrc, edst, efeat, emask, "mega")
    assert np.isfinite(float(l))
    assert any("mega" in str(x.message) for x in w)


def test_mega_inkernel_backward_matches():
    """BWD_INKERNEL_NODES=True (v7: one-hots + d_both + gather transposes
    inside the tail kernel, no XLA backward einsums) must produce the same
    gradients as the hybrid default, including across multiple edge tiles
    (node-cotangent accumulation over the inner grid axis)."""
    from immunostruct_tpu.ops import pallas_mega as pm
    saved = pm.BWD_INKERNEL_NODES
    try:
        # second case: e=3456 puts the v7 tail at tile 1728 = 2 tiles,
        # exercising the cross-tile node-cotangent accumulation branch
        for kwargs in ({}, dict(b=2, n=136, e=3456, seed=7)):
            params, *args = _toy(**kwargs)
            pm.BWD_INKERNEL_NODES = False
            l_hyb, g_hyb = jax.value_and_grad(_loss)(params, *args, "mega")
            pm.BWD_INKERNEL_NODES = True
            l_ink, g_ink = jax.value_and_grad(_loss)(params, *args, "mega")
            np.testing.assert_allclose(float(l_ink), float(l_hyb),
                                       rtol=1e-5, atol=1e-7)
            ref_scale = max(float(jnp.max(jnp.abs(g)))
                            for g in jax.tree.leaves(g_hyb))
            for a, b in zip(jax.tree.leaves(g_hyb), jax.tree.leaves(g_ink)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-3, atol=2e-3 * ref_scale)
    finally:
        pm.BWD_INKERNEL_NODES = saved


def test_mega_dboth_inkernel_backward_matches():
    """BWD_DBOTH_INKERNEL=True (v7a: the aggregation transpose d_both
    computed inside the tail kernel from raw dst indices) must produce
    the same gradients as the einsum default."""
    from immunostruct_tpu.ops import pallas_mega as pm
    saved = pm.BWD_DBOTH_INKERNEL
    try:
        # e=3456: the db tail tile is 1728 = 2 tiles (multi-tile d_both)
        for kwargs in ({}, dict(b=2, n=136, e=3456, seed=7)):
            params, *args = _toy(**kwargs)
            pm.BWD_DBOTH_INKERNEL = False
            l_ein, g_ein = jax.value_and_grad(_loss)(params, *args, "mega")
            pm.BWD_DBOTH_INKERNEL = True
            l_db, g_db = jax.value_and_grad(_loss)(params, *args, "mega")
            np.testing.assert_allclose(float(l_db), float(l_ein),
                                       rtol=1e-5, atol=1e-7)
            ref_scale = max(float(jnp.max(jnp.abs(g)))
                            for g in jax.tree.leaves(g_ein))
            for a, b in zip(jax.tree.leaves(g_ein), jax.tree.leaves(g_db)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-3, atol=2e-3 * ref_scale)
    finally:
        pm.BWD_DBOTH_INKERNEL = saved


def test_mega_shape_fuzz_matches_onehot():
    """Random shape sweep (node counts off the tile grid, edge counts at
    1..3 tiles, empty-ish masks): mega must match onehot everywhere it
    claims support."""
    rng = np.random.default_rng(99)
    cases = [
        dict(b=1, n=9, e=128),        # tiny, non-multiple-of-8 nodes
        dict(b=4, n=31, e=256),
        dict(b=2, n=57, e=384),       # 3 tiles at small budget? (still 1)
        dict(b=2, n=130, e=1408),     # the realistic featurizer edge pad
    ]
    for i, kw in enumerate(cases):
        params, h, x, esrc, edst, efeat, emask = _toy(seed=40 + i, **kw)
        if i == 0:  # degenerate: almost everything masked
            emask = jnp.asarray(np.arange(kw["e"]) < 3)[None].repeat(kw["b"], 0)
        l_one, g_one = jax.value_and_grad(_loss)(
            params, h, x, esrc, edst, efeat, emask, "onehot")
        l_mega, g_mega = jax.value_and_grad(_loss)(
            params, h, x, esrc, edst, efeat, emask, "mega")
        np.testing.assert_allclose(float(l_mega), float(l_one),
                                   rtol=5e-4, atol=5e-5, err_msg=str(kw))
        ref_scale = max(float(jnp.max(jnp.abs(g)))
                        for g in jax.tree.leaves(g_one)) or 1.0
        for a, b2 in zip(jax.tree.leaves(g_one), jax.tree.leaves(g_mega)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       rtol=2e-3, atol=2e-3 * ref_scale,
                                       err_msg=str(kw))


def test_mega_bf16_close_to_f32():
    params, h, x, esrc, edst, efeat, emask = _toy(seed=13)
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    l32 = _loss(params, h, x, esrc, edst, efeat, emask, "mega")
    l16 = _loss(cast(params), cast(h), cast(x), esrc, edst,
                cast(efeat), emask, "mega")
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)


def test_mega_inner_subtiling_matches():
    """MEGA_INNER>1 (v8 sub-tiled forward: unrolled per-sub-tile bodies so
    VPU one-hot builds can overlap MXU dots) must match the single-pass
    forward and its gradients; the only numeric delta is the f32 add chain
    on the aggregation partials."""
    from immunostruct_tpu.ops import pallas_mega as pm
    saved = pm.MEGA_INNER
    try:
        params, *args = _toy(e=512, seed=3)
        pm.MEGA_INNER = 1
        l1, g1 = jax.value_and_grad(_loss)(params, *args, "mega")
        for inner in (2, 4):
            pm.MEGA_INNER = inner
            l2, g2 = jax.value_and_grad(_loss)(params, *args, "mega")
            np.testing.assert_allclose(float(l2), float(l1),
                                       rtol=1e-6, atol=1e-8)
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)
        # non-dividing sub-tile shapes fall back to a single pass
        pm.MEGA_INNER = 3
        l3, _ = jax.value_and_grad(_loss)(params, *args, "mega")
        np.testing.assert_allclose(float(l3), float(l1), rtol=1e-6, atol=1e-8)
    finally:
        pm.MEGA_INNER = saved


def test_mega_tail_inner_subtiling_matches():
    """MEGA_TAIL_INNER>1 (v8b sub-tiled backward tail: unrolled sub-tile
    bodies so the chain-backward VPU work can overlap the transpose /
    weight-grad MXU dots) must match the single-pass backward; the only
    numeric delta is the f32 add chain on the weight-grad accumulators.
    Also covers the fwd+tail combination (both sub-tiled)."""
    from immunostruct_tpu.ops import pallas_mega as pm
    saved = (pm.MEGA_INNER, pm.MEGA_TAIL_INNER)
    try:
        params, *args = _toy(e=512, seed=5)
        pm.MEGA_INNER, pm.MEGA_TAIL_INNER = 1, 1
        l1, g1 = jax.value_and_grad(_loss)(params, *args, "mega")
        for fwd_inner, tail_inner in ((1, 2), (1, 4), (2, 2), (4, 4)):
            pm.MEGA_INNER, pm.MEGA_TAIL_INNER = fwd_inner, tail_inner
            l2, g2 = jax.value_and_grad(_loss)(params, *args, "mega")
            np.testing.assert_allclose(float(l2), float(l1),
                                       rtol=1e-6, atol=1e-8)
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)
        # non-dividing sub-tile shapes fall back to a single pass
        pm.MEGA_INNER, pm.MEGA_TAIL_INNER = 1, 3
        l3, g3 = jax.value_and_grad(_loss)(params, *args, "mega")
        np.testing.assert_allclose(float(l3), float(l1), rtol=1e-6,
                                   atol=1e-8)
        del g3
    finally:
        pm.MEGA_INNER, pm.MEGA_TAIL_INNER = saved


def test_mega_inner_non_pow2_factor_matches():
    """Non-power-of-2 sub-tile factors engage whenever the sub-tile stays
    a 128-multiple (e.g. factor 3 at T=1152 -> 384). This is the shape
    class the realistic corpus pad E=1408 = 11 x 128 needs (its only
    valid factor is 11), exercised here at an interpreter-affordable
    size."""
    from immunostruct_tpu.ops import pallas_mega as pm
    saved = (pm.MEGA_INNER, pm.MEGA_TAIL_INNER)
    try:
        params, *args = _toy(b=2, e=1152, seed=7)
        pm.MEGA_INNER, pm.MEGA_TAIL_INNER = 1, 1
        l1, g1 = jax.value_and_grad(_loss)(params, *args, "mega")
        pm.MEGA_INNER, pm.MEGA_TAIL_INNER = 3, 3
        l2, g2 = jax.value_and_grad(_loss)(params, *args, "mega")
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6,
                                   atol=1e-8)
        # tolerance covers the reordered-f32-add roundoff of the longer
        # (11-deep at this shape class) accumulation chains: measured
        # single-element deviations of ~6e-6 abs / 6e-5 rel; real bugs
        # show O(1) mismatches across many elements
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    finally:
        pm.MEGA_INNER, pm.MEGA_TAIL_INNER = saved


def _toy_paired(b=3, n=24, e=256, seed=11):
    """Toy batch satisfying the v9 mirror-pair invariant:
    edges[k + e/2] == reverse(edges[k]), padding mirrored (MEGA_PAIRED,
    ops/pallas_mega.py). Arc indices are drawn src != dst (no self
    loops, like real contact graphs)."""
    rng = np.random.default_rng(seed)
    half = e // 2
    src0 = rng.integers(0, n, (b, half)).astype(np.int32)
    dst0 = (src0 + rng.integers(1, n, (b, half)).astype(np.int32)) % n
    esrc = jnp.asarray(np.concatenate([src0, dst0], axis=1))
    edst = jnp.asarray(np.concatenate([dst0, src0], axis=1))
    emask0 = rng.random((b, half)) > 0.25
    emask = jnp.asarray(np.concatenate([emask0, emask0], axis=1))
    # mirror arcs share the edge attribute (all-ones in the pipeline,
    # structs.py GraphBatch doc) — mirrored here for exact parity
    ef0 = rng.standard_normal((b, half, 1)).astype(np.float32)
    efeat = jnp.asarray(np.concatenate([ef0, ef0], axis=1))
    h = jnp.asarray(rng.standard_normal((b, n, 20)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    params = eg.egnn_stack_init(jax.random.key(seed), 3, 20, 64)
    return params, h, x, esrc, edst, efeat, emask


def test_mega_paired_matches_production_and_onehot():
    """v9 MEGA_PAIRED on a mirror-paired batch must match the production
    mega kernel AND the XLA onehot path for loss and every gradient —
    the residuals it writes feed the UNCHANGED hybrid backward."""
    from immunostruct_tpu.ops import pallas_mega as pm
    params, *args = _toy_paired()
    saved = pm.MEGA_PAIRED
    try:
        pm.MEGA_PAIRED = False
        l_prod, g_prod = jax.value_and_grad(_loss)(params, *args, "mega")
        l_one, _ = jax.value_and_grad(_loss)(params, *args, "onehot")
        pm.MEGA_PAIRED = True
        l_pair, g_pair = jax.value_and_grad(_loss)(params, *args, "mega")
    finally:
        pm.MEGA_PAIRED = saved
    np.testing.assert_allclose(float(l_pair), float(l_prod),
                               rtol=5e-6, atol=1e-7)
    np.testing.assert_allclose(float(l_pair), float(l_one),
                               rtol=5e-4, atol=5e-5)
    ref_scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_prod))
    for a, b in zip(jax.tree.leaves(g_prod), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4 * ref_scale)


def test_mega_paired_falls_back_on_unpairable_shapes():
    """E/2 not a 128-multiple (the E=1408 class) or odd E: the paired
    call must fall back to the production kernel, not crash."""
    from immunostruct_tpu.ops import pallas_mega as pm
    params, *args = _toy(b=2, e=384, seed=13)   # 384/2 = 192: no tile
    saved = pm.MEGA_PAIRED
    try:
        pm.MEGA_PAIRED = False
        l_prod = float(_loss(params, *args, "mega"))
        pm.MEGA_PAIRED = True
        l_fall = float(_loss(params, *args, "mega"))
    finally:
        pm.MEGA_PAIRED = saved
    np.testing.assert_allclose(l_fall, l_prod, rtol=1e-6, atol=1e-8)
