"""Parity tests for the whole-stack EGNN kernel (interpret mode).

ops/experimental/pallas_stack.py runs the ENTIRE conv stack in one Pallas program
(one-hots built once, h/x resident in VMEM between layers) and must
match the per-layer paths — same math, different residency — for
forward values and gradients wrt every parameter and input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.ops import egnn as eg
from immunostruct_tpu.ops.experimental import pallas_stack as ps

from tests.test_pallas_mega import _toy, _loss


pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

@pytest.fixture(autouse=True)
def _enable_stack():
    """The stack kernel is a measured negative result, default OFF
    (ps.STACK_ENABLE docstring) — parity coverage forces it on."""
    saved = ps.STACK_ENABLE
    ps.STACK_ENABLE = True
    yield
    ps.STACK_ENABLE = saved


def test_stack_path_is_selected():
    """At the toy shapes the 'mega' aggregation resolves to the stack."""
    assert ps.stack_supported(128, 24, 64, 3, 1)
    assert not ps.stack_supported(100, 24, 64, 3, 1)   # non-128-multiple
    assert not ps.stack_supported(128, 24, 64, 1, 1)   # single layer
    assert not ps.stack_supported(128, 24, 64, 3, 2)   # edge_feat size
    ps.STACK_ENABLE = False
    assert not ps.stack_supported(128, 24, 64, 3, 1)   # default gate
    ps.STACK_ENABLE = True


def test_stack_matches_onehot_forward_and_grads():
    params, *args = _toy()
    l_one, g_one = jax.value_and_grad(_loss)(params, *args, "onehot")
    l_stk, g_stk = jax.value_and_grad(_loss)(params, *args, "mega")
    assert np.isfinite(float(l_stk))
    np.testing.assert_allclose(float(l_stk), float(l_one),
                               rtol=5e-4, atol=5e-5)
    ref_scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_one))
    for a, b in zip(jax.tree.leaves(g_one), jax.tree.leaves(g_stk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3 * ref_scale)


def test_stack_matches_per_layer_mega():
    """Stack kernel vs the per-layer mega path (STACK_ENABLE=False):
    identical op order per layer, so the agreement should be tight."""
    params, *args = _toy(seed=21)
    saved = ps.STACK_ENABLE
    try:
        ps.STACK_ENABLE = False
        l_per, g_per = jax.value_and_grad(_loss)(params, *args, "mega")
        ps.STACK_ENABLE = True
        l_stk, g_stk = jax.value_and_grad(_loss)(params, *args, "mega")
    finally:
        ps.STACK_ENABLE = saved
    np.testing.assert_allclose(float(l_stk), float(l_per),
                               rtol=1e-5, atol=1e-7)
    ref_scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_per))
    for a, b in zip(jax.tree.leaves(g_per), jax.tree.leaves(g_stk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4 * ref_scale)


def test_stack_grad_wrt_inputs_matches():
    params, h, x, esrc, edst, efeat, emask = _toy(seed=5)

    def loss_hx(h, x, agg):
        return _loss(params, h, x, esrc, edst, efeat, emask, agg)

    gh1, gx1 = jax.grad(loss_hx, argnums=(0, 1))(h, x, "onehot")
    gh2, gx2 = jax.grad(loss_hx, argnums=(0, 1))(h, x, "mega")
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-3, atol=1e-4)


def test_stack_bf16_close_to_f32():
    params, h, x, esrc, edst, efeat, emask = _toy(seed=13)
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    l32 = _loss(params, h, x, esrc, edst, efeat, emask, "mega")
    l16 = _loss(cast(params), cast(h), cast(x), esrc, edst,
                cast(efeat), emask, "mega")
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)


def test_stack_fallback_on_unsupported_shapes():
    """Shapes the stack kernel can't take fall through to the per-layer
    paths without error (here: non-128-multiple edge pad)."""
    import warnings
    params, h, x, esrc, edst, efeat, emask = _toy(e=100, seed=11)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        l = _loss(params, h, x, esrc, edst, efeat, emask, "mega")
    assert np.isfinite(float(l))
