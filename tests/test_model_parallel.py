"""TP/PP wired into the REAL flagship model (VERDICT round-2 item 3).

parallel/tensor.py previously proved the Megatron pair on toy MLPs and
parallel/pipeline.py GPipe on tanh stacks; here the same primitives drive
the actual ``HybridModelv2_Comparative`` forward via MPConfig
(parallel/mp.py) threaded through models/trunk.py:

- TP: VAE fc1 column-parallel -> fc21/fc22 row-parallel, fc3 column ->
  fc4 row (fc1+fc4 = ~96% of flagship params);
- PP: the 5 shape-homogeneous hidden EGNN convs as GPipe stages (padded
  with identity stages up to the pipe-axis size), edge data as gpipe aux.

Each configuration's full step (loss AND updated params) must match the
plain dense step on the 8-virtual-device CPU mesh. The VAE noise is
pinned (logvar == -80 => z = mu) and deterministic=True kills dropout, so
the comparison is noise-free and exact to f32 roundoff.

Compile-cost note: each sharded flagship step is a several-minute cold
XLA:CPU compile on this 1-core host (cached across runs in
tests/.jax_cache); the dense reference is computed once per spec and
shared by all configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

# the full TP/PP flagship steps are multi-minute cold compiles on the
# 8-virtual-device CPU mesh; the driver's dryrun_multichip exercises the
# same path every round, so the core lane can skip them
pytestmark = pytest.mark.slow
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from immunostruct_tpu.models import build_model
from immunostruct_tpu.parallel.mp import MPConfig
from immunostruct_tpu.parallel.trainer import make_mp_train_step
from immunostruct_tpu.procedures.train import Trainer, TrainState, make_optimizer
from immunostruct_tpu.structs import ComparativeBatch, SampleBatch
from immunostruct_tpu.utils.losses import LossConfig
from immunostruct_tpu.utils.schedule import constant_lr
from tests.test_models import tiny_graph_batch

B, N, E, L = 8, 24, 64, 12
VAE_DIM = L * 21
RNG = jax.random.key(3)


def _pin_noise(params):
    params = jax.tree.map(lambda x: x, params)  # deep copy
    params["vae"]["fc22"]["w"] = jnp.zeros_like(params["vae"]["fc22"]["w"])
    params["vae"]["fc22"]["b"] = jnp.full_like(params["vae"]["fc22"]["b"],
                                               -80.0)
    return params


def _make_trainer(spec, mp):
    return Trainer(spec, LossConfig(VAE_DIM, 1.0, sequence=True),
                   binary=True,
                   optimizer=make_optimizer("adam", constant_lr(1e-3)),
                   aggregation="scatter", donate=False, mp=mp)


def _comp_batch(seed=11):
    def half(seed2):
        r = np.random.default_rng(seed2)
        g = tiny_graph_batch(r, b=B, n=N, e=E)
        seq = jnp.asarray(r.random((B, L, 21)).astype(np.float32))
        props = jnp.asarray(r.random((B, 2)).astype(np.float32))
        tgt = jnp.asarray((r.random(B) > 0.5).astype(np.float32))
        return SampleBatch(graph=g, seq_onehot=seq, props=props, target=tgt,
                           aux_residue=None)

    return ComparativeBatch(cancer=half(seed), wt=half(seed + 1))


def _dense_step(trainer, params, batch, rng):
    """Plain full-precision step with the same noise-free loss."""
    loss, grads = jax.value_and_grad(
        lambda p: trainer._batch_loss(p, batch, rng, True))(params)
    updates, _ = trainer.optimizer.update(
        grads, trainer.optimizer.init(params), params)
    return loss, optax.apply_updates(params, updates)


def _mp_step_deterministic(trainer, mesh, data_axis):
    """make_mp_train_step variant with deterministic=True for exactness."""
    replicated = P()
    batch_spec = P(data_axis) if data_axis else P()

    def specs_like(tree, spec):
        return jax.tree.map(lambda _: spec, tree, is_leaf=lambda x: x is None)

    def loss_fn(params, batch, rng):
        def inner(p, b, r):
            loss = trainer._batch_loss(p, b, r, True)
            if data_axis:
                loss = jax.lax.pmean(loss, data_axis)
            return loss
        fn = shard_map(inner, mesh=mesh,
                       in_specs=(specs_like(params, replicated),
                                 specs_like(batch, batch_spec), replicated),
                       out_specs=replicated, check_vma=False)
        return fn(params, batch, rng)

    def step(params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, _ = trainer.optimizer.update(
            grads, trainer.optimizer.init(params), params)
        return loss, optax.apply_updates(params, updates)

    return step


def _assert_trees_close(a, b, rtol=2e-4, atol=2e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def batch():
    return _comp_batch()


@pytest.fixture(scope="module")
def dense_ref(batch):
    """One dense flagship step shared by every sharded configuration."""
    spec, params = build_model("HybridModelv2_Comparative", VAE_DIM,
                               jax.random.key(0))
    params = _pin_noise(params)
    trainer = _make_trainer(spec, None)
    loss, new_params = _dense_step(trainer, params, batch, RNG)
    return spec, params, loss, new_params


def test_tp_dp_flagship_full_step_matches_dense(batch, dense_ref):
    """TP x DP on a (2 data, 4 model) mesh: VAE Megatron-sharded inside the
    real comparative train step, batch sharded over data; loss + updated
    params match the dense step."""
    spec, params, l_d, p_d = dense_ref
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    trainer = _make_trainer(spec, MPConfig(tp_axis="model"))
    l_s, p_s = _mp_step_deterministic(trainer, mesh, "data")(
        params, batch, RNG)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=2e-5)
    _assert_trees_close(p_d, p_s)


def test_pp_flagship_full_step_matches_dense(batch, dense_ref):
    """GPipe over an 8-way 'pipe' axis: the flagship's 5 hidden EGNN convs
    + 3 identity pad stages, edge data as aux; full step matches dense."""
    spec, params, l_d, p_d = dense_ref
    mesh = Mesh(np.asarray(jax.devices()), ("pipe",))
    trainer = _make_trainer(spec, MPConfig(pp_axis="pipe",
                                           pp_microbatches=4))
    l_s, p_s = _mp_step_deterministic(trainer, mesh, None)(
        params, batch, RNG)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=2e-5)
    _assert_trees_close(p_d, p_s)


def test_tp_pp_dp_flagship_full_step_matches_dense(batch):
    """All three axes at once on a (2 data, 2 model, 2 pipe) mesh. The
    hidden EGNN stack is cut to 2 convs (pad_pipeline_stages requires
    stages >= layers and the pipe axis here is 2)."""
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2, 2),
                ("data", "model", "pipe"))
    mp = MPConfig(tp_axis="model", pp_axis="pipe", pp_microbatches=2)
    spec, params = build_model("HybridModelv2_Comparative", VAE_DIM,
                               jax.random.key(0), gcn_layers=2)
    params = _pin_noise(params)
    batch = _comp_batch(seed=21)
    trainer_mp, trainer_dense = _make_trainer(spec, mp), _make_trainer(spec, None)
    l_d, p_d = _dense_step(trainer_dense, params, batch, RNG)
    l_s, p_s = _mp_step_deterministic(trainer_mp, mesh, "data")(
        params, batch, RNG)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=2e-5)
    _assert_trees_close(p_d, p_s)


def test_mp_train_step_runs(batch, dense_ref):
    """The production make_mp_train_step (train-mode rng, jitted, optimizer
    inside) runs and produces a finite loss + changed params."""
    spec, params, _, _ = dense_ref
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    trainer = _make_trainer(spec, MPConfig(tp_axis="model"))
    step = make_mp_train_step(trainer, mesh, data_axis="data")
    state = TrainState(params=params,
                       opt_state=trainer.optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    state2, loss = step(state, batch, jax.random.key(7))
    assert np.isfinite(float(loss))
    before = jax.tree.leaves(params)[0]
    after = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
