"""Data-parallel training over a named mesh.

Two equivalent formulations are provided:

1. ``make_sharded_trainer`` — the idiomatic path: a normal ``Trainer`` whose
   batches are placed with a batch-axis NamedSharding and whose state is
   replicated; ``jax.jit`` partitions the program and inserts the gradient
   all-reduce (GSPMD). Zero changes to the step function.

2. ``shard_map_train_step`` — the explicit-SPMD path: per-shard loss/grad
   with a hand-written ``pmean`` over the data axis, for cases where manual
   control of collective placement matters (and as an executable spec of
   what GSPMD does). Loss semantics note: a pmean of per-shard mean losses
   equals the global batch mean only when shards are equally sized, which
   the shard_batch contract guarantees.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import optax
from jax.sharding import Mesh
from jax import shard_map
from jax.sharding import PartitionSpec as P

from immunostruct_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate_tree,
)
from immunostruct_tpu.procedures.train import Trainer, TrainState
from immunostruct_tpu.utils.losses import LossConfig


def make_sharded_trainer(spec, loss_cfg: LossConfig, *, binary: bool,
                         optimizer: optax.GradientTransformation,
                         mesh: Optional[Mesh] = None, axis_name: str = "data",
                         **trainer_kwargs) -> Trainer:
    """Trainer whose batches are sharded over the mesh's data axis."""
    mesh = mesh if mesh is not None else make_mesh(axis_name)

    trainer = Trainer(spec, loss_cfg, binary=binary, optimizer=optimizer,
                      mesh=mesh,
                      shard_batch=partial(shard_batch, mesh=mesh, axis_name=axis_name),
                      **trainer_kwargs)

    init_state_plain = trainer.init_state

    def init_state(params, rng=None) -> TrainState:
        state = init_state_plain(params, rng)
        return replicate_tree(state, mesh)

    trainer.init_state = init_state
    return trainer


def shard_map_train_step(trainer: Trainer, mesh: Mesh, axis_name: str = "data",
                         reduce: str = "psum"):
    """Explicit-SPMD train step: per-shard grads + mean-reduce over the data
    axis.

    Returns a jitted (state, batch, rng) -> (state, loss) function. The batch
    must be sharded with ``shard_batch`` (equal shard sizes).

    ``reduce``: 'psum' uses XLA's all-reduce; 'ring' uses the hand-written
    ring schedule from parallel/collectives.py (same numerics up to float
    reassociation) — manual control of collective placement, and the hook
    point for custom overlap schedules.
    """
    from immunostruct_tpu.parallel.collectives import ring_pmean

    mean_reduce = (ring_pmean if reduce == "ring"
                   else lambda x, ax: jax.lax.pmean(x, ax))

    def per_shard(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        # decorrelate dropout/reparam noise across shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        loss, grads = jax.value_and_grad(trainer._batch_loss)(
            state.params, batch, rng, False)
        grads = jax.tree.map(lambda g: mean_reduce(g, axis_name), grads)
        loss = mean_reduce(loss, axis_name)
        updates, opt_state = trainer.optimizer.update(grads, state.opt_state,
                                                      state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    replicated = P()
    batch_spec = P(axis_name)

    def specs_like(tree, spec):
        return jax.tree.map(lambda _: spec, tree,
                            is_leaf=lambda x: x is None)

    def step(state, batch, rng):
        fn = shard_map(
            per_shard, mesh=mesh,
            in_specs=(specs_like(state, replicated),
                      specs_like(batch, batch_spec),
                      replicated),
            out_specs=(specs_like(state, replicated), replicated),
            check_vma=False,
        )
        return fn(state, batch, rng)

    return jax.jit(step)


def make_mp_train_step(trainer: Trainer, mesh: Mesh,
                       data_axis: Optional[str] = None):
    """Model-parallel (TP and/or PP) full train step for the REAL model.

    ``trainer`` must carry an MPConfig (trainer.mp, parallel/mp.py) whose
    axis names exist in ``mesh``; ``data_axis`` additionally shards the
    batch (TP x DP / PP x DP). The per-shard forward runs inside one
    ``shard_map`` over the whole mesh — the VAE Megatron pair's psums and
    the GPipe ppermutes resolve against the named axes — while
    differentiation and the optimizer run OUTSIDE the shard_map on the
    replicated params, so weight-gradient reassembly across model shards
    falls out of the shard_map transpose (the pattern pinned by
    tests/test_tensor_parallel.py::test_tp_dp_2d_mesh_with_grads).

    Returns a jitted (state, batch, rng) -> (state, loss) step.
    """
    assert trainer.mp is not None, "trainer must be built with mp=MPConfig(...)"

    replicated = P()
    batch_spec = P(data_axis) if data_axis else P()

    def specs_like(tree, spec):
        return jax.tree.map(lambda _: spec, tree,
                            is_leaf=lambda x: x is None)

    def loss_fn(params, batch, rng):
        def inner(p, b, r):
            if data_axis:
                # decorrelate dropout/reparam noise across data shards
                r = jax.random.fold_in(r, jax.lax.axis_index(data_axis))
            loss = trainer._batch_loss(p, b, r, False)
            if data_axis:
                loss = jax.lax.pmean(loss, data_axis)
            return loss

        fn = shard_map(inner, mesh=mesh,
                       in_specs=(specs_like(params, replicated),
                                 specs_like(batch, batch_spec), replicated),
                       out_specs=replicated, check_vma=False)
        return fn(params, batch, rng)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = trainer.optimizer.update(grads, state.opt_state,
                                                      state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return jax.jit(step)
