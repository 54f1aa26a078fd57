"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md section 4):
sharded-vs-single-device equivalence, explicit collectives, shard_map step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from immunostruct_tpu.config import Config
from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset, BatchPipeline
from immunostruct_tpu.models import build_model
from immunostruct_tpu.parallel import (
    make_mesh, shard_batch, replicate_tree, psum, pmean, all_gather,
    ppermute_ring, make_sharded_trainer, shard_map_train_step,
)
from immunostruct_tpu.procedures.train import Trainer, make_optimizer
from immunostruct_tpu.utils.losses import LossConfig, pos_weight_from_counts
from immunostruct_tpu.utils.schedule import constant_lr


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh("data")


class TestCollectives:
    def test_psum_pmean(self, mesh):
        def f(x):
            return psum(x), pmean(x)

        x = jnp.arange(8.0)
        fn = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=(P(), P()))
        total, mean = fn(x)
        assert float(total[0]) == 28.0
        assert float(mean[0]) == 3.5

    def test_all_gather(self, mesh):
        def f(x):
            return all_gather(x)

        x = jnp.arange(8.0)
        fn = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
        out = fn(x)
        # every shard holds the full vector -> output is 8 concatenated copies
        assert out.shape == (64,)
        np.testing.assert_allclose(np.asarray(out[:8]), np.arange(8.0))

    def test_ppermute_ring(self, mesh):
        def f(x):
            return ppermute_ring(x, shift=1)

        x = jnp.arange(8.0)
        fn = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
        out = np.asarray(fn(x))
        np.testing.assert_allclose(out, np.roll(np.arange(8.0), 1))

    @pytest.mark.parametrize("shape", [(), (5,), (8,), (3, 7), (16, 9)])
    def test_ring_all_reduce_matches_psum(self, mesh, shape, rng):
        """The hand-written ring schedule == XLA's all-reduce for scalars,
        non-divisible sizes, and multi-dim tensors."""
        from immunostruct_tpu.parallel.collectives import ring_all_reduce

        per_shard = rng.standard_normal((8,) + shape).astype(np.float32)

        def f(x):
            x = x.reshape(shape)  # drop the leading shard axis
            return ring_all_reduce(x)[None], psum(x)[None]

        fn = shard_map(jax.jit(f), mesh=mesh, in_specs=P("data"),
                       out_specs=(P("data"), P("data")))
        ring, ref = fn(jnp.asarray(per_shard))
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ring)[0],
                                   per_shard.sum(0), rtol=1e-4, atol=1e-5)


def _setup(tmp_path, batch_size=16):
    cfg = Config(batch_size=batch_size, num_epochs=1, pad_nodes_multiple=4,
                 pad_edges_multiple=16, compute_dtype="float32",
                 aggregation="scatter", model="HybridModel",
                 full_sequence=True, sequence_loss=True,
                 model_save_dir=str(tmp_path / "ckpt"))
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=batch_size, seed=21)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    pipe = BatchPipeline(ds, np.arange(len(ds)), split="val", binary=False,
                         full=True, config=cfg, shuffle=False)
    batch = next(iter(pipe.epoch(0)))
    vae_dim = ds.seq_full.shape[1] * 21
    spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
    loss_cfg = LossConfig(vae_dim, pos_weight_from_counts(ds.class_weights),
                          sequence=True)
    return cfg, spec, params, loss_cfg, batch


class TestShardedTraining:
    def test_sharded_step_matches_single_device(self, tmp_path, mesh):
        """One DP train step over 8 shards == the same step on one device."""
        cfg, spec, params, loss_cfg, batch = _setup(tmp_path)
        opt = make_optimizer("adam", constant_lr(1e-3))

        single = Trainer(spec, loss_cfg, binary=False, optimizer=opt,
                         aggregation="scatter", donate=False)
        s_state = single.init_state(params)
        s_state, s_loss = single._train_step(s_state, batch, jax.random.key(3))

        sharded = make_sharded_trainer(spec, loss_cfg, binary=False,
                                       optimizer=opt, mesh=mesh,
                                       aggregation="scatter", donate=False)
        d_state = sharded.init_state(params)
        d_batch = shard_batch(batch, mesh)
        d_state, d_loss = sharded._train_step(d_state, d_batch, jax.random.key(3))

        assert float(d_loss) == pytest.approx(float(s_loss), rel=1e-5)
        for a, b in zip(jax.tree.leaves(s_state.params), jax.tree.leaves(d_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_shard_map_step_runs(self, tmp_path, mesh):
        """Explicit-SPMD step produces finite loss and updated params.

        Exact equality with the jit path is not expected: per-shard dropout/
        reparameterization keys are decorrelated by design."""
        cfg, spec, params, loss_cfg, batch = _setup(tmp_path)
        opt = make_optimizer("adam", constant_lr(1e-3))
        trainer = Trainer(spec, loss_cfg, binary=False, optimizer=opt,
                          aggregation="scatter", donate=False)
        state = replicate_tree(trainer.init_state(params), mesh)
        step = shard_map_train_step(trainer, mesh)
        batch = shard_batch(batch, mesh)
        new_state, loss = step(state, batch, jax.random.key(4))
        assert np.isfinite(float(loss))
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(state.params),
                            jax.tree.leaves(new_state.params)))
        assert changed
        assert int(new_state.step) == 1

    def test_shard_map_ring_reduce_matches_psum_step(self, tmp_path, mesh):
        """reduce='ring' and reduce='psum' produce the same loss and params
        (up to reassociation) from the same state/batch/rng."""
        cfg, spec, params, loss_cfg, batch = _setup(tmp_path)
        opt = make_optimizer("adam", constant_lr(1e-3))
        trainer = Trainer(spec, loss_cfg, binary=False, optimizer=opt,
                          aggregation="scatter", donate=False)
        state = replicate_tree(trainer.init_state(params), mesh)
        batch = shard_batch(batch, mesh)
        s1, l1 = shard_map_train_step(trainer, mesh, reduce="psum")(
            state, batch, jax.random.key(4))
        s2, l2 = shard_map_train_step(trainer, mesh, reduce="ring")(
            state, batch, jax.random.key(4))
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_fit_epoch_sharded(self, tmp_path, mesh):
        """A full sharded epoch via Trainer.fit with automatic batch placement."""
        cfg, spec, params, loss_cfg, _ = _setup(tmp_path)
        gd, pp, hp = synthetic_corpus(str(tmp_path / "d2"), num_samples=16, seed=22)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        pipe = BatchPipeline(ds, np.arange(16), split="train", binary=False,
                             full=True, config=cfg,
                             batch_size=16)  # divisible by 8 devices
        vae_dim = ds.seq_full.shape[1] * 21
        spec2, params2 = build_model(cfg.model, vae_dim, jax.random.key(1))
        loss_cfg2 = LossConfig(vae_dim, 1.0, sequence=True)
        opt = make_optimizer("adam", constant_lr(1e-3))
        trainer = make_sharded_trainer(spec2, loss_cfg2, binary=False,
                                       optimizer=opt, mesh=mesh,
                                       aggregation="scatter", donate=False)
        state = trainer.init_state(params2)
        state, hist = trainer.fit(state, pipe, pipe, 1, jax.random.key(0),
                                  verbose=False)
        assert np.isfinite(hist["train_loss"]).all()


class TestFusedUnderDP:
    def test_sharded_fused_step_matches_single_device(self, tmp_path, mesh):
        """The production TPU path (aggregation='fused', Pallas edge-program
        kernel, interpret mode here) composes with data parallelism: one DP
        step over 8 shards == the same step on one device."""
        cfg, spec, params, loss_cfg, batch = _setup(tmp_path)
        # re-pad edges to a 128 multiple so the Pallas path engages (the
        # tiny test corpus pads to 16s); masked pad edges are numerically
        # inert in every mode
        import dataclasses
        g = batch.graph
        e = g.edge_src.shape[1]
        pad = (-e) % 128
        g = dataclasses.replace(
            g,
            edge_src=jnp.pad(g.edge_src, ((0, 0), (0, pad))),
            edge_dst=jnp.pad(g.edge_dst, ((0, 0), (0, pad))),
            edge_feat=jnp.pad(g.edge_feat, ((0, 0), (0, pad), (0, 0))),
            edge_mask=jnp.pad(g.edge_mask, ((0, 0), (0, pad))))
        batch = dataclasses.replace(batch, graph=g)
        from immunostruct_tpu.ops.pallas_edge import pick_tile
        assert pick_tile(g.edge_src.shape[1]) > 0, \
            "corpus edge pad must exercise the fused path, not the fallback"
        opt = make_optimizer("adam", constant_lr(1e-3))

        single = Trainer(spec, loss_cfg, binary=False, optimizer=opt,
                         aggregation="fused", donate=False)
        s_state = single.init_state(params)
        s_state, s_loss = single._train_step(s_state, batch, jax.random.key(3))

        sharded = make_sharded_trainer(spec, loss_cfg, binary=False,
                                       optimizer=opt, mesh=mesh,
                                       aggregation="fused", donate=False)
        d_state = sharded.init_state(params)
        d_batch = shard_batch(batch, mesh)
        d_state, d_loss = sharded._train_step(d_state, d_batch,
                                              jax.random.key(3))

        assert float(d_loss) == pytest.approx(float(s_loss), rel=1e-5)
        for a, b in zip(jax.tree.leaves(s_state.params),
                        jax.tree.leaves(d_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)
