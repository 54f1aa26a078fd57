"""Determinism + fault-tolerance: identical seeds give bitwise-identical
training traces; interrupted stages resume where they left off."""

import jax
import numpy as np

from immunostruct_tpu.config import Config
from immunostruct_tpu.data import synthetic_corpus, ImmunoDataset, BatchPipeline
from immunostruct_tpu.models import build_model
from immunostruct_tpu.procedures.train import Trainer, make_optimizer
from immunostruct_tpu.utils.losses import LossConfig
from immunostruct_tpu.utils.schedule import constant_lr


def _setup(tmp_path, n=16):
    cfg = Config(batch_size=8, num_epochs=2, pad_nodes_multiple=4,
                 pad_edges_multiple=16, compute_dtype="float32",
                 aggregation="scatter", model="SequenceFpModel",
                 sequence_loss=True)
    gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=n, seed=51)
    ds = ImmunoDataset.load(cfg, gd, pp, hp)
    vae_dim = ds.seq_pep.shape[1] * 21
    spec, params = build_model(cfg.model, vae_dim, jax.random.key(0))
    loss_cfg = LossConfig(vae_dim, 1.0, sequence=True)
    mk = lambda split: BatchPipeline(ds, np.arange(n), split=split, binary=True,
                                     full=False, config=cfg)
    return cfg, spec, params, loss_cfg, mk


def _fit(cfg, spec, params, loss_cfg, mk, epochs=2, resume_path=None):
    trainer = Trainer(spec, loss_cfg, binary=True,
                      optimizer=make_optimizer("adam", constant_lr(1e-3)),
                      aggregation="scatter", donate=False)
    state = trainer.init_state(params)
    return trainer.fit(state, mk("train"), mk("val"), epochs,
                       jax.random.key(7), verbose=False,
                       resume_path=resume_path)


def test_same_seed_identical_trace(tmp_path):
    cfg, spec, params, loss_cfg, mk = _setup(tmp_path)
    _, h1 = _fit(cfg, spec, params, loss_cfg, mk)
    _, h2 = _fit(cfg, spec, params, loss_cfg, mk)
    np.testing.assert_array_equal(h1["train_loss"], h2["train_loss"])
    np.testing.assert_array_equal(h1["val_loss"], h2["val_loss"])


def test_resume_continues_training(tmp_path):
    from immunostruct_tpu.utils.checkpoint import save_resume_state
    import os
    cfg, spec, params, loss_cfg, mk = _setup(tmp_path)
    resume = str(tmp_path / "resume.ckpt")

    # simulate a crash after epoch 0 of a 2-epoch run: run 1 epoch, then
    # write the snapshot a crashed run would have left behind
    state1, h1 = _fit(cfg, spec, params, loss_cfg, mk, epochs=1)
    save_resume_state(resume, state1, epoch=0, best_val=h1["val_loss"][0])

    # resumed run does only the remaining epoch and continues the step count
    state2, h2 = _fit(cfg, spec, params, loss_cfg, mk, epochs=2,
                      resume_path=resume)
    assert len(h2["train_loss"]) == 1  # only epoch 1 ran
    assert int(state2.step) == 2 * int(state1.step)
    # completed stage cleans up its snapshot (two-pretrain-stage curricula
    # share checkpoint paths; stale snapshots must not short-circuit them)
    assert not os.path.exists(resume)

    # full uninterrupted run for comparison: resumed params match bitwise
    # (same per-epoch rng streams, same batch order)
    state3, h3 = _fit(cfg, spec, params, loss_cfg, mk, epochs=2)
    for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(state3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
