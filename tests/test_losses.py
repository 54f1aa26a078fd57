"""Loss-formula parity tests (reference: utils/loss.py, utils/contrastive.py)
plus resume-snapshot behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immunostruct_tpu.utils.losses import (
    LossConfig, regression_loss, bce_loss, pos_weight_from_counts,
)
from immunostruct_tpu.utils.contrastive import (
    paired_contrastive_init, paired_contrastive_loss,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestLossFormulas:
    def test_regression_weights(self, rng):
        """2*MSE(pred,y) + 0.5*recon-MSE + 0.5*KLD (loss.py:13-21)."""
        b, d = 6, 10
        cfg = LossConfig(d, pos_weight=1.0, sequence=True)
        recon = rng.standard_normal((b, d)).astype(np.float32)
        x = rng.standard_normal((b, d)).astype(np.float32)
        mu = rng.standard_normal((b, 3)).astype(np.float32)
        logvar = rng.standard_normal((b, 3)).astype(np.float32)
        pred = rng.standard_normal((b, 1)).astype(np.float32)
        y = rng.standard_normal((b,)).astype(np.float32)

        got = float(regression_loss(cfg, jnp.asarray(recon), jnp.asarray(x),
                                    jnp.asarray(mu), jnp.asarray(logvar),
                                    jnp.asarray(pred), jnp.asarray(y)))
        reg = np.mean((pred.reshape(-1) - y) ** 2)
        mse = np.mean((recon - x) ** 2)
        kld = -0.5 * np.mean(1 + logvar - mu ** 2 - np.exp(logvar))
        assert got == pytest.approx(2 * reg + 0.5 * mse + 0.5 * kld, rel=1e-5)

        cfg2 = LossConfig(d, 1.0, sequence=False)
        got2 = float(regression_loss(cfg2, None, None, None, None,
                                     jnp.asarray(pred), jnp.asarray(y)))
        assert got2 == pytest.approx(reg, rel=1e-5)

    def test_bce_pos_weight(self, rng):
        """5*weighted-BCE + 0.1*recon + 0.1*KLD with pos_weight=N_neg/N_pos."""
        b, d = 8, 6
        w = 3.0
        cfg = LossConfig(d, pos_weight=w, sequence=False)
        logits = rng.standard_normal((b,)).astype(np.float32)
        y = (rng.random(b) > 0.5).astype(np.float32)
        got = float(bce_loss(cfg, None, None, None, None,
                             jnp.asarray(logits), jnp.asarray(y)))
        p = _sigmoid(logits)
        want = np.mean(-(w * y * np.log(p) + (1 - y) * np.log(1 - p)))
        assert got == pytest.approx(want, rel=1e-4)

    def test_pos_weight_from_counts(self):
        from collections import Counter
        assert pos_weight_from_counts(Counter({0.0: 30, 1.0: 10})) == 3.0

    def test_ssl_term_ignores_sentinel(self, rng):
        b = 5
        cfg = LossConfig(4, 1.0, sequence=False, ssl=True)
        pred = rng.standard_normal((b, 1)).astype(np.float32)
        y = rng.standard_normal((b,)).astype(np.float32)
        node_logits = jnp.asarray(rng.standard_normal((b, 20)).astype(np.float32))
        no_mask = jnp.full((b,), -1, jnp.int32)
        base = float(regression_loss(
            LossConfig(4, 1.0, sequence=False, ssl=False),
            None, None, None, None, jnp.asarray(pred), jnp.asarray(y)))
        got = float(regression_loss(cfg, None, None, None, None,
                                    jnp.asarray(pred), jnp.asarray(y),
                                    node_logits=node_logits, residue=no_mask))
        assert got == pytest.approx(base, rel=1e-6)  # sentinel adds nothing
        with_mask = jnp.asarray(rng.integers(0, 20, b).astype(np.int32))
        got2 = float(regression_loss(cfg, None, None, None, None,
                                     jnp.asarray(pred), jnp.asarray(y),
                                     node_logits=node_logits, residue=with_mask))
        assert got2 > base  # cross-entropy term active


class TestContrastive:
    def _embs(self, rng, b=8, d=16):
        return (jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)))

    def test_gate_continuous_targets(self, rng):
        params = paired_contrastive_init(jax.random.key(0), 16, 32)
        e_c, e_w = self._embs(rng)
        y = jnp.asarray(rng.random(8).astype(np.float32))  # continuous
        assert float(paired_contrastive_loss(params, e_c, e_w, y)) == 0.0

    def test_gate_single_class(self, rng):
        params = paired_contrastive_init(jax.random.key(0), 16, 32)
        e_c, e_w = self._embs(rng)
        y = jnp.ones((8,))
        assert float(paired_contrastive_loss(params, e_c, e_w, y)) == 0.0

    def test_active_on_mixed_binary(self, rng):
        params = paired_contrastive_init(jax.random.key(0), 16, 32)
        e_c, e_w = self._embs(rng)
        y = jnp.asarray(np.r_[np.ones(4), np.zeros(4)].astype(np.float32))
        loss = float(paired_contrastive_loss(params, e_c, e_w, y))
        assert loss > 0.0

    def test_grads_flow_to_projector(self, rng):
        params = paired_contrastive_init(jax.random.key(0), 16, 32)
        e_c, e_w = self._embs(rng)
        y = jnp.asarray(np.r_[np.ones(4), np.zeros(4)].astype(np.float32))

        def f(p):
            return paired_contrastive_loss(p, e_c, e_w, y)

        grads = jax.grad(f)(params)
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert total > 0.0


class TestResume:
    def test_resume_roundtrip(self, tmp_path, rng):
        import optax
        from immunostruct_tpu.procedures.train import TrainState
        from immunostruct_tpu.utils.checkpoint import (
            save_resume_state, load_resume_state,
        )
        params = {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))}
        opt = optax.adam(1e-3)
        state = TrainState(params=params, opt_state=opt.init(params),
                           step=jnp.asarray(7, jnp.int32))
        path = str(tmp_path / "resume.ckpt")
        save_resume_state(path, state, epoch=3, best_val=0.25)
        restored, next_epoch, best = load_resume_state(path, state)
        assert next_epoch == 4 and best == 0.25
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(params["w"]))
        assert int(restored.step) == 7

    def test_missing_snapshot_returns_none(self, tmp_path):
        from immunostruct_tpu.utils.checkpoint import load_resume_state
        assert load_resume_state(str(tmp_path / "nope.ckpt"), {}) is None
