"""Multi-host simulation: 2 real processes x 4 virtual CPU devices form one
8-device global mesh (gloo collectives across the process boundary — the
DCN analog), run one comparative DP train step, and must agree bitwise-ish
with the same step on a single-process 8-device mesh.

Also pins shard_indices_for_process disjointness/coverage (the host-side
DistributedSampler replacement, parallel/mesh.py).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from immunostruct_tpu.parallel.mesh import shard_indices_for_process

pytestmark = pytest.mark.slow  # excluded from the core lane (-m 'not slow')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestShardIndices:
    def test_disjoint_and_covering(self):
        idx = np.random.default_rng(0).permutation(64)
        parts = [shard_indices_for_process(idx, pi, 4) for pi in range(4)]
        all_idx = np.concatenate(parts)
        assert len(all_idx) == 64
        assert len(set(all_idx.tolist())) == 64  # disjoint + covering

    def test_remainder_dropped_equally(self):
        idx = np.arange(10)
        parts = [shard_indices_for_process(idx, pi, 4) for pi in range(4)]
        assert all(len(p) == 2 for p in parts)
        flat = set(np.concatenate(parts).tolist())
        assert len(flat) == 8  # 2 dropped, no duplicates

    def test_tiny_dataset_identity(self):
        idx = np.arange(3)
        np.testing.assert_array_equal(
            shard_indices_for_process(idx, 1, 4), idx)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single_process():
    """Spawn 2 real processes; their global-mesh DP step loss must match a
    single-process 8-device run of the identical step (same seeds/batch)."""
    port = _free_port()
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)  # + TP shard_map compile
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    losses, tp_losses, pp_losses = [], [], []
    for i, (p, out) in enumerate(zip(procs, outs)):
        m = re.search(r"MULTIHOST_LOSS=([-\d.]+)", out)
        assert p.returncode == 0 and m, f"worker {i} failed:\n{out[-3000:]}"
        losses.append(float(m.group(1)))
        mtp = re.search(r"MULTIHOST_TP_LOSS=([-\d.]+)", out)
        assert mtp, f"worker {i} missing TP leg:\n{out[-3000:]}"
        tp_losses.append(float(mtp.group(1)))
        mpp = re.search(r"MULTIHOST_PP_LOSS=([-\d.]+)", out)
        assert mpp, f"worker {i} missing PP leg:\n{out[-3000:]}"
        pp_losses.append(float(mpp.group(1)))
    assert losses[0] == pytest.approx(losses[1], abs=1e-9)
    # TP x DP leg: model axis within-process, data axis across processes;
    # each worker already asserted TP==its own dense eval, here both
    # processes must agree on the global TP loss
    assert tp_losses[0] == pytest.approx(tp_losses[1], abs=1e-9)
    # GPipe leg: pipe axis spans the process boundary (stage 3 -> 4 hop
    # rides gloo); each worker asserted PP==dense full-batch loss, here
    # both processes must agree on the global pipeline loss
    assert pp_losses[0] == pytest.approx(pp_losses[1], abs=1e-9)

    # single-process reference on this process's 8 virtual devices
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.structs import SampleBatch, ComparativeBatch
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import constant_lr

    mesh = make_mesh("data")
    batch_size, nodes, edges, seq_len = 16, 16, 64, 32
    graph, seq, props = ge._example_inputs(batch_size, nodes, edges, seq_len,
                                           key_seed=7)
    target = jnp.asarray((np.arange(batch_size) % 2).astype(np.float32))
    sample = SampleBatch(graph=graph, seq_onehot=seq, props=props,
                         target=target, aux_residue=None)
    cbatch = ComparativeBatch(cancer=sample, wt=sample)

    spec, params = build_model("HybridModelv2_Comparative", seq_len * 21,
                               jax.random.key(0), use_wt_for_downstream=True)
    trainer = Trainer(spec, LossConfig(seq_len * 21, 1.0, sequence=True),
                      binary=True,
                      optimizer=make_optimizer("adamw", constant_lr(1e-3),
                                               weight_decay=1e-6),
                      coeff_contrastive=0.1, aggregation="onehot",
                      donate=False)
    state = trainer.init_state(params, jax.random.key(2))
    state = replicate_tree(state, mesh)
    _, loss = trainer._train_step(state, shard_batch(cbatch, mesh),
                                  jax.random.key(3))
    assert losses[0] == pytest.approx(float(loss), rel=2e-5)
