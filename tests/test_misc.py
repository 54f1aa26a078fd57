"""Small coverage gaps: tile picking, aggregation auto-resolution,
multi-host index sharding, distributed initialize no-op, config paths."""

import jax
import numpy as np
import pytest

from immunostruct_tpu.ops.experimental.pallas_segment import _pick_tile
from immunostruct_tpu.parallel.mesh import (
    shard_indices_for_process, initialize_distributed,
)
from immunostruct_tpu.config import Config, update_paths, sequence_input_dim


class TestTilePicking:
    def test_prefers_largest_divisor(self):
        assert _pick_tile(2560) == 512
        assert _pick_tile(256) == 256
        assert _pick_tile(384) == 128
        assert _pick_tile(100) == 0  # not 128-aligned -> caller falls back


class TestHostSharding:
    def test_even_split(self):
        idx = np.arange(16)
        shards = [shard_indices_for_process(idx, i, 4) for i in range(4)]
        assert all(len(s) == 4 for s in shards)
        assert sorted(np.concatenate(shards).tolist()) == list(range(16))

    def test_uneven_drops_remainder(self):
        idx = np.arange(10)
        shards = [shard_indices_for_process(idx, i, 4) for i in range(4)]
        assert all(len(s) == 2 for s in shards)

    def test_single_process_identity(self):
        idx = np.arange(7)
        np.testing.assert_array_equal(shard_indices_for_process(idx, 0, 1), idx)

    def test_initialize_noop_single_process(self):
        # single process without coordinator env: must not raise
        initialize_distributed()


class TestConfig:
    def test_root_expansion(self):
        cfg = Config(model_save_dir="$ROOT/results/")
        update_paths(cfg, root="/repo")
        assert cfg.model_save_dir == "/repo/results/"

    def test_derive_paths_encodes_hyperparams(self):
        cfg = Config(model="HybridModelv2", seed=3)
        cfg.derive_paths()
        assert "HybridModelv2" in cfg.model_save_path_pretrain
        assert "seed_3" in cfg.model_save_path_finetune
        assert cfg.model_save_path_pretrain.endswith("_pretrain.ckpt")

    def test_sequence_input_dim(self):
        assert sequence_input_dim(283, 11, True) == 283 * 21
        assert sequence_input_dim(283, 11, False) == 11 * 21


class TestEGNNAutoResolution:
    def test_auto_on_cpu_is_scatter(self, rng):
        """'auto' must resolve without error on the current platform."""
        import jax.numpy as jnp
        from immunostruct_tpu.ops.egnn import egnn_stack_init, egnn_stack_apply
        params = egnn_stack_init(jax.random.key(0), 1, 20, 8)
        h = jnp.asarray(rng.standard_normal((1, 6, 20)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((1, 6, 3)).astype(np.float32))
        src = jnp.zeros((1, 4), jnp.int32)
        dst = jnp.ones((1, 4), jnp.int32)
        out_h, out_x = egnn_stack_apply(params, h, x, src, dst,
                                        jnp.ones((1, 4, 1)), jnp.ones((1, 4), bool),
                                        aggregation="auto")
        assert np.isfinite(np.asarray(out_h)).all()


class TestMirrorPairEdgeIndex:
    """structs.mirror_pair_edge_index — the host canonicalizer for the
    v9 MEGA_PAIRED kernel layout (ops/pallas_mega.py)."""

    def test_pairs_symmetric_list(self):
        from immunostruct_tpu.structs import mirror_pair_edge_index
        rng = np.random.default_rng(0)
        s0 = rng.permutation(40)[:12]
        d0 = (s0 + 1 + rng.integers(0, 38, 12)) % 40
        keep = s0 != d0
        s0, d0 = s0[keep], d0[keep]
        # dedupe undirected duplicates before symmetrizing
        seen, arcs = set(), []
        for a, b in zip(s0, d0):
            k = (min(a, b), max(a, b))
            if k not in seen:
                seen.add(k)
                arcs.append((a, b))
        s0 = np.array([a for a, _ in arcs])
        d0 = np.array([b for _, b in arcs])
        ei = np.stack([np.concatenate([s0, d0]), np.concatenate([d0, s0])])
        ei = ei[:, rng.permutation(ei.shape[1])]   # scrambled arrival order
        out = mirror_pair_edge_index(ei)
        assert out is not None
        half = out.shape[1] // 2
        np.testing.assert_array_equal(out[0, half:], out[1, :half])
        np.testing.assert_array_equal(out[1, half:], out[0, :half])
        # same edge SET
        orig = {(a, b) for a, b in ei.T.tolist()}
        new = {(a, b) for a, b in out.T.tolist()}
        assert orig == new

    def test_rejects_unpairable(self):
        from immunostruct_tpu.structs import mirror_pair_edge_index
        # missing reverse arc
        assert mirror_pair_edge_index(np.array([[0, 1], [1, 2]])) is None
        # self loop
        assert mirror_pair_edge_index(
            np.array([[0, 1, 1, 0], [1, 0, 1, 1]])) is None
        # odd count
        assert mirror_pair_edge_index(np.array([[0], [1]])) is None
        # duplicate arc
        assert mirror_pair_edge_index(
            np.array([[0, 0, 1, 1], [1, 1, 0, 0]])) is None

    def test_featurizer_output_is_pairable(self):
        from immunostruct_tpu.structs import mirror_pair_edge_index
        from immunostruct_tpu.featurize.edges import build_edges
        rng = np.random.default_rng(3)
        n = 30
        coords = rng.standard_normal((n, 3)).astype(np.float64) * 4
        names = rng.choice(["ALA", "ARG", "ASP", "LEU", "SER", "CYS"], n)
        ei = build_edges(coords, list(names), np.arange(n),
                         ["A"] * n)
        if ei.shape[1]:
            assert mirror_pair_edge_index(ei) is not None

    def test_stack_paired_layout(self):
        from immunostruct_tpu.data.graphs import GraphCorpus
        rng = np.random.default_rng(5)
        graphs = []
        for g in range(3):
            nn = 10 + g
            s0 = np.array([0, 1, 2, 5]) % nn
            d0 = np.array([3, 4, 6, 7]) % nn
            ei = np.stack([np.concatenate([s0, d0]),
                           np.concatenate([d0, s0])]).astype(np.int32)
            ei = ei[:, rng.permutation(ei.shape[1])]
            graphs.append((np.eye(20, dtype=np.float32)[rng.integers(0, 20, nn)],
                           rng.standard_normal((nn, 3)).astype(np.float32), ei))
        corpus = GraphCorpus(keys=[f"g{i}" for i in range(3)],
                             node_onehot=[g[0] for g in graphs],
                             coords=[g[1] for g in graphs],
                             edge_index=[g[2] for g in graphs])
        arr = corpus.stack(paired=True)
        e = arr["edge_src"].shape[1]
        assert e % 256 == 0
        half = e // 2
        for i in range(3):
            mask = arr["edge_mask"][i]
            # mirrored mask and indices
            np.testing.assert_array_equal(mask[:half], mask[half:])
            real = mask[:half]
            np.testing.assert_array_equal(arr["edge_src"][i, half:][real],
                                          arr["edge_dst"][i, :half][real])
            np.testing.assert_array_equal(arr["edge_dst"][i, half:][real],
                                          arr["edge_src"][i, :half][real])
            # same undirected edge set as the unpaired stack
            plain = corpus.stack()
            pm_, pp = arr["edge_mask"][i], plain["edge_mask"][i]
            paired_set = {(a, b) for a, b in zip(
                arr["edge_src"][i][pm_], arr["edge_dst"][i][pm_])}
            plain_set = {(a, b) for a, b in zip(
                plain["edge_src"][i][pp], plain["edge_dst"][i][pp])}
            assert paired_set == plain_set
