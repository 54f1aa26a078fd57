"""Data-layer tests: encoding, tables, joins, pipelines, splits."""

import numpy as np
import pandas as pd
import pytest

from immunostruct_tpu.config import Config
from immunostruct_tpu.data import (
    AMINO_ACIDS, PADDING_CHAR, pad_sequence, one_hot_encode, one_hot_encode_batch,
    get_hash, parse_property_table, dedup_property_df, expand_hla,
    load_graph_dir, ImmunoDataset, ComparativeDataset, ClinicalDataset,
    seeded_split, BatchPipeline, ComparativePipeline,
    synthetic_corpus, synthetic_comparative_corpus, synthetic_clinical_corpus,
)


def small_config(**kw):
    cfg = Config(batch_size=8, pad_nodes_multiple=4, pad_edges_multiple=16, **kw)
    return cfg


class TestEncoding:
    def test_pad(self):
        assert pad_sequence("ACD", 6) == "ACDJJJ"
        assert pad_sequence("ACDEFG", 6) == "ACDEFG"

    def test_one_hot(self):
        enc = one_hot_encode("AJ")
        assert enc.shape == (2, 21)
        assert enc[0, 0] == 1 and enc[0].sum() == 1
        assert enc[1, 20] == 1  # 'J' is last channel

    def test_one_hot_unknown_is_zero_row(self):
        enc = one_hot_encode("AZB")  # Z, B unknown
        assert enc[1].sum() == 0 and enc[2].sum() == 0

    def test_batch(self):
        out = one_hot_encode_batch(["ACD", "A"], 4)
        assert out.shape == (2, 4, 21)
        assert out[1, 1, 20] == 1  # padded with J


class TestTables:
    def test_hash_stable(self):
        assert get_hash("abc") == "a9993e364706816aba3e25717850c26c9cd0d89d"

    def test_parse_iedb(self, tmp_path):
        df = pd.DataFrame({
            "peptide": ["AAA", "CCC", "DDD"],
            "allele": ["HLA-A*01:01"] * 3,
            "Foreignness_Score": [0.1, np.nan, 0.3],
            "smoothed_foreign": [0.1, 0.2, 0.3],
            "Mprop1": [1.0, 2.0, 3.0], "Mprop2": [4.0, 5.0, 6.0],
            "immunogenicity": [0, 1, 1],
        })
        p = tmp_path / "iedb.tsv"
        df.to_csv(p, sep="\t", index=False)
        f, fp2, imm, pairs = parse_property_table(str(p), cancer=False)
        assert pairs == ["AAAHLA-A*01:01", "DDDHLA-A*01:01"]  # NaN row dropped
        assert fp2["AAAHLA-A*01:01"] == (1.0, 4.0)
        assert imm["DDDHLA-A*01:01"] == 1

    def test_parse_cancer_allele_reformat(self, tmp_path):
        df = pd.DataFrame({
            "mut_pep": ["AAA"], "allele": ["HLA-A0201"],
            "foreign": [0.5], "smoothed_foreign": [0.5],
            "Mprop1": [1.0], "Mprop2": [2.0], "immunogenicity": [1],
        })
        p = tmp_path / "cancer.tsv"
        df.to_csv(p, sep="\t", index=False)
        _, _, _, pairs = parse_property_table(str(p), cancer=True)
        assert pairs == ["AAAHLA-A*02:01"]

    def test_dedup_rule(self):
        df = pd.DataFrame({
            "mut_pep": ["A", "A", "B", "B"], "wt_pep": ["a", "a", "b", "b"],
            "allele": ["x", "x", "y", "y"], "immunogenicity": [1, 1, 0, 0],
            "smoothed_foreign": [0.2, 0.9, 0.3, 0.1],
        })
        out = dedup_property_df(df)
        assert len(out) == 2
        # immunogenic keeps max foreignness; non-immunogenic keeps min
        assert out[out.mut_pep == "A"].smoothed_foreign.item() == 0.9
        assert out[out.mut_pep == "B"].smoothed_foreign.item() == 0.1

    def test_expand_hla(self, tmp_path):
        hla = pd.DataFrame({"allele": ["HLA-A*01:01"], "seqs": ["M" * 120]})
        p = tmp_path / "hla.csv"
        hla.to_csv(p, index=False)
        mapper = expand_hla(["PEPHLA-A*01:01"], str(p))
        chain, key, pep = mapper["PEPHLA-A*01:01"]
        assert chain == "M" * 120 + "PEP"
        assert pep == "PEP"
        assert key == chain[-99:] + "_" + get_hash(chain)[:5]

    def test_expand_hla_friendly_errors(self, tmp_path):
        hla = pd.DataFrame({"allele": ["HLA-A*01:01"], "seqs": ["M" * 120]})
        p = tmp_path / "hla.csv"
        hla.to_csv(p, index=False)
        import pytest
        with pytest.raises(ValueError, match="no 'HLA-' allele part"):
            expand_hla(["PEPH-2-Kb"], str(p))  # non-human allele, no prefix
        with pytest.raises(ValueError, match="not in .*hla.csv"):
            expand_hla(["PEPHLA-B*07:02"], str(p))  # missing from the table


class TestSplit:
    def test_split_fractions(self):
        tr, va, te = seeded_split(100, (0.8, 0.1, 0.1), seed=1)
        assert len(tr) == 80 and len(va) == 10 and len(te) == 10
        assert len(set(tr) | set(va) | set(te)) == 100

    def test_split_matches_torch_random_split(self):
        torch = pytest.importorskip("torch")
        got = seeded_split(50, (0.8, 0.1, 0.1), seed=7)
        g = torch.Generator().manual_seed(7)
        want = torch.utils.data.random_split(list(range(50)), [0.8, 0.1, 0.1], g)
        for mine, theirs in zip(got, want):
            assert sorted(mine.tolist()) == sorted(theirs.dataset[i] for i in theirs.indices)


class TestSyntheticEndToEnd:
    def test_immuno_dataset(self, tmp_path):
        gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=16, seed=1)
        cfg = small_config()
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        assert len(ds) > 0
        assert ds.seq_full.shape[0] == len(ds)
        assert ds.foreign_norm.min() >= -1.0 and ds.foreign_norm.max() <= 1.0
        # denormalize round-trips
        raw = ds.denormalize(ds.foreign_norm)
        assert raw.min() >= ds.foreign_min - 1e-5
        assert raw.max() <= ds.foreign_max + 1e-5
        # graphs aligned and padded to multiples
        assert ds.graphs.node_onehot.shape[1] % 4 == 0
        assert ds.graphs.edge_src.shape[1] % 16 == 0

    def test_pipeline_batches(self, tmp_path):
        gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=16, seed=2)
        cfg = small_config()
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        tr, va, te = seeded_split(len(ds), (0.8, 0.1, 0.1), cfg.seed)
        pipe = BatchPipeline(ds, tr, split="train", binary=False, full=True, config=cfg)
        batches = list(pipe.epoch(0))
        assert sum(b.target.shape[0] for b in batches) == len(tr)
        b0 = batches[0]
        assert b0.seq_onehot.ndim == 3 and b0.props.shape[1] == 2
        assert b0.graph.node_feat.shape[0] == b0.target.shape[0]
        # binary pipeline selects immunogenicity targets
        pipe_b = BatchPipeline(ds, tr, split="train", binary=True, full=True, config=cfg)
        tb = np.concatenate([np.asarray(b.target) for b in pipe_b.epoch(0)])
        assert set(np.unique(tb)) <= {0.0, 1.0}

    def test_pipeline_shuffle_determinism(self, tmp_path):
        gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=16, seed=3)
        cfg = small_config()
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        idx = np.arange(len(ds))
        p1 = BatchPipeline(ds, idx, split="train", binary=False, full=True, config=cfg)
        p2 = BatchPipeline(ds, idx, split="train", binary=False, full=True, config=cfg)
        t1 = np.concatenate([np.asarray(b.target) for b in p1.epoch(0)])
        t2 = np.concatenate([np.asarray(b.target) for b in p2.epoch(0)])
        np.testing.assert_array_equal(t1, t2)
        t3 = np.concatenate([np.asarray(b.target) for b in p1.epoch(1)])
        assert not np.array_equal(t1, t3)

    def test_ssl_masking(self, tmp_path):
        gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=8, seed=4)
        cfg = small_config()
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        idx = np.arange(len(ds))
        pipe = BatchPipeline(ds, idx, split="train", binary=False, full=True,
                             config=cfg, ssl=True)
        b = next(iter(pipe.epoch(0)))
        aux = np.asarray(b.aux_residue)
        assert aux.shape == (len(ds),)
        nf = np.asarray(b.graph.node_feat)
        # exactly one all-ones row per graph
        allones = (nf.sum(-1) == 20).sum(-1)
        assert (allones == 1).all()
        # masked class matches recorded class? all-ones row destroys argmax,
        # so check the class is a valid amino index
        assert (aux >= 0).all() and (aux < 20).all()
        # val split gives -1 sentinel
        pv = BatchPipeline(ds, idx, split="val", binary=False, full=True,
                           config=cfg, ssl=True)
        bv = next(iter(pv.epoch(0)))
        assert (np.asarray(bv.aux_residue) == -1).all()

    def test_sequence_masking(self, tmp_path):
        gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=8, seed=5)
        cfg = small_config(sequence_pad_count=3)
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        idx = np.arange(len(ds))
        pipe = BatchPipeline(ds, idx, split="train", binary=False, full=True, config=cfg)
        b = next(iter(pipe.epoch(0)))
        seq = np.asarray(b.seq_onehot)
        ml = pipe.maskable_len
        # at least 3 J-channel positions in the HLA region per row
        j_hits = (seq[:, :ml, 20] == 1).sum(-1)
        assert (j_hits >= 3).all()

    def test_extend_to(self, tmp_path):
        gd, pp, hp = synthetic_corpus(str(tmp_path), num_samples=8, seed=6)
        cfg = small_config()
        ds = ImmunoDataset.load(cfg, gd, pp, hp)
        pipe = BatchPipeline(ds, np.arange(len(ds)), split="train", binary=True,
                             full=True, config=cfg, extend_to=40)
        total = sum(b.target.shape[0] for b in pipe.epoch(0))
        assert total == 40

    def test_comparative_dataset_and_pipeline(self, tmp_path):
        dc, dw, pc, pw, hp = synthetic_comparative_corpus(str(tmp_path), num_samples=12, seed=7)
        cfg = small_config()
        ds = ComparativeDataset.load(cfg, dc, dw, pc, pw, hp)
        assert len(ds) > 0
        # WT labels forced 0; WT foreignness = min constant, which is -1.0
        # under the cancer-side normalization the reference applies
        # class-wide (immmunopred_dataloader.py:182-183, :208-214), and the
        # WT denormalize bounds are the cancer side's single (min, max)
        assert (ds.wt.immuno == 0).all()
        np.testing.assert_allclose(ds.wt.foreign_norm, -1.0, atol=1e-6)
        assert ds.wt.foreign_min == ds.cancer.foreign_min
        assert ds.wt.foreign_max == ds.cancer.foreign_max
        pipe = ComparativePipeline(ds, np.arange(len(ds)), split="train",
                                   binary=True, full=True, config=cfg)
        b = next(iter(pipe.epoch(0)))
        assert b.cancer.seq_onehot.shape == b.wt.seq_onehot.shape
        np.testing.assert_array_equal(np.asarray(b.cancer.target), np.asarray(b.wt.target))

    def test_comparative_ssl_same_class_masked(self, tmp_path):
        dc, dw, pc, pw, hp = synthetic_comparative_corpus(str(tmp_path), num_samples=8, seed=8)
        cfg = small_config()
        ds = ComparativeDataset.load(cfg, dc, dw, pc, pw, hp)
        pipe = ComparativePipeline(ds, np.arange(len(ds)), split="train",
                                   binary=False, full=True, config=cfg, ssl=True)
        b = next(iter(pipe.epoch(0)))
        nc = np.asarray(b.cancer.graph.node_feat)
        nw = np.asarray(b.wt.graph.node_feat)
        assert ((nc.sum(-1) == 20).sum(-1) <= 1).all()
        assert ((nw.sum(-1) == 20).sum(-1) <= 1).all()

    def test_clinical_dataset(self, tmp_path):
        gd, sp, cp = synthetic_clinical_corpus(str(tmp_path), num_rows=20, seed=9)
        cfg = small_config()
        ds = ClinicalDataset.load(cfg, gd, sp)
        assert len(ds) == 20
        assert ds.valid.sum() > 0 and (~ds.valid).sum() > 0
        # invalid rows have NaN props
        assert np.isnan(ds.props[~ds.valid]).all()
        assert not np.isnan(ds.props[ds.valid]).any()


def test_comparative_duplicate_wt_pairs_stay_aligned(tmp_path):
    """Two cancer mutants sharing one WT peptide+allele must yield TWO
    aligned comparative rows (reference keeps one WT row per combined-table
    row) — regression for the dict-dedup misalignment the real cedar corpus
    exposed (2,710 rows vs 2,686 unique WT pep_pairs)."""
    import pandas as pd
    from immunostruct_tpu.data.graphs import save_graph_npz
    from immunostruct_tpu.data.tables import expand_hla
    from immunostruct_tpu.data import ComparativeDataset
    from immunostruct_tpu.config import Config

    hla = "".join("ACDEFGHIKLMNPQRSTVWY"[i % 20] for i in range(30))
    hla_path = tmp_path / "hla.csv"
    pd.DataFrame({"allele": ["HLA-A*02:01"], "seqs": [hla]}).to_csv(
        hla_path, index=False)

    rows = dict(
        mut_pep=["SIINFEKLV", "SIINFEKLA"],   # two mutants ...
        wt_pep=["SIINFEKLL", "SIINFEKLL"],    # ... one shared WT
        allele=["HLA-A0201", "HLA-A0201"],
        foreign=[0.5, 0.7], smoothed_foreign=[0.5, 0.7],
        Mprop1=[0.1, 0.2], Mprop2=[0.3, 0.4], immunogenicity=[1, 0],
    )
    cancer_path = tmp_path / "cancer.tsv"
    pd.DataFrame(rows).to_csv(cancer_path, sep="\t", index=False)
    wt = dict(rows)
    wt["Mprop1_wt"] = [0.5, 0.6]
    wt["Mprop2_wt"] = [0.7, 0.8]
    wt_path = tmp_path / "wt.tsv"
    pd.DataFrame(wt).to_csv(wt_path, sep="\t", index=False)

    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    pairs = [p + "HLA-A*02:01" for p in
             ("SIINFEKLV", "SIINFEKLA", "SIINFEKLL")]
    rng = np.random.default_rng(0)
    for pair, (chain, key, pep) in expand_hla(pairs, str(hla_path)).items():
        n = len(chain)
        x = np.zeros((n, 22), np.float32)
        x[np.arange(n), rng.integers(0, 20, n)] = 1.0
        save_graph_npz(str(graph_dir / f"{key}.npz"), name=f"Immuno{key}",
                       x=x, coords=rng.standard_normal((n, 3)).astype(np.float32),
                       edge_index=np.stack([np.arange(n - 1), np.arange(1, n)]).astype(np.int32))

    cfg = Config()
    ds = ComparativeDataset.load(cfg, str(graph_dir), str(graph_dir),
                                 str(cancer_path), str(wt_path), str(hla_path))
    assert len(ds) == 2
    assert len(ds.wt) == 2
    # both WT rows reference the same graph, with per-row alignment intact
    assert ds.wt.raw_chain[0] == ds.wt.raw_chain[1] == hla + "SIINFEKLL"
    assert ds.cancer.raw_chain[0] != ds.cancer.raw_chain[1]
    np.testing.assert_array_equal(np.asarray(ds.wt.immuno), [0.0, 0.0])


class TestFailFastGuards:
    """Round-5 review fixes: loud errors instead of late/silent failures."""

    def test_nan_foreignness_raises(self):
        # the reference dropnas on 'foreign'/'Foreignness_Score' but READS
        # 'smoothed_foreign' (preprocess.py:50-59); a NaN there would
        # silently poison the min-max normalization — we raise instead
        from immunostruct_tpu.data.dataset import _normalize_foreignness
        with pytest.raises(ValueError, match="NaN"):
            _normalize_foreignness(np.array([0.1, np.nan, 0.5], np.float32))

    def test_check_seq_dims(self):
        import types
        from immunostruct_tpu.cli.common import check_seq_dims

        mk = lambda lf, lp=9: types.SimpleNamespace(
            seq_full=np.zeros((3, lf, 21), np.float32),
            seq_pep=np.zeros((3, lp, 21), np.float32))
        check_seq_dims(10 * 21, True, a=mk(10), b=None)  # match + None: ok
        with pytest.raises(ValueError, match="sequence-dim mismatch"):
            check_seq_dims(10 * 21, True, a=mk(10), late=mk(12))
        with pytest.raises(ValueError, match="comparative.wt"):
            check_seq_dims(
                10 * 21, True,
                comparative=types.SimpleNamespace(cancer=mk(10), wt=mk(12)))
        # peptide mode reads seq_pep
        check_seq_dims(9 * 21, False, a=mk(99, lp=9))
        with pytest.raises(ValueError, match="peptides"):
            check_seq_dims(9 * 21, False, a=mk(99, lp=11))
