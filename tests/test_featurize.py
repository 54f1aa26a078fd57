"""Featurizer tests: PDB parsing, edge rules, native-vs-numpy parity,
directory pipeline with fault tolerance, join-key compatibility."""

import os

import numpy as np
import pytest

from immunostruct_tpu.featurize import (
    parse_pdb_ca, build_edges, EdgeConfig, featurize_pdb, featurize_directory,
)
from immunostruct_tpu.featurize.builder import node_features, SUBGRAPH_POSITIONS
from immunostruct_tpu.featurize.native import native_available, native_featurize
from immunostruct_tpu.data.encoding import AA3_TO_1, RESIDUE_ONEHOT_INDEX

RES3 = list(AA3_TO_1.keys())


def write_pdb(path, resnames, coords, chains=None, resnums=None):
    chains = chains or ["A"] * len(resnames)
    resnums = resnums if resnums is not None else list(range(1, len(resnames) + 1))
    with open(path, "w") as f:
        serial = 1
        for i, (res, xyz) in enumerate(zip(resnames, coords)):
            # N atom line first to check CA filtering
            f.write(f"ATOM  {serial:5d}  N   {res} {chains[i]}{resnums[i]:4d}    "
                    f"{xyz[0]:8.3f}{xyz[1] + 1:8.3f}{xyz[2]:8.3f}  1.00  0.00           N\n")
            serial += 1
            f.write(f"ATOM  {serial:5d}  CA  {res} {chains[i]}{resnums[i]:4d}    "
                    f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}  1.00  0.00           C\n")
            serial += 1
        f.write("END\n")


def helix_coords(n, spacing=3.8):
    t = np.arange(n)
    return np.stack([np.cos(t) * 2, np.sin(t) * 2, t * spacing * 0.4], -1).astype(np.float32)


class TestParse:
    def test_parse_ca(self, tmp_path, rng):
        n = 10
        resnames = [RES3[i % 20] for i in range(n)]
        coords = helix_coords(n)
        path = str(tmp_path / "t.pdb")
        write_pdb(path, resnames, coords)
        ca = parse_pdb_ca(path)
        assert len(ca) == n
        np.testing.assert_allclose(ca.coords, coords, atol=1e-3)
        assert ca.resnames == resnames

    def test_duplicate_residue_kept_once(self, tmp_path):
        path = str(tmp_path / "d.pdb")
        coords = helix_coords(3)
        write_pdb(path, ["ALA", "ALA", "GLY"], coords, resnums=[1, 1, 2])
        ca = parse_pdb_ca(path)
        assert len(ca) == 2  # first CA per residue number wins


class TestEdges:
    def test_peptide_bonds_always_connect(self):
        coords = helix_coords(5) * 100  # far apart spatially
        names = ["GLY"] * 5
        ei = build_edges(coords, names, np.arange(1, 6), ["A"] * 5)
        pairs = set(map(tuple, ei.T.tolist()))
        for i in range(4):
            assert (i, i + 1) in pairs and (i + 1, i) in pairs

    def test_no_peptide_bond_across_chains(self):
        coords = helix_coords(2) * 100
        ei = build_edges(coords, ["GLY", "GLY"], np.asarray([1, 2]), ["A", "B"])
        assert ei.shape[1] == 0

    def test_hydrophobic_edge(self):
        coords = np.asarray([[0, 0, 0], [4.0, 0, 0], [20, 0, 0]], np.float32)
        names = ["LEU", "VAL", "ILE"]
        ei = build_edges(coords, names, np.asarray([1, 5, 9]), ["A"] * 3)
        pairs = set(map(tuple, ei.T.tolist()))
        assert (0, 1) in pairs       # 4.0 < 5.0
        assert (1, 2) not in pairs   # 16 > 5.0

    def test_ionic_requires_opposite_charge(self):
        coords = np.asarray([[0, 0, 0], [5.0, 0, 0]], np.float32)
        ei = build_edges(coords, ["ARG", "ASP"], np.asarray([1, 5]), ["A"] * 2)
        assert ei.shape[1] == 2      # ARG(+) / ASP(-) within 6
        ei2 = build_edges(coords, ["ARG", "LYS"], np.asarray([1, 5]), ["A"] * 2)
        assert ei2.shape[1] == 0     # same charge: no ionic edge

    def test_hbond_sulfur_threshold(self):
        coords = np.asarray([[0, 0, 0], [3.8, 0, 0]], np.float32)
        # CYS-SER: sulfur side -> 4.0 threshold, 3.8 connects
        ei = build_edges(coords, ["CYS", "SER"], np.asarray([1, 5]), ["A"] * 2)
        assert ei.shape[1] == 2
        # SER-THR: 3.5 threshold, 3.8 does not connect
        ei2 = build_edges(coords, ["SER", "THR"], np.asarray([1, 5]), ["A"] * 2)
        assert ei2.shape[1] == 0


class TestNodeFeatures:
    def test_onehot_layout(self):
        x = node_features(["ALA", "TYR", "UNK"])
        assert x.shape == (3, 22)
        assert x[0, RESIDUE_ONEHOT_INDEX["A"]] == 1
        assert x[1, RESIDUE_ONEHOT_INDEX["Y"]] == 1
        assert x[2, :20].sum() == 0  # unknown -> zero one-hot (MASK parity)
        # ARG has 3 donors
        assert node_features(["ARG"])[0, 20] == 3


class TestFeaturizePDB:
    def test_subgraph_filter(self, tmp_path):
        # residues 1..5, then 200..204 (dropped), then 273..277
        resnums = list(range(1, 6)) + list(range(200, 205)) + list(range(273, 278))
        n = len(resnums)
        path = str(tmp_path / "s.pdb")
        write_pdb(path, ["GLY"] * n, helix_coords(n), resnums=resnums)
        name, x, coords, ei = featurize_pdb(path, use_native=False)
        assert x.shape[0] == 10  # 5 + 5 kept
        assert all(rn in SUBGRAPH_POSITIONS for rn in resnums[:5])

    def test_name_from_filename(self, tmp_path):
        path = str(tmp_path / "fooImmunoKEY123.pdb")
        write_pdb(path, ["GLY"] * 4, helix_coords(4))
        name, *_ = featurize_pdb(path, use_native=False)
        assert name == "fooImmunoKEY123"

    @pytest.mark.skipif(not native_available(), reason="native lib not built")
    def test_native_matches_numpy(self, tmp_path, rng):
        n = 60
        resnames = [RES3[int(rng.integers(0, 20))] for _ in range(n)]
        coords = helix_coords(n) + rng.standard_normal((n, 3)).astype(np.float32)
        path = str(tmp_path / "p.pdb")
        write_pdb(path, resnames, coords)

        name_n, x_n, c_n, ei_n = featurize_pdb(path, use_native=True)
        name_p, x_p, c_p, ei_p = featurize_pdb(path, use_native=False)
        np.testing.assert_allclose(c_n, c_p, atol=1e-3)
        np.testing.assert_array_equal(x_n, x_p)
        assert set(map(tuple, ei_n.T.tolist())) == set(map(tuple, ei_p.T.tolist()))

    def test_directory_pipeline_with_bad_file(self, tmp_path):
        src = tmp_path / "pdbs"
        out = tmp_path / "graphs"
        src.mkdir()
        for i in range(3):
            write_pdb(str(src / f"okImmuno{i}.pdb"), ["GLY"] * 5, helix_coords(5))
        (src / "brokenImmunoX.pdb").write_bytes(b"\x00\xff garbage\n" * 3)
        written = featurize_directory(str(src), str(out), workers=2,
                                      use_native=False)
        assert len(written) == 3 or len(written) == 4  # garbage may parse to 0 CAs
        # graphs are loadable by the corpus loader
        from immunostruct_tpu.data.graphs import load_graph_dir
        corpus = load_graph_dir(str(out))
        assert len(corpus) >= 1

    def test_join_key_roundtrip(self, tmp_path):
        """A graph featurized from an HLA+peptide chain joins with the
        table-side expand_hla key when the PDB filename carries the key."""
        from immunostruct_tpu.data.tables import get_hash
        hla = "".join(["GAVLIMFWP"[i % 9] for i in range(48)])
        pep = "ACDEFGHIK"
        chain = hla + pep
        key = chain[-99:] + "_" + get_hash(chain)[:5]
        resnames = [{v: k for k, v in AA3_TO_1.items()}[c] for c in chain]
        path = str(tmp_path / f"xImmuno{key}.pdb")
        write_pdb(path, resnames, helix_coords(len(chain)))
        name, x, coords, ei = featurize_pdb(path, use_native=False)
        from immunostruct_tpu.data.graphs import graph_key_from_name
        assert graph_key_from_name(name) == key
