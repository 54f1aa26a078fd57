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


def _edge_set(path, use_native):
    _, _, _, ei = featurize_pdb(path, use_native=use_native)
    return set(map(tuple, ei.T.tolist()))


def _both_paths(path):
    """Edge sets from the numpy rules and (when built) the C++ kernel."""
    sets = [_edge_set(path, use_native=False)]
    if native_available():
        sets.append(_edge_set(path, use_native=True))
    return sets


class TestGoldenBoundary:
    """Per-edge-type golden fixtures at boundary distances (VERDICT r1 #5):
    hand-constructed PDBs where the documented rule (featurize/edges.py,
    graphein's thresholds evaluated at CA granularity) has a derivable
    answer, pinned through BOTH the numpy rules and the C++ kernel.
    Residue numbers are spaced >1 apart so no peptide bond can mask a
    distance-rule failure. PARITY.md 'Featurizer edge rules' records the
    per-type criteria and the known CA-vs-atomic granularity caveat."""

    def _fixture(self, tmp_path, tag, resnames, xs, resnums=None):
        coords = np.asarray([[x, 0.0, 0.0] for x in xs], np.float32)
        path = str(tmp_path / f"{tag}.pdb")
        write_pdb(path, resnames, coords,
                  resnums=resnums or [10 * (i + 1) for i in range(len(xs))])
        return path

    def test_hbond_donor_acceptor_boundary(self, tmp_path):
        # SER(donor+acceptor) - THR(donor+acceptor): 3.45 < 3.5 connects
        p_in = self._fixture(tmp_path, "hb_in", ["SER", "THR"], [0.0, 3.45])
        # 3.55 > 3.5 does not
        p_out = self._fixture(tmp_path, "hb_out", ["SER", "THR"], [0.0, 3.55])
        for s in _both_paths(p_in):
            assert s == {(0, 1), (1, 0)}
        for s in _both_paths(p_out):
            assert s == set()

    def test_hbond_needs_donor_and_acceptor(self, tmp_path):
        # ARG and LYS are donor-only: no H-bond even at 3.0 A (and no ionic:
        # both positive; not hydrophobic; not consecutive)
        p = self._fixture(tmp_path, "dd", ["ARG", "LYS"], [0.0, 3.0])
        for s in _both_paths(p):
            assert s == set()
        # ASP and GLU are acceptor-only: likewise nothing at 3.0 A
        p2 = self._fixture(tmp_path, "aa", ["ASP", "GLU"], [0.0, 3.0])
        for s in _both_paths(p2):
            assert s == set()

    def test_hbond_sulfur_boundary(self, tmp_path):
        # CYS carries S: threshold relaxes to 4.0 (CYS donor+acceptor)
        p_in = self._fixture(tmp_path, "s_in", ["CYS", "SER"], [0.0, 3.95])
        p_out = self._fixture(tmp_path, "s_out", ["CYS", "SER"], [0.0, 4.05])
        for s in _both_paths(p_in):
            assert s == {(0, 1), (1, 0)}
        for s in _both_paths(p_out):
            assert s == set()

    def test_hydrophobic_boundary(self, tmp_path):
        p_in = self._fixture(tmp_path, "hp_in", ["LEU", "VAL"], [0.0, 4.95])
        p_out = self._fixture(tmp_path, "hp_out", ["LEU", "VAL"], [0.0, 5.05])
        for s in _both_paths(p_in):
            assert s == {(0, 1), (1, 0)}
        for s in _both_paths(p_out):
            assert s == set()

    def test_hydrophobic_needs_both_sides(self, tmp_path):
        # LEU-GLY at 4.0: GLY not hydrophobic; GLY/LEU have no donor or
        # acceptor capability -> no edge at all
        p = self._fixture(tmp_path, "hp_one", ["LEU", "GLY"], [0.0, 4.0])
        for s in _both_paths(p):
            assert s == set()

    def test_ionic_boundary(self, tmp_path):
        p_in = self._fixture(tmp_path, "io_in", ["LYS", "GLU"], [0.0, 5.95])
        p_out = self._fixture(tmp_path, "io_out", ["LYS", "GLU"], [0.0, 6.05])
        for s in _both_paths(p_in):
            assert s == {(0, 1), (1, 0)}
        for s in _both_paths(p_out):
            assert s == set()

    def test_ionic_his_counts_positive(self, tmp_path):
        # HIS is in graphein's positive set; HIS(donor+acceptor himself) and
        # ASP(acceptor): at 5.0 A only the ionic rule fires (hbond needs
        # < 3.5)
        p = self._fixture(tmp_path, "io_his", ["HIS", "ASP"], [0.0, 5.0])
        for s in _both_paths(p):
            assert s == {(0, 1), (1, 0)}

    def test_peptide_bond_requires_consecutive_numbering(self, tmp_path):
        # same chain, resnums 10 and 12: spatially adjacent GLYs but a
        # numbering gap -> no peptide bond (and GLY has no other rule)
        p = self._fixture(tmp_path, "pb_gap", ["GLY", "GLY"], [0.0, 3.8],
                          resnums=[10, 12])
        for s in _both_paths(p):
            assert s == set()
        # consecutive numbering connects regardless of distance
        p2 = self._fixture(tmp_path, "pb_far", ["GLY", "GLY"], [0.0, 80.0],
                           resnums=[10, 11])
        for s in _both_paths(p2):
            assert s == {(0, 1), (1, 0)}

    def test_multi_rule_union(self, tmp_path):
        """Rules union into one undirected edge set: TYR-TYR at 3.4 is both
        an H-bond (donor+acceptor both sides) and hydrophobic -> exactly one
        edge pair, not duplicates."""
        p = self._fixture(tmp_path, "union", ["TYR", "TYR"], [0.0, 3.4])
        for s in _both_paths(p):
            assert s == {(0, 1), (1, 0)}


class TestAtomicGranularity:
    """edge_granularity='atomic': interaction distances measured between the
    actual interacting ATOMS (as graphein does on all-atom PDBs), mapped to
    residue-level edges — fixtures place sidechain atoms close while CAs
    stay far, so 'ca' and 'atomic' provably differ."""

    def _write_atoms(self, path, records):
        """records: list of (atom_name, resname, resnum, (x,y,z))."""
        with open(path, "w") as f:
            for i, (an, rn, num, xyz) in enumerate(records, 1):
                f.write(f"ATOM  {i:5d}  {an:<4s}{rn} A{num:4d}    "
                        f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}"
                        f"  1.00  0.00           {an[0]}\n")
            f.write("END\n")

    def _edges(self, path, granularity):
        """Edge set from the numpy path, asserted identical to the C++
        kernel when it is built."""
        cfg = EdgeConfig(granularity=granularity)
        _, _, _, ei = featurize_pdb(path, edge_config=cfg, use_native=False)
        got = set(map(tuple, ei.T.tolist()))
        if native_available():
            _, _, _, ei_n = featurize_pdb(path, edge_config=cfg, use_native=True)
            assert set(map(tuple, ei_n.T.tolist())) == got, granularity
        return got

    def test_sidechain_hbond_found_only_by_atomic(self, tmp_path):
        # SER OG and TYR OH 3.0 A apart; CAs 8 A apart (resnums spaced
        # so no peptide bond; TYR alone is hydrophobic, SER is not)
        path = str(tmp_path / "hb.pdb")
        self._write_atoms(path, [
            ("CA", "SER", 10, (0.0, 0.0, 0.0)),
            ("OG", "SER", 10, (2.5, 0.0, 0.0)),
            ("CA", "TYR", 20, (8.0, 0.0, 0.0)),
            ("OH", "TYR", 20, (5.5, 0.0, 0.0)),
        ])
        assert self._edges(path, "ca") == set()
        assert self._edges(path, "atomic") == {(0, 1), (1, 0)}

    def test_backbone_hbond(self, tmp_path):
        # backbone N...O at 2.9 A between GLY residues (no sidechains):
        # atomic mode finds the classic backbone H-bond
        path = str(tmp_path / "bb.pdb")
        self._write_atoms(path, [
            ("CA", "GLY", 10, (0.0, 0.0, 0.0)),
            ("N", "GLY", 10, (1.5, 0.0, 0.0)),
            ("CA", "GLY", 20, (7.0, 0.0, 0.0)),
            ("O", "GLY", 20, (4.4, 0.0, 0.0)),
        ])
        assert self._edges(path, "ca") == set()
        assert self._edges(path, "atomic") == {(0, 1), (1, 0)}

    def test_hydrophobic_rgroup_carbons_only(self, tmp_path):
        # LEU CD1 and VAL CG1 4.5 A apart, CAs 9 A apart -> atomic edge;
        # backbone carbons (CA) at the same distance must NOT count
        path = str(tmp_path / "hp.pdb")
        self._write_atoms(path, [
            ("CA", "LEU", 10, (0.0, 0.0, 0.0)),
            ("CD1", "LEU", 10, (2.5, 0.0, 0.0)),
            ("CA", "VAL", 20, (9.0, 0.0, 0.0)),
            ("CG1", "VAL", 20, (7.0, 0.0, 0.0)),
        ])
        assert self._edges(path, "ca") == set()
        assert self._edges(path, "atomic") == {(0, 1), (1, 0)}
        # same geometry but only backbone atoms: nothing
        path2 = str(tmp_path / "hp2.pdb")
        self._write_atoms(path2, [
            ("CA", "LEU", 10, (0.0, 0.0, 0.0)),
            ("CA", "VAL", 20, (4.5, 0.0, 0.0)),
        ])
        assert self._edges(path2, "atomic") == set()
        # (CA mode, by design, DOES connect these: documented divergence)
        assert self._edges(path2, "ca") == {(0, 1), (1, 0)}

    def test_ionic_charged_atoms(self, tmp_path):
        # LYS NZ to GLU OE1 at 5.5 A, CAs 12 A apart
        path = str(tmp_path / "io.pdb")
        self._write_atoms(path, [
            ("CA", "LYS", 10, (0.0, 0.0, 0.0)),
            ("NZ", "LYS", 10, (3.5, 0.0, 0.0)),
            ("CA", "GLU", 20, (12.0, 0.0, 0.0)),
            ("OE1", "GLU", 20, (9.0, 0.0, 0.0)),
        ])
        assert self._edges(path, "ca") == set()
        assert self._edges(path, "atomic") == {(0, 1), (1, 0)}
        # NZ-OE1 at 6.5 A: outside threshold. NZ is also an H-bond donor
        # and OE1 an acceptor, but 6.5 > 3.5 so nothing fires.
        path2 = str(tmp_path / "io2.pdb")
        self._write_atoms(path2, [
            ("CA", "LYS", 10, (0.0, 0.0, 0.0)),
            ("NZ", "LYS", 10, (2.5, 0.0, 0.0)),
            ("CA", "GLU", 20, (12.0, 0.0, 0.0)),
            ("OE1", "GLU", 20, (9.0, 0.0, 0.0)),
        ])
        assert self._edges(path2, "atomic") == set()

    def test_peptide_bonds_unchanged_in_atomic_mode(self, tmp_path):
        path = str(tmp_path / "pb.pdb")
        self._write_atoms(path, [
            ("CA", "GLY", 10, (0.0, 0.0, 0.0)),
            ("CA", "GLY", 11, (50.0, 0.0, 0.0)),
        ])
        assert self._edges(path, "atomic") == {(0, 1), (1, 0)}

    @pytest.mark.skipif(not native_available(), reason="native lib not built")
    def test_native_atomic_matches_numpy_randomized(self, tmp_path, rng):
        """Fuzz parity: random all-atom structures through both atomic
        implementations must agree exactly."""
        pool = ["N", "CA", "C", "O", "CB", "CG", "CD1", "NE", "NH1", "NZ",
                "OD1", "OE1", "OG", "OG1", "OH", "SD", "SG", "ND2", "NE2"]
        for trial in range(5):
            records = []
            num = 0
            for r in range(12):
                num += int(rng.integers(1, 3))
                res = RES3[int(rng.integers(0, 20))]
                base = rng.uniform(0, 15, 3)
                for an in ("N", "CA", "C", "O"):
                    records.append((an, res, num,
                                    tuple(base + rng.uniform(-1, 1, 3))))
                for _ in range(int(rng.integers(0, 4))):
                    an = pool[int(rng.integers(0, len(pool)))]
                    records.append((an, res, num,
                                    tuple(base + rng.uniform(-3, 3, 3))))
            path = str(tmp_path / f"fuzz{trial}.pdb")
            self._write_atoms(path, records)
            cfg = EdgeConfig(granularity="atomic")
            _, _, _, ei_p = featurize_pdb(path, edge_config=cfg, use_native=False)
            _, _, _, ei_n = featurize_pdb(path, edge_config=cfg, use_native=True)
            assert (set(map(tuple, ei_p.T.tolist()))
                    == set(map(tuple, ei_n.T.tolist()))), trial
