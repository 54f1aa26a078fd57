"""Featurizer throughput: native C++ kernel vs pure-numpy path.

Generates synthetic AlphaFold-like PDBs (~460 residues: 370-residue HLA
chain + peptide, matching real pMHC structures before the subgraph filter)
and measures structures/second for both paths across worker counts.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.realpath(__file__))))

import numpy as np

from immunostruct_tpu.featurize import featurize_directory
from immunostruct_tpu.featurize.native import native_available

RES3 = ["ALA", "CYS", "ASP", "GLU", "PHE", "GLY", "HIS", "ILE", "LYS", "LEU",
        "MET", "ASN", "PRO", "GLN", "ARG", "SER", "THR", "VAL", "TRP", "TYR"]


def write_pdb(path, n_residues, rng):
    t = np.arange(n_residues)
    coords = np.stack([np.cos(t * 0.5) * 5, np.sin(t * 0.5) * 5, t * 1.5], -1)
    coords += rng.standard_normal(coords.shape) * 0.4
    with open(path, "w") as f:
        serial = 1
        for i in range(n_residues):
            res = RES3[int(rng.integers(0, 20))]
            x, y, z = coords[i]
            # full atom records like real PDBs (N, CA, C, O per residue)
            for atom, el in (("N  ", "N"), ("CA ", "C"), ("C  ", "C"), ("O  ", "O")):
                f.write(f"ATOM  {serial:5d}  {atom}{res} A{i + 1:4d}    "
                        f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           {el}\n")
                serial += 1
        f.write("END\n")


def main(n_structures=200, n_residues=460):
    rng = np.random.default_rng(0)
    src = tempfile.mkdtemp(prefix="pdbs_")
    for i in range(n_structures):
        write_pdb(os.path.join(src, f"sImmuno{i:04d}.pdb"), n_residues, rng)

    results = {}
    for label, use_native, workers in (
        ("numpy w=1", False, 1),
        ("numpy w=8", False, 8),
        ("native w=1", True, 1),
        ("native w=8", True, 8),
    ):
        if use_native and not native_available():
            print(f"{label}: native lib not built, skipping")
            continue
        out = tempfile.mkdtemp(prefix="graphs_")
        t0 = time.perf_counter()
        written = featurize_directory(src, out, workers=workers,
                                      use_native=use_native)
        dt = time.perf_counter() - t0
        rate = len(written) / dt
        results[label] = rate
        print(f"{label}: {len(written)} structures in {dt:.2f}s = {rate:.1f}/s")
        shutil.rmtree(out)
    shutil.rmtree(src)
    if "native w=8" in results and "numpy w=1" in results:
        print(f"speedup native-w8 vs numpy-w1: "
              f"{results['native w=8'] / results['numpy w=1']:.1f}x")


if __name__ == "__main__":
    main()
