"""Minimal PDB parsing: CA records per residue.

Replaces graphein's biopandas-backed ``read_pdb_to_dataframe`` +
``construct_graph`` front end (reference:
preprocessing/cancer_graph_construction_new_KBG.py:102-117) for the only
information the featurizer actually consumes: per-residue CA coordinates,
residue names, chain ids, and residue numbers.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CAChain:
    """Per-residue CA records, in file order (first CA per residue wins,
    matching drop_duplicates('residue_number'))."""

    coords: np.ndarray      # [n, 3] float32
    resnames: list[str]     # 3-letter codes
    resnums: np.ndarray     # [n] int32 author residue numbers
    chains: list[str]       # chain id per residue

    def __len__(self):
        return len(self.resnames)


@dataclasses.dataclass
class AtomTable:
    """All ATOM records (altloc-filtered), for atomic-granularity edge
    rules: interaction distances measured between the actual interacting
    atoms, then mapped back to residue-level (CA) nodes."""

    coords: np.ndarray      # [m, 3] float32
    atom_names: list[str]
    resnames: list[str]
    resnums: np.ndarray     # [m] int32
    chains: list[str]

    def __len__(self):
        return len(self.atom_names)


def parse_pdb_atoms(path: str) -> AtomTable:
    """Every ATOM/HETATM record (first altloc wins per atom position)."""
    coords, names, resnames, resnums, chains = [], [], [], [], []
    seen = set()
    with open(path, "r") as f:
        for line in f:
            if not line.startswith(("ATOM", "HETATM")):
                continue
            if len(line) < 54:  # truncated record: skip (C++ kernel parity)
                continue
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue
            atom_name = line[12:16].strip()
            chain = line[21]
            resnum = int(line[22:26])
            key = (chain, resnum, atom_name)
            if key in seen:
                continue
            seen.add(key)
            coords.append((float(line[30:38]), float(line[38:46]), float(line[46:54])))
            names.append(atom_name)
            resnames.append(line[17:20].strip())
            resnums.append(resnum)
            chains.append(chain)
    return AtomTable(coords=np.asarray(coords, np.float32).reshape(-1, 3),
                     atom_names=names, resnames=resnames,
                     resnums=np.asarray(resnums, np.int32), chains=chains)


def parse_pdb_ca(path: str) -> CAChain:
    """Extract one CA record per (chain, residue number) from ATOM lines."""
    coords, resnames, resnums, chains = [], [], [], []
    seen = set()
    with open(path, "r") as f:
        for line in f:
            if not line.startswith(("ATOM", "HETATM")):
                continue
            if len(line) < 54:  # truncated record: skip (C++ kernel parity)
                continue
            atom_name = line[12:16].strip()
            if atom_name != "CA":
                continue
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue
            chain = line[21]
            resnum = int(line[22:26])
            key = (chain, resnum)
            if key in seen:
                continue
            seen.add(key)
            coords.append((float(line[30:38]), float(line[38:46]), float(line[46:54])))
            resnames.append(line[17:20].strip())
            resnums.append(resnum)
            chains.append(chain)
    return CAChain(coords=np.asarray(coords, np.float32).reshape(-1, 3),
                   resnames=resnames,
                   resnums=np.asarray(resnums, np.int32),
                   chains=chains)
