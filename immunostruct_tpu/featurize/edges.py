"""Edge construction rules at CA granularity.

Vectorized numpy replacement for graphein's edge functions
(reference: preprocessing/cancer_graph_construction_new_KBG.py:46-52 uses
add_peptide_bonds, add_hydrogen_bond_interactions,
add_hydrophobic_interactions, add_ionic_interactions):

- peptide bonds: consecutive residue numbers within the same chain;
- hydrogen bonds: donor/acceptor-capable residue pairs with CA distance
  < 3.5 A (4.0 A when either side is sulfur-bearing CYS/MET) — graphein's
  distance criteria evaluated at CA granularity;
- hydrophobic: both residues in the hydrophobic set, CA distance < 5.0 A;
- ionic: oppositely-charged residue pair (pos {ARG, LYS, HIS} x neg
  {ASP, GLU}), CA distance < 6.0 A.

Edges are undirected in graphein/NetworkX and become both directed arcs
after the PyG conversion (data/utils.py:63 takes src, dst from edge_index);
``build_edges`` emits both directions, deduplicated.
"""

from __future__ import annotations

import dataclasses

import numpy as np

HYDROPHOBIC = {"ALA", "VAL", "LEU", "ILE", "MET", "PHE", "TRP", "PRO", "TYR"}
POSITIVE = {"ARG", "LYS", "HIS"}
NEGATIVE = {"ASP", "GLU"}
SULFUR = {"CYS", "MET"}
# residues with sidechain H-bond donor / acceptor capability
HBOND_DONOR_RES = {"ARG", "ASN", "GLN", "HIS", "LYS", "SER", "THR", "TRP", "TYR", "CYS"}
HBOND_ACCEPTOR_RES = {"ASP", "GLU", "ASN", "GLN", "HIS", "SER", "THR", "TYR", "MET", "CYS"}


@dataclasses.dataclass(frozen=True)
class EdgeConfig:
    hbond_dist: float = 3.5
    hbond_sulfur_dist: float = 4.0
    hydrophobic_dist: float = 5.0
    ionic_dist: float = 6.0


def build_edges(coords: np.ndarray, resnames: list[str], resnums: np.ndarray,
                chains: list[str], config: EdgeConfig = EdgeConfig()) -> np.ndarray:
    """Returns [2, E] int32 edge_index with both arc directions."""
    n = len(resnames)
    if n == 0:
        return np.zeros((2, 0), np.int32)

    names = np.asarray(resnames)
    chain_arr = np.asarray(chains)
    resnums = np.asarray(resnums)

    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    adj = np.zeros((n, n), bool)

    # peptide bonds: consecutive residue numbers in the same chain
    same_chain = chain_arr[:, None] == chain_arr[None, :]
    consecutive = np.abs(resnums[:, None] - resnums[None, :]) == 1
    adj |= same_chain & consecutive

    # hydrogen bonds
    donor = np.isin(names, list(HBOND_DONOR_RES))
    acceptor = np.isin(names, list(HBOND_ACCEPTOR_RES))
    sulfur = np.isin(names, list(SULFUR))
    hb_pair = (donor[:, None] & acceptor[None, :]) | (acceptor[:, None] & donor[None, :])
    hb_thresh = np.where(sulfur[:, None] | sulfur[None, :],
                         config.hbond_sulfur_dist, config.hbond_dist)
    adj |= hb_pair & (d < hb_thresh)

    # hydrophobic
    hydro = np.isin(names, list(HYDROPHOBIC))
    adj |= (hydro[:, None] & hydro[None, :]) & (d < config.hydrophobic_dist)

    # ionic: opposite charges only
    pos = np.isin(names, list(POSITIVE))
    neg = np.isin(names, list(NEGATIVE))
    opposite = (pos[:, None] & neg[None, :]) | (neg[:, None] & pos[None, :])
    adj |= opposite & (d < config.ionic_dist)

    np.fill_diagonal(adj, False)
    adj |= adj.T  # symmetrize -> both directions
    src, dst = np.nonzero(adj)
    return np.stack([src, dst]).astype(np.int32)
