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
    # 'ca': interaction distances on CA coordinates (round-1 default, C++
    # kernel); 'atomic': distances between the actual interacting atoms,
    # mapped to residue edges — closer to graphein's behavior on all-atom
    # PDBs (see build_edges_atomic and PARITY.md "Featurizer edge rules")
    granularity: str = "ca"


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


# --------------------------------------------------------------------------
# Atomic granularity (PARITY.md "Featurizer edge rules", ROADMAP #6)
# --------------------------------------------------------------------------
# graphein computes interaction edges on the interacting ATOMS' coordinates
# (its rgroup/atom-subset dataframes come from the full atomic structure)
# even when the graph's nodes are CA-granularity residues. This mode does
# the same: distances between the actual donor/acceptor, R-group, or
# charged-group atoms, mapped back to residue-level edges. The exact
# graphein atom-name lists could not be executed side-by-side in this
# environment (no graphein, no egress); the sets below are the standard
# protein-chemistry assignments, recorded per rule.

# sidechain + backbone H-bond donor/acceptor heavy atoms
HBOND_DONOR_ATOMS = {
    ("ARG", "NE"), ("ARG", "NH1"), ("ARG", "NH2"), ("ASN", "ND2"),
    ("GLN", "NE2"), ("HIS", "ND1"), ("HIS", "NE2"), ("LYS", "NZ"),
    ("SER", "OG"), ("THR", "OG1"), ("TRP", "NE1"), ("TYR", "OH"),
    ("CYS", "SG"),
}
HBOND_ACCEPTOR_ATOMS = {
    ("ASP", "OD1"), ("ASP", "OD2"), ("GLU", "OE1"), ("GLU", "OE2"),
    ("ASN", "OD1"), ("GLN", "OE1"), ("HIS", "ND1"), ("HIS", "NE2"),
    ("SER", "OG"), ("THR", "OG1"), ("TYR", "OH"), ("MET", "SD"),
    ("CYS", "SG"),
}
BACKBONE_ATOMS = {"N", "CA", "C", "O", "OXT"}
SULFUR_ATOMS = {"SD", "SG"}
IONIC_POSITIVE_ATOMS = {
    ("ARG", "NE"), ("ARG", "NH1"), ("ARG", "NH2"), ("LYS", "NZ"),
    ("HIS", "ND1"), ("HIS", "NE2"),
}
IONIC_NEGATIVE_ATOMS = {
    ("ASP", "OD1"), ("ASP", "OD2"), ("GLU", "OE1"), ("GLU", "OE2"),
}


def _pairs_to_residue_adj(adj_atoms, res_idx, n_res):
    """Atom-pair hits -> residue-level adjacency (self-pairs dropped)."""
    out = np.zeros((n_res, n_res), bool)
    ai, aj = np.nonzero(adj_atoms)
    ri, rj = res_idx[ai], res_idx[aj]
    keep = ri != rj
    out[ri[keep], rj[keep]] = True
    return out


def build_edges_atomic(atoms, ca_resnums: np.ndarray, ca_chains: list[str],
                       config: EdgeConfig = EdgeConfig()) -> np.ndarray:
    """[2, E] residue-level edge_index from atomic interaction distances.

    ``atoms``: an AtomTable (featurize/pdb.py) pre-filtered to the residues
    present in the CA subgraph; ``ca_resnums``/``ca_chains`` give the
    residue-node ordering the indices map into. Peptide bonds stay at
    residue granularity (consecutive numbering in the same chain).
    """
    n_res = len(ca_resnums)
    res_of = {(c, int(r)): i for i, (c, r) in enumerate(zip(ca_chains, ca_resnums))}

    m = len(atoms)
    adj = np.zeros((n_res, n_res), bool)

    # peptide bonds (residue granularity, unchanged)
    chain_arr = np.asarray(ca_chains)
    same_chain = chain_arr[:, None] == chain_arr[None, :]
    consecutive = np.abs(ca_resnums[:, None] - ca_resnums[None, :]) == 1
    adj |= same_chain & consecutive

    if m:
        res_idx = np.asarray([res_of.get((c, int(r)), -1)
                              for c, r in zip(atoms.chains, atoms.resnums)],
                             np.int64)
        keep = res_idx >= 0
        coords = atoms.coords[keep]
        res_idx = res_idx[keep]
        keys = [(rn, an) for rn, an, k in
                zip(atoms.resnames, atoms.atom_names, np.asarray(keep))
                if k]
        names = np.asarray([an for _, an in keys])

        d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)

        donor = np.asarray([k in HBOND_DONOR_ATOMS or k[1] == "N" for k in keys])
        acceptor = np.asarray([k in HBOND_ACCEPTOR_ATOMS or k[1] == "O" for k in keys])
        sulfur = np.isin(names, list(SULFUR_ATOMS))
        hb_pair = (donor[:, None] & acceptor[None, :]) | (acceptor[:, None] & donor[None, :])
        hb_thresh = np.where(sulfur[:, None] | sulfur[None, :],
                             config.hbond_sulfur_dist, config.hbond_dist)
        adj |= _pairs_to_residue_adj(hb_pair & (d < hb_thresh), res_idx, n_res)

        resname_arr = np.asarray([rn for rn, _ in keys])
        hydro = (np.isin(resname_arr, list(HYDROPHOBIC))
                 & ~np.isin(names, list(BACKBONE_ATOMS))
                 & np.char.startswith(names.astype(str), "C"))
        adj |= _pairs_to_residue_adj(
            (hydro[:, None] & hydro[None, :]) & (d < config.hydrophobic_dist),
            res_idx, n_res)

        pos = np.asarray([k in IONIC_POSITIVE_ATOMS for k in keys])
        neg = np.asarray([k in IONIC_NEGATIVE_ATOMS for k in keys])
        opposite = (pos[:, None] & neg[None, :]) | (neg[:, None] & pos[None, :])
        adj |= _pairs_to_residue_adj(opposite & (d < config.ionic_dist),
                                     res_idx, n_res)

    np.fill_diagonal(adj, False)
    adj |= adj.T
    src, dst = np.nonzero(adj)
    return np.stack([src, dst]).astype(np.int32)
