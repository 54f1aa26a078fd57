"""Offline featurizer pipeline: AlphaFold PDB -> fixed-shape graph arrays.

Replaces the graphein-driven script
(reference: preprocessing/cancer_graph_construction_new_KBG.py:93-157):

  for each PDB:
    parse CA records -> subgraph residues 1-179 + 273-999 (HLA a1/a2 +
    peptide, :103) -> edges (4 interaction types, :46-52) -> node features
    = 20-dim alphabetical one-hot + h-donor count + h-acceptor count
    (22 dims, :137-138; enc_dict :65-87 is exactly the alphabetical
    one-letter one-hot, MASK = zeros) -> save one graph per structure.

Output: .npz graphs in the native format (data/graphs.py), named
'<stem>' when the filename already carries the Immuno join key, else
'Immuno<chain[-99:]_sha1[:5]>' derived from the extracted sequence.

Fault tolerance parity: per-file try/except appending to error_log.txt and
continuing (:151-157). Parallelism: a thread pool (the C++ kernel path in
immunostruct_tpu/featurize/native.py releases the GIL; numpy fallback
releases it inside BLAS) — the stage is embarrassingly parallel
(SURVEY.md section 3.5).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from glob import glob
from typing import Optional

import numpy as np

from immunostruct_tpu.data.encoding import AA3_TO_1, RESIDUE_ONEHOT_INDEX
from immunostruct_tpu.data.graphs import save_graph_npz
from immunostruct_tpu.data.tables import get_hash
from immunostruct_tpu.featurize.pdb import parse_pdb_ca
from immunostruct_tpu.featurize.edges import build_edges, EdgeConfig

# sidechain H-bond donor/acceptor counts per residue (standard chemistry
# tables; the loader cuts these two columns anyway, preprocess.py:40-42)
RESIDUE_HBOND_DONORS = {
    "ARG": 3, "ASN": 1, "GLN": 1, "HIS": 1, "LYS": 1, "SER": 1, "THR": 1,
    "TRP": 1, "TYR": 1, "CYS": 1,
}
RESIDUE_HBOND_ACCEPTORS = {
    "ASP": 2, "GLU": 2, "ASN": 1, "GLN": 1, "HIS": 1, "SER": 1, "THR": 1,
    "TYR": 1, "MET": 1, "CYS": 1,
}

SUBGRAPH_POSITIONS = set(range(1, 180)) | set(range(273, 1000))

_WARNED_MISSING_KEY = False


def node_features(resnames: list[str]) -> np.ndarray:
    """[n, 22]: 20-dim alphabetical one-hot + donor count + acceptor count.

    Unknown residues (and the reference's MASK) encode as zero one-hots.
    """
    n = len(resnames)
    x = np.zeros((n, 22), np.float32)
    for i, res in enumerate(resnames):
        one = AA3_TO_1.get(res)
        if one is not None:
            x[i, RESIDUE_ONEHOT_INDEX[one]] = 1.0
        x[i, 20] = RESIDUE_HBOND_DONORS.get(res, 0)
        x[i, 21] = RESIDUE_HBOND_ACCEPTORS.get(res, 0)
    return x


def featurize_pdb(path: str, edge_config: EdgeConfig = EdgeConfig(),
                  name: Optional[str] = None, use_native: bool = True,
                  mask_percentage: float = 0.0,
                  mask_rng: Optional[np.random.Generator] = None):
    """One PDB -> (name, x [n,22], coords [n,3], edge_index [2,e]).

    ``mask_percentage`` zeroes the one-hot of that fraction of *peptide*
    residues (sequence position >= 273), the reference's optional peptide
    masking (cancer_graph_construction_new_KBG.py:20-31, pct=0 at :131;
    MASK encodes as the all-zero row, enc_dict :86).
    """
    chain = None
    if use_native:
        from immunostruct_tpu.featurize.native import native_featurize
        chain = native_featurize(path, edge_config)
    if chain is None:
        ca = parse_pdb_ca(path)
        keep = [i for i, rn in enumerate(ca.resnums.tolist())
                if rn in SUBGRAPH_POSITIONS]
        coords = ca.coords[keep]
        resnames = [ca.resnames[i] for i in keep]
        resnums = ca.resnums[keep]
        chains = [ca.chains[i] for i in keep]
        if edge_config.granularity == "atomic":
            from immunostruct_tpu.featurize.pdb import parse_pdb_atoms
            from immunostruct_tpu.featurize.edges import build_edges_atomic

            atoms = parse_pdb_atoms(path)
            akeep = np.asarray([rn in SUBGRAPH_POSITIONS
                                for rn in atoms.resnums.tolist()])
            atoms = type(atoms)(
                coords=atoms.coords[akeep],
                atom_names=[a for a, k in zip(atoms.atom_names, akeep) if k],
                resnames=[r for r, k in zip(atoms.resnames, akeep) if k],
                resnums=atoms.resnums[akeep],
                chains=[c for c, k in zip(atoms.chains, akeep) if k])
            edge_index = build_edges_atomic(atoms, resnums, chains, edge_config)
        else:
            edge_index = build_edges(coords, resnames, resnums, chains, edge_config)
    else:
        coords, resnames, resnums, chains, edge_index = chain

    x = node_features(resnames)

    if mask_percentage > 0:
        rng = mask_rng if mask_rng is not None else np.random.default_rng(0)
        pep_idx = np.nonzero(np.asarray(resnums) >= 273)[0]
        k = int(len(pep_idx) * mask_percentage / 100)
        if k > 0:
            picked = rng.choice(pep_idx, size=k, replace=False)
            x[picked, :20] = 0.0  # MASK = zero one-hot

    if name is None:
        stem = os.path.splitext(os.path.basename(path))[0]
        if "Immuno" in stem:
            name = stem
        else:
            # fallback key derived from the SUBGRAPH sequence — this cannot
            # join property tables (their keys hash the full 274-aa HLA
            # chain + peptide, tables.py expand_hla). Fine for standalone
            # graph use; for training corpora the PDB filename must carry
            # the Immuno<chain[-99:]_sha1[:5]> key, as the reference's do.
            seq = "".join(AA3_TO_1.get(r, "X") for r in resnames)
            name = f"{stem}Immuno{seq[-99:]}_{get_hash(seq)[:5]}"
            global _WARNED_MISSING_KEY
            if not _WARNED_MISSING_KEY:
                _WARNED_MISSING_KEY = True
                print(f"WARNING: {stem}.pdb (and possibly others) has no "
                      "'Immuno' join key in its filename; derived standalone "
                      "names that will NOT join property tables. "
                      "(warning shown once)")
    return name, x, coords, edge_index


def featurize_directory(alphafold_folder: str, save_folder: str,
                        edge_config: EdgeConfig = EdgeConfig(),
                        workers: int = 8, use_native: bool = True,
                        error_log: Optional[str] = None) -> list[str]:
    """Featurize every .pdb in a folder; returns the list of written files."""
    os.makedirs(save_folder, exist_ok=True)
    error_log = error_log or os.path.join(save_folder, "error_log.txt")
    files = sorted(glob(os.path.join(alphafold_folder, "*.pdb")))
    written = []

    def one(path):
        stem = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(save_folder, stem + ".npz")
        try:
            name, x, coords, edge_index = featurize_pdb(path, edge_config,
                                                        use_native=use_native)
            save_graph_npz(out_path, name=name, x=x, coords=coords,
                           edge_index=edge_index)
            return out_path, None
        except Exception as e:  # noqa: BLE001 - per-file fault tolerance
            return None, f"Error creating graph {stem}. Encountered exception {e}"

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for out_path, err in pool.map(one, files):
            if err is not None:
                print(err)
                with open(error_log, "a") as f:
                    f.write(err + "\n")
            else:
                written.append(out_path)
    return written
