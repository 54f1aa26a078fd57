"""ctypes bindings for the native featurizer kernel (native/featurizer.cc).

Loads native/libfeaturizer.so when present (``make -C native``); otherwise
``native_featurize`` returns None and the caller falls back to the pure
numpy path. ctypes calls release the GIL, so featurize_directory's thread
pool parallelizes across structures.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from immunostruct_tpu.featurize.edges import EdgeConfig

_LIB = None
_LIB_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.realpath(__file__))))
_LIB_PATHS = [
    os.path.join(_REPO_ROOT, "native", "libfeaturizer.so"),
    os.path.join(os.path.dirname(__file__), "libfeaturizer.so"),
]

# class id -> 3-letter code (alphabetical one-letter order)
_CLASS_TO_RES3 = ["ALA", "CYS", "ASP", "GLU", "PHE", "GLY", "HIS", "ILE",
                  "LYS", "LEU", "MET", "ASN", "PRO", "GLN", "ARG", "SER",
                  "THR", "VAL", "TRP", "TYR"]


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for path in _LIB_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.parse_pdb_ca.restype = ctypes.c_int
            lib.parse_pdb_ca.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.build_edges.restype = ctypes.c_int
            lib.build_edges.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            if hasattr(lib, "build_edges_atomic"):
                lib.build_edges_atomic.restype = ctypes.c_int
                lib.build_edges_atomic.argtypes = [
                    ctypes.c_char_p, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                    ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                    ctypes.c_int,
                ]
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_featurize(path: str, edge_config: EdgeConfig = EdgeConfig(),
                     max_nodes: int = 4096, max_edges: int = 262144,
                     apply_subgraph_filter: bool = True) -> Optional[tuple]:
    """Returns (coords, resnames, resnums, chains, edge_index) or None."""
    lib = _load()
    if lib is None:
        return None

    coords = np.zeros((max_nodes, 3), np.float32)
    res_class = np.zeros((max_nodes,), np.int32)
    resnum = np.zeros((max_nodes,), np.int32)
    chain_id = np.zeros((max_nodes,), np.int32)
    donors = np.zeros((max_nodes,), np.float32)
    acceptors = np.zeros((max_nodes,), np.float32)

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))

    n = lib.parse_pdb_ca(path.encode(), int(apply_subgraph_filter),
                         fp(coords), ip(res_class), ip(resnum), ip(chain_id),
                         fp(donors), fp(acceptors), max_nodes)
    if n < 0:
        raise RuntimeError(f"native parse_pdb_ca failed with code {n} for {path}")

    thresholds = np.asarray([edge_config.hbond_dist, edge_config.hbond_sulfur_dist,
                             edge_config.hydrophobic_dist, edge_config.ionic_dist],
                            np.float32)
    src = np.zeros((max_edges,), np.int32)
    dst = np.zeros((max_edges,), np.int32)
    if edge_config.granularity == "atomic":
        if not hasattr(lib, "build_edges_atomic"):
            return None  # stale .so: fall back to the numpy path
        e = lib.build_edges_atomic(path.encode(), int(apply_subgraph_filter),
                                   ip(resnum), ip(chain_id), n, fp(thresholds),
                                   ip(src), ip(dst), max_edges)
    else:
        e = lib.build_edges(fp(coords), ip(res_class), ip(resnum), ip(chain_id),
                            n, fp(thresholds), ip(src), ip(dst), max_edges)
    if e == -1:
        raise RuntimeError(f"native build_edges_atomic could not read {path}")
    if e < 0:
        raise RuntimeError(
            f"native edge buffer overflow for {path} (raise max_edges)")

    resnames = [(_CLASS_TO_RES3[c] if 0 <= c < 20 else "UNK")
                for c in res_class[:n]]
    chains = [chr(c) for c in chain_id[:n]]
    edge_index = np.stack([src[:e], dst[:e]]).astype(np.int32)
    return coords[:n].copy(), resnames, resnum[:n].copy(), chains, edge_index
