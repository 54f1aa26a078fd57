"""Offline featurization entry point.

Mirrors reference: preprocessing/cancer_graph_construction_new_KBG.py run
standalone over a folder of AlphaFold PDBs, emitting one graph file per
structure (.npz native format instead of PyG .pt).

Usage:
  python -m immunostruct_tpu.cli.featurize \
      --alphafold-folder data/alphafold_pdb_Cancer/ \
      --save-folder data/graph_pyg_Cancer/ --workers 16
"""

from __future__ import annotations

import argparse
import time

from immunostruct_tpu.featurize import featurize_directory
from immunostruct_tpu.featurize.native import native_available


def main(argv=None):
    p = argparse.ArgumentParser(description="PDB -> graph featurizer")
    p.add_argument("--alphafold-folder", required=True, type=str)
    p.add_argument("--save-folder", required=True, type=str)
    p.add_argument("--workers", default=1, type=int,
                   help="thread count; >1 only pays for very large PDBs "
                        "(scripts/bench_featurizer.py: single-thread native "
                        "does ~850 structures/s on pMHC-sized inputs)")
    p.add_argument("--no-native", action="store_true",
                   help="force the pure-numpy path")
    p.add_argument("--edge-granularity", default="ca", choices=["ca", "atomic"],
                   help="'ca': interaction distances on CA coordinates (C++ "
                        "kernel); 'atomic': distances between the actual "
                        "interacting atoms, mapped to residue edges — closer "
                        "to graphein on all-atom PDBs (PARITY.md)")
    args = p.parse_args(argv)

    use_native = not args.no_native
    if use_native and not native_available():
        print("native featurizer not built (make -C native); using numpy path")
        use_native = False

    from immunostruct_tpu.featurize import EdgeConfig
    edge_config = EdgeConfig(granularity=args.edge_granularity)

    t0 = time.perf_counter()
    written = featurize_directory(args.alphafold_folder, args.save_folder,
                                  edge_config=edge_config,
                                  workers=args.workers, use_native=use_native)
    dt = time.perf_counter() - t0
    rate = len(written) / dt if dt > 0 else float("inf")
    print(f"featurized {len(written)} structures in {dt:.2f}s ({rate:.1f}/s, "
          f"native={use_native})")
    return written


if __name__ == "__main__":
    main()
