"""Exact-duplicate detection across (sequence, properties, graph topology).

Reference parity: data/utils.py:91-146 — ``duplicate_check`` reports rows
whose (one-hot sequence, property tuple) match a previous row AND whose
graphs match on node/edge counts, node features, edge attributes, and
source lists ("double dupes"); ``dedupe`` removes them. The reference calls
duplicate_check in every dataset constructor (immmunopred_dataloader.py:55)
but only prints; here the same scan returns indices so callers can filter.
"""

from __future__ import annotations

import numpy as np

from immunostruct_tpu.data.dataset import ImmunoDataset


def find_duplicates(ds: ImmunoDataset) -> tuple[int, list[int]]:
    """Returns (n_seq_prop_dupes, indices of full duplicates to remove)."""
    cache: dict = {}
    dupes = 0
    to_remove: list[int] = []
    g = ds.graphs
    for i in range(len(ds)):
        key = (ds.seq_full[i].tobytes(), ds.props[i].tobytes())
        if key in cache:
            dupes += 1
            j = cache[key]
            gi, gj = ds.graph_idx[i], ds.graph_idx[j]
            if gi == gj:
                to_remove.append(i)
                continue
            same = (g.num_nodes[gi] == g.num_nodes[gj]
                    and np.array_equal(g.edge_mask[gi], g.edge_mask[gj])
                    and np.array_equal(g.node_onehot[gi], g.node_onehot[gj])
                    and np.array_equal(g.edge_src[gi], g.edge_src[gj])
                    and np.array_equal(g.edge_dst[gi], g.edge_dst[gj]))
            if same:
                to_remove.append(i)
        else:
            cache[key] = i
    return dupes, to_remove


def duplicate_check(ds: ImmunoDataset) -> None:
    """Print-only scan, mirroring the reference's constructor-time check."""
    dupes, double = find_duplicates(ds)
    print("dupes", dupes, len(double))


def dedupe(ds: ImmunoDataset) -> ImmunoDataset:
    """Return a copy of the dataset with full duplicates removed."""
    import dataclasses
    from collections import Counter
    _, to_remove = find_duplicates(ds)
    if not to_remove:
        return ds
    keep = np.setdiff1d(np.arange(len(ds)), np.asarray(to_remove))
    immuno = ds.immuno[keep]
    return dataclasses.replace(
        ds,
        seq_full=ds.seq_full[keep], seq_pep=ds.seq_pep[keep],
        props=ds.props[keep], immuno=immuno,
        foreign_norm=ds.foreign_norm[keep], graph_idx=ds.graph_idx[keep],
        raw_chain=[ds.raw_chain[i] for i in keep], pep_len=ds.pep_len[keep],
        # class weights (and the pos_weight derived from them) must reflect
        # the deduplicated labels
        class_weights=Counter(immuno.tolist()),
    )
