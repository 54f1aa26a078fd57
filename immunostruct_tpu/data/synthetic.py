"""Synthetic corpus generation for tests and benchmarks.

Produces structurally-faithful miniature versions of the reference's inputs
(graph directory of .npz files, cancer/IEDB property TSVs, the HLA csv, the
clinical sequence + outcome tables) so every entry point can run end-to-end
without the real (unavailable) AlphaFold-derived data.

Geometry: nodes are laid on a noisy helix-like backbone; edges combine
chain adjacency (peptide bonds) with k-nearest-neighbor contacts, giving
edge/node ratios similar to the real CA-granularity graphs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from immunostruct_tpu.data.encoding import AMINO_ACIDS
from immunostruct_tpu.data.graphs import save_graph_npz
from immunostruct_tpu.data.tables import get_hash

_HLA_NAMES = [f"HLA-A*{i:02d}:01" for i in range(1, 28)]


def _random_seq(rng, length: int) -> str:
    return "".join(rng.choice(list(AMINO_ACIDS), length))


def _make_graph(rng, seq: str, knn: int = 4, compact_tail: int = 0,
                tail_scale: float = 0.5):
    n = len(seq)
    t = np.arange(n, dtype=np.float32)
    coords = np.stack([np.cos(t * 0.6), np.sin(t * 0.6), 0.5 * t], -1)
    coords = coords + 0.3 * rng.standard_normal((n, 3)).astype(np.float32)
    if compact_tail:
        # pull the last `compact_tail` residues (the peptide) toward their
        # centroid: a pure-coordinate perturbation — node features and the
        # rest of the generator are untouched, so any model that recovers it
        # must be reading geometry (used by the geometric learnability test)
        tail = coords[n - compact_tail:]
        coords[n - compact_tail:] = tail.mean(0) + tail_scale * (tail - tail.mean(0))

    onehot = np.zeros((n, 20), np.float32)
    for i, ch in enumerate(seq):
        onehot[i, AMINO_ACIDS.index(ch)] = 1.0
    hd = rng.integers(0, 3, (n, 1)).astype(np.float32)
    ha = rng.integers(0, 3, (n, 1)).astype(np.float32)
    x = np.concatenate([onehot, hd, ha], -1)  # 22 cols; loader cuts last 2

    # chain adjacency + knn contacts, both directions
    src = list(range(n - 1)) + list(range(1, n))
    dst = list(range(1, n)) + list(range(n - 1))
    d2 = np.sum((coords[:, None] - coords[None]) ** 2, -1)
    np.fill_diagonal(d2, np.inf)
    nn = np.argsort(d2, axis=1)[:, :knn]
    for i in range(n):
        for j in nn[i]:
            src.extend([i, int(j)])
            dst.extend([int(j), i])
    edge_index = np.unique(np.stack([src, dst]), axis=1).astype(np.int32)
    return x, coords, edge_index


def _hla_table(root: str, rng, hla_len: int, shared_hla_path=None):
    """Write (or reuse) the HLA csv; returns (path, {allele: seq})."""
    if shared_hla_path and os.path.exists(shared_hla_path):
        df = pd.read_csv(shared_hla_path)
        return shared_hla_path, dict(zip(df["allele"], df["seqs"]))
    hla_seqs = {name: _random_seq(rng, hla_len) for name in _HLA_NAMES[:4]}
    path = shared_hla_path or os.path.join(root, "HLA_seqs.csv")
    pd.DataFrame({"allele": list(hla_seqs), "seqs": list(hla_seqs.values())}
                 ).to_csv(path, index=False)
    return path, hla_seqs


def synthetic_corpus(root: str, num_samples: int = 32, hla_len: int = 48,
                     pep_len_range=(8, 11), seed: int = 0,
                     cancer: bool = False, positive_rate: float = 0.4,
                     shared_hla_path=None, planted_signal: bool = False,
                     geometric_signal: bool = False):
    """Write a synthetic (graph dir, property tsv, hla csv) trio.

    Returns (graph_dir, property_path, hla_path). Pass ``shared_hla_path``
    to reuse one HLA table across corpora (required when several corpora
    feed the same run, as the Cancer curriculum does).

    ``planted_signal=True`` makes labels learnable instead of random:
    immunogenicity = [peptide hydrophobic fraction > median-ish threshold],
    foreignness correlates with the same statistic, and Mprop1 carries a
    noisy copy — so sequence-, property-, and structure-branch models can
    all recover signal (used by the learnability tests).

    ``geometric_signal=True`` plants a signal ONLY in the coordinates:
    immunogenicity = [peptide tail is compacted around its centroid], with
    sequence, properties, and foreignness all label-independent random.
    This isolates the E(n) machinery (reference raison d'être:
    immunostruct/models/hybrid_models.py:29-31): structure-reading models
    can recover the label, sequence/property-only models provably cannot.
    Mutually exclusive with ``planted_signal``.
    """
    if planted_signal and geometric_signal:
        raise ValueError("planted_signal and geometric_signal are exclusive")
    rng = np.random.default_rng(seed)
    tag = "Cancer" if cancer else "IEDB"
    graph_dir = os.path.join(root, f"graph_pyg_{tag}")
    os.makedirs(graph_dir, exist_ok=True)

    hla_path, hla_seqs = _hla_table(root, rng, hla_len, shared_hla_path)

    rows = []
    for i in range(num_samples):
        allele = _HLA_NAMES[int(rng.integers(0, 4))]
        pep = _random_seq(rng, int(rng.integers(*pep_len_range)))
        chain = hla_seqs[allele] + pep
        key = chain[-99:] + "_" + get_hash(chain)[:5]
        geo_label = int(rng.random() < 0.5) if geometric_signal else 0
        x, coords, ei = _make_graph(
            rng, chain, compact_tail=len(pep) if geo_label else 0)
        save_graph_npz(os.path.join(graph_dir, f"g{i:04d}.npz"),
                       name=f"synImmuno{key}", x=x, coords=coords, edge_index=ei)
        if geometric_signal:
            immuno = geo_label
            foreign = float(rng.random())
            mprop1 = float(rng.random())
        elif planted_signal:
            hydrophobic = sum(c in "AVLIMFWPY" for c in pep) / len(pep)
            immuno = int(hydrophobic > 0.45)
            foreign = float(np.clip(hydrophobic + 0.1 * rng.standard_normal(), 0, 1))
            mprop1 = float(np.clip(hydrophobic + 0.2 * rng.standard_normal(), 0, 1))
        else:
            immuno = int(rng.random() < positive_rate)
            foreign = float(rng.random())
            mprop1 = float(rng.random())
        row = {
            "immunogenicity": immuno,
            "smoothed_foreign": foreign,
            "Mprop1": mprop1,
            "Mprop2": float(rng.random()),
        }
        if cancer:
            row.update({
                "mut_pep": pep,
                "wt_pep": pep,  # overwritten by comparative generator
                "allele": "HLA-" + allele.split("-")[1].replace("*", "").replace(":", ""),
                "foreign": foreign,
            })
        else:
            row.update({
                "peptide": pep, "allele": allele,
                "Foreignness_Score": foreign,
            })
        rows.append(row)

    property_path = os.path.join(root, f"props_{tag}.tsv")
    pd.DataFrame(rows).to_csv(property_path, sep="\t", index=False)
    return graph_dir, property_path, hla_path


def synthetic_comparative_corpus(root: str, num_samples: int = 24,
                                 hla_len: int = 48, seed: int = 0,
                                 shared_hla_path=None):
    """Paired cancer/WT corpus: graphs for both branches + the two TSVs.

    WT peptides are single-point mutations of the cancer peptides.
    Returns (graph_dir_cancer, graph_dir_wt, props_cancer, props_wt, hla_path).
    """
    rng = np.random.default_rng(seed)
    dir_c = os.path.join(root, "graph_pyg_Cancer")
    dir_w = os.path.join(root, "graph_pyg_Cancer_WT")
    os.makedirs(dir_c, exist_ok=True)
    os.makedirs(dir_w, exist_ok=True)

    hla_path, hla_seqs = _hla_table(root, rng, hla_len, shared_hla_path)

    rows_c, rows_w = [], []
    for i in range(num_samples):
        allele_star = _HLA_NAMES[int(rng.integers(0, 4))]
        allele_raw = "HLA-" + allele_star.split("-")[1].replace("*", "").replace(":", "")
        pep_c = _random_seq(rng, int(rng.integers(8, 11)))
        pos = int(rng.integers(0, len(pep_c)))
        sub = rng.choice([a for a in AMINO_ACIDS if a != pep_c[pos]])
        pep_w = pep_c[:pos] + str(sub) + pep_c[pos + 1:]

        for pep, d in ((pep_c, dir_c), (pep_w, dir_w)):
            chain = hla_seqs[allele_star] + pep
            key = chain[-99:] + "_" + get_hash(chain)[:5]
            x, coords, ei = _make_graph(rng, chain)
            save_graph_npz(os.path.join(d, f"g{i:04d}.npz"),
                           name=f"synImmuno{key}", x=x, coords=coords, edge_index=ei)

        immuno = int(rng.random() < 0.5)
        foreign = float(rng.random())
        base = {"mut_pep": pep_c, "wt_pep": pep_w, "allele": allele_raw,
                "immunogenicity": immuno, "foreign": foreign}
        rows_c.append({**base, "smoothed_foreign": foreign,
                       "Mprop1": float(rng.random()), "Mprop2": float(rng.random())})
        rows_w.append({**base,
                       "Mprop1_wt": float(rng.random()), "Mprop2_wt": float(rng.random())})

    props_c = os.path.join(root, "props_cancer.tsv")
    props_w = os.path.join(root, "props_wt.tsv")
    pd.DataFrame(rows_c).to_csv(props_c, sep="\t", index=False)
    pd.DataFrame(rows_w).to_csv(props_w, sep="\t", index=False)
    return dir_c, dir_w, props_c, props_w, hla_path


def synthetic_clinical_corpus(root: str, num_rows: int = 40, num_patients: int = 8,
                              hla_len: int = 48, match_rate: float = 0.8,
                              seed: int = 3):
    """Clinical graph dir + sequence table + outcomes table.

    Matching rows get a graph whose join key derives from hla_seq + mut_pep
    (the reference's clinical join, preprocess.py:302-313); the rest have no
    graph and become NaN rows, exercising the placeholder path.
    Returns (graph_dir, seq_path, clin_path).
    """
    rng = np.random.default_rng(seed)
    graph_dir = os.path.join(root, "graph_pyg_Clinical")
    os.makedirs(graph_dir, exist_ok=True)
    hla_seq = _random_seq(rng, hla_len)

    rows = []
    patients = [f"mUC-{i}" for i in range(num_patients)]
    for i in range(num_rows):
        patient = patients[i % num_patients]
        pep = _random_seq(rng, int(rng.integers(8, 11)))
        if rng.random() < match_rate:
            chain = hla_seq + pep
            key = chain[-99:] + "_" + get_hash(chain)[:5]
            x, coords, ei = _make_graph(rng, chain)
            save_graph_npz(os.path.join(graph_dir, f"c{i:04d}.npz"),
                           name=f"synImmuno{key}", x=x, coords=coords,
                           edge_index=ei)
        rows.append({"patient": patient, "combo": f"combo{i}",
                     "mut_pep": pep, "hla_seq": hla_seq})
    seq_df = pd.DataFrame(rows)

    clin = pd.DataFrame({
        "Patient": [p.replace("mUC", "BC") for p in patients],
        "RECIST": ["PD"] * num_patients,
        "PFS.Time": rng.random(num_patients) * 20,
        "OS.Time": rng.random(num_patients) * 30,
        "PFS.Event": rng.integers(0, 2, num_patients),
        "OS.Event": rng.integers(0, 2, num_patients),
        "mut_load": rng.integers(10, 2000, num_patients),
    })
    seq_path = os.path.join(root, "clinical_seq.tsv")
    clin_path = os.path.join(root, "clinical_outcomes.tsv")
    seq_df.to_csv(seq_path, sep="\t", index=False)
    clin.to_csv(clin_path, sep="\t", index=False)
    return graph_dir, seq_path, clin_path


def random_sample_batch(batch: int, nodes: int, edges: int, seq_len: int,
                        seed: int = 0):
    """In-memory random SampleBatch at given padded shapes (no files).

    The canonical flagship-shaped input used by bench.py and
    cli/profile_step.py — one definition so the two stay in sync.
    """
    import jax.numpy as jnp

    from immunostruct_tpu.structs import GraphBatch, SampleBatch

    rng = np.random.default_rng(seed)
    onehot = np.zeros((batch, nodes, 20), np.float32)
    for b in range(batch):
        onehot[b, np.arange(nodes), rng.integers(0, 20, nodes)] = 1.0
    graph = GraphBatch(
        node_feat=jnp.asarray(onehot),
        coords=jnp.asarray(
            rng.standard_normal((batch, nodes, 3)).astype(np.float32)),
        edge_src=jnp.asarray(rng.integers(0, nodes, (batch, edges)).astype(np.int32)),
        edge_dst=jnp.asarray(rng.integers(0, nodes, (batch, edges)).astype(np.int32)),
        edge_feat=jnp.ones((batch, edges, 1), jnp.float32),
        edge_mask=jnp.ones((batch, edges), bool),
        node_mask=jnp.ones((batch, nodes), bool),
        num_nodes=jnp.full((batch,), nodes, jnp.int32),
    )
    return SampleBatch(
        graph=graph,
        seq_onehot=jnp.asarray(rng.random((batch, seq_len, 21)).astype(np.float32)),
        props=jnp.asarray(rng.random((batch, 2)).astype(np.float32)),
        target=jnp.asarray((rng.random(batch) > 0.5).astype(np.float32)),
        aux_residue=None)


def random_comparative_batch(batch: int, nodes: int, edges: int, seq_len: int,
                             seed: int = 0):
    """In-memory random ComparativeBatch (cancer/WT twins at identical
    padded shapes) — the flagship stage-3 step's input, used by
    cli/profile_step --comparative and the twin-path benches."""
    from immunostruct_tpu.structs import ComparativeBatch

    cancer = random_sample_batch(batch, nodes, edges, seq_len, seed=seed)
    wt = random_sample_batch(batch, nodes, edges, seq_len, seed=seed + 1)
    # twins share the pair-level target (train.py twin losses both see it)
    wt = type(wt)(graph=wt.graph, seq_onehot=wt.seq_onehot, props=wt.props,
                  target=cancer.target, aux_residue=None)
    return ComparativeBatch(cancer=cancer, wt=wt)
