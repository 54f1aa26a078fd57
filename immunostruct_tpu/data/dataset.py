"""Datasets: the joined (sequence, graph, property, label) corpora.

Mirrors the reference dataset classes
(reference: data/immmunopred_dataloader.py:17-285, data/infer_dataloader.py:13-244)
but produces dense numpy arrays ready for device streaming instead of
per-item torch tensors + DGL graph objects:

- unique graphs are stacked once ([G, N, ...]) and rows carry a graph index,
  so shared structures are not duplicated;
- foreignness is min-max normalized to [-1, 1]
  (immmunopred_dataloader.py:67-70);
- comparative WT rows get label 0 and foreignness = corpus min, i.e. -1.0
  under the cancer-side normalization bounds the reference applies
  class-wide (immmunopred_dataloader.py:182-183, :208-214);
- clinical rows WITH a matching graph get the reference's placeholder
  props [0.4, 0.4]; rows WITHOUT one become NaN features + NaN props +
  placeholder graph, labels -1 for everyone (infer_dataloader.py:216-233).
"""

from __future__ import annotations

import dataclasses
from collections import Counter
from typing import Optional

import numpy as np
import pandas as pd

from immunostruct_tpu.data.encoding import one_hot_encode_batch
from immunostruct_tpu.data.graphs import GraphCorpus, load_graph_dir
from immunostruct_tpu.data.tables import (
    parse_property_table, parse_property_tables_cancer_wt, expand_hla,
)


def seeded_split(n: int, fractions: tuple, seed: int):
    """Replicate ``torch.utils.data.random_split(dataset, fractions, g)``.

    Uses torch's randperm under the same manual seed so the train/val/test
    folds are bitwise-identical to the reference run
    (train_IEDB_wFT.py:56, :69) — required for AUROC parity on the same
    splits. Falls back to numpy if torch is unavailable.
    """
    lengths = [int(np.floor(n * f)) for f in fractions]
    remainder = n - sum(lengths)
    for i in range(remainder):  # round-robin remainder, like torch
        lengths[i % len(lengths)] += 1
    try:
        import torch
        g = torch.Generator().manual_seed(seed)
        perm = torch.randperm(n, generator=g).tolist()
    except ImportError:
        # NOT fold-compatible with the torch path: a model trained where
        # torch was available cannot recover its test fold here. Warn loudly
        # instead of silently leaking train rows into "test" metrics.
        print("WARNING: torch unavailable — seeded_split is using a numpy "
              "permutation that does NOT reproduce torch.random_split folds. "
              "Do not mix checkpoints/evaluations across the two modes.")
        perm = np.random.default_rng(seed).permutation(n).tolist()
    out, offset = [], 0
    for ln in lengths:
        out.append(np.asarray(perm[offset:offset + ln], np.int64))
        offset += ln
    return out


@dataclasses.dataclass
class GraphArrays:
    """Stacked unique graphs (see GraphCorpus.stack for shapes)."""
    node_onehot: np.ndarray
    coords: np.ndarray
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_mask: np.ndarray
    node_mask: np.ndarray
    num_nodes: np.ndarray

    @property
    def max_nodes(self) -> int:
        return self.node_onehot.shape[1]

    @property
    def max_edges(self) -> int:
        return self.edge_src.shape[1]


def _stack_corpus(corpus: GraphCorpus, nodes_multiple=8, edges_multiple=128,
                  max_nodes=None, max_edges=None) -> GraphArrays:
    return GraphArrays(**corpus.stack(max_nodes=max_nodes, max_edges=max_edges,
                                      nodes_multiple=nodes_multiple,
                                      edges_multiple=edges_multiple))


def _normalize_foreignness(f: np.ndarray):
    if np.isnan(f).any():
        # documented fail-fast divergence: the reference dropnas on the
        # 'foreign'/'Foreignness_Score' column but READS 'smoothed_foreign'
        # (preprocess.py:50-59), so a row with NaN smoothed_foreign would
        # silently NaN the min/max here and poison every normalized target;
        # raise instead of training on all-NaN foreignness
        raise ValueError(
            f"{int(np.isnan(f).sum())}/{f.size} foreignness values are NaN "
            "(rows with NaN smoothed_foreign survive the reference's "
            "dropna columns); clean the property table before training")
    lo, hi = float(np.min(f)), float(np.max(f))
    norm = 2.0 * (f - (hi + lo) / 2.0) / (hi - lo) if hi > lo else np.zeros_like(f)
    return norm.astype(np.float32), lo, hi


@dataclasses.dataclass
class ImmunoDataset:
    """Single-modality dataset (ImmunoPredDataset parity).

    Arrays (M rows):
      seq_full [M, Lf, 21], seq_pep [M, Lp, 21], props [M, 2] (Mprop1/2),
      immuno [M], foreign_norm [M] in [-1, 1], graph_idx [M] -> graphs.
    """

    seq_full: np.ndarray
    seq_pep: np.ndarray
    props: np.ndarray
    immuno: np.ndarray
    foreign_norm: np.ndarray
    graph_idx: np.ndarray
    graphs: GraphArrays
    class_weights: Counter
    foreign_min: float
    foreign_max: float
    raw_chain: list[str]            # full peptide-HLA chains, for prediction dumps
    pep_len: np.ndarray             # real peptide length per row (for seq masking)

    def __len__(self):
        return len(self.immuno)

    def denormalize(self, output: np.ndarray) -> np.ndarray:
        """Inverse of the [-1, 1] normalization (immmunopred_dataloader.py:72-73)."""
        return output / 2.0 * (self.foreign_max - self.foreign_min) + \
            (self.foreign_max + self.foreign_min) / 2.0

    @classmethod
    def load(cls, config, graph_directory: str, property_path: str, hla_path: str,
             corpus: Optional[GraphCorpus] = None,
             cancer: Optional[bool] = None) -> "ImmunoDataset":
        # table dialect defaults to the reference's directory-name heuristic
        # (train_IEDB_wFT.py via immmunopred_dataloader.py:29); pass `cancer`
        # explicitly when the directory name doesn't encode it
        if cancer is None:
            cancer = "Cancer" in graph_directory
        corpus = corpus if corpus is not None else load_graph_dir(graph_directory)
        f_dict, fp2_dict, imm_dict, pep_pairs = parse_property_table(property_path, cancer)
        name_mapper = expand_hla(pep_pairs, hla_path)
        return cls.from_joined(config, corpus, name_mapper, f_dict, fp2_dict, imm_dict)

    @classmethod
    def from_joined(cls, config, corpus: GraphCorpus, name_mapper: dict,
                    f_dict: dict, fp2_dict: dict, imm_dict: dict,
                    verbose: bool = True, pairs: Optional[list] = None) -> "ImmunoDataset":
        # two-sided join (preprocess.py:147-173)
        #
        # ``pairs``: optional ordered pep_pair list, possibly with
        # DUPLICATES. The comparative path needs it: two cancer mutants can
        # share one WT peptide+allele, and the reference keeps one aligned
        # WT row per combined-table row (preprocess.py:188-266 iterates
        # rows, resolving dict lookups per row) — deduping by pep_pair here
        # would misalign the twins. Found by the real cedar corpus (2,710
        # combined rows, 2,686 unique WT pep_pairs).
        corpus_index = corpus.index()
        items = (list(name_mapper.items()) if pairs is None
                 else [(p, name_mapper[p]) for p in pairs])
        rows = [(pair, v) for pair, v in items if v[1] in corpus_index]
        if not rows:
            raise ValueError(
                "sequence/graph join produced 0 rows: no pep_pair chain key "
                "matches any graph name. Check that the graph directory and "
                "the property/HLA tables belong to the same corpus (graph "
                f"count={len(corpus)}, table rows={len(name_mapper)}).")
        used_keys = sorted({v[1] for _, v in rows}, key=lambda k: corpus_index[k])
        if verbose:
            # join-statistic reporting, reference UX parity (preprocess.py:158,:173)
            print(f"new sequence table size: {len(rows)}, "
                  f"removed {len(items) - len(rows)}")
            print(f"new graph list size: {len(used_keys)}, "
                  f"removed {len(corpus) - len(used_keys)}")
        key_to_new = {k: i for i, k in enumerate(used_keys)}
        sub = corpus.subset([corpus_index[k] for k in used_keys])

        chains = [v[0] for _, v in rows]
        peps = [v[2] for _, v in rows]
        max_full = max(len(c) for c in chains)
        max_pep = max(len(p) for p in peps)

        immuno = np.asarray([imm_dict[pair] for pair, _ in rows], np.float32)
        foreign = np.asarray([f_dict[pair] for pair, _ in rows], np.float32)
        props = np.asarray([fp2_dict[pair] for pair, _ in rows], np.float32)
        graph_idx = np.asarray([key_to_new[v[1]] for _, v in rows], np.int32)

        foreign_norm, lo, hi = _normalize_foreignness(foreign)
        graphs = _stack_corpus(sub, nodes_multiple=config.pad_nodes_multiple,
                               edges_multiple=config.pad_edges_multiple)
        return cls(
            seq_full=one_hot_encode_batch(chains, max_full),
            seq_pep=one_hot_encode_batch(peps, max_pep),
            props=props, immuno=immuno, foreign_norm=foreign_norm,
            graph_idx=graph_idx, graphs=graphs,
            class_weights=Counter(immuno.tolist()),
            foreign_min=lo, foreign_max=hi,
            raw_chain=chains,
            pep_len=np.asarray([len(p) for p in peps], np.int32),
        )


@dataclasses.dataclass
class ComparativeDataset:
    """Paired cancer/WT dataset (ImmunoPredDatasetComparative parity)."""

    cancer: ImmunoDataset
    wt: ImmunoDataset

    def __len__(self):
        return len(self.cancer)

    @property
    def class_weights(self) -> Counter:
        return self.cancer.class_weights

    @classmethod
    def load(cls, config, graph_directory_cancer: str, graph_directory_wt: str,
             property_path_cancer: str, property_path_wt: str, hla_path: str,
             corpus_cancer: Optional[GraphCorpus] = None,
             corpus_wt: Optional[GraphCorpus] = None) -> "ComparativeDataset":
        corpus_c = corpus_cancer if corpus_cancer is not None else load_graph_dir(graph_directory_cancer)
        corpus_w = corpus_wt if corpus_wt is not None else load_graph_dir(graph_directory_wt)
        combined = parse_property_tables_cancer_wt(property_path_cancer, property_path_wt)
        mapper_c = expand_hla(combined["pep_pair_cancer"], hla_path)
        mapper_w = expand_hla(combined["pep_pair_wt"], hla_path)

        # keep rows whose cancer AND wt graphs both exist (preprocess.py:188-266)
        keys_c, keys_w = set(corpus_c.index()), set(corpus_w.index())
        ok = combined.apply(
            lambda r: mapper_c[r["pep_pair_cancer"]][1] in keys_c
            and mapper_w[r["pep_pair_wt"]][1] in keys_w, axis=1)
        combined = combined[ok].reset_index(drop=True)
        if len(combined) == 0:
            raise ValueError("no cancer/WT rows survived the graph join")

        f_c = dict(zip(combined["pep_pair_cancer"], combined["smoothed_foreign"]))
        fp2_c = dict(zip(combined["pep_pair_cancer"],
                         zip(combined["Mprop1"], combined["Mprop2"])))
        imm_c = dict(zip(combined["pep_pair_cancer"], combined["immunogenicity"]))
        cancer_ds = ImmunoDataset.from_joined(
            config, corpus_c, mapper_c, f_c, fp2_c, imm_c,
            pairs=combined["pep_pair_cancer"].tolist())

        # WT rows: label forced 0, foreignness = corpus minimum
        # (immmunopred_dataloader.py:182-183). Row order follows the
        # combined table (duplicate WT pep_pairs stay duplicated) so the
        # twins align 1:1 with the cancer side.
        wt_min = float(combined["smoothed_foreign"].min())
        f_w = {k: wt_min for k in combined["pep_pair_wt"]}
        fp2_w = dict(zip(combined["pep_pair_wt"],
                         zip(combined["Mprop1_wt"], combined["Mprop2_wt"])))
        imm_w = {k: 0.0 for k in combined["pep_pair_wt"]}
        wt_ds = ImmunoDataset.from_joined(
            config, corpus_w, mapper_w, f_w, fp2_w, imm_w,
            pairs=combined["pep_pair_wt"].tolist())

        if len(cancer_ds) != len(wt_ds):
            raise ValueError(f"cancer/WT row mismatch: {len(cancer_ds)} vs {len(wt_ds)}")
        # The reference's comparative normalize() uses ONE min/max pair —
        # the cancer side's — class-wide, and never rescales the WT tensor
        # (immmunopred_dataloader.py:208-214; WT stays at the raw corpus
        # min, which equals -1.0 under that normalization). from_joined
        # normalized the all-constant WT array against itself (-> 0.0 with
        # degenerate denormalize bounds); redo it with the cancer bounds so
        # WT foreign_norm reads -1.0 and wt.denormalize matches the
        # reference's single class-level (min, max).
        lo, hi = cancer_ds.foreign_min, cancer_ds.foreign_max
        wt_ds.foreign_min, wt_ds.foreign_max = lo, hi
        if hi > lo:
            norm_min = 2.0 * (wt_min - (hi + lo) / 2.0) / (hi - lo)
            wt_ds.foreign_norm = np.full_like(wt_ds.foreign_norm, norm_min)
        # training reads the label/foreignness from the cancer side
        # (immmunopred_dataloader.py:279-285 returns cancer immuno/foreignness)
        return cls(cancer=cancer_ds, wt=wt_ds)


@dataclasses.dataclass
class ClinicalDataset:
    """Clinical scoring rows aligned 1:1 with the clinical sequence table.

    In the reference, rows without a matching graph carry NaN features so
    their predictions come out NaN and are excluded from the per-patient load
    (infer_dataloader.py:220-224; clinical_validation.py:196-197). Here the
    stored features are zero-filled (NaNs would poison the jitted forward)
    and the ``valid`` mask drives the same exclusion after the forward pass;
    ``props`` keeps its NaNs for reference-parity inspection.

    Exposes the BatchPipeline field surface (immuno/foreign_norm are -1
    placeholders, infer_dataloader.py:233).
    """

    seq_full: np.ndarray
    seq_pep: np.ndarray
    props: np.ndarray              # NaN on invalid rows (parity)
    props_filled: np.ndarray       # zero-filled copy used by the pipeline
    graph_idx: np.ndarray
    graphs: GraphArrays
    valid: np.ndarray              # bool per row: had a real graph match
    patients: list[str]
    immuno: np.ndarray = dataclasses.field(default=None)
    foreign_norm: np.ndarray = dataclasses.field(default=None)

    def __post_init__(self):
        if self.immuno is None:
            self.immuno = np.full((len(self.graph_idx),), -1.0, np.float32)
        if self.foreign_norm is None:
            self.foreign_norm = np.full((len(self.graph_idx),), -1.0, np.float32)

    def __len__(self):
        return len(self.graph_idx)

    @classmethod
    def load(cls, config, graph_directory: str, seq_path: str,
             corpus: Optional[GraphCorpus] = None) -> "ClinicalDataset":
        corpus = corpus if corpus is not None else load_graph_dir(graph_directory)
        seq_df = pd.read_table(seq_path)

        # build name mapper from the clinical table itself
        # (preprocess.py:302-313: combo column keys, hla_seq + mut_pep chains)
        from immunostruct_tpu.data.tables import get_hash
        name_mapper = {}
        for combo, hla_seq, mut_pep in zip(seq_df["combo"], seq_df["hla_seq"],
                                           seq_df["mut_pep"]):
            chain = str(hla_seq) + str(mut_pep)
            name_mapper[str(combo)] = (
                chain, chain[-99:] + "_" + get_hash(chain)[:5], str(mut_pep))

        corpus_index = corpus.index()
        valid_rows = {combo: v for combo, v in name_mapper.items()
                      if v[1] in corpus_index}
        if not valid_rows:
            raise ValueError("no clinical rows matched a graph")

        used_keys = sorted({v[1] for v in valid_rows.values()},
                           key=lambda k: corpus_index[k])
        key_to_new = {k: i for i, k in enumerate(used_keys)}
        sub = corpus.subset([corpus_index[k] for k in used_keys])
        graphs = _stack_corpus(sub, nodes_multiple=config.pad_nodes_multiple,
                               edges_multiple=config.pad_edges_multiple)

        chains = [v[0] for v in valid_rows.values()]
        peps = [v[2] for v in valid_rows.values()]
        max_full = max(len(c) for c in chains)
        max_pep = max(len(p) for p in peps)
        placeholder_key = next(iter(valid_rows.values()))[1]

        m = len(seq_df)
        seq_full = np.zeros((m, max_full, 21), np.float32)
        seq_pep = np.zeros((m, max_pep, 21), np.float32)
        props = np.full((m, 2), np.nan, np.float32)
        graph_idx = np.full((m,), key_to_new[placeholder_key], np.int32)
        row_combos = [str(c) for c in seq_df["combo"]]
        valid = np.asarray([c in valid_rows for c in row_combos], bool)

        # encode the matched rows as ONE batch per modality (a per-row
        # one_hot_encode_batch call costs minutes at 29K clinical rows)
        idx = np.nonzero(valid)[0]
        if len(idx):
            matched = [valid_rows[row_combos[i]] for i in idx]
            seq_full[idx] = one_hot_encode_batch([v[0] for v in matched], max_full)
            seq_pep[idx] = one_hot_encode_batch([v[2] for v in matched], max_pep)
            props[idx] = [0.4, 0.4]  # placeholder props (infer_dataloader.py:216-217)
            graph_idx[idx] = [key_to_new[v[1]] for v in matched]

        props_filled = np.where(np.isnan(props), 0.0, props).astype(np.float32)
        return cls(seq_full=seq_full, seq_pep=seq_pep, props=props,
                   props_filled=props_filled,
                   graph_idx=graph_idx, graphs=graphs, valid=valid,
                   patients=[str(p) for p in seq_df["patient"].tolist()])
