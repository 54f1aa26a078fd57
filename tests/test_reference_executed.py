"""Executed-reference golden parity: import the reference's OWN code from
/root/reference and run it against this repo's implementations.

Everything else in tests/ compares against re-derivations (independent
re-implementations of the same equations). This file upgrades the evidence
class for the directly-runnable slice of the reference: torch and sklearn
are installed here, and the only missing dependency on these paths is dgl
(imported at module scope by data/utils.py:2), which is stubbed since the
functions under test never touch it.

Covered (VERDICT round-2 item 2):
  - preprocess_properties / preprocess_properties_cancer_wt /
    __dedup_property_df / preprocess_hla (data/preprocess.py:45-145)
    executed on the REAL cedar table vs data/tables.py
  - Losses.regression_loss / BCE_loss (+_SSL) (utils/loss.py:13-61)
    vs utils/losses.py on random tensors
  - PairedContrastiveLoss (utils/contrastive.py:37-83) vs
    paired_contrastive_loss with copied projector weights
  - LinearWarmupCosineAnnealingLR stepped per-epoch exactly as the
    reference train loop does (utils/scheduler.py; train.py:33-34)
    vs utils/schedule.py
  - procedures/metric.py:6-115 vs procedures/metrics.py on random
    predictions
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

REF_ROOT = "/root/reference/immunostruct"
REF_DATA = "/root/reference/data"
CEDAR = os.path.join(REF_DATA, "cedar_data_final_with_mprop1_mprop2_v2.txt")
HLA = os.path.join(REF_DATA, "HLA_27_seqs_csv.csv")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present")


# ---------------------------------------------------------------------------
# Reference loader: fake package + dgl stub
# ---------------------------------------------------------------------------

def _ensure_pkg(name: str, path: str) -> None:
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        pkg.__package__ = name
        sys.modules[name] = pkg


def _load(modname: str, filepath: str):
    """Import a reference file under the fake 'refimmuno' package so its
    relative imports resolve, executing the reference's own code."""
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(modname, filepath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Namespace of executed reference modules (dgl stubbed)."""
    if "dgl" not in sys.modules:
        sys.modules["dgl"] = types.ModuleType("dgl")  # never touched here
    _ensure_pkg("refimmuno", REF_ROOT)
    _ensure_pkg("refimmuno.data", os.path.join(REF_ROOT, "data"))
    _ensure_pkg("refimmuno.utils", os.path.join(REF_ROOT, "utils"))
    _ensure_pkg("refimmuno.procedures", os.path.join(REF_ROOT, "procedures"))
    ns = types.SimpleNamespace()
    ns.utils_data = _load("refimmuno.data.utils",
                          os.path.join(REF_ROOT, "data", "utils.py"))
    ns.preprocess = _load("refimmuno.data.preprocess",
                          os.path.join(REF_ROOT, "data", "preprocess.py"))
    ns.loss = _load("refimmuno.utils.loss",
                    os.path.join(REF_ROOT, "utils", "loss.py"))
    ns.contrastive = _load("refimmuno.utils.contrastive",
                           os.path.join(REF_ROOT, "utils", "contrastive.py"))
    ns.scheduler = _load("refimmuno.utils.scheduler",
                         os.path.join(REF_ROOT, "utils", "scheduler.py"))
    ns.metric = _load("refimmuno.procedures.metric",
                      os.path.join(REF_ROOT, "procedures", "metric.py"))
    return ns


@pytest.fixture(scope="module")
def wt_table(tmp_path_factory):
    """WT-schema table synthesized from the real cedar rows (the actual WT
    property table is one of the checkout's missing large blobs). Both
    implementations read the SAME file, so the comparison is still pure
    code-vs-code."""
    df = pd.read_table(CEDAR)
    wt = df.copy()
    wt["Mprop1_wt"] = wt["Mprop1"]
    wt["Mprop2_wt"] = wt["Mprop2"]
    path = tmp_path_factory.mktemp("reftab") / "wildtype.tsv"
    wt.to_csv(path, sep="\t", index=False)
    return str(path)


@pytest.fixture(scope="module")
def iedb_table(tmp_path_factory):
    """IEDB-schema table from the real cedar rows (peptide/allele/
    Foreignness_Score columns), as scripts/realdata_e2e.py synthesizes."""
    df = pd.read_table(CEDAR)
    iedb = df.rename(columns={"mut_pep": "peptide"}).copy()
    iedb["Foreignness_Score"] = iedb["foreign"]
    # IEDB alleles are already in 'HLA-A*02:01' style (preprocess.py:56-57)
    parts = iedb["allele"].str.split("-", expand=True)
    iedb["allele"] = (parts[0] + "-" + parts[1].str[0] + "*"
                      + parts[1].str[1:3] + ":" + parts[1].str[3:])
    path = tmp_path_factory.mktemp("reftab") / "iedb.tsv"
    iedb.to_csv(path, sep="\t", index=False)
    return str(path)


# ---------------------------------------------------------------------------
# Tables (data/preprocess.py:45-145 vs data/tables.py) on the REAL cedar
# ---------------------------------------------------------------------------

def _dict_equal(a: dict, b: dict):
    assert set(a) == set(b)
    for k in a:
        av, bv = a[k], b[k]
        if isinstance(av, tuple):
            assert tuple(av) == tuple(bv), k
        else:
            assert av == bv or (pd.isna(av) and pd.isna(bv)), k


def test_preprocess_properties_cancer_executed(ref):
    from immunostruct_tpu.data.tables import parse_property_table

    rf, rfp2, rimm, rpairs = ref.preprocess.preprocess_properties(
        CEDAR, cancer=True)
    mf, mfp2, mimm, mpairs = parse_property_table(CEDAR, cancer=True)
    assert rpairs == mpairs
    _dict_equal(rf, mf)
    _dict_equal(rfp2, mfp2)
    _dict_equal(rimm, mimm)


def test_preprocess_properties_iedb_executed(ref, iedb_table):
    from immunostruct_tpu.data.tables import parse_property_table

    rf, rfp2, rimm, rpairs = ref.preprocess.preprocess_properties(
        iedb_table, cancer=False)
    mf, mfp2, mimm, mpairs = parse_property_table(iedb_table, cancer=False)
    assert rpairs == mpairs
    _dict_equal(rf, mf)
    _dict_equal(rfp2, mfp2)
    _dict_equal(rimm, mimm)


def test_dedup_property_df_executed(ref):
    """__dedup_property_df (preprocess.py:92-130) vs the vectorized
    dedup_property_df on the real cedar short-df (which contains genuine
    duplicate (mut_pep, wt_pep, allele) groups)."""
    from immunostruct_tpu.data.tables import (
        dedup_property_df, reformat_cancer_allele)

    df = pd.read_table(CEDAR).dropna(subset="foreign")
    df = df.assign(pep_pair_cancer=df["mut_pep"]
                   + reformat_cancer_allele(df["allele"]))
    short = df[["mut_pep", "wt_pep", "allele", "immunogenicity",
                "pep_pair_cancer", "smoothed_foreign", "Mprop1", "Mprop2"]]
    ref_out = getattr(ref.preprocess, "__dedup_property_df")(short)
    my_out = dedup_property_df(short)
    assert len(ref_out) < len(short)  # the real table does deduplicate
    pd.testing.assert_frame_equal(
        ref_out.sort_index(), my_out.sort_index())


def test_cancer_wt_combined_executed(ref, wt_table):
    from immunostruct_tpu.data.tables import parse_property_tables_cancer_wt

    ref_df = ref.preprocess.preprocess_properties_cancer_wt(CEDAR, wt_table)
    my_df = parse_property_tables_cancer_wt(CEDAR, wt_table)
    assert list(ref_df.columns) == list(my_df.columns)
    pd.testing.assert_frame_equal(ref_df.reset_index(drop=True),
                                  my_df.reset_index(drop=True))


def test_preprocess_hla_executed(ref):
    from immunostruct_tpu.data.tables import expand_hla

    _, _, _, pairs = ref.preprocess.preprocess_properties(CEDAR, cancer=True)
    ref_map = ref.preprocess.preprocess_hla(pairs, HLA)
    my_map = expand_hla(pairs, HLA)
    assert set(ref_map) == set(my_map)
    for k in ref_map:
        assert tuple(ref_map[k]) == tuple(my_map[k]), k


# ---------------------------------------------------------------------------
# Losses (utils/loss.py:13-61 vs utils/losses.py)
# ---------------------------------------------------------------------------

def _loss_inputs(seed=0, b=16, d=126, zdim=32):
    rng = np.random.default_rng(seed)
    return dict(
        recon=rng.normal(size=(b, d)).astype(np.float32),
        x=rng.normal(size=(b, d)).astype(np.float32),
        mu=rng.normal(size=(b, zdim)).astype(np.float32),
        logvar=rng.normal(size=(b, zdim)).astype(np.float32) * 0.3,
        pred=rng.normal(size=(b, 1)).astype(np.float32),
        y_cont=rng.normal(size=(b,)).astype(np.float32),
        y_bin=(rng.random(b) > 0.6).astype(np.float32),
    )


@pytest.mark.parametrize("sequence", [True, False])
def test_losses_executed(ref, sequence):
    import torch
    from collections import Counter
    from immunostruct_tpu.utils.losses import (
        LossConfig, regression_loss, bce_loss)

    t = _loss_inputs()
    cw = Counter({0: 11, 1: 5})
    rl = ref.loss.Losses(t["x"].shape[1], cw, sequence=sequence)
    tt = {k: torch.tensor(v) for k, v in t.items()}

    ref_reg = rl.regression_loss(tt["recon"], tt["x"], tt["mu"],
                                 tt["logvar"], tt["pred"], tt["y_cont"])
    ref_bce = rl.BCE_loss(tt["recon"], tt["x"], tt["mu"], tt["logvar"],
                          tt["pred"], tt["y_bin"])

    cfg = LossConfig(vae_input_dim=t["x"].shape[1],
                     pos_weight=cw[0] / cw[1], sequence=sequence)
    my_reg = regression_loss(cfg, t["recon"], t["x"], t["mu"], t["logvar"],
                             t["pred"], t["y_cont"])
    my_bce = bce_loss(cfg, t["recon"], t["x"], t["mu"], t["logvar"],
                      t["pred"], t["y_bin"])
    np.testing.assert_allclose(float(my_reg), float(ref_reg), rtol=1e-5)
    np.testing.assert_allclose(float(my_bce), float(ref_bce), rtol=1e-5)


def test_losses_ssl_executed(ref):
    import torch
    from collections import Counter
    from immunostruct_tpu.utils.losses import (
        LossConfig, regression_loss, bce_loss)

    t = _loss_inputs(seed=3)
    rng = np.random.default_rng(4)
    b = t["pred"].shape[0]
    node_logits = rng.normal(size=(b, 20)).astype(np.float32)
    residue = rng.integers(0, 20, size=(b,))

    cw = Counter({0: 9, 1: 7})
    rl = ref.loss.Losses(t["x"].shape[1], cw, sequence=True)
    tt = {k: torch.tensor(v) for k, v in t.items()}
    ref_reg = rl.regression_loss_SSL(
        tt["recon"], tt["x"], tt["mu"], tt["logvar"], tt["pred"],
        tt["y_cont"], torch.tensor(node_logits), torch.tensor(residue))
    ref_bce = rl.BCE_loss_SSL(
        tt["recon"], tt["x"], tt["mu"], tt["logvar"], tt["pred"],
        tt["y_bin"], torch.tensor(node_logits), torch.tensor(residue))
    # empty prediction tensor -> aux term skipped (train_SSL val loops)
    ref_reg_noaux = rl.regression_loss_SSL(
        tt["recon"], tt["x"], tt["mu"], tt["logvar"], tt["pred"],
        tt["y_cont"], torch.empty(0), torch.empty(0))

    cfg = LossConfig(vae_input_dim=t["x"].shape[1],
                     pos_weight=cw[0] / cw[1], sequence=True, ssl=True)
    my_reg = regression_loss(cfg, t["recon"], t["x"], t["mu"], t["logvar"],
                             t["pred"], t["y_cont"],
                             node_logits=node_logits, residue=residue)
    my_bce = bce_loss(cfg, t["recon"], t["x"], t["mu"], t["logvar"],
                      t["pred"], t["y_bin"],
                      node_logits=node_logits, residue=residue)
    my_reg_noaux = regression_loss(
        cfg, t["recon"], t["x"], t["mu"], t["logvar"], t["pred"], t["y_cont"],
        node_logits=None, residue=None)
    np.testing.assert_allclose(float(my_reg), float(ref_reg), rtol=1e-5)
    np.testing.assert_allclose(float(my_bce), float(ref_bce), rtol=1e-5)
    np.testing.assert_allclose(float(my_reg_noaux), float(ref_reg_noaux),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# Contrastive (utils/contrastive.py:37-83) with copied projector weights
# ---------------------------------------------------------------------------

def test_contrastive_executed(ref):
    import torch
    from immunostruct_tpu.utils.contrastive import (
        paired_contrastive_init, paired_contrastive_loss)
    import jax

    emb_dim, z_dim, b = 104, 128, 12
    torch.manual_seed(7)
    ref_loss_mod = ref.contrastive.PairedContrastiveLoss(
        embedding_dim=emb_dim, z_dim=z_dim)

    rng = np.random.default_rng(11)
    ec = rng.normal(size=(b, emb_dim)).astype(np.float32)
    ew = rng.normal(size=(b, emb_dim)).astype(np.float32)
    y = np.array([0, 1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 0], dtype=np.float32)

    ref_loss_mod.train()
    ref_out = ref_loss_mod(torch.tensor(ec), torch.tensor(ew),
                           torch.tensor(y))

    params = paired_contrastive_init(jax.random.PRNGKey(0), emb_dim, z_dim)
    fc1, bn, _, fc2 = ref_loss_mod.projector
    params["fc1"]["w"] = np.asarray(fc1.weight.detach().numpy().T)
    params["bn_scale"] = np.asarray(bn.weight.detach().numpy())
    params["bn_bias"] = np.asarray(bn.bias.detach().numpy())
    params["fc2"]["w"] = np.asarray(fc2.weight.detach().numpy().T)
    my_out = paired_contrastive_loss(params, ec, ew, y)
    np.testing.assert_allclose(float(my_out), float(ref_out), rtol=2e-4)

    # gate parity: continuous targets and single-class batches contrast to 0
    y_cont = rng.normal(size=(b,)).astype(np.float32)
    assert ref_loss_mod(torch.tensor(ec), torch.tensor(ew),
                        torch.tensor(y_cont)) == 0
    assert float(paired_contrastive_loss(params, ec, ew, y_cont)) == 0.0
    y_one = np.ones((b,), dtype=np.float32)
    assert ref_loss_mod(torch.tensor(ec), torch.tensor(ew),
                        torch.tensor(y_one)) == 0
    assert float(paired_contrastive_loss(params, ec, ew, y_one)) == 0.0


# ---------------------------------------------------------------------------
# Scheduler (utils/scheduler.py) stepped per-epoch like train.py:33-34
# ---------------------------------------------------------------------------

def test_scheduler_trace_executed(ref):
    import torch
    from immunostruct_tpu.utils.schedule import linear_warmup_cosine_annealing

    num_epochs, base_lr = 40, 1e-4
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    sched = ref.scheduler.LinearWarmupCosineAnnealingLR(
        opt, warmup_epochs=num_epochs // 4,
        warmup_start_lr=base_lr / 100, max_epochs=num_epochs)
    # the reference reads the LR during the epoch, then steps the scheduler
    # at epoch end (procedures/train.py:33-34, :127-128)
    ref_trace = []
    for _ in range(num_epochs):
        ref_trace.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    mine = linear_warmup_cosine_annealing(
        base_lr, warmup_epochs=num_epochs // 4, max_epochs=num_epochs,
        warmup_start_lr=base_lr / 100)
    my_trace = [float(mine(e)) for e in range(num_epochs)]
    np.testing.assert_allclose(my_trace, ref_trace, rtol=1e-5)


# ---------------------------------------------------------------------------
# Metrics (procedures/metric.py:6-115 vs procedures/metrics.py)
# ---------------------------------------------------------------------------

def _pred_fixture(seed=0, n=400):
    rng = np.random.default_rng(seed)
    p = rng.random(n)
    y = (rng.random(n) > 0.55).astype(np.uint8)
    y[50:150] = (p[50:150] > 0.5).astype(np.uint8)  # planted signal
    return y, p


def test_find_optimal_threshold_executed(ref):
    from immunostruct_tpu.procedures.metrics import find_optimal_threshold

    y, p = _pred_fixture()
    assert find_optimal_threshold(y, p) == pytest.approx(
        ref.metric.find_optimal_threshold(y, p), abs=0)


def test_mean_ppvn_executed(ref):
    from immunostruct_tpu.procedures.metrics import mean_ppvn

    y, p = _pred_fixture(seed=5)
    for topk in (None, 30, 10_000):
        assert mean_ppvn(y, p, topk=topk) == pytest.approx(
            ref.metric.mean_PPVn(y, p, topk=topk), rel=1e-12)
    # the evaluate_metrics quirk path: PPVn over BINARIZED predictions,
    # where tie-breaking order inside argsort matters
    for thr in (0.5, 0.7):
        assert mean_ppvn(y, (p >= thr).astype(float)) == pytest.approx(
            ref.metric.mean_PPVn(y, (p >= thr).astype(float)), rel=1e-12)


def test_evaluate_metrics_executed(ref, capsys):
    from immunostruct_tpu.procedures.metrics import (
        evaluate_metrics, find_optimal_threshold)

    y, p = _pred_fixture(seed=9)
    thr = find_optimal_threshold(y, p)
    ref_out = ref.metric.evaluate_metrics(y, p, thr)
    my_out = evaluate_metrics(y, p, thr, verbose=False)
    capsys.readouterr()
    assert set(ref_out) == set(my_out)
    for k in ref_out:
        np.testing.assert_allclose(my_out[k], ref_out[k], rtol=1e-9,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# Round-3 additions: sequence encoding, ExtendedDataset, $ROOT, dedupe
# ---------------------------------------------------------------------------

def test_one_hot_encode_sequence_executed(ref):
    """data/utils.py:75-89 (executed) vs data/encoding.py::one_hot_encode
    — 21-alphabet incl. the 'J' padding char, unknown chars -> zero rows."""
    from immunostruct_tpu.data.encoding import one_hot_encode
    for seq in ["ACDEFGHIKLMNPQRSTVWYJ", "AJJA", "AXB?C", ""]:
        theirs = ref.utils_data.one_hot_encode_sequence(seq)
        ours = one_hot_encode(seq)
        np.testing.assert_array_equal(ours, theirs.astype(np.float32))


def test_extended_dataset_executed(ref):
    """util_dataloader.py ExtendedDataset (executed): cyclic index
    extension matches BatchPipeline's extend_to tiling."""
    util_dl = _load("refimmuno.data.util_dataloader",
                    os.path.join(REF_ROOT, "data", "util_dataloader.py"))
    base = list(range(7))
    ext = util_dl.ExtendedDataset(base, 20)
    assert len(ext) == 20
    ref_order = [ext[i] for i in range(20)]
    # ours: np.tile of the index list, truncated to extend_to
    reps = int(np.ceil(20 / len(base)))
    ours = np.tile(np.asarray(base), reps)[:20]
    np.testing.assert_array_equal(ours, ref_order)


def test_update_paths_executed(ref):
    """utils/update_paths.py (executed) vs config.update_paths: identical
    $ROOT expansion over every string field (different roots by design —
    each expands relative to its own tree — so both run with the
    reference's computed ROOT)."""
    import types as _types
    from immunostruct_tpu.config import Config, update_paths

    up = _load("refimmuno.utils.update_paths",
               os.path.join(REF_ROOT, "utils", "update_paths.py"))
    ref_cfg = _types.SimpleNamespace(
        a="$ROOT/data/x.tsv", b="no-root", c=123, d="$ROOT/y")
    up.update_paths(ref_cfg)
    root = ref_cfg.a[: -len("/data/x.tsv")]

    cfg = Config(property_path_IEDB="$ROOT/data/x.tsv",
                 model_save_dir="$ROOT/y")
    update_paths(cfg, root=root)
    assert cfg.property_path_IEDB == ref_cfg.a
    assert cfg.model_save_dir == ref_cfg.d


def test_dedupe_executed(ref):
    """data/utils.py::dedupe (executed, graph args stubbed to the dgl
    surface it touches): a (sequence, reg-value) dupe is removed only when
    the graphs are fully identical — same rule as data/dedupe.py."""
    import types as _types

    def fake_graph(n_nodes, n_edges, tag):
        x = np.full((n_nodes, 22), float(tag))
        return _types.SimpleNamespace(
            num_nodes=lambda: n_nodes, num_edges=lambda: n_edges,
            ndata={"x": _TensorLike(x)},
            edata={"edge_attr": _TensorLike(np.ones((n_edges, 1)))},
            edges=lambda: (_TensorLike(np.zeros(n_edges)),
                           _TensorLike(np.zeros(n_edges))),
        )

    class _TensorLike:
        def __init__(self, a):
            self.a = a

        def tolist(self):
            return self.a.tolist()

    seqs = [np.eye(3)[:2], np.eye(3)[:2], np.eye(3)[1:], np.eye(3)[:2]]
    regs = [0.5, 0.5, 0.5, 0.5]
    imm = [1, 0, 1, 0]
    regf = [0.1, 0.2, 0.3, 0.4]
    graphs = [fake_graph(4, 6, 0), fake_graph(4, 6, 0),  # full dupe: drop 1
              fake_graph(4, 6, 0), fake_graph(5, 6, 0)]  # seq dupe, diff graph
    out = ref.utils_data.dedupe(seqs, regs, imm, regf, graphs)
    # index 1 removed (identical seq+reg+graph); index 3 kept (graph differs)
    assert [g.num_nodes() for g in out[4]] == [4, 4, 5]
    assert out[3] == [0.1, 0.3, 0.4]
