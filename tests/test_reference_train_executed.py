"""Executed-reference TRAIN-LOOP parity: run the reference's own
``procedures/train.py::train_model`` / ``train_model_comparative`` and
``procedures/infer.py::inference`` (torch CPU, wandb stubbed) against this
repo's ``Trainer.fit`` / ``procedures.infer.inference`` with identical
weights, identical tiny corpora, and both VAE reparameterizations pinned to
the mean — upgrading the LOOP semantics (per-epoch loss accumulation,
summed-val best-checkpoint selection, per-epoch scheduler stepping, stage
transition with head re-init, train->test threshold transfer) from
"re-derived" to "executed reference" (VERDICT r4 item 2, the last closable
evidence-class gap).

Three legs:
1. SequenceFpModel full two-stage curriculum with ZERO stubbed reference
   code (the model has no conv stack): pretrain (regression) -> best-val
   reload -> new head -> finetune (BCE + warmup-cosine scheduler) ->
   threshold transfer -> full metric dict.
2. HybridModelv2 with the SAME stand-in conv both sides (the pattern of
   tests/test_reference_model_executed.py): per-epoch train/val loss parity
   through the complete multimodal forward+backward+Adam chain.
3. HybridModelv2_Comparative through the reference's own
   ``train_model_comparative`` twin loop (averaged twin losses,
   train.py:107-114).

Reference: /root/reference/immunostruct/procedures/train.py:10-67,:70-185,
/root/reference/immunostruct/procedures/infer.py:9-103,
/root/reference/train_IEDB_wFT.py:78-129.
"""

from __future__ import annotations

import copy
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.test_reference_executed import REF_ROOT, _ensure_pkg, _load
from tests.test_reference_model_executed import (  # noqa: F401  (fixture)
    copy_linear, copy_shared_weights, refm,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                       reason="reference checkout not present"),
]

L_SEQ = 20           # tiny sequence length -> VAE input 20*21 = 420
VAE_DIM = L_SEQ * 21
B = 6                # batch size
N = 6                # padded nodes (hybrid legs)
N_TRAIN, N_VAL, N_TEST = 3, 2, 2   # batches per split


# ---------------------------------------------------------------------------
# Reference procedure loader (wandb + clinical_validation stubbed)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def refproc(refm):
    """Executed reference procedures: train.py / infer.py / metric.py.

    ``train.py`` does ``import wandb`` and ``from utils import
    PairedContrastiveLoss`` (absolute — the reference runs with its repo
    root on sys.path); ``infer.py`` pulls ``clinical_validation`` whose
    lifelines dep is absent here. All three boundaries are stubbed; every
    line of loop logic is the reference's own code.
    """
    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb.log = lambda *a, **k: None
        sys.modules["wandb"] = wandb

    _ensure_pkg("utils", os.path.join(REF_ROOT, "utils"))
    contrastive = _load("refimmuno.utils.contrastive",
                        os.path.join(REF_ROOT, "utils", "contrastive.py"))
    sys.modules["utils"].PairedContrastiveLoss = contrastive.PairedContrastiveLoss

    # infer.py: `from .clinical_validation import inference_clinical_only`
    # (lifelines not installed -> pre-register a stub submodule)
    clin = types.ModuleType("refimmuno.procedures.clinical_validation")
    clin.inference_clinical_only = lambda *a, **k: {}
    sys.modules.setdefault("refimmuno.procedures.clinical_validation", clin)

    ns = types.SimpleNamespace()
    ns.loss = _load("refimmuno.utils.loss",
                    os.path.join(REF_ROOT, "utils", "loss.py"))
    ns.scheduler = _load("refimmuno.utils.scheduler",
                         os.path.join(REF_ROOT, "utils", "scheduler.py"))
    ns.metric = _load("refimmuno.procedures.metric",
                      os.path.join(REF_ROOT, "procedures", "metric.py"))
    ns.train = _load("refimmuno.procedures.train",
                     os.path.join(REF_ROOT, "procedures", "train.py"))
    ns.infer = _load("refimmuno.procedures.infer",
                     os.path.join(REF_ROOT, "procedures", "infer.py"))
    return ns


# ---------------------------------------------------------------------------
# Shared tiny-corpus machinery
# ---------------------------------------------------------------------------

class ListPipe:
    """Fixed list of pre-assembled batches; epoch order is deterministic on
    both sides so the comparison isolates the LOOP semantics."""

    def __init__(self, batches):
        self.batches = batches

    def epoch(self, _epoch_idx):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _graph_pair(rng):
    """(reference stand-in graph, our GraphBatch) with identical node
    features — mirrors tests/test_reference_model_executed.py."""
    from immunostruct_tpu.structs import GraphBatch
    onehot = np.zeros((B, N, 20), np.float32)
    onehot[np.arange(B)[:, None], np.arange(N)[None, :],
           rng.integers(0, 20, (B, N))] = 1.0
    coords = rng.standard_normal((B, N, 3)).astype(np.float32)
    graph = types.SimpleNamespace(
        ndata={"x": torch.tensor(np.concatenate(
            [onehot, np.zeros((B, N, 2), np.float32)],
            axis=-1).reshape(B * N, 22))},
        edata={"edge_attr": torch.zeros(0, 1)},
        batch_num_nodes=lambda: [N] * B,
        device="cpu",
        to=None,
    )
    graph.to = lambda device, g=graph: g
    gb = GraphBatch(
        node_feat=jnp.asarray(onehot), coords=jnp.asarray(coords),
        edge_src=jnp.zeros((B, 1), jnp.int32),
        edge_dst=jnp.zeros((B, 1), jnp.int32),
        edge_feat=jnp.zeros((B, 1, 1)), edge_mask=jnp.zeros((B, 1), bool),
        node_mask=jnp.ones((B, N), bool),
        num_nodes=jnp.full((B,), N, jnp.int32),
    )
    return graph, gb


class _DummyGraph:
    def to(self, device):
        return self


def _make_split(rng, n_batches, binary, with_graph):
    """Parallel (torch loader list, our ListPipe) over identical data."""
    from immunostruct_tpu.structs import SampleBatch
    ref_batches, our_batches = [], []
    for _ in range(n_batches):
        seq = rng.random((B, L_SEQ, 21)).astype(np.float32)
        props = rng.random((B, 2)).astype(np.float32)
        if binary:
            target = (rng.random(B) > 0.5).astype(np.float32)
            if target.sum() == 0:
                target[0] = 1.0
            if target.sum() == B:
                target[0] = 0.0
        else:
            target = rng.uniform(-1, 1, B).astype(np.float32)
        if with_graph:
            graph, gb = _graph_pair(rng)
        else:
            # sequence-only models ignore the graph but the reference loop
            # still calls .to(device) on it (its loaders always yield a DGL
            # graph, train.py:20) — hand it an inert stand-in
            graph, gb = _DummyGraph(), None
        ref_batches.append((graph, torch.tensor(seq.reshape(B, -1)),
                            torch.tensor(target), torch.tensor(props)))
        our_batches.append(SampleBatch(
            graph=gb, seq_onehot=jnp.asarray(seq), props=jnp.asarray(props),
            target=jnp.asarray(target)))
    return ref_batches, ListPipe(our_batches)


def _zero_ref_noise(ref_model):
    """Pin the reference model: z = mu, dropout off (the randn_like /
    dropout draws cannot be made bitwise-identical across frameworks, and
    the loop semantics under test are orthogonal to them)."""
    ref_model.reparameterize = lambda mu, logvar: mu
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _pin_our_noise(monkeypatch):
    import immunostruct_tpu.models.trunk as trunk
    monkeypatch.setattr(trunk, "_reparameterize", lambda key, mu, lv: mu)


def _our_trainer(spec, loss_cfg, *, binary, lr, schedule=None,
                 steps_per_epoch=1):
    from immunostruct_tpu.procedures.train import Trainer, make_optimizer
    from immunostruct_tpu.utils.schedule import constant_lr
    opt = make_optimizer("adam", schedule or constant_lr(lr),
                         steps_per_epoch=steps_per_epoch)
    return Trainer(spec, loss_cfg, binary=binary, optimizer=opt,
                   aggregation="scatter", donate=False)


def _run_our_fit(trainer, params, train_pipe, val_pipe, epochs, ckpt_dir,
                 monkeypatch):
    """Run Trainer.fit capturing every best-val checkpoint save."""
    import immunostruct_tpu.procedures.train as our_train
    saved = []
    monkeypatch.setattr(our_train, "save_checkpoint",
                        lambda path, tree: saved.append(
                            jax.tree.map(np.asarray, tree)))
    state = trainer.init_state(params)
    state, history = trainer.fit(state, train_pipe, val_pipe, epochs,
                                 jax.random.key(0),
                                 ckpt_path=os.path.join(ckpt_dir, "our.npz"),
                                 verbose=False)
    return state, history, saved


def _run_ref_train(refproc, model, ref_train, ref_val, loss_fn, epochs, lr,
                   tmp, monkeypatch, scheduler_factory=None,
                   comparative=False):
    """Run the reference's own train_model capturing every torch.save."""
    cfg = types.SimpleNamespace(
        num_epochs=epochs,
        model_save_path_pretrain=os.path.join(tmp, "ref_pre.pt"),
        model_save_path_finetune=os.path.join(tmp, "ref_fin.pt"),
    )
    opt = torch.optim.Adam(
        [p for p in model.parameters() if p.requires_grad], lr=lr)
    sched = scheduler_factory(opt) if scheduler_factory else None
    saved = []
    monkeypatch.setattr(
        refproc.train.torch, "save",
        lambda obj, path: saved.append(copy.deepcopy(obj)))
    fn = (refproc.train.train_model_comparative if comparative
          else refproc.train.train_model)
    tr, vl = fn(cfg, "cpu", model, ref_train, ref_val, opt, loss_fn,
                scheduler=sched, stage="pretrain")
    return tr, vl, saved


def _assert_losses(ref_losses, our_losses, what):
    np.testing.assert_allclose(
        np.asarray(our_losses), np.asarray(ref_losses), rtol=5e-4, atol=5e-5,
        err_msg=f"{what}: per-epoch losses diverged from the executed "
                "reference loop")


# ---------------------------------------------------------------------------
# Leg 1: SequenceFpModel — full curriculum, zero stubbed reference code
# ---------------------------------------------------------------------------

def test_full_curriculum_executed_sequencefp(refm, refproc, monkeypatch,
                                             tmp_path):
    """pretrain -> best-val reload -> new head -> finetune(+scheduler) ->
    threshold transfer -> metrics, reference loop vs Trainer.fit."""
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.models.trunk import reset_head
    from immunostruct_tpu.utils.losses import LossConfig
    from immunostruct_tpu.utils.schedule import linear_warmup_cosine_annealing
    import immunostruct_tpu.procedures.infer as our_infer

    rng = np.random.default_rng(42)
    spec, params = build_model("SequenceFpModel", VAE_DIM, jax.random.key(3))
    import dataclasses
    spec = dataclasses.replace(spec, dropout_rate=0.0)

    torch.manual_seed(0)
    ref = refm.ablation.SequenceFpModel(VAE_DIM, device="cpu")
    copy_shared_weights(ref, params, spec)
    _zero_ref_noise(ref)
    _pin_our_noise(monkeypatch)

    ref_tr, our_tr = _make_split(rng, N_TRAIN, binary=False, with_graph=False)
    ref_va, our_va = _make_split(rng, N_VAL, binary=False, with_graph=False)

    # ---- stage 1: foreignness regression pretrain (5 epochs, Adam 1e-3)
    n_pos = max(int(sum(float(b[2].sum()) for b in ref_tr)), 1)
    loss_cfg = LossConfig(vae_input_dim=VAE_DIM, pos_weight=2.0)
    ref_losses = refproc.loss.Losses(VAE_DIM, class_weights=[2.0 * n_pos, n_pos])

    epochs = 5
    ref_tl, ref_vl, ref_saved = _run_ref_train(
        refproc, ref, ref_tr, ref_va, ref_losses.regression_loss, epochs,
        1e-3, str(tmp_path), monkeypatch)

    trainer = _our_trainer(spec, loss_cfg, binary=False, lr=1e-3,
                           steps_per_epoch=len(our_tr))
    state, hist, our_saved = _run_our_fit(
        trainer, params, our_tr, our_va, epochs, str(tmp_path), monkeypatch)

    _assert_losses(ref_tl, hist["train_loss"], "pretrain train")
    _assert_losses(ref_vl, hist["val_loss"], "pretrain val")

    # best-val selection: the reference compares the SUMMED val loss
    # (train.py:48-57), this repo the mean — same constant divisor, same
    # winner. Both sides must have checkpointed the same epoch sequence,
    # and the final saved params must be the same network.
    assert len(ref_saved) == len(our_saved), (
        "different checkpoint-improvement sequences: the summed-vs-mean "
        "val ordering claim at procedures/train.py:15-16 would be false")
    best = our_saved[-1]
    ref_best = ref_saved[-1]
    np.testing.assert_allclose(
        best["classifier"]["out"]["w"].T,
        ref_best["classifier.4.weight"].numpy(), rtol=1e-3, atol=1e-5,
        err_msg="best-val checkpoint is a different epoch's network")

    # ---- stage transition: reload best, re-init the head on our side and
    # copy the SAME fresh head into the reloaded reference model
    # (load_trained(new_head=True), hybrid_models.py:76-79)
    ref.load_state_dict({k: torch.tensor(np.asarray(v)) if not torch.is_tensor(v)
                         else v for k, v in ref_best.items()})
    params2 = reset_head(
        {k: jax.tree.map(jnp.asarray, v) for k, v in best.items()},
        spec, jax.random.key(11))
    copy_linear(ref.classifier[1], params2["classifier"]["trunk"])
    copy_linear(ref.classifier[4], params2["classifier"]["out"])

    # ---- stage 2: immunogenicity BCE finetune + warmup-cosine scheduler
    ref_tr2, our_tr2 = _make_split(rng, N_TRAIN, binary=True, with_graph=False)
    ref_va2, our_va2 = _make_split(rng, N_VAL, binary=True, with_graph=False)
    n1 = sum(float(b[2].sum()) for b in ref_tr2)
    n0 = N_TRAIN * B - n1
    loss_cfg2 = LossConfig(vae_input_dim=VAE_DIM, pos_weight=n0 / n1)
    ref_losses2 = refproc.loss.Losses(VAE_DIM, class_weights=[n0, n1])

    epochs2 = 6
    warm = epochs2 // 4
    sched_factory = lambda opt: refproc.scheduler.LinearWarmupCosineAnnealingLR(  # noqa: E731
        opt, warmup_epochs=warm, max_epochs=epochs2,
        warmup_start_lr=1e-5, eta_min=1e-6)
    ref_tl2, ref_vl2, ref_saved2 = _run_ref_train(
        refproc, ref, ref_tr2, ref_va2, ref_losses2.BCE_loss, epochs2,
        1e-3, str(tmp_path), monkeypatch, scheduler_factory=sched_factory)

    our_sched = linear_warmup_cosine_annealing(
        1e-3, warm, epochs2, warmup_start_lr=1e-5, eta_min=1e-6)
    trainer2 = _our_trainer(spec, loss_cfg2, binary=True, lr=1e-3,
                            schedule=our_sched, steps_per_epoch=len(our_tr2))
    state2, hist2, our_saved2 = _run_our_fit(
        trainer2, params2, our_tr2, our_va2, epochs2, str(tmp_path),
        monkeypatch)

    _assert_losses(ref_tl2, hist2["train_loss"],
                   "finetune train (per-epoch scheduler stepping)")
    _assert_losses(ref_vl2, hist2["val_loss"], "finetune val")
    assert len(ref_saved2) == len(our_saved2)

    # ---- threshold transfer + metric dump (train-derived Youden threshold
    # reused on test, train_IEDB_wFT.py:127-129; infer.py:9-50)
    best2 = our_saved2[-1]
    ref.load_state_dict({k: torch.tensor(np.asarray(v)) if not torch.is_tensor(v)
                         else v for k, v in ref_saved2[-1].items()})
    params_best = {k: jax.tree.map(jnp.asarray, v) for k, v in best2.items()}

    ref_te, our_te = _make_split(rng, N_TEST, binary=True, with_graph=False)
    cfg = types.SimpleNamespace(seed=0, aggregation="scatter",
                                compute_dtype="float32", scan_layers=False)
    ref_cfg = types.SimpleNamespace()
    ref_train_out = refproc.infer.inference(ref_cfg, ref, ref_tr2, "cpu")
    thr = ref_train_out["optimal_threshold"]
    ref_test_out = refproc.infer.inference(ref_cfg, ref, ref_te, "cpu",
                                           optimal_threshold=thr)

    our_train_out = our_infer.inference(cfg, spec, params_best, our_tr2,
                                        verbose=False)
    our_test_out = our_infer.inference(
        cfg, spec, params_best, our_te,
        optimal_threshold=our_train_out["optimal_threshold"], verbose=False)

    np.testing.assert_allclose(our_train_out["optimal_threshold"], thr,
                               rtol=1e-4, atol=1e-6)
    for key in ("roc_auc", "pr_auc", "accuracy", "accuracy_op", "f1",
                "f1_op", "precision", "precision_op", "recall", "recall_op",
                "ppvn", "ppvn_op", "ppv30", "ppv30_op"):
        np.testing.assert_allclose(
            our_test_out[key], ref_test_out[key], rtol=1e-4, atol=1e-6,
            err_msg=f"threshold-transferred test metric '{key}' diverged")


# ---------------------------------------------------------------------------
# Leg 2: HybridModelv2 with the shared stand-in conv
# ---------------------------------------------------------------------------

def test_train_loop_executed_hybridv2(refm, refproc, monkeypatch, tmp_path):
    """Per-epoch train/val loss parity through the complete multimodal
    forward+backward+Adam chain (attention, pooling, VAE, property branch,
    fusion attention, classifier) around a frozen shared stand-in conv."""
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.utils.losses import LossConfig
    import immunostruct_tpu.models.trunk as trunk

    rng = np.random.default_rng(7)
    spec, params = build_model("HybridModelv2", VAE_DIM, jax.random.key(5))
    import dataclasses
    spec = dataclasses.replace(spec, dropout_rate=0.0)

    torch.manual_seed(1)
    ref = refm.hybrid.HybridModelv2(VAE_DIM, device="cpu")
    copy_shared_weights(ref, params, spec)
    _zero_ref_noise(ref)
    _pin_our_noise(monkeypatch)

    # freeze the stand-in convs on the torch side and replay the SAME
    # projections as constants on ours: neither side trains the conv, so
    # the loops stay comparable while every other weight gets Adam updates
    projs = []
    for layer in ref.GCN_layers:
        layer.proj.weight.requires_grad_(False)
        projs.append(np.asarray(layer.proj.weight.detach().numpy().T))

    def fake_stack(layers, h, x, *args, **kwargs):
        for p in projs:
            h = h @ jnp.asarray(p, h.dtype)
        return h, x

    monkeypatch.setattr(trunk, "egnn_stack_apply", fake_stack)

    ref_tr, our_tr = _make_split(rng, N_TRAIN, binary=False, with_graph=True)
    ref_va, our_va = _make_split(rng, N_VAL, binary=False, with_graph=True)

    loss_cfg = LossConfig(vae_input_dim=VAE_DIM, pos_weight=1.0)
    ref_losses = refproc.loss.Losses(VAE_DIM, class_weights=[1.0, 1.0])

    epochs = 3
    ref_tl, ref_vl, _ = _run_ref_train(
        refproc, ref, ref_tr, ref_va, ref_losses.regression_loss, epochs,
        1e-3, str(tmp_path), monkeypatch)

    trainer = _our_trainer(spec, loss_cfg, binary=False, lr=1e-3,
                           steps_per_epoch=len(our_tr))
    _, hist, _ = _run_our_fit(trainer, params, our_tr, our_va, epochs,
                              str(tmp_path), monkeypatch)

    _assert_losses(ref_tl, hist["train_loss"], "hybridv2 train")
    _assert_losses(ref_vl, hist["val_loss"], "hybridv2 val")


# ---------------------------------------------------------------------------
# Leg 3: the comparative twin loop (train_model_comparative)
# ---------------------------------------------------------------------------

def test_comparative_train_loop_executed(refm, refproc, monkeypatch,
                                         tmp_path):
    """The reference's own train_model_comparative (averaged twin losses,
    train.py:107-114) vs Trainer.fit over a ComparativeBatch pipeline."""
    from immunostruct_tpu.models import build_model
    from immunostruct_tpu.structs import ComparativeBatch, SampleBatch
    from immunostruct_tpu.utils.losses import LossConfig
    import immunostruct_tpu.models.trunk as trunk

    rng = np.random.default_rng(9)
    spec, params = build_model("HybridModelv2_Comparative", VAE_DIM,
                               jax.random.key(13))
    import dataclasses
    spec = dataclasses.replace(spec, dropout_rate=0.0)

    torch.manual_seed(2)
    ref = refm.comparative.HybridModelv2_Comparative(VAE_DIM, device="cpu")
    copy_shared_weights(ref, params, spec)
    _zero_ref_noise(ref)
    _pin_our_noise(monkeypatch)

    projs = []
    for layer in ref.GCN_layers:
        layer.proj.weight.requires_grad_(False)
        projs.append(np.asarray(layer.proj.weight.detach().numpy().T))

    def fake_stack(layers, h, x, *args, **kwargs):
        for p in projs:
            h = h @ jnp.asarray(p, h.dtype)
        return h, x

    monkeypatch.setattr(trunk, "egnn_stack_apply", fake_stack)

    def make_comp_split(n_batches):
        ref_batches, our_batches = [], []
        for _ in range(n_batches):
            sides = []
            for _side in range(2):
                seq = rng.random((B, L_SEQ, 21)).astype(np.float32)
                props = rng.random((B, 2)).astype(np.float32)
                graph, gb = _graph_pair(rng)
                sides.append((seq, props, graph, gb))
            target = rng.uniform(-1, 1, B).astype(np.float32)
            (cs, cp, cg, cgb), (ws, wp, wg, wgb) = sides
            ref_batches.append((
                (cg, wg),
                (torch.tensor(cs.reshape(B, -1)), torch.tensor(ws.reshape(B, -1))),
                torch.tensor(target),
                (torch.tensor(cp), torch.tensor(wp))))
            our_batches.append(ComparativeBatch(
                cancer=SampleBatch(graph=cgb, seq_onehot=jnp.asarray(cs),
                                   props=jnp.asarray(cp),
                                   target=jnp.asarray(target)),
                wt=SampleBatch(graph=wgb, seq_onehot=jnp.asarray(ws),
                               props=jnp.asarray(wp),
                               target=jnp.asarray(target))))
        return ref_batches, ListPipe(our_batches)

    ref_tr, our_tr = make_comp_split(N_TRAIN)
    ref_va, our_va = make_comp_split(N_VAL)

    loss_cfg = LossConfig(vae_input_dim=VAE_DIM, pos_weight=1.0)
    ref_losses = refproc.loss.Losses(VAE_DIM, class_weights=[1.0, 1.0])

    epochs = 3
    ref_tl, ref_vl, _ = _run_ref_train(
        refproc, ref, ref_tr, ref_va, ref_losses.regression_loss, epochs,
        1e-3, str(tmp_path), monkeypatch, comparative=True)

    trainer = _our_trainer(spec, loss_cfg, binary=False, lr=1e-3,
                           steps_per_epoch=len(our_tr))
    _, hist, _ = _run_our_fit(trainer, params, our_tr, our_va, epochs,
                              str(tmp_path), monkeypatch)

    _assert_losses(ref_tl, hist["train_loss"], "comparative twin train")
    _assert_losses(ref_vl, hist["val_loss"], "comparative twin val")
