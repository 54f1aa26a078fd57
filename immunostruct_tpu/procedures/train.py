"""Training engine: jitted fused train/eval steps + host epoch loop.

Replaces the reference's per-batch Python loops with H2D copies and eager
kernels (reference: procedures/train.py:10-185, train_SSL.py) with one
compiled XLA program per step: EGNN stack + attention + VAE + fusion +
loss + grad + optimizer update all fuse under a single ``jax.jit`` (donated
state, so parameters update in place on device).

Parity notes:
- stage losses and their weights live in utils/losses.py;
- the comparative loss averages twin losses (train.py:107-114) and adds the
  gated contrastive term (train.py:116-118) whose projector params are part
  of the optimized pytree (fixing the reference's unoptimized projector,
  see utils/contrastive.py docstring);
- best-val checkpointing per epoch (train.py:48-57); the reference compares
  the *summed* val loss, which orders identically to the mean used here;
- the LR schedule advances once per epoch (train.py:33-34).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from immunostruct_tpu.models.trunk import (
    ModelSpec, model_apply, model_apply_comparative,
)
from immunostruct_tpu.structs import SampleBatch, ComparativeBatch
from immunostruct_tpu.utils.losses import LossConfig, make_loss_fn
from immunostruct_tpu.utils.contrastive import (
    paired_contrastive_init, paired_contrastive_loss,
)
from immunostruct_tpu.utils.checkpoint import save_checkpoint


class PretrainCollapse(RuntimeError):
    """Raised by ``Trainer.fit`` when the collapse guard fires and the
    caller opted into restart (``raise_on_fire``)."""

    def __init__(self, epoch: int, val_auc: float, window: int):
        super().__init__(
            f"pretrain collapse: val AUROC at chance ({val_auc:.3f}) for "
            f"{window} consecutive epochs (epoch {epoch + 1})")
        self.epoch = epoch
        self.val_auc = val_auc


@dataclasses.dataclass
class CollapseGuard:
    """Detects the flatlined-at-chance pretrain failure mode.

    Observed at flagship seed 2 (benchmarks/RESULTS.md seed-variance
    section): the 40+40 recipe sat at train ROC ~0.56 with all-negative
    predictions for the whole pretrain. The VAE branch keeps improving the
    combined loss while the classifier is dead, so loss alone cannot
    detect it — the guard watches per-epoch **val AUROC** instead (the
    logits are already computed by the val loss pass; reusing them is
    free). Fires when AUROC stays within ``chance_band`` of 0.5 for
    ``window`` consecutive epochs after ``min_epoch``.
    """

    window: int = 8           # consecutive at-chance epochs to fire
    chance_band: float = 0.07 # |AUROC - 0.5| below this counts as chance
    min_epoch: int = 6        # ignore the initial epochs
    raise_on_fire: bool = False
    # whether --reinit-on-collapse would act on this stage (pretrain-only;
    # train_model forces reinit off elsewhere) — gates the advice printed
    # when the guard fires so finetune warnings don't suggest a no-op flag
    reinit_available: bool = True

    _streak: int = dataclasses.field(default=0, init=False)
    fired: bool = dataclasses.field(default=False, init=False)

    def observe(self, epoch: int, val_auc: float) -> bool:
        """Record one epoch; returns True the first time the guard fires."""
        if epoch < self.min_epoch:
            return False
        at_chance = abs(val_auc - 0.5) < self.chance_band
        self._streak = self._streak + 1 if at_chance else 0
        if self._streak >= self.window and not self.fired:
            self.fired = True
            return True
        return False


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[])


def make_optimizer(name: str, lr_schedule: Callable, weight_decay: float = 0.0,
                   steps_per_epoch: int = 1):
    """Adam/AdamW with an epoch-indexed schedule (per-epoch stepping parity).

    Weight-decay semantics match torch: 'adam' with weight_decay applies
    coupled L2 (decay added to the gradient BEFORE the Adam moments, like
    torch.optim.Adam(weight_decay=...), used by the reference's IEDB
    finetune, train_IEDB_wFT.py:97); 'adamw' applies decoupled decay.
    """
    def per_step_schedule(step):
        return lr_schedule(step // steps_per_epoch)

    if name == "adamw":
        return optax.adamw(per_step_schedule, weight_decay=weight_decay)
    if weight_decay > 0:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(per_step_schedule))
    return optax.adam(per_step_schedule)


class Trainer:
    """One training stage (pretrain or finetune) for one model spec.

    The jitted step is specialized on (spec, binary, comparative, ssl,
    loss config, optimizer); batches of differing size trigger at most one
    extra compile (the remainder batch).
    """

    def __init__(self, spec: ModelSpec, loss_cfg: LossConfig, *, binary: bool,
                 optimizer: optax.GradientTransformation,
                 coeff_contrastive: float = 0.0,
                 aggregation: str = "auto", compute_dtype=jnp.float32,
                 donate: bool = True, mesh=None, shard_batch=None,
                 grad_accum_steps: int = 1, scan_layers: bool = False,
                 stack_twins: bool = False, mp=None,
                 allow_microbatch_contrastive: bool = False):
        if (coeff_contrastive > 0 and grad_accum_steps > 1
                and not allow_microbatch_contrastive):
            # The contrastive loss builds its pair-similarity matrix and
            # Barlow-Twins cross-correlation over the batch it sees
            # (utils/contrastive.py); under gradient accumulation that batch
            # is the microbatch, which silently changes the loss semantics
            # vs. the reference's full-batch statistics (contrastive.py:63-80
            # in the reference). Fail loudly instead of drifting.
            raise ValueError(
                f"coeff_contrastive={coeff_contrastive} with "
                f"grad_accum_steps={grad_accum_steps}: the contrastive "
                "pair-similarity/cross-correlation statistics would be "
                "computed per microbatch, not per global batch. Either set "
                "grad_accum_steps=1, disable the contrastive term, or pass "
                "allow_microbatch_contrastive=True to opt into microbatch "
                "statistics explicitly.")
        self.spec = spec
        self.loss_cfg = loss_cfg
        self.binary = binary
        self.optimizer = optimizer
        self.coeff_contrastive = coeff_contrastive
        self.aggregation = aggregation
        self.compute_dtype = compute_dtype
        self.loss_fn = make_loss_fn(loss_cfg, binary)
        self.mesh = mesh
        self.shard_batch = shard_batch
        # microbatched gradient accumulation: the batch's leading axis is
        # split into grad_accum_steps chunks scanned sequentially, averaging
        # grads. Keeps the per-chunk working set at the measured v5e sweet
        # spot (B=128; see docs/DESIGN.md section 2) while training at larger
        # effective batch sizes. Note: loss terms that mix examples across
        # the full batch (the contrastive pair-similarity/batchnorm) see the
        # microbatch, not the global batch.
        self.grad_accum_steps = grad_accum_steps
        self.scan_layers = scan_layers
        # one 2B-stacked forward_item instead of two B-sized twin passes
        # (models/trunk.py::model_apply_comparative docstring)
        self.stack_twins = stack_twins
        # model-parallel config (parallel/mp.py MPConfig). When set, the
        # step MUST run inside shard_map over the named axes
        # (parallel/trainer.py::make_mp_train_step); the plain jitted
        # _train_step would fail on the unbound axis names.
        self.mp = mp

        donate_args = (0,) if donate else ()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=donate_args)
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- state ---------------------------------------------------------------
    def init_state(self, params: dict, rng: Optional[jax.Array] = None) -> TrainState:
        if self.coeff_contrastive > 0 and "contrastive_projector" not in params:
            key = rng if rng is not None else jax.random.key(0)
            params = dict(params)
            params["contrastive_projector"] = paired_contrastive_init(
                key, embedding_dim=self.spec.embedding_dim)
        return TrainState(params=params,
                          opt_state=self.optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))

    # -- loss ----------------------------------------------------------------
    def _batch_loss_aux(self, params: dict, batch, rng: jax.Array,
                        deterministic: bool):
        """(loss, (logits, target)); the aux pair feeds the collapse guard."""
        if isinstance(batch, ComparativeBatch):
            c, w = batch.cancer, batch.wt
            out_c, out_w, logits = model_apply_comparative(
                params, self.spec, (c.graph, w.graph),
                (c.seq_onehot, w.seq_onehot), (c.props, w.props), rng,
                deterministic=deterministic, aggregation=self.aggregation,
                compute_dtype=self.compute_dtype, scan_layers=self.scan_layers,
                stack_twins=self.stack_twins, mp=self.mp)
            loss_c = self.loss_fn(out_c.recon, c.seq_onehot, out_c.mu, out_c.logvar,
                                  logits, c.target,
                                  node_logits=out_c.node_logits, residue=c.aux_residue)
            loss_w = self.loss_fn(out_w.recon, w.seq_onehot, out_w.mu, out_w.logvar,
                                  logits, w.target,
                                  node_logits=out_w.node_logits, residue=w.aux_residue)
            loss = (loss_c + loss_w) / 2.0
            if self.coeff_contrastive > 0:
                loss = loss + self.coeff_contrastive * paired_contrastive_loss(
                    params["contrastive_projector"], out_c.embedding,
                    out_w.embedding, c.target)
            return loss, (logits, c.target)
        out = model_apply(params, self.spec, batch.graph, batch.seq_onehot,
                          batch.props, rng, deterministic=deterministic,
                          aggregation=self.aggregation,
                          compute_dtype=self.compute_dtype,
                          scan_layers=self.scan_layers, mp=self.mp)
        loss = self.loss_fn(out.recon, batch.seq_onehot, out.mu, out.logvar,
                            out.logits, batch.target,
                            node_logits=out.node_logits, residue=batch.aux_residue)
        return loss, (out.logits, batch.target)

    def _batch_loss(self, params: dict, batch, rng: jax.Array, deterministic: bool):
        return self._batch_loss_aux(params, batch, rng, deterministic)[0]

    # -- steps ---------------------------------------------------------------
    def _loss_and_grads(self, params, batch, rng):
        k = self.grad_accum_steps
        batch_size = jax.tree.leaves(batch)[0].shape[0]
        if k <= 1 or batch_size % k != 0:
            # remainder batches (trailing partial batch) fall back to the
            # unsplit gradient; shapes are static so this is a trace-time branch
            return jax.value_and_grad(self._batch_loss)(params, batch, rng, False)

        def chunked(x):
            return jax.tree.map(
                lambda a: a.reshape((k, a.shape[0] // k) + a.shape[1:]), x)

        micro = chunked(batch)

        def body(carry, inp):
            loss_acc, grads_acc = carry
            mb, i = inp
            loss, grads = jax.value_and_grad(self._batch_loss)(
                params, mb, jax.random.fold_in(rng, i), False)
            return (loss_acc + loss,
                    jax.tree.map(jnp.add, grads_acc, grads)), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (loss_sum, grads_sum), _ = jax.lax.scan(
            body, (jnp.zeros(()), zeros), (micro, jnp.arange(k)))
        scale = 1.0 / k
        return loss_sum * scale, jax.tree.map(lambda g: g * scale, grads_sum)

    def _train_step_impl(self, state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = self._loss_and_grads(state.params, batch, rng)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    def _eval_step_impl(self, params: dict, batch, rng: jax.Array):
        return self._batch_loss_aux(params, batch, rng, True)

    # -- epoch loop ------------------------------------------------------------
    def fit(self, state: TrainState, train_pipe, val_pipe, num_epochs: int,
            rng: jax.Array, ckpt_path: Optional[str] = None,
            log_fn: Optional[Callable[[dict], None]] = None,
            verbose: bool = True, resume_path: Optional[str] = None,
            collapse_guard: Optional[CollapseGuard] = None):
        """Best-val-checkpointed training. Returns (state, history).

        ``resume_path``: optional full-state snapshot file; when it exists,
        training continues from the saved epoch (params + optimizer state +
        best-val tracker) — within-stage resume the reference lacks.

        ``collapse_guard``: optional at-chance-AUROC detector (see
        CollapseGuard). Warns loudly when it fires; raises PretrainCollapse
        instead when the guard has ``raise_on_fire`` set.
        """
        from immunostruct_tpu.utils.checkpoint import (
            save_resume_state, load_resume_state,
        )
        history = {"train_loss": [], "val_loss": [], "epoch_time": []}
        lowest_val = float("inf")
        start_epoch = 0
        if resume_path:
            resumed = load_resume_state(resume_path, state)
            if resumed is not None:
                state, start_epoch, lowest_val = resumed
                if verbose:
                    print(f"resumed from {resume_path} at epoch {start_epoch}")
        eval_rng = jax.random.fold_in(rng, 0xE7A1)

        from immunostruct_tpu.data.pipeline import prefetch

        for epoch in range(start_epoch, num_epochs):
            t0 = time.perf_counter()
            train_loss, n_train = 0.0, 0
            for batch in prefetch(train_pipe.epoch(epoch)):
                batch = self._shard(batch)
                state, loss = self._train_step(state, batch, rng)
                train_loss += float(loss)
                n_train += 1
            train_loss /= max(n_train, 1)

            val_loss, n_val = 0.0, 0
            val_logits, val_targets = [], []
            for i, batch in enumerate(val_pipe.epoch(epoch)):
                batch = self._shard(batch)
                loss, (logits, target) = self._eval_step(
                    state.params, batch, jax.random.fold_in(eval_rng, i))
                val_loss += float(loss)
                n_val += 1
                if collapse_guard is not None:
                    val_logits.append(np.asarray(logits).ravel())
                    val_targets.append(np.asarray(target).ravel())
            val_loss /= max(n_val, 1)

            if collapse_guard is not None and n_val:
                from immunostruct_tpu.procedures.metrics import roc_auc_score
                t, s = np.concatenate(val_targets), np.concatenate(val_logits)
                # soft-target stages (foreignness pretrain, binary=False —
                # the stage that actually collapsed at flagship seed 2):
                # median-split the targets so the guard watches the same
                # rank signal ("train ROC" in the RESULTS.md observation)
                uniq = np.unique(t)
                y = (t > 0.5) if np.isin(uniq, (0.0, 1.0)).all() \
                    else (t > np.median(t))
                # single-class val targets make AUROC meaningless: record
                # nan and do NOT feed the guard (no spurious streaks)
                two_class = len(np.unique(y)) > 1
                val_auc = roc_auc_score(y, s) if two_class else float("nan")
                history.setdefault("val_auc", []).append(val_auc)
                if two_class and collapse_guard.observe(epoch, val_auc):
                    advice = ("Consider --reinit-on-collapse, a different "
                              "seed, or a lower pretrain LR."
                              if collapse_guard.reinit_available else
                              "Consider a different seed or a lower "
                              "pretrain LR (--reinit-on-collapse acts on "
                              "pretrain stages only and would not apply "
                              "here).")
                    msg = (f"COLLAPSE GUARD: val AUROC at chance "
                           f"({val_auc:.3f}) for {collapse_guard.window} "
                           f"consecutive epochs at epoch {epoch + 1} — the "
                           "classifier head has flatlined (known seed-"
                           "sensitive pretrain failure, benchmarks/"
                           f"RESULTS.md). {advice}")
                    print(msg)
                    if log_fn:
                        log_fn({"epoch": epoch, "collapse_detected": True,
                                "val_auc": val_auc})
                    if collapse_guard.raise_on_fire:
                        raise PretrainCollapse(epoch, val_auc,
                                               collapse_guard.window)

            if val_loss < lowest_val:
                lowest_val = val_loss
                if ckpt_path:
                    save_checkpoint(ckpt_path, state.params)

            if resume_path:
                save_resume_state(resume_path, state, epoch, lowest_val)

            dt = time.perf_counter() - t0
            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["epoch_time"].append(dt)
            if log_fn:
                log_fn({"epoch": epoch, "train_loss": train_loss,
                        "val_loss": val_loss, "epoch_time_s": dt})
            if verbose:
                print(f"Epoch {epoch + 1}, Train Loss: {train_loss:.4f}, "
                      f"Val Loss: {val_loss:.4f} ({dt:.2f}s)")

        # stage finished: drop the resume snapshot so a later stage with the
        # same paths starts fresh instead of short-circuiting
        if resume_path:
            import os
            if os.path.exists(resume_path):
                os.remove(resume_path)
        return state, history

    def _shard(self, batch):
        if self.shard_batch is not None:
            return self.shard_batch(batch)
        return batch


# --------------------------------------------------------------------------
# Functional wrappers mirroring the reference's procedure names
# --------------------------------------------------------------------------

# measured on the remote-compile tunnel (benchmarks/RESULTS.md): unrolled
# compile ~116 s vs ~15 s scanned (the Pallas kernel pair compiles once
# inside the scan body), at +16% step time. Breakeven: ~100 s / (0.16 *
# ~11 ms) ~= 55k steps; auto uses a conservative fraction of that so the
# throughput default is kept for genuine soaks.
SCAN_LAYERS_AUTO_MAX_STEPS = 20_000


def resolve_scan_layers(config, spec: ModelSpec, steps_per_epoch: int) -> bool:
    """Tri-state --scan-layers: True/False force; None = auto (VERDICT r2
    item 8). Auto turns the scan on for short TPU runs with an EGNN stack,
    where the unrolled first-compile (~100 s longer through the
    remote-compile tunnel) would dominate wall-clock."""
    sl = getattr(config, "scan_layers", None)
    if sl is not None:
        return bool(sl)
    if not spec.use_structure or spec.gcn_layers < 2:
        return False
    if jax.devices()[0].platform != "tpu":
        return False  # CPU/GPU compiles are fast; keep the simpler HLO
    total_steps = int(getattr(config, "num_epochs", 0)) * max(steps_per_epoch, 1)
    return total_steps < SCAN_LAYERS_AUTO_MAX_STEPS


def resolve_stack_twins(config) -> bool:
    """Tri-state --stack-twins: True/False force; None = auto (OFF).

    The 2B-stacked forward was expected to win on per-pass overhead
    amortization, but the interleaved race (scripts/race_twins.py, round
    3) measured it SLOWER than two B-sized twin passes under both kernel
    paths (mega: 26.14 vs 24.90 ms/step; fused: 26.80 vs 25.37): the
    per-step concatenation of the cancer/wt input pytrees re-copies the
    whole batch through HBM — more bytes than the fixed overhead it
    saves on this bandwidth-bound step. Kept as an explicit option; the
    balance may flip for compute-bound configs (tiny E, big hidden)."""
    st = getattr(config, "stack_twins", None)
    if st is not None:
        return bool(st)
    return False


def train_model(config, spec: ModelSpec, params: dict, train_pipe, val_pipe,
                loss_cfg: LossConfig, *, binary: bool, learning_rate: float,
                weight_decay: float = 0.0, optimizer_name: str = "adam",
                lr_schedule=None, rng: Optional[jax.Array] = None,
                stage: str = "pretrain", coeff_contrastive: float = 0.0,
                log_fn=None, verbose: bool = True,
                resume_tag: Optional[str] = None):
    """Stage runner with the reference's train_model/_comparative signature
    semantics (procedures/train.py:10, :70). Comparative-ness follows the
    pipeline type, not a separate function."""
    from immunostruct_tpu.utils.schedule import constant_lr
    rng = rng if rng is not None else jax.random.key(config.seed)
    schedule = lr_schedule if lr_schedule is not None else constant_lr(learning_rate)
    optimizer = make_optimizer(optimizer_name, schedule, weight_decay,
                               steps_per_epoch=max(len(train_pipe), 1))
    accum = getattr(config, "grad_accum_steps", 1)
    if accum > 1 and config.batch_size % accum != 0:
        raise ValueError(
            f"--grad-accum-steps {accum} does not divide --batch-size "
            f"{config.batch_size}; accumulation would be silently skipped on "
            "every full batch. Pick a divisible pair (e.g. batch 128, k=2).")
    if getattr(config, "data_parallel", False):
        from immunostruct_tpu.parallel.trainer import make_sharded_trainer
        trainer = make_sharded_trainer(
            spec, loss_cfg, binary=binary, optimizer=optimizer,
            coeff_contrastive=coeff_contrastive,
            aggregation=config.aggregation,
            compute_dtype=jnp.dtype(config.compute_dtype),
            grad_accum_steps=accum,
            scan_layers=resolve_scan_layers(config, spec, len(train_pipe)),
            stack_twins=resolve_stack_twins(config),
            allow_microbatch_contrastive=getattr(
                config, "allow_microbatch_contrastive", False))
    else:
        trainer = Trainer(spec, loss_cfg, binary=binary, optimizer=optimizer,
                          coeff_contrastive=coeff_contrastive,
                          aggregation=config.aggregation,
                          compute_dtype=jnp.dtype(config.compute_dtype),
                          grad_accum_steps=accum,
                          scan_layers=resolve_scan_layers(config, spec,
                                                          len(train_pipe)),
                          stack_twins=resolve_stack_twins(config),
                          allow_microbatch_contrastive=getattr(
                              config, "allow_microbatch_contrastive", False))
    ckpt = (config.model_save_path_pretrain if stage == "pretrain"
            else config.model_save_path_finetune)
    # stage-unique snapshot names: multi-pretrain curricula share the
    # pretrain checkpoint path, and a stale snapshot from a later stage must
    # not resume an earlier one with the wrong state
    suffix = f".{resume_tag}.resume" if resume_tag else ".resume"
    resume_path = (ckpt + suffix) if getattr(config, "resume", False) else None

    # collapse guard: ALL stages since round 5 — the seed-2 40+40 collapse
    # arms showed a flatline whose pretrain val AUROC sat just outside the
    # chance band while the at-chance classifier surfaced in FINETUNE
    # (benchmarks/RESULTS.md collapse-arms table), so finetune stages are
    # now watched too (warn-only). Re-init remains pretrain-only: restarting
    # a finetune from a re-folded init would discard the pretrained trunk.
    # Soft-target pretrains are watched via a median-split AUROC (see fit);
    # binary stages directly.
    reinit = (bool(getattr(config, "reinit_on_collapse", False))
              and stage == "pretrain")
    guard_on = bool(getattr(config, "collapse_detection", True))
    max_attempts = 3 if (guard_on and reinit) else 1

    for attempt in range(max_attempts):
        guard = (CollapseGuard(raise_on_fire=reinit and attempt < max_attempts - 1,
                               reinit_available=(stage == "pretrain"))
                 if guard_on else None)
        attempt_rng = jax.random.fold_in(rng, attempt) if attempt else rng
        state = trainer.init_state(params, attempt_rng)
        try:
            state, history = trainer.fit(
                state, train_pipe, val_pipe, config.num_epochs, attempt_rng,
                ckpt_path=ckpt, log_fn=log_fn, verbose=verbose,
                resume_path=resume_path, collapse_guard=guard)
            break
        except PretrainCollapse as e:
            # re-fold the init key and restart the stage from scratch
            # (reference has no equivalent; VERDICT r3 item 4)
            from immunostruct_tpu.models.trunk import model_init
            if verbose:
                print(f"{e} — re-initializing (attempt {attempt + 2}/"
                      f"{max_attempts})")
            if log_fn:
                log_fn({"collapse_reinit": True, "attempt": attempt + 1})
            params = model_init(
                jax.random.fold_in(attempt_rng, 0xC011AD5E), spec,
                loss_cfg.vae_input_dim,
                dtype=jax.tree.leaves(params)[0].dtype)
    return state.params, history


# aliases, reference API surface parity: the comparative path is selected by
# passing a ComparativePipeline; SSL by an ssl=True pipeline + LossConfig(ssl=True)
# (the reference splits these into four functions, procedures/train.py:10,:70
# and train_SSL.py:10,:71)
train_model_comparative = train_model
train_model_SSL = train_model
train_model_comparative_SSL = train_model
