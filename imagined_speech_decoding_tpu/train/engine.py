"""The training engine: one jitted, scan-based `fit`, vmappable to many
models at once.

TPU re-design of the reference training stack (Lightning module +
Trainer + ModelCheckpoint + HistoryCallback, ``src/fast/train/`` and
``scripts/train_fast.py:100-198``):

  * an entire training run (epochs x steps, AdamW + warmup-cosine,
    per-epoch validation, best-checkpoint selection by ``val_acc``,
    history capture) is ONE compiled XLA program: ``lax.scan`` over
    epochs around ``lax.scan`` over steps;
  * the corpus stays in HBM; a step's "data loading" is one gather
    through per-model index arrays (see ``data.arrays``);
  * ``fit_many`` vmaps the whole program over a leading model axis —
    the reference's 15-subject x 5-fold Python loop (75k sequential
    optimizer steps) becomes 1k fused steps of a 75-model stack. This
    megabatching is where the tiny (~0.2 M-param) model finally feeds
    the MXU.

Best-checkpoint semantics match Lightning ``ModelCheckpoint(monitor=
'val_acc', mode='max', save_top_k=1)``: strictly-greater improvements
replace the stored (params, model-state) snapshot.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.arrays import num_batches, sequential_batch_indices, shuffled_epoch_indices
from .metrics import confusion_matrix, cross_entropy, f1_from_confusion
from .schedule import warmup_cosine_lr


class ModelDef(NamedTuple):
    """A trainable model: ``init(key) -> (params, state)`` and
    ``apply(params, state, x, *, train, rng) -> (logits, new_state)``."""

    init: Callable
    apply: Callable


class FitResult(NamedTuple):
    params: Any  # final params
    model_state: Any  # final mutable state (e.g. BN stats)
    best_params: Any  # snapshot at best val_acc
    best_model_state: Any
    best_val_acc: jnp.ndarray  # scalar (or (M,) under fit_many)
    best_epoch: jnp.ndarray
    history: Dict[str, jnp.ndarray]  # each (E,) (or (M, E))


def make_optimizer(
    learning_rate: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 10,
    final_scale: float = 0.1,
    weight_decay: float = 0.01,
    schedule: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """AdamW with the reference warmup-cosine schedule (torch-default
    betas/eps; decay applies to all params, as torch AdamW does).
    ``schedule`` overrides the built-in table with a custom
    ``step -> lr`` fn (e.g. the Lightning-exact off-by-one table used by
    the trajectory-parity harness, ``tests/test_trajectory_parity.py``)."""
    if schedule is None:
        schedule = warmup_cosine_lr(
            learning_rate, epochs, steps_per_epoch, warmup_epochs, final_scale
        )
    return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)


def make_fit(
    apply_fn: Callable,
    n_classes: int,
    *,
    epochs: int,
    batch_size: int,
    n_train: int,
    n_val: int,
    learning_rate: float = 5e-4,
    warmup_epochs: int = 10,
    final_scale: float = 0.1,
    weight_decay: float = 0.01,
    data_dtype=None,
    total_epochs: Optional[int] = None,
    early_stop_threshold: Optional[float] = None,
    early_stop_patience: Optional[int] = None,
    batch_sharding=None,
    schedule: Optional[Callable] = None,
    eval_batch_size: Optional[int] = None,
    sweep: bool = False,
    val_every: int = 1,
) -> Callable:
    """Build the single-model fit function (jit/vmap it at the call site).

    Returned signature::

        fit(key, params0, state0, train_idx (n_train,), val_idx (n_val,),
            X (N_total, C, T), Y (N_total,)) -> FitResult

    ``train_idx``/``val_idx`` index into the *global* trial axis of
    ``X``/``Y`` — under ``vmap`` each model gets its own index vectors
    while the corpus itself is shared (broadcast), so HBM holds one copy.

    ``sweep=True`` makes the learning rate and weight decay RUNTIME
    arguments: the returned fit gains a leading ``hyper`` argument,
    ``{'lr_scale': c, 'wd_scale': w}`` (traced scalars), and trains with
    effective ``lr = learning_rate * c`` and ``weight_decay =
    weight_decay * w`` — exactly, because AdamW's update is linear in
    the step lr (``-lr_t * (m̂/(√v̂+ε) + wd·p)``): the base optimizer
    runs at UNIT lr (wd-free), and the effective update
    ``-lr_t·(adam_dir + wd'·p)`` is reconstructed per step. ``hyper``
    may additionally carry ``'lr_table'``, a ``(total_steps,)`` array of
    absolute per-step learning rates that REPLACES the built-in
    schedule for that model (then ``lr_t = lr_scale * lr_table[step]``)
    — by the same linearity, the entire schedule SHAPE (warmup length,
    final scale, decay family) becomes a runtime input. Under ``vmap``
    over ``hyper`` this trains a whole hyperparameter grid as ONE
    compiled program — see ``train.sweep``.

    ``val_every=k`` runs the validation pass (and therefore the
    best-checkpoint / early-stop updates) only every k-th epoch instead
    of every epoch. The default 1 reproduces Lightning's per-epoch
    ``ModelCheckpoint(monitor='val_acc')`` exactly; k>1 is an opt-in
    throughput mode (the per-epoch val pass costs ~20% of step
    throughput at the production geometry, see docs/PERFORMANCE.md)
    that coarsens best-checkpoint granularity to k epochs. The TRAIN
    trajectory is unchanged — epoch keys/shuffles fold in the global
    epoch counter, not the val cadence — so a ``val_every=k`` run's
    params equal the ``val_every=1`` run's params exactly; only which
    epochs could be selected as "best" differs. Skipped epochs record
    NaN in the ``val_*`` history rows. Requires ``epochs % k == 0``
    (segment boundaries stay val epochs, so segmented == whole-run
    holds unchanged).
    """
    if val_every < 1 or epochs % val_every != 0:
        raise ValueError(
            f"val_every must be >= 1 and divide epochs ({epochs}); got {val_every}"
        )
    spe = num_batches(n_train, batch_size)
    # The LR schedule spans the FULL run; under segmented execution
    # `epochs` is one segment and `total_epochs` the whole schedule
    # (optax's step counter carries across segments via opt_state).
    if schedule is None:
        schedule = warmup_cosine_lr(
            learning_rate, total_epochs or epochs, spe, warmup_epochs, final_scale
        )
    # Sweep mode keeps the base optimizer decay-free AND at unit lr:
    # both the decay and the per-step lr are applied manually in
    # train_step where they can be scaled (or table-replaced) per model.
    opt = make_optimizer(
        learning_rate, total_epochs or epochs, spe, warmup_epochs, final_scale,
        0.0 if sweep else weight_decay,
        schedule=(lambda _: 1.0) if sweep else schedule,
    )

    # Validation batching is free to differ from the train batch size —
    # metrics are weighted sums, so any batching gives identical numbers
    # — and the train size is usually wasteful here: n_val=70 at batch 64
    # pads to 2x64=128 trial-forwards per epoch. Default: never take
    # more eval steps than the train size would (per-step dispatch
    # dominates tiny batches), and among step-count-minimal sizes pick
    # the one with the fewest padded slots, largest batch on ties —
    # 70 -> 2x35 (zero waste), 71 -> 2x36 (1 slot; NOT 71x1, which a
    # pure waste-minimizing rule would pick). An explicit
    # ``eval_batch_size`` overrides.
    if eval_batch_size is None:
        eval_batch_size = batch_size if n_val < 1 else min(
            range(1, min(batch_size, n_val) + 1),
            key=lambda b: (-(-n_val // b), -(-n_val // b) * b, -b),
        )
    vidx_np, vw_np = sequential_batch_indices(n_val, eval_batch_size)
    vidx_c = jnp.asarray(vidx_np)
    vw_c = jnp.asarray(vw_np)

    def gather(X, Y, gidx):
        x = jnp.take(X, gidx, axis=0)
        if data_dtype is not None:
            x = x.astype(data_dtype)
        y = jnp.take(Y, gidx, axis=0)
        if batch_sharding is not None:
            # Data parallelism via GSPMD: constrain the gathered batch to
            # the ('data',) mesh axis; XLA shards the forward/backward
            # along it and inserts the gradient all-reduce automatically
            # (equivalence with unsharded training is tested).
            x = jax.lax.with_sharding_constraint(x, batch_sharding)
        return x, y

    # Ragged final batches are padded to the static batch size with
    # zero-weight rows; models whose apply accepts `sample_weight`
    # (BN-bearing ones) exclude those rows from batch statistics,
    # matching the reference's short drop_last=False batches exactly.
    import inspect

    try:
        _takes_sw = "sample_weight" in inspect.signature(apply_fn).parameters
    except (TypeError, ValueError):
        _takes_sw = False

    def train_step(X, Y, hyper, ep, carry, inp):
        params, mstate, opt_state = carry
        gidx, w, key, i = inp
        x, y = gather(X, Y, gidx)
        sw_kw = {"sample_weight": w} if _takes_sw else {}

        def loss_fn(p):
            logits, new_ms = apply_fn(p, mstate, x, train=True, rng=key, **sw_kw)
            return cross_entropy(logits, y, w), (logits, new_ms)

        (loss, (logits, new_ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        if hyper is not None:
            # Sweep mode (see make_fit docstring): base updates are
            # -adam_dir (unit-lr, wd-free optimizer); the effective
            # update -lr_t·(adam_dir + wd'·p) is reconstructed with
            # lr_t = lr_scale x (the model's own lr table, or the
            # built-in schedule) at this global step (= the optimizer's
            # count for this step) and wd' = weight_decay * wd_scale.
            step_no = ep * spe + i
            if "lr_table" in hyper:
                tbl = hyper["lr_table"]
                base_lr = tbl[jnp.clip(step_no, 0, tbl.shape[0] - 1)]
            else:
                base_lr = schedule(step_no)
            lr_t = hyper["lr_scale"] * base_lr
            wd_t = lr_t * (weight_decay * hyper["wd_scale"])
            updates = jax.tree.map(lambda u, p: lr_t * u - wd_t * p, updates, params)
        params = optax.apply_updates(params, updates)
        cm = confusion_matrix(logits, y, n_classes, w)
        return (params, new_ms, opt_state), (loss * jnp.sum(w), cm)

    def eval_pass(X, Y, params, mstate, idx_mat, w_mat):
        def body(_, inp):
            gidx, w = inp
            x, y = gather(X, Y, gidx)
            logits, _ = apply_fn(params, mstate, x, train=False, rng=None)
            return None, (cross_entropy(logits, y, w) * jnp.sum(w), confusion_matrix(logits, y, n_classes, w))

        _, (losses, cms) = jax.lax.scan(body, None, (idx_mat, w_mat))
        cm = cms.sum(0)
        total = jnp.maximum(cm.sum(), 1.0)
        loss = jnp.sum(losses) / total
        acc = jnp.trace(cm) / total
        return loss, acc, f1_from_confusion(cm)

    def init_carry(params0, state0):
        return (
            params0, state0, opt.init(params0),
            params0, state0,
            jnp.float32(-jnp.inf), jnp.int32(-1), jnp.int32(0),
            jnp.bool_(False),  # early-stopped flag
        )

    def _run_epochs(carry, key, n_epochs, train_idx, val_idx, X, Y, hyper=None):
        # Epoch keys are derived from the GLOBAL epoch counter carried
        # across segments (fold_in(key, ep)), not pre-split per call —
        # so a segmented run (fit.segment invoked repeatedly with the
        # same base key) draws the exact key stream of the whole-run
        # fit: shuffles, dropout and step keys are identical, making
        # "segmented == whole-run" a true statement about trajectories,
        # not just freeze semantics (tests/test_sweep.py, test_resume.py).
        def make_epoch_fn(do_val: bool):
          # `do_val` is a PYTHON-level static: the no-val variant's XLA
          # graph simply contains no eval pass (a traced lax.cond would
          # lower to select under vmap and execute both branches —
          # saving nothing).
          def epoch_fn(carry, _):
            (params0_c, mstate0_c, opt_state0_c, best_params, best_ms,
             best_acc, best_ep, ep, stopped) = carry
            ekey = jax.random.fold_in(key, ep)
            kshuf, kstep = jax.random.split(ekey)
            bidx, bw = shuffled_epoch_indices(kshuf, n_train, batch_size)
            gidx = jnp.take(train_idx, bidx, axis=0)  # (spe, B) global indices
            step_keys = jax.random.split(kstep, spe)

            # Pad-free ragged tail: the final short batch (n_train %
            # batch_size trials) runs as its own exact-shape step
            # instead of being padded to batch_size with zero-weight
            # rows (280 trials at batch 64: 4x64 scanned + 1x56 = 280
            # trial-forwards per epoch instead of 320). Deterministic
            # math is identical — losses/metrics are weight-summed and
            # BN statistics row-masked, and batch content, order and
            # the optimizer step count are all unchanged. One caveat:
            # with dropout > 0 the tail step draws its masks at shape
            # (rem, ...) rather than (batch_size, ...), so mask BITS
            # differ from the padded formulation (statistically
            # equivalent, but padded-era runs are not bit-replayable).
            rem = n_train % batch_size
            n_full = spe - 1 if rem else spe
            steps = jnp.arange(spe, dtype=jnp.int32)
            step_fn = partial(train_step, X, Y, hyper, ep)
            carry_t = (params0_c, mstate0_c, opt_state0_c)
            if rem == 0:
                carry_t, (losses, cms) = jax.lax.scan(
                    step_fn, carry_t, (gidx, bw, step_keys, steps)
                )
            else:
                if n_full:
                    carry_t, (losses, cms) = jax.lax.scan(
                        step_fn,
                        carry_t,
                        (gidx[:n_full], bw[:n_full], step_keys[:n_full], steps[:n_full]),
                    )
                carry_t, (loss_t, cm_t) = step_fn(
                    carry_t,
                    (gidx[n_full, :rem], bw[n_full, :rem], step_keys[n_full], steps[n_full]),
                )
                if n_full:
                    losses = jnp.concatenate([losses, loss_t[None]])
                    cms = jnp.concatenate([cms, cm_t[None]])
                else:
                    losses, cms = loss_t[None], cm_t[None]
            params, mstate, opt_state = carry_t
            # Freeze semantics (in-scan, fixed-shape): epoch passes still
            # run but their updates are discarded once the model has
            # early-stopped (Lightning EarlyStopping) OR the full-run
            # epoch budget is exhausted — the latter makes segmented
            # execution exact when total_epochs is not a multiple of the
            # segment length (the last segment's surplus epochs are
            # no-ops, so the result equals a run of exactly
            # total_epochs).
            halted = stopped
            if total_epochs is not None:
                halted = halted | (ep >= total_epochs)
            if (
                early_stop_threshold is not None
                or early_stop_patience is not None
                or total_epochs is not None
            ):
                frozen = lambda new, old: jax.tree.map(
                    lambda a, b: jnp.where(halted, b, a), new, old
                )
                params = frozen(params, params0_c)
                mstate = frozen(mstate, mstate0_c)
                opt_state = frozen(opt_state, opt_state0_c)
            cm = cms.sum(0)
            total = jnp.maximum(cm.sum(), 1.0)
            tr_loss = jnp.sum(losses) / total
            tr_acc = jnp.trace(cm) / total
            tr_f1 = f1_from_confusion(cm)

            if do_val:
                gvidx = jnp.take(val_idx, vidx_c, axis=0)
                va_loss, va_acc, va_f1 = eval_pass(X, Y, params, mstate, gvidx, vw_c)

                improved = (va_acc > best_acc) & ~halted
                sel = lambda new, old: jax.tree.map(
                    lambda a, b: jnp.where(improved, a, b), new, old
                )
                best_params = sel(params, best_params)
                best_ms = sel(mstate, best_ms)
                best_acc = jnp.where(improved, va_acc, best_acc)
                best_ep = jnp.where(improved, ep, best_ep)

                if early_stop_threshold is not None:
                    stopped = stopped | (va_acc >= early_stop_threshold)
                if early_stop_patience is not None:
                    stopped = stopped | (ep - best_ep >= early_stop_patience)
            else:
                nan = jnp.float32(jnp.nan)
                va_loss = va_acc = va_f1 = nan

            out = (tr_loss, tr_acc, tr_f1, va_loss, va_acc, va_f1)
            return (
                params, mstate, opt_state, best_params, best_ms,
                best_acc, best_ep, ep + 1, stopped,
            ), out

          return epoch_fn

        if val_every == 1:
            carry, hist = jax.lax.scan(make_epoch_fn(True), carry, None, length=n_epochs)
        else:
            # val_every=k: scan over blocks of k epochs — k-1 val-free
            # epochs (whose XLA graph contains no eval pass at all) then
            # one val epoch. Train math/keys are epoch-counter-driven and
            # identical to the k=1 program; only the val/best cadence
            # changes (see make_fit docstring).
            assert n_epochs % val_every == 0, (n_epochs, val_every)
            ep_noval, ep_val = make_epoch_fn(False), make_epoch_fn(True)

            def block_fn(carry, _):
                carry, h_a = jax.lax.scan(ep_noval, carry, None, length=val_every - 1)
                carry, h_b = ep_val(carry, None)
                return carry, tuple(
                    jnp.concatenate([a, b[None]]) for a, b in zip(h_a, h_b)
                )

            carry, hist_b = jax.lax.scan(
                block_fn, carry, None, length=n_epochs // val_every
            )
            # (n_blocks, k) per metric -> flat (n_epochs,) epoch axis.
            hist = tuple(x.reshape(-1) for x in hist_b)
        history = dict(zip(["loss", "acc", "f1", "val_loss", "val_acc", "val_f1"], hist))
        return carry, history

    def _result(carry, history):
        params, mstate, _, best_params, best_ms, best_acc, best_ep, _, _ = carry
        return FitResult(params, mstate, best_params, best_ms, best_acc, best_ep, history)

    if sweep:

        def fit(hyper, key, params0, state0, train_idx, val_idx, X, Y):
            carry = init_carry(params0, state0)
            carry, history = _run_epochs(
                carry, key, epochs, train_idx, val_idx, X, Y, hyper
            )
            return _result(carry, history)

        def segment(hyper, carry, key, train_idx, val_idx, X, Y):
            """Sweep-mode segment: leading ``hyper`` argument, otherwise
            identical to the default-mode ``segment``."""
            return _run_epochs(carry, key, epochs, train_idx, val_idx, X, Y, hyper)

    else:

        def fit(key, params0, state0, train_idx, val_idx, X, Y):
            carry = init_carry(params0, state0)
            carry, history = _run_epochs(carry, key, epochs, train_idx, val_idx, X, Y)
            return _result(carry, history)

        def segment(carry, key, train_idx, val_idx, X, Y):
            """Run ``epochs`` epochs from an existing carry (see
            ``fit_segmented``). Returns ``(carry, history)``."""
            return _run_epochs(carry, key, epochs, train_idx, val_idx, X, Y)

    fit.sweep = sweep
    fit.init_carry = init_carry
    fit.segment = segment
    fit.result = _result
    fit.epochs_per_call = epochs
    fit.eval_batch_size = eval_batch_size
    fit.val_every = val_every
    return fit


def _donate_enabled() -> bool:
    """``ISD_DONATE=1`` opts the segmented executor into carry donation
    (see the measurement note inside :func:`fit_many_segmented`)."""
    import os

    return os.environ.get("ISD_DONATE", "") == "1"


@jax.jit
def _tree_copy(tree):
    """Fresh device buffers for every leaf (one fused program, one
    dispatch). Used to decouple the async checkpoint writer's snapshot
    from the donated segment carry."""
    return jax.tree.map(jnp.copy, tree)


def fit_many(fit_fn: Callable, keys, params0, state0, train_idx, val_idx, X, Y) -> FitResult:
    """Train a stack of models simultaneously: all args with a leading
    model axis except the shared corpus ``X``/``Y`` (broadcast)."""
    return jax.vmap(fit_fn, in_axes=(0, 0, 0, 0, 0, None, None))(
        keys, params0, state0, train_idx, val_idx, X, Y
    )


def fit_many_segmented(
    fit_fn: Callable,
    keys,
    params0,
    state0,
    train_idx,
    val_idx,
    X,
    Y,
    total_epochs: int,
    progress: Optional[Callable[[int, Dict], None]] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    checkpoint_every: int = 1,
    hyper=None,
) -> FitResult:
    """Segmented variant of ``fit_many``: repeatedly invokes one compiled
    ``epochs_per_call``-epoch segment, carrying (params, optimizer, best
    snapshot) on device between calls, and concatenates histories.

    Keeps single XLA programs short (long whole-run scans have crashed
    the TPU runtime), gives natural segment-level resume points, and
    costs one compile total. Build ``fit_fn`` with
    ``make_fit(epochs=<segment>, total_epochs=<total>)`` so the LR
    schedule spans the full run.

    ``checkpoint_dir``: persist the full carry (params, optimizer state,
    best snapshot, epoch counter) + history to disk at segment
    boundaries (atomic tmp+rename), and — with ``resume=True`` — restart
    from the newest boundary after a crash. The reference analogue is
    Lightning ``ModelCheckpoint`` during ``trainer.fit``
    (``scripts/train_fast.py:118-125``); this additionally restores the
    optimizer, so a resumed run is step-identical to an uninterrupted
    one (tested).

    Checkpoint writes run on a single background thread so the next
    segment's device compute overlaps the disk write (a 75-model carry
    is ~300 MB, ~60 s on the measured ~5 MB/s container disk — fully
    serialized saves dominated campaign wall time). The functional
    carry makes this race-free: the writer holds the old immutable
    snapshot while the device produces the new one; writes stay atomic
    (tmp+rename) and at most one is in flight. ``checkpoint_every=k``
    additionally writes only every k-th boundary (the last segment
    always writes) — crash-resume then restarts from a k-segment
    granularity instead of 1.
    """
    import os
    import threading

    from .checkpoint import load_segment_checkpoint, save_segment_checkpoint

    seg = fit_fn.epochs_per_call
    n_segments = -(-total_epochs // seg)

    init = jax.vmap(fit_fn.init_carry)(params0, state0)
    if getattr(fit_fn, "sweep", False):
        # Sweep-mode fits take a leading per-model hyper dict (see
        # make_fit(sweep=True)); it is constant across segments.
        if hyper is None:
            raise ValueError("sweep-mode fit_fn requires hyper={'lr_scale', 'wd_scale'}")
        # ISD_DONATE=1 donates the carry (~300 MB at the 75-model
        # production stack: params + opt state + best snapshot) into
        # each segment call, aliasing output into input buffers instead
        # of re-allocating the stack. Measured on the target chip
        # (experiments/r4_levers.py, two A/B pairs): donation is 1-3%
        # SLOWER at unchanged results — aliasing constrains XLA's
        # scheduling more than the allocation costs — so it is OFF by
        # default and exists as the memory lever for stacks near the
        # HBM ceiling (~90 models), where 300 MB buys headroom.
        donate = _donate_enabled()
        _seg = jax.jit(
            jax.vmap(fit_fn.segment, in_axes=(0, 0, 0, 0, 0, None, None)),
            donate_argnums=(1,) if donate else (),
        )
        segment = lambda c, k, ti, vi, Xc, Yc: _seg(hyper, c, k, ti, vi, Xc, Yc)
    else:
        donate = _donate_enabled()
        segment = jax.jit(
            jax.vmap(fit_fn.segment, in_axes=(0, 0, 0, 0, None, None)),
            donate_argnums=(0,) if donate else (),
        )

    # Under donation the segment call consumes its carry argument, and
    # the initial carry built by vmap(init_carry) can alias the caller's
    # params0/state0 buffers (identity outputs) — donate a private copy
    # instead so the caller's arrays survive the first segment.
    carry = _tree_copy(init) if donate else init
    histories = []
    start_seg = 0
    ckpt_path = os.path.join(checkpoint_dir, "segment_carry.npz") if checkpoint_dir else None
    if ckpt_path and resume and os.path.exists(ckpt_path):
        carry, histories, start_seg = load_segment_checkpoint(ckpt_path, init)

    # Writer-thread failures (disk full, permissions) must not be
    # swallowed: a campaign that "succeeds" with a stale checkpoint
    # would silently resume from the wrong epoch. The thread records
    # its exception; join re-raises it on the caller.
    writer: Optional[threading.Thread] = None
    writer_err: list = []

    def _save_async(*save_args):
        try:
            save_segment_checkpoint(*save_args)
        except BaseException as e:  # noqa: BLE001 — re-raised at join
            writer_err.append(e)

    def _join_writer():
        if writer is not None:
            writer.join()
        if writer_err:
            raise RuntimeError(
                f"segment-checkpoint write to {ckpt_path} failed"
            ) from writer_err[0]

    for s in range(start_seg, n_segments):
        if writer_err:  # fail fast: don't burn further segments of
            _join_writer()  # device compute after a write already failed
        # The base keys pass through unchanged: the engine folds in the
        # global epoch counter itself, so every segment continues the
        # whole-run key stream exactly (see _run_epochs).
        carry, hist = segment(carry, keys, train_idx, val_idx, X, Y)
        histories.append(hist)
        if ckpt_path and ((s + 1) % max(checkpoint_every, 1) == 0 or s + 1 == n_segments):
            jax.block_until_ready(hist)
            _join_writer()
            # Under donation the NEXT segment call consumes the carry's
            # buffers, deleting the jax Arrays the writer thread would
            # still be reading. Hand the writer its own device-side
            # copy: one fused jitted tree-copy (a single dispatch; ~300 MB
            # of HBM-to-HBM traffic at the production stack, microseconds
            # at the hardware's streaming rate) — NOT a host fetch, which
            # would serialize a ~300 MB D2H transfer into the loop.
            writer = threading.Thread(
                target=_save_async,
                args=(
                    ckpt_path,
                    _tree_copy(carry) if donate else carry,
                    list(histories),
                    s + 1,
                ),
                daemon=True,
            )
            writer.start()
        if progress is not None:
            progress(min((s + 1) * seg, total_epochs), hist)
    _join_writer()

    history = {
        k: jnp.concatenate([h[k] for h in histories], axis=-1)[..., :total_epochs]
        for k in histories[0]
    }
    return fit_fn.result(carry, history)


# Jitted eval/predict kernels, cached per apply_fn so repeated
# evaluate()/predict() calls (e.g. the 15-subject CV loop) compile the
# forward graph once and run fused instead of eagerly per op. The cache
# is weakly keyed on apply_fn: entries (and their XLA executables) are
# dropped when the model goes away, so long-lived processes that build
# many models don't leak compiled programs.
import weakref

_EVAL_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _per_apply_cache(apply_fn: Callable) -> Dict:
    try:
        return _EVAL_CACHE.setdefault(apply_fn, {})
    except TypeError:  # not weakref-able (e.g. some builtins) — no caching
        return {}


def _jitted_eval(apply_fn: Callable, n_classes: int) -> Callable:
    cache = _per_apply_cache(apply_fn)
    key = ("eval", n_classes)
    if key not in cache:

        @jax.jit
        def batch_stats(params, mstate, x, y, wi):
            logits, _ = apply_fn(params, mstate, x, train=False, rng=None)
            return (
                cross_entropy(logits, y, wi) * wi.sum(),
                confusion_matrix(logits, y, n_classes, wi),
            )

        cache[key] = batch_stats
    return cache[key]


def _jitted_predict(apply_fn: Callable) -> Callable:
    cache = _per_apply_cache(apply_fn)
    if "predict" not in cache:

        @jax.jit
        def batch_pred(params, mstate, x):
            logits, _ = apply_fn(params, mstate, x, train=False, rng=None)
            return jnp.argmax(logits, axis=-1)

        cache["predict"] = batch_pred
    return cache["predict"]


def _jitted_proba(apply_fn: Callable) -> Callable:
    cache = _per_apply_cache(apply_fn)
    if "proba" not in cache:

        @jax.jit
        def batch_proba(params, mstate, x):
            logits, _ = apply_fn(params, mstate, x, train=False, rng=None)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        cache["proba"] = batch_proba
    return cache["proba"]


def evaluate(
    apply_fn: Callable,
    params,
    mstate,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    n_classes: int,
    batch_size: int = 64,
) -> Dict[str, float]:
    """Host-convenience full-dataset evaluation (single model)."""
    idx, w = sequential_batch_indices(X.shape[0], batch_size)
    batch_stats = _jitted_eval(apply_fn, n_classes)
    loss_sum, cm = 0.0, jnp.zeros((n_classes, n_classes), jnp.float32)
    for i in range(idx.shape[0]):
        x = jnp.take(X, jnp.asarray(idx[i]), axis=0)
        y = jnp.take(Y, jnp.asarray(idx[i]), axis=0)
        loss_i, cm_i = batch_stats(params, mstate, x, y, jnp.asarray(w[i]))
        loss_sum += float(loss_i)
        cm = cm + cm_i
    total = float(cm.sum())
    return {
        "loss": loss_sum / max(total, 1.0),
        "acc": float(jnp.trace(cm)) / max(total, 1.0),
        "f1": float(f1_from_confusion(cm)),
        "confusion": np.asarray(cm),
    }


def predict(
    apply_fn: Callable, params, mstate, X: jnp.ndarray, batch_size: int = 64
) -> np.ndarray:
    """Argmax predictions over a dataset (reference ``inference_on_loader``,
    ``src/fast/train/trainer.py:82-93``)."""
    n = X.shape[0]
    idx, w = sequential_batch_indices(n, batch_size)
    batch_pred = _jitted_predict(apply_fn)
    preds = []
    for i in range(idx.shape[0]):
        x = jnp.take(X, jnp.asarray(idx[i]), axis=0)
        preds.append(np.asarray(batch_pred(params, mstate, x)))
    return np.concatenate(preds)[:n]


def predict_proba(
    apply_fn: Callable, params, mstate, X: jnp.ndarray, batch_size: int = 64
) -> np.ndarray:
    """Class posteriors ``(N, n_classes)`` over a dataset (f32 softmax).

    The probabilistic sibling of :func:`predict` — the unit of
    soft-voting ensembles (``train.ensemble``), which average these
    posteriors across independently trained members before the argmax.
    """
    n = X.shape[0]
    idx, _ = sequential_batch_indices(n, batch_size)
    batch_proba = _jitted_proba(apply_fn)
    probs = []
    for i in range(idx.shape[0]):
        x = jnp.take(X, jnp.asarray(idx[i]), axis=0)
        probs.append(np.asarray(batch_proba(params, mstate, x)))
    return np.concatenate(probs)[:n]
