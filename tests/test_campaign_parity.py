"""Campaign-level CV parity vs the actual torch reference.

Extends the single-fold trajectory oracle (``test_trajectory_parity``)
to the full per-subject cross-validation campaign the reference runs
(``scripts/train_fast.py:86-227``): 2 subjects x 5 folds driven through
the production ``train.cv.train_per_subject_cv`` (one stacked jitted
program, segmented execution, artifact tree) against a faithful torch
re-drive of the reference's sequential fold loop on IDENTICAL data,
IDENTICAL ``KFold(5, shuffle=True, random_state=seed)`` splits,
IDENTICAL per-epoch batch orders, the SAME per-step lr table, and
per-(subject, fold) transplanted initial weights. Asserted:

  * per-(subject, fold) best-val-acc agrees within one val trial
    (val_acc is quantized to 1/n_val);
  * best-fold-per-subject selection agrees, except when the top two
    folds are within one val trial of each other (a legitimate
    quantization tie);
  * official-test accuracy of each subject's selected model within 1 pt,
    and the global (pooled) test accuracy within 1 pt — the
    BASELINE.json north star at campaign scope;
  * ``fold_metrics.csv`` carries exactly the per-fold best-val
    accuracies of the stacked run (artifact semantics,
    ``scripts/train_fast.py:215-227``).
"""

import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
for _p in (_here, os.path.dirname(_here)):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from imagined_speech_decoding_tpu.config import TrainConfig
from imagined_speech_decoding_tpu.data.arrays import shuffled_epoch_indices
from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials
from imagined_speech_decoding_tpu.train.schedule import cosine_scheduler

from test_torch_parity import (
    ELECTRODES,
    REF_FAST,
    _load_ref_fast,
    torch_config,
    transplant,
)
from test_trajectory_parity import make_cfg

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FAST), reason="reference repo not mounted"
)

# Campaign geometry: 2 synthetic subjects, the reference's 5 folds.
N_SUBJECTS = 2
N_TRIALS = 50           # per-subject pool -> folds of 10 (50 % 5 == 0)
N_TEST = 200            # per subject; global test = 400 (1 pt = 4 trials)
EPOCHS = 40
BATCH = 16              # 40 train trials -> 3 steps/epoch (ragged tail: 8)
LR, WD = 5e-4, 0.01
WARMUP = 10
SEED = 42
SNR = 1.5               # 40-trial folds need a separable corpus: parity
                        # at chance level would be vacuous evidence


def make_campaign_data():
    """Per-subject pools + test sets; each subject its own generation
    seed (distinct class signatures, like distinct real subjects)."""
    X, Y, test = [], [], {}
    for s in range(N_SUBJECTS):
        x_all, y_all = synthetic_trials(
            s, N_TRIALS + N_TEST, n_channels=len(ELECTRODES), n_samples=250, snr=SNR
        )
        X.append(x_all[:N_TRIALS])
        Y.append(y_all[:N_TRIALS])
        test[f"{s + 1:02d}"] = (x_all[N_TRIALS:], y_all[N_TRIALS:].astype(np.int64))
    return np.stack(X), np.stack(Y).astype(np.int64), test


def engine_lr_table(epochs: int, spe: int) -> np.ndarray:
    """The engine's built-in warmup-cosine table (train.schedule); the
    torch loop consumes the SAME table so campaign orchestration — not
    schedule stepping, already pinned by the trajectory oracle — is the
    only thing under test."""
    return LR * cosine_scheduler(1.0, 0.1, epochs, spe, warmup_epochs=WARMUP)


def replay_engine_batches(fit_key, epochs, n_train, batch):
    """Host replay of the engine's per-epoch shuffled batch indices
    (fold_in(key, global epoch) -> (shuffle, step), engine._run_epochs)."""
    plans = []
    for ep in range(epochs):
        kshuf, _ = jax.random.split(jax.random.fold_in(fit_key, ep))
        bidx, bw = shuffled_epoch_indices(kshuf, n_train, batch)
        plans.append((np.asarray(bidx), np.asarray(bw)))
    return plans


def torch_fold_run(ref, init_model, x_pool, y_pool, train_idx, val_idx, batch_plan):
    """One fold of the reference loop: AdamW + per-step lr table,
    strictly-greater best-val checkpoint (ModelCheckpoint semantics)."""
    model = init_model
    loss_fn = torch.nn.CrossEntropyLoss()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    spe = len(batch_plan[0][0])
    table = engine_lr_table(EPOCHS, spe)

    xt = torch.from_numpy(x_pool)
    yt = torch.from_numpy(y_pool)
    x_val, y_val = xt[val_idx], yt[val_idx]

    best_acc, best_sd = -np.inf, None
    step = 0
    for epoch in range(EPOCHS):
        model.train()
        bidx, bw = batch_plan[epoch]
        for b in range(spe):
            real = bw[b] > 0
            gidx = train_idx[bidx[b][real]]
            for g in opt.param_groups:
                g["lr"] = table[step]
            loss = loss_fn(model(xt[gidx]), yt[gidx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            step += 1
        model.eval()
        with torch.no_grad():
            va_acc = float((model(x_val).argmax(-1) == y_val).float().mean())
        if va_acc > best_acc:
            best_acc = va_acc
            best_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    model.load_state_dict(best_sd)
    return model, best_acc


def run_torch_campaign(cfg, X, Y, test, splits):
    """The reference's sequential loop (scripts/train_fast.py:86-227):
    per subject, per fold train -> best-of-folds by val acc -> test."""
    ref = _load_ref_fast()
    torch.manual_seed(0)
    # same init stream as the JAX side: one model per (subject, fold),
    # drawn sequentially from the torch RNG
    inits = [
        ref.FAST(torch_config(cfg)) for _ in range(N_SUBJECTS * len(splits[0]))
    ]
    fit_keys = jax.random.split(
        jax.random.PRNGKey(SEED + 1), N_SUBJECTS * len(splits[0])
    )

    fold_best = np.zeros((N_SUBJECTS, len(splits[0])))
    subj_test_acc, global_pred, global_true = [], [], []
    for s in range(N_SUBJECTS):
        models = []
        for k, (tr, va) in enumerate(splits[s]):
            m = s * len(splits[s]) + k
            plan = replay_engine_batches(fit_keys[m], EPOCHS, len(tr), BATCH)
            model, best = torch_fold_run(
                ref, inits[m], X[s], Y[s], tr, va, plan
            )
            models.append(model)
            fold_best[s, k] = best
        best_k = int(np.argmax(fold_best[s]))  # train_fast.py:182-185
        x_test, y_test = test[f"{s + 1:02d}"]
        with torch.no_grad():
            preds = models[best_k](torch.from_numpy(x_test)).argmax(-1).numpy()
        subj_test_acc.append(float((preds == y_test).mean()))
        global_pred.append(preds)
        global_true.append(y_test)
    g_pred = np.concatenate(global_pred)
    g_true = np.concatenate(global_true)
    return fold_best, subj_test_acc, float((g_pred == g_true).mean())


def run_jax_campaign(cfg, X, Y, test, tmp_dir):
    """The production stacked campaign with torch-transplanted inits."""
    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.train.cv import train_per_subject_cv

    ref = _load_ref_fast()
    torch.manual_seed(0)
    pieces = [
        transplant(ref.FAST(torch_config(cfg)), cfg)
        for _ in range(N_SUBJECTS * 5)
    ]
    params0 = jax.tree.map(lambda *xs: jnp.stack(xs), *[p for p, _ in pieces])
    state0 = jax.tree.map(lambda *xs: jnp.stack(xs), *[s for _, s in pieces])

    model = make_fast_model(cfg)
    tc = TrainConfig(
        max_epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
        weight_decay=WD, warmup_epochs=WARMUP, seed=SEED, n_folds=5,
        precision="f32",
    )
    subjects = [f"{s + 1:02d}" for s in range(N_SUBJECTS)]
    res = train_per_subject_cv(
        model, tc, X, Y.astype(np.int32), subjects, cfg.n_classes,
        test_per_subject={k: (v[0], v[1].astype(np.int32)) for k, v in test.items()},
        save_dir=tmp_dir, warm_start=(params0, state0), verbose=False,
    )
    fold_best = np.asarray(res.fit.best_val_acc).reshape(N_SUBJECTS, 5)
    return res, fold_best


@pytest.mark.slow
class TestCampaignParity:
    @pytest.fixture(scope="class")
    def result(self, tmp_path_factory):
        from imagined_speech_decoding_tpu.train.cv import kfold_indices

        cfg = make_cfg()
        X, Y, test = make_campaign_data()
        splits = [kfold_indices(N_TRIALS, 5, SEED) for _ in range(N_SUBJECTS)]
        out = str(tmp_path_factory.mktemp("campaign"))
        jres, j_fold_best = run_jax_campaign(cfg, X, Y, test, out)
        t_fold_best, t_subj_acc, t_global = run_torch_campaign(
            cfg, X, Y, test, splits
        )
        return {
            "out": out,
            "jres": jres,
            "j_fold_best": j_fold_best,
            "t_fold_best": t_fold_best,
            "t_subj_acc": t_subj_acc,
            "t_global": t_global,
            "n_val": N_TRIALS // 5,
        }

    def test_identical_fold_splits(self):
        """train.cv uses sklearn KFold exactly as the reference
        (scripts/train_fast.py:94,100)."""
        from imagined_speech_decoding_tpu.train.cv import build_cv_index_stack, kfold_indices

        tr_stack, va_stack, meta = build_cv_index_stack(N_SUBJECTS, N_TRIALS, 5, SEED)
        for s in range(N_SUBJECTS):
            for k, (tr, va) in enumerate(kfold_indices(N_TRIALS, 5, SEED)):
                m = s * 5 + k
                np.testing.assert_array_equal(tr_stack[m], s * N_TRIALS + tr)
                np.testing.assert_array_equal(va_stack[m], s * N_TRIALS + va)

    def test_fold_val_accs_within_one_trial(self, result):
        one = 1.0 / result["n_val"]
        np.testing.assert_allclose(
            result["j_fold_best"], result["t_fold_best"], atol=one + 1e-6,
            err_msg="per-(subject, fold) best val accs",
        )

    def test_best_fold_selection(self, result):
        for s in range(N_SUBJECTS):
            jk = int(np.argmax(result["j_fold_best"][s]))
            tk = int(np.argmax(result["t_fold_best"][s]))
            if jk != tk:
                # only acceptable as a quantization tie: the two folds'
                # accs agree within one val trial on BOTH sides
                one = 1.0 / result["n_val"]
                assert abs(result["j_fold_best"][s, jk] - result["j_fold_best"][s, tk]) <= one + 1e-6
                assert abs(result["t_fold_best"][s, jk] - result["t_fold_best"][s, tk]) <= one + 1e-6

    def test_subject_test_acc_within_1pt(self, result):
        j = result["jres"].summary["Test_Acc"].to_numpy()
        t = np.asarray(result["t_subj_acc"])
        np.testing.assert_allclose(j, t, atol=0.01 + 1e-9)

    def test_global_test_acc_within_1pt(self, result):
        from imagined_speech_decoding_tpu.train.artifacts import load_predictions_csv

        y_pred, y_true = load_predictions_csv(
            os.path.join(result["out"], "global_test_predictions.csv")
        )
        j_global = float((y_pred == y_true).mean())
        assert abs(j_global - result["t_global"]) <= 0.01 + 1e-9

    def test_learned_not_saturated(self, result):
        accs = result["jres"].summary["Test_Acc"].to_numpy()
        assert (accs > 0.30).all() and (accs < 0.95).all(), accs

    def test_fold_metrics_csv_semantics(self, result):
        """fold_metrics.csv rows are exactly the stacked run's per-fold
        best val accs (reference artifact, train_fast.py:215-227)."""
        for s in range(N_SUBJECTS):
            df = pd.read_csv(
                os.path.join(result["out"], f"sub-{s + 1:02d}", "fold_metrics.csv")
            )
            assert list(df["Fold"]) == list(range(5))
            np.testing.assert_allclose(
                df["Best_Val_Acc"].to_numpy(), result["j_fold_best"][s], rtol=1e-6
            )


if __name__ == "__main__":
    # report mode for docs/PARITY.md
    from imagined_speech_decoding_tpu.train.cv import kfold_indices

    cfg = make_cfg()
    X, Y, test = make_campaign_data()
    splits = [kfold_indices(N_TRIALS, 5, SEED) for _ in range(N_SUBJECTS)]
    import tempfile

    out = tempfile.mkdtemp()
    jres, j_fold = run_jax_campaign(cfg, X, Y, test, out)
    t_fold, t_subj, t_global = run_torch_campaign(cfg, X, Y, test, splits)
    print("per-(subject, fold) best val acc:")
    for s in range(N_SUBJECTS):
        print(f"  sub {s}: jax {j_fold[s]}  torch {t_fold[s]}")
    print("subject test acc: jax", jres.summary["Test_Acc"].tolist(), " torch", t_subj)
    print(f"torch global test acc {t_global:.4f}")
