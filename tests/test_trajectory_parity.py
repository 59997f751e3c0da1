"""Multi-step training-TRAJECTORY parity vs the actual torch reference.

The strongest accuracy-parity evidence available without the private
BCIC2020 dataset: run the reference's torch training stack and this
repo's jitted engine on IDENTICAL data, IDENTICAL KFold splits, and
IDENTICAL batch orders for >= 100 optimizer steps, then assert

  * per-epoch train-loss curves agree,
  * per-epoch val-accuracy curves agree,
  * official-test accuracy of the best-val checkpoint agrees within 1 pt

(the BASELINE.json "accuracy within 1 pt" north star).

Reference semantics reproduced exactly (the torch side of the harness is
a faithful re-drive of the Lightning loop — Lightning itself is not
installed in this environment, so the loop is emulated with the SAME
numeric components the reference uses):

  * model: the reference's own ``FAST`` imported from
    ``/root/reference/src/fast/models/fast.py`` (oracle, never copied);
  * optimizer: ``AdamW(lr=5e-4)`` with torch defaults
    (``src/fast/train/trainer.py:49``);
  * LR schedule: the reference ``cosine_scheduler(1, 0.1, E, spe,
    warmup_epochs=10)`` table driven through ``LambdaLR`` with
    Lightning's exact stepping order (``trainer.py:38,50-54``):
    optimizer step 1 runs at ``table[-1]`` (the LambdaLR constructor
    evaluates the lambda at global_step=0 -> index -1), step k>=2 at
    ``table[k-2]``. The JAX fit is given the equivalent table via
    ``make_fit(schedule=...)`` so both sides see the same lr sequence;
  * loss: ``nn.CrossEntropyLoss`` (``trainer.py:37``);
  * batching: ``DataLoader(shuffle=True, drop_last=False)`` semantics —
    the torch loop consumes the SAME per-epoch batch index matrices the
    jitted engine derives from its PRNG key (replayed on host), so the
    two trajectories see identical batches incl. the ragged final batch;
  * best checkpoint: strictly-greater val_acc, Lightning
    ``ModelCheckpoint(monitor='val_acc', mode='max')`` semantics;
  * splits: ``sklearn.model_selection.KFold(5, shuffle=True,
    random_state=42)`` exactly as ``scripts/train_fast.py:94``.

Run ``python tests/test_trajectory_parity.py`` directly for the
docs/PARITY.md report (curves table + final accuracies).
"""

import os
import sys

# Script-mode execution (`python tests/test_trajectory_parity.py`): put
# the repo root + tests dir on the path before the package imports.
_here = os.path.dirname(os.path.abspath(__file__))
for _p in (_here, os.path.dirname(_here)):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from imagined_speech_decoding_tpu.config import FASTConfig
from imagined_speech_decoding_tpu.data.arrays import shuffled_epoch_indices
from imagined_speech_decoding_tpu.data.synthetic import synthetic_trials
from imagined_speech_decoding_tpu.train.schedule import cosine_scheduler

# Shared with the logit-parity suite: same reference oracle, same
# montage/zone geometry, same config bridge — one definition so the two
# harnesses can never drift apart.
from test_torch_parity import (
    ELECTRODES,
    REF_FAST,
    ZONES,
    _load_ref_fast,
    torch_config,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FAST), reason="reference repo not mounted"
)

# Harness geometry: one synthetic "subject", reference CV fold 0.
N_TRIALS = 120          # subject train+val pool (reference: 350)
N_TEST = 400            # official-test stand-in (1 pt resolution = 4 trials)
EPOCHS = 60             # 60 epochs x 6 steps/epoch = 360 optimizer steps
BATCH = 16              # 96 train trials -> 6 steps/epoch
LR, WD = 5e-4, 0.01     # trainer.py:49 + torch AdamW defaults
WARMUP_EPOCHS = 10      # trainer.py:38
SNR = 0.5               # non-trivially separable: lands mid-range, not 1.0


def make_cfg() -> FASTConfig:
    return FASTConfig(
        electrodes=ELECTRODES,
        zone_dict=ZONES,
        dim_cnn=16,
        dim_token=16,
        seq_len=250,
        window_len=100,
        slide_step=50,
        head="Conv4Layers",  # stateless + dropout 0 -> deterministic
        n_classes=5,
        num_layers=2,
        num_heads=4,
        dropout=0.0,
    )


def lightning_lr_table(epochs: int, spe: int) -> np.ndarray:
    """The lr actually applied at optimizer step k (0-indexed), under
    Lightning's LambdaLR-per-step driving of the reference table."""
    base = LR * cosine_scheduler(1.0, 0.1, epochs, spe, warmup_epochs=WARMUP_EPOCHS)
    return np.concatenate([base[-1:], base[:-1]])


def replay_batch_indices(key, epochs: int, n_train: int, batch: int):
    """Replay the jitted engine's per-epoch shuffled batch indices on the
    host (same PRNG splits as ``engine.make_fit._run_epochs``)."""
    out = []
    for ep in range(epochs):
        # engine derivation: fold_in(base key, global epoch) -> (shuffle, step)
        kshuf, _ = jax.random.split(jax.random.fold_in(key, ep))
        bidx, bw = shuffled_epoch_indices(kshuf, n_train, batch)
        out.append((np.asarray(bidx), np.asarray(bw)))
    return out


def make_data(seed: int = 0):
    from sklearn.model_selection import KFold

    # ONE draw for pool + test: the class signatures (frequencies,
    # spatial mixing) are seed-dependent, so pool and test must come
    # from the same generation to share a distribution.
    x_all, y_all = synthetic_trials(
        seed, N_TRIALS + N_TEST, n_channels=len(ELECTRODES), n_samples=250, snr=SNR
    )
    x_pool, y_pool = x_all[:N_TRIALS], y_all[:N_TRIALS]
    x_test, y_test = x_all[N_TRIALS:], y_all[N_TRIALS:]
    # Reference split: KFold(5, shuffle=True, random_state=42), fold 0 —
    # 42 is pinned regardless of `seed` (scripts/train_fast.py:94,100).
    kf = KFold(n_splits=5, shuffle=True, random_state=42)
    train_idx, val_idx = next(iter(kf.split(x_pool)))
    return x_pool, y_pool.astype(np.int64), x_test, y_test.astype(np.int64), train_idx, val_idx


# ---------------------------------------------------------------------------
# torch reference trajectory (faithful Lightning-loop re-drive)
# ---------------------------------------------------------------------------

def run_torch_reference(cfg, x_pool, y_pool, x_test, y_test, train_idx, val_idx,
                        batch_plan, epochs=EPOCHS):
    ref = _load_ref_fast()
    torch.manual_seed(0)
    model = ref.FAST(torch_config(cfg))
    loss_fn = torch.nn.CrossEntropyLoss()
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    spe = len(batch_plan[0][0])
    table = lightning_lr_table(epochs, spe)

    xt = torch.from_numpy(x_pool)
    yt = torch.from_numpy(y_pool)
    x_val = xt[val_idx]
    y_val = yt[val_idx]

    hist = {"loss": [], "val_acc": [], "val_loss": []}
    best_acc, best_sd = -np.inf, None
    step = 0
    for epoch in range(epochs):
        model.train()
        bidx, bw = batch_plan[epoch]
        ep_loss, ep_n = 0.0, 0
        for b in range(spe):
            real = bw[b] > 0
            gidx = train_idx[bidx[b][real]]
            x, y = xt[gidx], yt[gidx]
            for g in opt.param_groups:  # LambdaLR('step') emulation
                g["lr"] = table[step]
            logits = model(x)
            loss = loss_fn(logits, y)
            opt.zero_grad()
            loss.backward()
            opt.step()
            step += 1
            ep_loss += float(loss.detach()) * len(gidx)
            ep_n += len(gidx)
        hist["loss"].append(ep_loss / ep_n)

        model.eval()
        with torch.no_grad():
            vlogits = model(x_val)
            va_loss = float(loss_fn(vlogits, y_val))
            va_acc = float((vlogits.argmax(-1) == y_val).float().mean())
        hist["val_loss"].append(va_loss)
        hist["val_acc"].append(va_acc)
        if va_acc > best_acc:  # ModelCheckpoint mode='max': strictly greater
            best_acc = va_acc
            best_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}

    model.load_state_dict(best_sd)
    model.eval()
    with torch.no_grad():
        preds = model(torch.from_numpy(x_test)).argmax(-1).numpy()
    test_acc = float((preds == y_test).mean())
    return model, hist, best_acc, test_acc


# ---------------------------------------------------------------------------
# JAX engine trajectory (the production fit, weight-transplanted init)
# ---------------------------------------------------------------------------

def run_jax_engine(cfg, torch_init_model, x_pool, y_pool, x_test, y_test,
                   train_idx, val_idx, fit_key, epochs=EPOCHS, batch=BATCH):
    from test_torch_parity import transplant

    from imagined_speech_decoding_tpu.models.api import make_fast_model
    from imagined_speech_decoding_tpu.train.engine import make_fit, predict

    model = make_fast_model(cfg)
    params0, state0 = transplant(torch_init_model, cfg)

    n_train, n_val = len(train_idx), len(val_idx)
    spe = -(-n_train // batch)
    table = jnp.asarray(lightning_lr_table(epochs, spe))
    schedule = lambda c: table[jnp.clip(c, 0, table.shape[0] - 1)]

    fit = make_fit(
        model.apply, cfg.n_classes, epochs=epochs, batch_size=batch,
        n_train=n_train, n_val=n_val, learning_rate=LR,
        warmup_epochs=WARMUP_EPOCHS, schedule=schedule,
    )
    res = jax.jit(fit)(
        fit_key, params0, state0,
        jnp.asarray(train_idx, jnp.int32), jnp.asarray(val_idx, jnp.int32),
        jnp.asarray(x_pool), jnp.asarray(y_pool.astype(np.int32)),
    )
    hist = {k: np.asarray(v) for k, v in res.history.items()}
    preds = predict(model.apply, res.best_params, res.best_model_state, jnp.asarray(x_test))
    test_acc = float((preds == y_test).mean())
    return res, hist, float(res.best_val_acc), test_acc


def run_both(seed: int = 0, epochs: int = EPOCHS, batch: int = BATCH):
    cfg = make_cfg()
    x_pool, y_pool, x_test, y_test, train_idx, val_idx = make_data(seed)
    fit_key = jax.random.PRNGKey(123)
    batch_plan = replay_batch_indices(fit_key, epochs, len(train_idx), batch)
    # Same torch-seeded init on both sides: build the torch model first,
    # train a transplanted copy on the JAX side.
    ref = _load_ref_fast()
    torch.manual_seed(0)
    init_model = ref.FAST(torch_config(cfg))

    jres, jhist, jbest, jtest = run_jax_engine(
        cfg, init_model, x_pool, y_pool, x_test, y_test, train_idx, val_idx,
        fit_key, epochs=epochs, batch=batch,
    )
    tmodel, thist, tbest, ttest = run_torch_reference(
        cfg, x_pool, y_pool, x_test, y_test, train_idx, val_idx, batch_plan,
        epochs=epochs,
    )
    return {
        "torch": {"hist": thist, "best_val_acc": tbest, "test_acc": ttest},
        "jax": {"hist": jhist, "best_val_acc": jbest, "test_acc": jtest},
        "n_steps": epochs * len(batch_plan[0][0]),
        "n_val": len(val_idx),
    }


@pytest.mark.slow
class TestTrajectoryParity:
    @pytest.fixture(scope="class")
    def result(self):
        return run_both()

    def test_enough_steps(self, result):
        assert result["n_steps"] >= 100

    def test_train_loss_curves_match(self, result):
        t = np.asarray(result["torch"]["hist"]["loss"])
        j = np.asarray(result["jax"]["hist"]["loss"])
        # identical data/batches/lr sequence: early epochs near-exact,
        # divergence compounds -> bounded relative error over the run
        np.testing.assert_allclose(j[:5], t[:5], rtol=2e-3)
        np.testing.assert_allclose(j, t, rtol=6e-2)
        assert np.max(np.abs(j - t) / np.maximum(np.abs(t), 1e-3)) < 6e-2

    def test_val_curves_match(self, result):
        t = np.asarray(result["torch"]["hist"]["val_acc"])
        j = np.asarray(result["jax"]["hist"]["val_acc"])
        one_trial = 1.0 / result["n_val"]
        # val_acc is quantized to 1/n_val; allow at most 1 flipped trial
        # per epoch and require most epochs to agree exactly
        assert np.max(np.abs(j - t)) <= one_trial + 1e-6
        assert np.mean(np.abs(j - t) < 1e-6) >= 0.8
        tl = np.asarray(result["torch"]["hist"]["val_loss"])
        jl = np.asarray(result["jax"]["hist"]["val_loss"])
        np.testing.assert_allclose(jl, tl, rtol=6e-2)

    def test_learned_not_saturated(self, result):
        """The corpus must be HARD enough that parity is informative:
        final accuracy away from both chance (0.2) and ceiling (1.0)."""
        for side in ("torch", "jax"):
            assert 0.30 < result[side]["test_acc"] < 0.95, result[side]

    def test_final_accuracy_within_1pt(self, result):
        delta = abs(result["jax"]["test_acc"] - result["torch"]["test_acc"])
        assert delta <= 0.01 + 1e-9, (
            f"jax {result['jax']['test_acc']:.4f} vs "
            f"torch {result['torch']['test_acc']:.4f}"
        )


@pytest.mark.slow
class TestTrajectoryParityRaggedTail:
    """Same oracle comparison at a batch size that does NOT divide the
    train-set size (96 trials at batch 28 -> 3x28 + 1x12): pins the
    engine's pad-free ragged tail step — the final short batch runs at
    its exact shape instead of padded with zero-weight rows — against
    the torch loop's masked short batch. 25 epochs x 4 steps = 100
    optimizer steps."""

    @pytest.fixture(scope="class")
    def result(self):
        return run_both(epochs=25, batch=28)

    def test_enough_steps(self, result):
        assert result["n_steps"] >= 100

    def test_train_loss_curves_match(self, result):
        t = np.asarray(result["torch"]["hist"]["loss"])
        j = np.asarray(result["jax"]["hist"]["loss"])
        np.testing.assert_allclose(j[:5], t[:5], rtol=2e-3)
        np.testing.assert_allclose(j, t, rtol=6e-2)

    def test_val_curves_match(self, result):
        t = np.asarray(result["torch"]["hist"]["val_acc"])
        j = np.asarray(result["jax"]["hist"]["val_acc"])
        one_trial = 1.0 / result["n_val"]
        assert np.max(np.abs(j - t)) <= one_trial + 1e-6
        assert np.mean(np.abs(j - t) < 1e-6) >= 0.8

    def test_final_accuracy_within_1pt(self, result):
        delta = abs(result["jax"]["test_acc"] - result["torch"]["test_acc"])
        assert delta <= 0.01 + 1e-9, (
            f"jax {result['jax']['test_acc']:.4f} vs "
            f"torch {result['torch']['test_acc']:.4f}"
        )


def main():
    res = run_both()
    t, j = res["torch"], res["jax"]
    print(f"steps: {res['n_steps']}")
    print("epoch |  loss(torch)  loss(jax) | val_acc(torch) val_acc(jax)")
    for e in range(EPOCHS):
        print(f"{e:5d} | {t['hist']['loss'][e]:12.5f} {j['hist']['loss'][e]:10.5f}"
              f" | {t['hist']['val_acc'][e]:13.4f} {j['hist']['val_acc'][e]:12.4f}")
    print(f"best val_acc:  torch {t['best_val_acc']:.4f}  jax {j['best_val_acc']:.4f}")
    print(f"test accuracy: torch {t['test_acc']:.4f}  jax {j['test_acc']:.4f}  "
          f"delta {abs(t['test_acc'] - j['test_acc']) * 100:.2f} pt")


if __name__ == "__main__":
    main()
