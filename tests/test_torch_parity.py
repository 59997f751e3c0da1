"""Numerical parity against the ACTUAL reference implementation.

Instantiates the reference torch ``FAST`` (``/root/reference/src/fast/
models/fast.py:213-284``), transplants its weights into the JAX FAST,
and asserts logits agree (f32, rtol 1e-4) for all 4 head families and
all 3 forward modes — the substantiation path for the "accuracy within
1 pt" target without the private dataset, plus one step of AdamW
training-dynamics agreement.

The reference module is imported (never copied) purely as a test oracle.
"""

import importlib.util
import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_FAST = "/root/reference/src/fast/models/fast.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FAST), reason="reference repo not mounted"
)

import jax
import jax.numpy as jnp

from imagined_speech_decoding_tpu.config import FASTConfig
from imagined_speech_decoding_tpu.data.constants import zone_layout
from imagined_speech_decoding_tpu.models.fast import fast_apply, fast_init
from imagined_speech_decoding_tpu.ops.norm import BNState

RTOL, ATOL = 1e-4, 1e-5


def _load_ref_fast():
    spec = importlib.util.spec_from_file_location("ref_fast", REF_FAST)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ELECTRODES = ("C1", "C2", "C3", "C4", "P1", "P2", "O1", "O2", "F1", "F2")
ZONES = {
    "Central": ("C1", "C2", "C3", "C4"),
    "Parietal": ("P1", "P2"),
    "Occipital": ("O1", "O2"),
    "Frontal": ("F1", "F2"),
}


def make_cfg(head: str, window_len: int, seq_len: int, step: int) -> FASTConfig:
    return FASTConfig(
        electrodes=ELECTRODES,
        zone_dict=ZONES,
        dim_cnn=12 if head == "HeadConv_Paper_Version" else 16,
        dim_token=16,
        seq_len=seq_len,
        window_len=window_len,
        slide_step=step,
        head=head,
        n_classes=5,
        num_layers=2,
        num_heads=4,
        dropout=0.0,  # deterministic parity
    )


def torch_config(cfg: FASTConfig):
    return types.SimpleNamespace(
        electrodes=list(cfg.electrodes),
        zone_dict={k: list(v) for k, v in cfg.zone_dict.items()},
        head=cfg.head,
        dim_cnn=cfg.dim_cnn,
        dim_token=cfg.dim_token,
        seq_len=cfg.seq_len,
        window_len=cfg.window_len,
        slide_step=cfg.slide_step,
        n_classes=cfg.n_classes,
        num_heads=cfg.num_heads,
        num_layers=cfg.num_layers,
        dropout=cfg.dropout,
    )


# ---------------------------------------------------------------------------
# torch state_dict -> JAX (params, state) transplant
# ---------------------------------------------------------------------------

def _pad_spatial(w: np.ndarray, c_max: int) -> np.ndarray:
    """Zero-pad a (O, I, C_zone, 1) spatial conv kernel to C_max rows."""
    o, i, c, k = w.shape
    out = np.zeros((o, i, c_max, k), w.dtype)
    out[:, :, :c] = w
    return out


def _head_zone_params(head: str, zsd: dict, c_max: int):
    """Per-zone torch tensors -> JAX head params/state for one zone.

    ``.numpy().copy()`` — detached numpy views SHARE torch storage; an
    in-place torch optimizer step would otherwise mutate the JAX params
    (jnp.asarray zero-copies on CPU)."""
    g = lambda k: zsd[k].detach().numpy().copy()
    t = lambda k: g(k).T  # torch Linear stores (out, in)
    if head == "Conv4Layers":
        return {
            "cnn1": {"w": g("cnn1.weight"), "b": g("cnn1.bias")},
            "cnn2": {"w": _pad_spatial(g("cnn2.weight"), c_max)},
            "cnn3": {"w": g("cnn3.weight")},
            "cnn4": {"w": g("cnn4.weight")},
        }, {}
    bn = lambda k: {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}
    bns = lambda k: BNState(
        mean=g(f"{k}.running_mean"), var=g(f"{k}.running_var")
    )
    if head == "CVBlock":
        return {
            "conv1": {"w": g("conv1.weight")},
            "conv2": {"w": _pad_spatial(g("conv2.weight"), c_max)},
            "conv3": {"w": g("conv3.weight")},
            "projector": {"w": t("projector.weight"), "b": g("projector.bias")},
            "bn1": bn("bn1"), "bn2": bn("bn2"), "bn3": bn("bn3"),
        }, {"bn1": bns("bn1"), "bn2": bns("bn2"), "bn3": bns("bn3")}
    if head == "EEGNet_Encoder":
        return {
            "temporal": {"w": g("temporal_conv.0.weight")},
            "spatial": {"w": _pad_spatial(g("spatial_conv.0.weight"), c_max)},
            "sep_depth": {"w": g("separable_conv.0.weight")},
            "sep_point": {"w": g("separable_conv.1.weight")},
            "projector": {"w": t("projector.2.weight"), "b": g("projector.2.bias")},
            "bn1": bn("temporal_conv.1"), "bn2": bn("spatial_conv.1"),
            "bn3": bn("separable_conv.2"),
        }, {
            "bn1": bns("temporal_conv.1"), "bn2": bns("spatial_conv.1"),
            "bn3": bns("separable_conv.2"),
        }
    if head == "HeadConv_Paper_Version":
        p = {
            "cnn1_t": {"w": g("cnn1_t.weight"), "b": g("cnn1_t.bias")},
            "cnn1_s": {"w": _pad_spatial(g("cnn1_s.weight"), c_max)},
        }
        s = {}
        for i in (2, 3, 4):
            p[f"cnn{i}"] = {"w": g(f"cnn{i}.weight")}
        for i in (1, 2, 3, 4):
            p[f"norm{i}"] = bn(f"norm{i}")
            s[f"norm{i}"] = bns(f"norm{i}")
        return p, s
    raise KeyError(head)


def transplant(torch_model, cfg: FASTConfig):
    """Build JAX (params, state) carrying the torch model's weights."""
    layout = zone_layout(cfg.electrodes, cfg.zone_dict)
    sd = torch_model.state_dict()
    g = lambda k: sd[k].detach().numpy().copy()  # copy: see _head_zone_params
    t = lambda k: g(k).T

    zone_ps, zone_ss = [], []
    for zname in layout.names:
        zsd = {
            k[len(f"head.encoders.{zname}."):]: v
            for k, v in sd.items()
            if k.startswith(f"head.encoders.{zname}.")
        }
        zp, zs = _head_zone_params(cfg.head, zsd, layout.c_max)
        zone_ps.append(zp)
        zone_ss.append(zs)
    head_params = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *zone_ps)
    head_state = (
        jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *zone_ss)
        if zone_ss[0]
        else {}
    )

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer.{i}."
        blocks.append({
            "ln1": {"scale": g(pre + "layer_norm_1.weight"), "bias": g(pre + "layer_norm_1.bias")},
            "attn": {
                "in_w": t(pre + "attn.in_proj_weight"),
                "in_b": g(pre + "attn.in_proj_bias"),
                "out_w": t(pre + "attn.out_proj.weight"),
                "out_b": g(pre + "attn.out_proj.bias"),
            },
            "ln2": {"scale": g(pre + "layer_norm_2.weight"), "bias": g(pre + "layer_norm_2.bias")},
            "fc1": {"w": t(pre + "linear.0.weight"), "b": g(pre + "linear.0.bias")},
            "fc2": {"w": t(pre + "linear.3.weight"), "b": g(pre + "linear.3.bias")},
        })

    params = {
        "head": head_params,
        "input_layer": {"w": t("input_layer.0.weight"), "b": g("input_layer.0.bias")},
        "blocks": blocks,
        "pos_embedding": g("pos_embedding"),
        "cls_token": g("cls_token"),
        "last_layer": {"w": t("last_layer.weight"), "b": g("last_layer.bias")},
    }
    params = jax.tree.map(jnp.asarray, params)
    return params, {"head": head_state}


HEAD_CASES = [
    ("Conv4Layers", 100, 250, 50),
    ("CVBlock", 250, 500, 125),  # torch probes flat-dim with a 250 dummy
    ("EEGNet_Encoder", 100, 250, 50),
    ("HeadConv_Paper_Version", 100, 250, 50),
]


@pytest.fixture(scope="module")
def ref():
    return _load_ref_fast()


def _make_pair(ref, head, window_len, seq_len, step, seed=0):
    cfg = make_cfg(head, window_len, seq_len, step)
    torch.manual_seed(seed)
    tm = ref.FAST(torch_config(cfg)).eval()
    params, state = transplant(tm, cfg)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(4, cfg.n_channels, cfg.seq_len)).astype(np.float32)
    return cfg, tm, params, state, x


class TestForwardParity:
    @pytest.mark.parametrize("head,window_len,seq_len,step", HEAD_CASES)
    def test_logits_match_eval(self, ref, head, window_len, seq_len, step):
        cfg, tm, params, state, x = _make_pair(ref, head, window_len, seq_len, step)
        with torch.no_grad():
            ref_logits = tm(torch.from_numpy(x)).numpy()
        logits, _ = fast_apply(params, state, jnp.asarray(x), cfg, train=False)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("mode", ["default", "train_head", "train_transformer"])
    def test_forward_modes_match(self, ref, mode):
        cfg, tm, params, state, x = _make_pair(ref, *HEAD_CASES[0])
        with torch.no_grad():
            ref_logits = tm(torch.from_numpy(x), forward_mode=mode).numpy()
        logits, _ = fast_apply(
            params, state, jnp.asarray(x), cfg, forward_mode=mode, train=False
        )
        np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=RTOL, atol=ATOL)

    def test_step_override_matches(self, ref):
        cfg, tm, params, state, x = _make_pair(ref, *HEAD_CASES[0])
        with torch.no_grad():
            ref_feat = tm.forward_head(torch.from_numpy(x), step_override=25).numpy()
        from imagined_speech_decoding_tpu.models.fast import fast_forward_head

        feat, _ = fast_forward_head(params, state, jnp.asarray(x), cfg, step_override=25)
        np.testing.assert_allclose(np.asarray(feat), ref_feat, rtol=RTOL, atol=ATOL)


class TestTrainDynamicsParity:
    def test_bn_train_forward_and_stats(self, ref):
        """CVBlock train-mode: batch statistics + running-stat updates.

        torch's CVBlock hardcodes internal Dropout(0.5) — zero it so the
        comparison isolates BN semantics (the JAX side gets rng=None)."""
        cfg, tm, params, state, x = _make_pair(ref, *HEAD_CASES[1])
        tm.train()
        for m in tm.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
        with torch.no_grad():
            ref_logits = tm(torch.from_numpy(x)).numpy()
        logits, new_state = fast_apply(params, state, jnp.asarray(x), cfg, train=True, rng=None)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=RTOL, atol=1e-4)
        # Running stats after one train pass (zone 0, bn1) match torch's.
        ref_mean = tm.head.encoders[list(ZONES)[0]].bn1.running_mean.detach().numpy()
        got_mean = np.asarray(new_state["head"]["bn1"].mean)[0]
        np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_one_adamw_step(self, ref):
        """Gradients + one AdamW step produce matching logits after update."""
        import optax

        cfg, tm, params, state, x = _make_pair(ref, *HEAD_CASES[0])
        tm.train()  # Conv4Layers is stateless & dropout=0 -> deterministic
        y = np.array([0, 1, 2, 3], dtype=np.int64)
        lr, wd = 5e-4, 0.01

        opt_t = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=wd)
        loss_t = torch.nn.functional.cross_entropy(
            tm(torch.from_numpy(x)), torch.from_numpy(y)
        )
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()
        with torch.no_grad():
            tm.eval()
            ref_logits_after = tm(torch.from_numpy(x)).numpy()

        opt_j = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
        opt_state = opt_j.init(params)

        def loss_fn(p):
            logits, _ = fast_apply(p, state, jnp.asarray(x), cfg, train=True, rng=None)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, jnp.asarray(y)[:, None], axis=-1))

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=RTOL)
        updates, _ = opt_j.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        logits_after, _ = fast_apply(new_params, state, jnp.asarray(x), cfg, train=False)
        np.testing.assert_allclose(
            np.asarray(logits_after), ref_logits_after, rtol=1e-3, atol=1e-5
        )


class TestMultiStepDynamics:
    @pytest.mark.slow
    def test_ten_adamw_steps_track_torch(self, ref):
        """10 full-batch AdamW steps: the JAX training trajectory tracks
        the torch reference step-for-step (f32, no stochastic ops)."""
        import optax

        cfg, tm, params, state, x = _make_pair(ref, *HEAD_CASES[0])
        y = np.array([0, 1, 2, 3], dtype=np.int64)
        lr, wd = 5e-4, 0.01
        tm.train()
        opt_t = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=wd)
        opt_j = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
        opt_state = opt_j.init(params)

        def loss_fn(p):
            logits, _ = fast_apply(p, state, jnp.asarray(x), cfg, train=True, rng=None)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, jnp.asarray(y)[:, None], axis=-1))

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        torch_losses, jax_losses = [], []
        for step in range(10):
            loss_t = torch.nn.functional.cross_entropy(
                tm(torch.from_numpy(x)), torch.from_numpy(y)
            )
            opt_t.zero_grad()
            loss_t.backward()
            opt_t.step()
            torch_losses.append(float(loss_t.detach()))

            loss_j, grads = grad_fn(params)
            updates, opt_state = opt_j.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            jax_losses.append(float(loss_j))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-3)
        # final logits agree after the full trajectory
        tm.eval()
        with torch.no_grad():
            ref_logits = tm(torch.from_numpy(x)).numpy()
        logits, _ = fast_apply(params, state, jnp.asarray(x), cfg, train=False)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-2, atol=2e-4)
        # and the loss actually decreased (both sides trained)
        assert jax_losses[-1] < jax_losses[0]


class TestCVBlockTrajectoryWithBN:
    @pytest.mark.slow
    def test_hundred_steps_bn_stats_track_torch(self, ref):
        """100 full-batch AdamW steps on the BN-bearing CVBlock head:
        losses, BN running statistics, and eval-mode logits (which READ
        the running stats) track torch step-for-step. Catches
        running-stat momentum/indexing drift that single-step parity
        (test_bn_train_forward_and_stats) cannot."""
        import optax

        cfg, tm, params, state, _ = _make_pair(ref, *HEAD_CASES[1])
        rng = np.random.default_rng(3)
        x = rng.normal(size=(8, cfg.n_channels, cfg.seq_len)).astype(np.float32)
        y = np.arange(8, dtype=np.int64) % 5
        lr, wd = 5e-4, 0.01
        tm.train()
        for m in tm.modules():  # isolate BN: zero torch's hardcoded Dropout(0.5)
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
        opt_t = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=wd)
        opt_j = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
        opt_state = opt_j.init(params)

        def loss_fn(p, s):
            logits, new_s = fast_apply(p, s, jnp.asarray(x), cfg, train=True, rng=None)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.mean(jnp.take_along_axis(logp, jnp.asarray(y)[:, None], axis=-1))
            return nll, new_s

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        t_losses, j_losses = [], []
        for _ in range(100):
            loss_t = torch.nn.functional.cross_entropy(
                tm(torch.from_numpy(x)), torch.from_numpy(y)
            )
            opt_t.zero_grad()
            loss_t.backward()
            opt_t.step()
            t_losses.append(float(loss_t.detach()))

            (loss_j, state), grads = grad_fn(params, state)
            updates, opt_state = opt_j.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            j_losses.append(float(loss_j))

        np.testing.assert_allclose(j_losses, t_losses, rtol=2e-2)
        # BN running stats after 100 train-mode passes (zone 0, all BNs)
        z0 = tm.head.encoders[list(ZONES)[0]]
        for bn_name in ("bn1", "bn2", "bn3"):
            ref_mean = getattr(z0, bn_name).running_mean.detach().numpy()
            ref_var = getattr(z0, bn_name).running_var.detach().numpy()
            got = state["head"][bn_name]
            # running means sit near 0 (|mean| ~ 1e-2): absolute
            # tolerance carries the comparison; variances are O(1) so
            # the relative term does (100 steps of EMA accumulate
            # ~1e-3 of benign float drift — the single-step test pins
            # the exact semantics)
            np.testing.assert_allclose(np.asarray(got.mean)[0], ref_mean, rtol=5e-2, atol=5e-3)
            np.testing.assert_allclose(np.asarray(got.var)[0], ref_var, rtol=2e-2, atol=5e-3)
        # eval-mode logits read the running stats: final agreement
        tm.eval()
        with torch.no_grad():
            ref_logits = tm(torch.from_numpy(x)).numpy()
        logits, _ = fast_apply(params, state, jnp.asarray(x), cfg, train=False)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=5e-2, atol=5e-3)
        assert j_losses[-1] < j_losses[0]


class TestCanonicalGeometryParity:
    """Weight-transplant parity at the EXACT production geometry —
    the default config every real training run uses (the reduced
    harness above keeps the other cases fast): full 64-electrode
    montage, all 8 zones with ragged sizes 4-15, seq_len 800 →
    5 sliding windows → CLS over 6 tokens, dim_cnn=dim_token=32,
    4 transformer layers, 8 heads (``configs/default.yaml`` /
    reference ``scripts/train_fast.py:293-307``). Guards against
    geometry-dependent bugs (zone padding, window count, token
    width) that reduced shapes cannot expose."""

    def test_logits_match_eval_full_geometry(self, ref):
        from imagined_speech_decoding_tpu.data.constants import Electrodes, Zones

        cfg = FASTConfig(
            electrodes=tuple(Electrodes),
            zone_dict={k: tuple(v) for k, v in Zones.items()},
            dim_cnn=32, dim_token=32,
            seq_len=800, window_len=250, slide_step=125,
            head="Conv4Layers", n_classes=5,
            num_layers=4, num_heads=8,
            dropout=0.0,  # deterministic parity (eval has no dropout anyway)
        )
        torch.manual_seed(0)
        tm = ref.FAST(torch_config(cfg)).eval()
        params, state = transplant(tm, cfg)
        x = np.random.default_rng(0).normal(
            size=(4, cfg.n_channels, cfg.seq_len)
        ).astype(np.float32)
        with torch.no_grad():
            ref_logits = tm(torch.from_numpy(x)).numpy()
        logits, _ = fast_apply(params, state, jnp.asarray(x), cfg, train=False)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=RTOL, atol=ATOL)

    def test_forward_head_full_geometry(self, ref):
        """The tokenizer path alone at full geometry: 5 windows x 8
        zones x 32 features per trial, against the torch head."""
        from imagined_speech_decoding_tpu.data.constants import Electrodes, Zones
        from imagined_speech_decoding_tpu.models.fast import fast_forward_head

        cfg = FASTConfig(
            electrodes=tuple(Electrodes),
            zone_dict={k: tuple(v) for k, v in Zones.items()},
            dim_cnn=32, dim_token=32,
            seq_len=800, window_len=250, slide_step=125,
            head="Conv4Layers", n_classes=5,
            num_layers=4, num_heads=8, dropout=0.0,
        )
        torch.manual_seed(1)
        tm = ref.FAST(torch_config(cfg)).eval()
        params, state = transplant(tm, cfg)
        x = np.random.default_rng(1).normal(
            size=(2, cfg.n_channels, cfg.seq_len)
        ).astype(np.float32)
        with torch.no_grad():
            ref_feat = tm.forward_head(torch.from_numpy(x)).numpy()
        feat, _ = fast_forward_head(params, state, jnp.asarray(x), cfg)
        assert np.asarray(feat).shape == (2, cfg.n_tokens, len(Zones), cfg.dim_cnn)
        np.testing.assert_allclose(np.asarray(feat), ref_feat, rtol=RTOL, atol=ATOL)
