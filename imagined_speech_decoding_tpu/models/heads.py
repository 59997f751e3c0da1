"""Zone-encoder heads: Conv4Layers, CVBlock, EEGNetEncoder, HeadConvPaper.

Functional re-designs of the reference's per-zone encoder families
(``src/fast/models/fast.py:32-196``). The reference instantiates one
encoder per functional zone with a *ragged* channel width (4-15) and
loops over zones in Python (``fast.py:209-210``); here each head is a
single-zone pure function over a **rectangular** ``(B, C_max, T)`` input
plus a channel-validity mask, so FAST can ``vmap`` one encoder kernel
across the zone axis (stacked per-zone params) — one batched XLA program
instead of 8 sequential module calls.

Masking contract (exact ragged equivalence):
  * inputs arrive with padded channel rows zeroed (``ops.zone_gather``);
  * after any op that can write non-zero values into padded rows (a
    biased conv, a batch-norm affine) the rows are re-zeroed *before*
    the full-width spatial conv, so padded rows contribute exactly 0 —
    identical to a ragged-width conv over only the real channels;
  * batch-norm statistics are computed with the channel mask
    (``ops.norm.batch_norm``) while channel structure is still present.

Each head is an ``(init, apply)`` pair:
  ``init(key, c_max, feature_dim, window_len, dtype) -> (params, state)``
  ``apply(params, state, x, mask, *, train, rng, sample_mask) ->
  (feat (B, F), state)``

``sample_mask`` (optional ``(B,)``) marks zero-weight padding rows of a
ragged final batch; BN-bearing heads exclude them from batch statistics
(see ``ops.norm.bn_sample_mask``) so padded static-shape batches train
identically to the reference's short ragged batches.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.norm import BNState, batch_norm, bn_init, bn_sample_mask
from . import modules as nn


class ZoneEncoder(NamedTuple):
    init: Callable
    apply: Callable
    stochastic: bool = True  # whether apply() consumes rng (dropout)


def _mask_rows(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero padded channel rows of ``(B, F, C, T)`` given mask ``(C,)``."""
    return x * mask.astype(x.dtype)[None, None, :, None]


def _bn_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Channel mask shaped for BN over ``(B, F, C, T)``."""
    return mask[None, None, :, None]


# ---------------------------------------------------------------------------
# Conv4Layers — the default head (reference fast.py:103-119)
# ---------------------------------------------------------------------------

def conv4layers_init(key, c_max: int, dim: int = 32, window_len: int = 250, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "cnn1": nn.conv2d_init(k1, 1, dim, (1, 5), bias=True, dtype=dtype),
        "cnn2": nn.conv2d_init(k2, dim, dim, (c_max, 1), bias=False, dtype=dtype),
        "cnn3": nn.conv2d_init(k3, dim, dim, (1, 5), bias=False, dtype=dtype),
        "cnn4": nn.conv2d_init(k4, dim, dim, (1, 5), bias=False, dtype=dtype),
    }
    return params, {}


def _fuse_temporal_spatial(w_t, b_t, w_s, mask):
    """Compose temporal conv (+bias) → channel-mask → spatial conv into ONE
    conv kernel + bias.

    ``w_t (F, 1, 1, K)`` temporal, ``b_t (F,)`` its bias, ``w_s (O, F,
    C, 1)`` spatial, ``mask (C,)``. The chain is linear, so::

        spatial(mask(temporal(x)))[o, t]
          = Σ_c Σ_k (Σ_f w_s[o,f,c] w_t[f,k]) x[c, t+k]
            + Σ_{c: mask} Σ_f w_s[o,f,c] b_t[f]

    i.e. one ``(O, 1, C, K)`` conv with bias. This is the memory-critical
    rewrite: the naive sequence materializes a ``(B, F, C_max, T)``
    activation (the largest tensor in the network — tens of GB across the
    stacked models); the fused kernel never creates it, and does ~7x
    fewer FLOPs. Exact-equivalence is covered by the padded-vs-ragged
    head tests.
    """
    wt = w_t[:, 0, 0, :]  # (F, K)
    ws = w_s[:, :, :, 0]  # (O, F, C)
    w = jnp.einsum("ofc,fk->ock", ws, wt)[:, None, :, :]  # (O, 1, C, K)
    b = jnp.einsum("ofc,c,f->o", ws, mask.astype(ws.dtype), b_t)
    return w, b


def conv4layers_apply(params, state, x, mask, *, train=False, rng=None, sample_mask=None):
    """4-layer CNN: temporal(1,5)+bias → spatial(C,1) → 2x temporal(1,5)
    → GELU → mean over time. ``x (B, C_max, T) -> (B, dim)``.

    The first two (purely linear) convs run as one fused kernel (see
    ``_fuse_temporal_spatial``); every conv runs as shifted batched GEMMs
    (``nn.temporal_conv``) so the zone/model-vmapped program stays on the
    MXU instead of degenerating into 1-group-per-instance grouped convs."""
    w12, b12 = _fuse_temporal_spatial(
        params["cnn1"]["w"], params["cnn1"]["b"], params["cnn2"]["w"], mask
    )
    h = nn.temporal_conv(x, w12[:, 0], b12)  # (B, dim, T-4)
    h = nn.temporal_conv(h, params["cnn3"]["w"][:, :, 0, :], pad=2)
    h = nn.temporal_conv(h, params["cnn4"]["w"][:, :, 0, :], pad=2)
    h = jax.nn.gelu(h, approximate=False)
    return jnp.mean(h, axis=-1), state


def _zone_scatter(indices, mask, c_full: int):
    """Static one-hot selection tensor ``(Z, C_max, C_full)``: S[z,c,C]=1
    iff zone z's slot c is montage channel C (0 for padded slots)."""
    import numpy as np

    z, c_max = indices.shape
    s = np.zeros((z, c_max, c_full), np.float32)
    zi, ci = np.nonzero(np.asarray(mask))
    s[zi, ci, np.asarray(indices)[zi, ci]] = 1.0
    return s


def _conv4_fused_w12(params, indices, mask, c_full: int, dtype):
    """Zone-stacked Conv4Layers params → gather-free fused first conv:
    temporal∘spatial fusion (cf. ``_fuse_temporal_spatial``) + zone
    scatter to full-montage width. Returns ``(w12 (Z, O, C_full, K),
    b12 (Z, O))``."""
    z_mask = jnp.asarray(mask)
    wt = params["cnn1"]["w"][:, :, 0, 0, :]  # (Z, F, K)
    bt = params["cnn1"]["b"]  # (Z, F)
    ws = params["cnn2"]["w"][:, :, :, :, 0]  # (Z, O, F, C_max)
    s = jnp.asarray(_zone_scatter(indices, mask, c_full), wt.dtype)
    w12 = jnp.einsum("zofc,zfk,zcC->zoCk", ws, wt, s)  # (Z, O, C_full, K)
    b12 = jnp.einsum("zofc,zc,zf->zo", ws, z_mask.astype(ws.dtype), bt)
    return w12.astype(dtype), b12.astype(dtype)


def _patches(v, k):
    """(..., T) -> (..., T-K+1, K): K-tap patch stack as a jnp.stack of
    static slices (a single fused copy). Raises each conv's contraction
    to (channels x taps) for the MXU — measured best of several
    formulations tried (grouped convs, per-tap shifted GEMMs,
    time-major GEMMs)."""
    t_out = v.shape[-1] - k + 1
    return jnp.stack(
        [jax.lax.slice_in_dim(v, i, i + t_out, axis=-1) for i in range(k)], axis=-1
    )


def _conv4_impl(which: str) -> str:
    """Formulation knobs for the fused Conv4Layers fast path, settable via
    ``ISD_CONV4_FIRST`` (first conv: ``gemm`` patch-GEMM | ``conv`` native
    XLA conv) and ``ISD_CONV4_TAILS`` (``pertap`` accumulated shifted
    GEMMs | ``patches`` K-tap patch-stack GEMM | ``conv`` native XLA
    grouped conv | ``dense`` de-grouped block-diagonal dense conv
    (Z x FLOPs for full MXU lanes) | ``nhwc2`` channels-last end-to-end
    tails | ``conv2`` composed single conv | ``fullseq`` /
    ``fullseq2`` full-sequence tails). Defaults are the measured-fastest
    on the available chip, backend-gated in ``_conv4_tails_impl`` (TPU:
    ``dense`` for train and inference; elsewhere ``conv`` train /
    ``conv2`` inference): the program is HBM-bandwidth-bound, and
    XLA's native conv emitter tiles the tail convs in VMEM without
    materializing the K-tap patch stack — less traffic AND less live
    memory, which in turn admits 4x larger head chunks (59k vs 35k
    windows/s measured; see docs/PERFORMANCE.md)."""
    import os

    defaults = {"first": "gemm", "tails": "conv"}
    return os.environ.get(f"ISD_CONV4_{which.upper()}", defaults[which])


def _conv4_tails_impl(train: bool) -> str:
    """Effective tails formulation: the ``ISD_CONV4_TAILS`` override if
    set, else ``dense`` on TPU (training AND inference — measured best
    for both, see below); elsewhere ``conv`` for training and ``conv2``
    (composed single conv + exact edge corrections) for inference.

    Round-4 measurement (experiments/r4_levers.py, production geometry:
    75 models x 4 epochs, bf16, remat, 256-window chunks): the
    de-grouped block-diagonal ``dense`` tails train at **77.6k** incl-val
    windows/s vs ``conv``'s 73.1k (+6.1%; trainpass 62.1k vs 58.5k) —
    spending Z x the FLOPs to fill all 128 MXU lanes with a (Z*I*K)-deep
    contraction beats the grouped conv's 32-lane occupancy AND sheds the
    grouped feed's relayout copies (dense also fits at 512-window chunks
    where grouped OOM'd unchunked: 78.2k). On CPU the extra FLOPs are
    real cost with no lane win, so the non-TPU training default stays
    ``conv``. The composed ``conv2`` stays inference-only: its backward
    needs ~5 GB more HBM across the stack (measured OOM).

    ``ISD_CONV4_TAILS_EVAL`` overrides the INFERENCE formulation alone
    (validation passes inside the jitted fit, ``predict``, serving) so
    train/eval formulations can be measured independently — e.g.
    ``ISD_CONV4_TAILS_EVAL=dense2`` runs the composed 9-tap kernel as a
    de-grouped dense conv while training stays on the default.

    Round-4 eval-formulation measurement (experiments/tails_sweep.py
    --eval-tails, production geometry unchunked, train=``dense``):
    eval ``conv2`` 77.6k incl-val windows/s, eval ``dense2`` (composed
    de-grouped) 76.2k, eval ``dense`` **78.6k** — the two-stage dense
    conv beats the composed kernel on TPU (the composed trick pays on a
    LAUNCH-bound grouped conv; de-grouped, the 9-tap full-lane kernel
    plus its edge corrections cost more than the second 5-tap stage
    saves). TPU inference default is therefore ``dense`` too; ``conv2``
    stays the non-TPU inference default (composed = fewer passes where
    lanes aren't the constraint)."""
    import os

    if not train:
        env_eval = os.environ.get("ISD_CONV4_TAILS_EVAL")
        if env_eval is not None:
            return env_eval
    env = os.environ.get("ISD_CONV4_TAILS")
    if env is not None:
        return env
    import jax

    if jax.default_backend() == "tpu":
        return "dense"
    return "conv" if train else "conv2"


def _compose_taps(w3, w4):
    """Pre-convolve two back-to-back linear conv kernels into one:
    ``w3 (Z, J, I, K3)`` then ``w4 (Z, O, J, K4)`` → ``w34 (Z, O, I,
    K3+K4-1)`` with ``w34[..,m] = Σ_{ka+kb=m} Σ_j w4[..,j,kb]
    w3[j,..,ka]`` (correlation semantics, matching
    ``conv_general_dilated``). Composed in f32 (tiny tensors)."""
    w3f, w4f = w3.astype(jnp.float32), w4.astype(jnp.float32)
    k3, k4 = w3.shape[-1], w4.shape[-1]
    taps = [
        sum(
            jnp.einsum("zji,zoj->zoi", w3f[..., ka], w4f[..., m - ka])
            for ka in range(max(0, m - k4 + 1), min(k3 - 1, m) + 1)
        )
        for m in range(k3 + k4 - 1)
    ]
    return jnp.stack(taps, axis=-1)


def _conv4_tails_composed(params, h, dense=False):
    """Both tail convs as ONE composed (K3+K4-1)-tap grouped conv + exact
    edge corrections: ``h (B, Z, I, T1) -> (B, Z, O)``. With
    ``dense=True`` (the ``dense2`` formulation) the composed kernel runs
    de-grouped on the block diagonal of one dense conv — the ``dense``
    occupancy trade applied to the forward-only composed path.

    cnn3 and cnn4 are back-to-back linear convs (GELU only after cnn4),
    so their kernels pre-convolve into one. Measured on the target chip,
    the grouped conv is launch/bandwidth-bound, not tap-bound — a 9-tap
    conv costs the same as a 5-tap one, so this halves the tails' time.

    Composition is NOT exact at the ``e = K3//2 + K4//2`` positions at
    each end: the true two-stage computation zero-clamps cnn3's OUTPUT
    values outside [0, T1), while the composed conv only zero-pads the
    input. Those 2e positions are recomputed exactly from ``2e``-wide
    input strips (two-stage, window-local padding) and the time-mean is
    patched by the difference. Exact-equivalence with the two-stage path
    is tested (values and gradients).
    """
    w3 = params["cnn3"]["w"][:, :, :, 0, :]  # (Z, O, I, K)
    w4 = params["cnn4"]["w"][:, :, :, 0, :]
    return _tails_composed_core(h, w3, w4, dense=dense)


def _edge_two_stage(strip, left, w3d, w4d):
    """Exact two-stage window-local tail values on a ``2e``-wide edge
    strip (``strip (B, Z, I, 2e)`` → ``(B, Z, O, e)``). Weights must
    already be in the compute dtype. Shared by the composed-tails
    forward (`_tails_composed_core`) and the `conv2c` custom backward
    (`_tails_composed_cvjp_bwd`) so the edge math cannot drift between
    a forward edit and the hand-written VJP."""
    k3, k4 = w3d.shape[-1], w4d.shape[-1]
    pad = [(0, 0), (0, 0), (0, 0)]
    p3 = [(k3 // 2, 0)] if left else [(0, k3 // 2)]
    p4 = [(k4 // 2, 0)] if left else [(0, k4 // 2)]
    h3 = _conv_valid_time(jnp.pad(strip, pad + p3), w3d)
    return _conv_valid_time(jnp.pad(h3, pad + p4), w4d)


def _tails_composed_core(h, w3, w4, dense=False):
    """Composed-tails forward math: ``h (B, Z, I, T1)`` ×
    ``w3/w4 (Z, O|J, I|J, K)`` → ``(B, Z, O)``. See
    ``_conv4_tails_composed`` for the derivation. ``dense=True`` runs
    the composed kernel as a block-diagonal de-grouped dense conv
    (``dense2``: Z x the FLOPs for full MXU lanes on the one big conv;
    the tiny edge strips stay two-stage grouped)."""
    k3, k4 = w3.shape[-1], w4.shape[-1]
    e = k3 // 2 + k4 // 2
    t1 = h.shape[-1]
    w34 = _compose_taps(w3, w4).astype(h.dtype)  # (Z, O, I, K3+K4-1)
    conv_fn = _dense_conv_same_time if dense else _grouped_conv_same_time
    h4c = conv_fn(h, w34)  # (B, Z, O, T1), exact on [e, t1-e)
    g = jax.nn.gelu(h4c, approximate=False)
    # Mean in the compute dtype (same numerics as the two-stage path's
    # jnp.mean); an f32 cast here would materialize a full-width f32
    # copy of g — measured +3.9 GB across the stacked-model axis.
    base = jnp.mean(g, axis=-1).astype(jnp.float32)  # (B, Z, O)

    w3d, w4d = w3.astype(h.dtype), w4.astype(h.dtype)
    s_l = jax.lax.slice_in_dim(h, 0, 2 * e, axis=-1)
    s_r = jax.lax.slice_in_dim(h, t1 - 2 * e, t1, axis=-1)
    true_l = _edge_two_stage(s_l, True, w3d, w4d)
    true_r = _edge_two_stage(s_r, False, w3d, w4d)
    approx_l = jax.lax.slice_in_dim(h4c, 0, e, axis=-1)
    approx_r = jax.lax.slice_in_dim(h4c, t1 - e, t1, axis=-1)
    corr = sum(
        jnp.sum(jax.nn.gelu(t, approximate=False).astype(jnp.float32), axis=-1)
        - jnp.sum(jax.nn.gelu(a, approximate=False).astype(jnp.float32), axis=-1)
        for t, a in ((true_l, approx_l), (true_r, approx_r))
    )
    return (base + corr / t1).astype(h.dtype)


@jax.custom_vjp
def _tails_composed_cvjp(h, w3, w4):
    """Composed tails with a hand-scheduled backward (`conv2c`).

    The autodiff backward of the composed formulation needs ~5 GB more
    HBM across the 75-model stack than the two-stage path (measured:
    17.4 vs 12.5 GB AOT temp for the full fit program), which is what
    kept `conv2` inference-only. This custom VJP recomputes ``h4c`` with
    ONE grouped conv and expresses every adjoint as a native conv —
    input-grad: the 'same' grouped conv with taps flipped and in/out
    channels swapped; filter-grad: XLA's conv filter-gradient emitter —
    so the backward never materializes more than one full-width
    cotangent alongside ``h``/``h4c``. Forward math is byte-identical to
    ``_tails_composed_core`` (equivalence + gradients tested vs the
    two-stage path in ``tests/test_model.py``).
    """
    return _tails_composed_core(h, w3, w4)


def _tails_composed_cvjp_fwd(h, w3, w4):
    return _tails_composed_core(h, w3, w4), (h, w3, w4)


def _tails_composed_cvjp_bwd(res, cot):
    import numpy as np

    h, w3, w4 = res
    cot = cot.astype(jnp.float32)  # (B, Z, O)
    k3, k4 = w3.shape[-1], w4.shape[-1]
    e = k3 // 2 + k4 // 2
    t1 = h.shape[-1]
    w34 = _compose_taps(w3, w4).astype(h.dtype)

    h4c = _grouped_conv_same_time(h, w34)  # (B, Z, O, T1)

    # Adjoint of the GELU→interior-mean. Mathematically the forward is
    # out = (Σ_interior gelu(h4c) + Σ_edges gelu(true_edges)) / t1: the
    # composed conv's base mean and its approx-edge subtraction cancel
    # exactly at the 2e edge positions, so the cotangent through h4c is
    # masked to the interior and the edges flow through the strip path.
    # The gelu' chain is written explicitly in the COMPUTE dtype: an
    # f32 cotangent here upcasts the whole elementwise chain and XLA
    # materializes a full-width f32 erfc temp (measured +4.5 GB across
    # the stacked-model axis — the allocation that kept conv2 OOM).
    interior = np.ones((t1,), np.float32)
    interior[:e] = 0.0
    interior[t1 - e :] = 0.0

    # gelu'(x) = Φ(x) + x·φ(x), elementwise in h.dtype.
    xf = h4c
    cdf = 0.5 * (1.0 + jax.lax.erf(xf * jnp.asarray(0.7071067811865476, xf.dtype)))
    pdf = jnp.exp(-0.5 * xf * xf) * jnp.asarray(0.3989422804014327, xf.dtype)
    scale = (cot / t1).astype(h.dtype)  # (B, Z, O)
    cot_h4c = (
        scale[..., None] * jnp.asarray(interior, h.dtype) * (cdf + xf * pdf)
    )  # (B, Z, O, T1), h.dtype

    # dh + dw34 through XLA's canonical conv input-/filter-gradient
    # emitters (one vjp over the grouped conv — the only difference from
    # full autodiff is the controlled gelu'/mask chain above and the
    # h4c recompute), then back through the (tiny) tap composition onto
    # (w3, w4).
    _, vjp_conv = jax.vjp(_grouped_conv_same_time, h, w34)
    dh, dw34 = vjp_conv(cot_h4c)
    _, vjp_c = jax.vjp(lambda a, b: _compose_taps(a, b).astype(h.dtype), w3, w4)
    dw3, dw4 = vjp_c(dw34)

    # Edge strips: exact two-stage recompute on 2e-wide slices of h
    # (tiny), differentiated directly through the SAME helper the
    # forward uses (`_edge_two_stage`).
    s_l = jax.lax.slice_in_dim(h, 0, 2 * e, axis=-1)
    s_r = jax.lax.slice_in_dim(h, t1 - 2 * e, t1, axis=-1)

    def edge_mean(sl, sr, a3, a4):
        a3d, a4d = a3.astype(h.dtype), a4.astype(h.dtype)
        h4l = _edge_two_stage(sl, True, a3d, a4d)
        h4r = _edge_two_stage(sr, False, a3d, a4d)
        s = jnp.sum(
            jax.nn.gelu(h4l, approximate=False).astype(jnp.float32), axis=-1
        ) + jnp.sum(jax.nn.gelu(h4r, approximate=False).astype(jnp.float32), axis=-1)
        return s / t1

    _, vjp_e = jax.vjp(edge_mean, s_l, s_r, w3, w4)
    dsl, dsr, dw3e, dw4e = vjp_e(cot)
    dh = dh.at[..., : 2 * e].add(dsl).at[..., t1 - 2 * e :].add(dsr)

    return dh.astype(h.dtype), dw3 + dw3e, dw4 + dw4e


_tails_composed_cvjp.defvjp(_tails_composed_cvjp_fwd, _tails_composed_cvjp_bwd)


def _conv4_tails(params, h, impl=None):
    """cnn3/cnn4 ('same'-padded, zone-batched) + GELU + time-mean:
    ``h (B, Z, O, T1) -> (B, Z, O)``. Several formulations (same math,
    different HBM-traffic/FLOP trade — see ``_conv4_impl``)."""
    if impl is None:
        impl = _conv4_impl("tails")
    b, z, o, t1 = h.shape
    if impl in ("conv2", "conv2c", "dense2") and t1 >= 2 * (
        params["cnn3"]["w"].shape[-1] // 2 + params["cnn4"]["w"].shape[-1] // 2
    ):
        if impl == "conv2c":
            return _tails_composed_cvjp(
                h,
                params["cnn3"]["w"][:, :, :, 0, :],
                params["cnn4"]["w"][:, :, :, 0, :],
            )
        return _conv4_tails_composed(params, h, dense=impl == "dense2")
    if impl == "nhwc2":
        # Channels-last END-TO-END: the r2 `convnhwc` experiment
        # transposed around EACH conv, reintroducing the very relayout
        # copies it meant to remove (measured null). This variant pays
        # ONE transpose into NHWC, runs cnn3 -> cnn4 -> GELU -> time-mean
        # entirely channels-last, and converts back only at the tiny
        # (B, Z, O) output — the layout-attack candidate for the 22%
        # copy share in docs/PERFORMANCE.md's op profile.
        return _tails_nhwc_chain(
            h,
            params["cnn3"]["w"][:, :, :, 0, :].astype(h.dtype),
            params["cnn4"]["w"][:, :, :, 0, :].astype(h.dtype),
        )
    for name in ("cnn3", "cnn4"):
        w = params[name]["w"][:, :, :, 0, :].astype(h.dtype)  # (Z, O, I, K)
        kk = w.shape[-1]
        if impl == "pertap":
            # K accumulated shifted GEMMs: K reads of h, no K-tap stack.
            hp = jnp.pad(h, [(0, 0), (0, 0), (0, 0), (kk // 2, kk // 2)])
            acc = None
            for k in range(kk):
                hk = jax.lax.slice_in_dim(hp, k, k + t1, axis=-1)
                term = jnp.einsum(
                    "bzit,zoi->bzot", hk, w[..., k], preferred_element_type=h.dtype
                )
                acc = term if acc is None else acc + term
            h = acc
        elif impl == "patches":
            hp = jnp.pad(h, [(0, 0), (0, 0), (0, 0), (kk // 2, kk // 2)])
            h = jnp.einsum(
                "bzitk,zoik->bzot", _patches(hp, kk), w, preferred_element_type=h.dtype
            )
        elif impl == "convnhwc":
            # Channels-last layout: time as the H spatial dim, zone*feat
            # on the TPU-native minor (lane) axis.
            out = jax.lax.conv_general_dilated(
                h.reshape(b, z * w.shape[2], 1, t1).transpose(0, 2, 3, 1),
                w.reshape(z * o, w.shape[2], 1, kk).transpose(2, 3, 1, 0),
                window_strides=(1, 1),
                padding=[(0, 0), (kk // 2, kk // 2)],
                feature_group_count=z,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = out.transpose(0, 3, 1, 2).reshape(b, z, o, t1)
        elif impl.startswith("dense"):
            # De-grouped block-diagonal dense conv: the grouped tails'
            # per-zone O=32-wide outputs use 32 of the MXU's 128 lanes
            # and contract only I*K deep — the structural MFU ceiling
            # analyzed in docs/PERFORMANCE.md. This variant embeds the Z
            # grouped kernels on the block diagonal of ONE dense
            # (Z*O, Z*I, K) kernel: Z x the FLOPs, but full-lane (Z*O)
            # outputs and a (Z*I*K)-deep contraction. Math is exact (the
            # off-block weights are zero), and gradients stay exact and
            # GROUPED: the dense kernel is a zero-preserving scatter of
            # the grouped params, so off-block weight cotangents vanish
            # in the scatter's VJP.
            #
            # ``dense_gG`` de-groups PARTIALLY: a grouped conv with G
            # groups of Z/G zones, each group's kernels block-diagonal —
            # (Z/G)*O-wide outputs at (Z/G)x the FLOPs, the intermediate
            # occupancy/FLOPs points between grouped (O=32 lanes, 1x)
            # and fully dense (Z*O wide, Zx). At Z=8, O=32: ``dense_g2``
            # = 128-wide (one full lane tile) at 4x, ``dense_g4`` =
            # 64-wide at 2x. Requires G | Z (else falls back to g=1).
            if impl.startswith("dense_s"):
                # ``dense_sG``: the same partial de-grouping as
                # ``dense_gG`` — G blocks of Z/G zones, each block's
                # kernels block-diagonal-dense — but executed as G
                # SEPARATE dense convs over Python-sliced channel
                # halves instead of one conv with
                # ``feature_group_count=G``. The grouped-conv feed (and
                # its relayout memory, which is what sank ``dense_g2``
                # despite its exactly-one-lane-tile 128-wide outputs)
                # never exists: each sub-conv is an ordinary dense conv
                # on a contiguous channel slice. At Z=8, O=32,
                # ``dense_s2`` = two 128-wide full-lane convs at 4x the
                # grouped FLOPs — HALF of fully-dense's 8x redundancy
                # at identical lane occupancy per conv.
                h = _dense_split_conv_same_time(h, w, int(impl[7:]))
            else:
                g = int(impl[7:]) if impl.startswith("dense_g") else 1
                h = _dense_conv_same_time(h, w, g)
        else:  # "conv" (also the fallback for "fullseq" in windowed contexts)
            # One native grouped conv (group = zone): XLA's conv emitter
            # tiles in VMEM without materializing shifted copies.
            h = _grouped_conv_same_time(h, w)
        # Offerable remat-policy save points (no-ops outside a
        # name-aware jax.checkpoint policy — see fast.ISD_REMAT_SAVE).
        from jax.ad_checkpoint import checkpoint_name

        h = checkpoint_name(h, "tails_h3" if name == "cnn3" else "tails_h4")
    h = jax.nn.gelu(h, approximate=False)
    return jnp.mean(h, axis=-1)  # (B, Z, O)


def _tails_nhwc_chain(x, w3, w4):
    """Both tail convs + GELU + time-mean fully channels-last:
    ``x (B, Z, I, T1)`` → ``(B, Z, O)`` with a single layout change on
    the large activation (into NHWC before cnn3; the output transpose
    is on the time-reduced (B, Z·O) tensor, i.e. free)."""
    b, z, i, t1 = x.shape
    o = w3.shape[1]
    h = x.reshape(b, z * i, 1, t1).transpose(0, 2, 3, 1)  # (B, 1, T1, Z*I)
    for w in (w3, w4):
        kk = w.shape[-1]
        h = jax.lax.conv_general_dilated(
            h,
            w.reshape(z * w.shape[1], w.shape[2], 1, kk).transpose(2, 3, 1, 0),
            window_strides=(1, 1),
            padding=[(0, 0), (kk // 2, kk // 2)],
            feature_group_count=z,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    h = jax.nn.gelu(h, approximate=False)  # (B, 1, T1, Z*O)
    return jnp.mean(h[:, 0], axis=1).reshape(b, z, o)


def _dense_conv_same_time(x, w, g=1):
    """'same'-padded conv with the Z grouped kernels de-grouped onto the
    block diagonal of G dense kernels (``g=1``: fully dense, Z x the
    FLOPs for full (Z*O)-lane MXU occupancy; ``g>1``: G conv groups of
    Z/G zones each — the intermediate occupancy/FLOPs points). Requires
    ``g | Z`` (else falls back to fully dense). Math is exact: the
    off-block weights are structural zeros, and the dense kernel is a
    zero-preserving scatter of the grouped params, so off-block weight
    cotangents vanish in the scatter's VJP and gradients stay exactly
    grouped. ``x (B, Z, I, T)`` x ``w (Z, O, I, K)`` -> ``(B, Z, O, T)``."""
    b, z, i, t = x.shape
    o, kk = w.shape[1], w.shape[-1]
    if z % g:
        g = 1
    zg = z // g
    eye_zg = jnp.eye(zg, dtype=w.dtype)
    wd = (
        w.reshape(g, zg, o, i, kk)[:, :, :, None, :, :]
        * eye_zg[None, :, None, :, None, None]
    ).reshape(g * zg * o, zg * i, kk)
    out = jax.lax.conv_general_dilated(
        x.reshape(b, z * i, 1, t),
        wd[:, :, None, :],
        window_strides=(1, 1),
        padding=[(0, 0), (kk // 2, kk // 2)],
        feature_group_count=g,
    )
    return out.reshape(b, z, o, t)


def _dense_split_conv_same_time(x, w, g):
    """'same'-padded conv as G SEPARATE block-diagonal dense convs over
    Python-sliced zone groups (``dense_sG``): each group's Z/G grouped
    kernels are de-grouped onto the block diagonal of its own dense
    ((Z/G)*O, (Z/G)*I, K) kernel, and the G convs run on contiguous
    channel slices of ``x`` — no ``feature_group_count``, so none of the
    grouped feed's relayout memory that made ``dense_gG`` lose (see
    docs/PERFORMANCE.md). (Z/G)x the FLOPs per zone at full
    ((Z/G)*O)-lane occupancy per conv. Math is exact for the same
    reason as ``_dense_conv_same_time``: off-block weights are
    structural zeros and the dense kernels are zero-preserving scatters
    of the grouped params, so gradients stay exactly grouped.
    ``x (B, Z, I, T)`` x ``w (Z, O, I, K)`` -> ``(B, Z, O, T)``.
    Requires ``g | Z`` (else falls back to fully dense ``g=1``)."""
    b, z, i, t = x.shape
    o, kk = w.shape[1], w.shape[-1]
    if z % g:
        g = 1
    zg = z // g
    eye_zg = jnp.eye(zg, dtype=w.dtype)
    wd = (
        w.reshape(g, zg, o, i, kk)[:, :, :, None, :, :]
        * eye_zg[None, :, None, :, None, None]
    ).reshape(g, zg * o, zg * i, kk)
    xg = x.reshape(b, g, zg * i, 1, t)
    outs = [
        jax.lax.conv_general_dilated(
            xg[:, gi],
            wd[gi][:, :, None, :],
            window_strides=(1, 1),
            padding=[(0, 0), (kk // 2, kk // 2)],
        )
        for gi in range(g)
    ]
    return jnp.stack(outs, axis=1).reshape(b, z, o, t)


def _grouped_conv_same_time(x, w):
    """'same'-padded zone-grouped conv over time via XLA's native conv
    emitter: ``x (B, Z, I, T)`` × ``w (Z, O, I, K)`` → ``(B, Z, O, T)``."""
    b, z, i, t = x.shape
    o, kk = w.shape[1], w.shape[-1]
    out = jax.lax.conv_general_dilated(
        x.reshape(b, z * i, 1, t),
        w.reshape(z * o, i, 1, kk),
        window_strides=(1, 1),
        padding=[(0, 0), (kk // 2, kk // 2)],
        feature_group_count=z,
    )
    return out.reshape(b, z, o, t)


def _conv_valid_time(x, w):
    """Valid zone-grouped conv on SHORT time strips (patch-GEMM, tiny):
    ``x (B, Z, I, L)`` × ``w (Z, O, I, K)`` → ``(B, Z, O, L-K+1)``."""
    return jnp.einsum(
        "bzitk,zoik->bzot", _patches(x, w.shape[-1]), w, preferred_element_type=x.dtype
    )


def _conv4_tails_fullseq(params, h1, t1, offsets, composed=False):
    """Window-local tails computed from ONE full-sequence pass + exact
    edge corrections: ``h1 (B, Z, I, T_full)`` → ``(B, N, Z, O)``.

    cnn3/cnn4 are back-to-back linear convs ('same'-padded per window,
    GELU only after cnn4), so a window's tail output equals the
    full-sequence 'same' conv at every *interior* position — the two
    computations read the same ``h1`` values there. They differ only at
    the ``e = K3//2 + K4//2`` positions at each window edge, where the
    window-local version sees zero padding but the full-sequence version
    sees neighboring samples. So: run cnn3→cnn4→GELU once over the full
    sequence, take each window's interior sum from it, and recompute the
    2e edge positions per window exactly from ``2e``-wide strips of
    ``h1`` (tiny). At 50% window overlap this does the tail convs'
    FLOPs once per sample instead of ~1.6x. Exact-equivalence with the
    per-window path is tested (values and gradients).

    Off by default (``ISD_CONV4_TAILS=fullseq`` to enable): on the
    measured chip it loses to the windowed native-conv tails (26k vs
    59k train windows/s) — the full-sequence grouped convs carry more
    live memory per trial, forcing smaller head chunks — but the FLOP
    cut may win on HBM-richer hardware (see docs/PERFORMANCE.md).
    """
    w3 = params["cnn3"]["w"][:, :, :, 0, :].astype(h1.dtype)  # (Z, O, I, K)
    w4 = params["cnn4"]["w"][:, :, :, 0, :].astype(h1.dtype)
    k3, k4 = w3.shape[-1], w4.shape[-1]
    e = k3 // 2 + k4 // 2  # edge width where window-local != full-seq

    if composed:
        # ONE (K3+K4-1)-tap composed conv instead of two (see
        # _conv4_tails_composed; the grouped conv is launch-bound, not
        # tap-bound, so this halves the tails' conv time and drops one
        # full-sequence intermediate). Composition is inexact only
        # within e of the FULL-SEQUENCE ends — positions already outside
        # every window interior, so the edge corrections below (exact
        # two-stage recomputes from h1 strips) need no change.
        w34 = _compose_taps(w3, w4).astype(h1.dtype)
        g = jax.nn.gelu(_grouped_conv_same_time(h1, w34), approximate=False)
    else:
        h3 = _grouped_conv_same_time(h1, w3)
        h4 = _grouped_conv_same_time(h3, w4)
        g = jax.nn.gelu(h4, approximate=False)

    # Interior sums (positions [e, t1-e) of each window) from the shared
    # full-sequence GELU output, as ONE GEMM against a static 0/1
    # window-mask matrix (f32 accumulate on the MXU). Summing each
    # window's slice directly is the same math, but its backward
    # materializes N zero-padded full-sequence gradient tensors before
    # accumulating — enough to blow HBM across the stacked-model axis;
    # the mask-GEMM's backward is a single GEMM with the mask transposed.
    import numpy as np

    t_full = g.shape[-1]
    m = np.zeros((len(offsets), t_full), np.float32)
    for i, o in enumerate(offsets):
        m[i, o + e : o + t1 - e] = 1.0
    interior = jnp.einsum(
        "bzot,nt->bnzo", g, jnp.asarray(m, g.dtype), preferred_element_type=jnp.float32
    )  # (B, N, Z, O)

    def edge_sums(o):
        # Left edge: h4_w(0..e-1) from h1_w[0 : 2e] with window-local
        # (zero) left padding; right edge mirrored.
        pad = [(0, 0), (0, 0), (0, 0)]
        s_l = jax.lax.slice_in_dim(h1, o, o + 2 * e, axis=-1)
        h3_l = _conv_valid_time(jnp.pad(s_l, pad + [(k3 // 2, 0)]), w3)
        h4_l = _conv_valid_time(jnp.pad(h3_l, pad + [(k4 // 2, 0)]), w4)
        s_r = jax.lax.slice_in_dim(h1, o + t1 - 2 * e, o + t1, axis=-1)
        h3_r = _conv_valid_time(jnp.pad(s_r, pad + [(0, k3 // 2)]), w3)
        h4_r = _conv_valid_time(jnp.pad(h3_r, pad + [(0, k4 // 2)]), w4)
        return jnp.sum(
            jax.nn.gelu(h4_l, approximate=False).astype(jnp.float32), axis=-1
        ) + jnp.sum(jax.nn.gelu(h4_r, approximate=False).astype(jnp.float32), axis=-1)

    edges = jnp.stack([edge_sums(o) for o in offsets], axis=1)  # (B, N, Z, O)
    return ((interior + edges) / t1).astype(h1.dtype)


def _conv4_first(w12, b12, x):
    """The fused temporal→spatial first conv (valid): ``x (B, C_full, T)``
    × ``w12 (Z, O, C_full, K)`` → ``(B, Z, O, T-K+1)``."""
    z, o, c, k = w12.shape
    if _conv4_impl("first") == "conv":
        out = jax.lax.conv_general_dilated(
            x[:, :, None, :],
            w12.reshape(z * o, c, 1, k),
            window_strides=(1, 1),
            padding="VALID",
        )
        h = out.reshape(x.shape[0], z, o, -1)
    else:  # "gemm": K-tap patch stack raises the contraction to C*K
        xp = _patches(x, k)  # (B, C_full, T1, K)
        h = jnp.einsum("bCtk,zoCk->bzot", xp, w12, preferred_element_type=x.dtype)
    return h + b12[None, :, :, None]


def conv4layers_fused_all_zones(params, x, indices, mask, train=True):
    """All-zones Conv4Layers over UN-gathered input: ``x (B, C_full, T)``
    → ``(B, Z, dim)``.

    The gather-free path for the default head: zone channel selection is
    folded into the fused temporal→spatial conv weights (a static
    scatter to full-montage width), so the whole head is a handful of
    batched GEMMs over a (Z,) batch axis — no TPU gathers, no per-zone
    vmap (which would lower to Z-group grouped convs). ``params`` are
    the zone-stacked Conv4Layers params from ``head_init``.
    Exact-equivalence with the gather+vmap path is tested.
    """
    w12, b12 = _conv4_fused_w12(params, indices, mask, x.shape[1], x.dtype)
    h = _conv4_first(w12, b12, x)  # (B, Z, O, T1)
    return _conv4_tails(params, h, _conv4_tails_impl(train))


def conv4layers_fused_all_zones_fullseq(
    params, x, indices, mask, window_len, step, train=True
):
    """All-zones Conv4Layers over full UN-windowed sequences:
    ``x (B, C_full, T_seq)`` → ``(B, N, Z, dim)``.

    The production fast path: the fused temporal→spatial conv is a
    *valid* (un-padded) conv, hence shift-invariant — so it runs ONCE
    over the whole sequence and each sliding window's conv output is a
    slice of the full-sequence output (window at offset s ≡ rows
    [s, s + window_len - K + 1)). At the canonical 800/250/125 geometry
    the 5 windows overlap 50%, so this does the dominant conv's FLOPs on
    796 samples instead of 5x246 = 1230 — a 1.55x cut (and the same cut
    in HBM traffic). The zero-padded tail convs are window-local
    (padding semantics differ at window edges) and stay per-window.
    Exact-equivalence with the windowed path is tested.
    """
    b, _, t_seq = x.shape
    n = (t_seq - window_len) // step + 1
    w12, b12 = _conv4_fused_w12(params, indices, mask, x.shape[1], x.dtype)
    k = w12.shape[-1]
    t1 = window_len - k + 1
    h = _conv4_first(w12, b12, x)  # (B, Z, O, T_seq-K+1)

    k3 = params["cnn3"]["w"].shape[-1]
    k4 = params["cnn4"]["w"].shape[-1]
    e = k3 // 2 + k4 // 2
    impl = _conv4_tails_impl(train)
    if impl in ("fullseq", "fullseq2") and t1 >= 2 * e + 2:
        offsets = [i * step for i in range(n)]
        return _conv4_tails_fullseq(
            params, h, t1, offsets, composed=impl == "fullseq2"
        )

    hw = jnp.stack(
        [jax.lax.slice_in_dim(h, i * step, i * step + t1, axis=-1) for i in range(n)],
        axis=1,
    )  # (B, N, Z, O, T1)
    hw = hw.reshape(b * n, *hw.shape[2:])
    from jax.ad_checkpoint import checkpoint_name

    hw = checkpoint_name(hw, "tails_h2")
    hw = _maybe_pin_h2_layout(hw)
    return _conv4_tails(params, hw, impl).reshape(b, n, *hw.shape[1:3])


def _maybe_pin_h2_layout(hw):
    """Pin the window-stack activation's layout (VERDICT r4 #2 — the
    direct attack on the ~21% relayout-copy share after every axis-order
    rewrite measured null, docs/PERFORMANCE.md).

    ``ISD_H2_LAYOUT`` is a comma-separated major-to-minor permutation
    for the ``(B*N, Z, O, T1)`` tensor; empty string disables. Default
    ON TPU: ``"0,1,2,3"`` (row-major) — pinning the tensor to its
    producer's natural layout removes XLA layout assignment's freedom
    to re-lay it mid-program. Measured at the production 75-model fit
    (experiments/r5_layout.py, four independent A/B pairs, unchunked
    AND 512-chunk): +0.5-0.7% windows/s, every pinned run faster than
    every unpinned one. The OTHER perms measured worse (O-minor OOMs
    at compile with a 4x-padded copy; B-minor -3%; 0,2,1,3 -5%), and
    XLA-chosen AUTO entry layouts were inconclusive (re-laying the
    corpus + 25/64 args OOMs at this stack size) — so row-major-pinned
    is the ceiling this avenue yields. Default OFF elsewhere (the
    constraint is TPU-tiling-specific). No-op fallback if the
    experimental layout API is unavailable."""
    import os

    spec = os.environ.get("ISD_H2_LAYOUT")
    if spec is None:
        import jax

        spec = "0,1,2,3" if jax.default_backend() == "tpu" else ""
    if not spec:
        return hw
    try:
        from jax.experimental.layout import Layout, with_layout_constraint
    except ImportError:
        return hw

    perm = tuple(int(s) for s in spec.split(","))
    return with_layout_constraint(hw, Layout(perm))


def conv4layers_prepare_fused_weights(params, indices, mask, c_full: int):
    """Zone-stacked Conv4Layers params → operand layouts for the Pallas
    ``fused_conv4_head`` kernel (see ``ops/pallas/conv4head.py``).

    Returns ``(w12r (Z*O, K1*C_full) tap-major, b12 (Z*O, 1) f32,
    w3r (Z, O, K*I) tap-major, w4r)``. Pure (tiny) einsums — JAX's
    autodiff of this prep routes the kernel's weight grads back onto the
    original param tree.
    """
    wt = params["cnn1"]["w"][:, :, 0, 0, :]  # (Z, F, K)
    bt_ = params["cnn1"]["b"]  # (Z, F)
    ws = params["cnn2"]["w"][:, :, :, :, 0]  # (Z, O, F, C_max)
    m = jnp.asarray(mask, ws.dtype)
    s = jnp.asarray(_zone_scatter(indices, mask, c_full), ws.dtype)
    w12 = jnp.einsum("zofc,zfk,zcC->zokC", ws, wt, s)  # tap-major (Z,O,K,C)
    b12 = jnp.einsum("zofc,zc,zf->zo", ws, m, bt_)
    z, o, k, c = w12.shape
    w12r = w12.reshape(z * o, k * c)
    b12r = b12.reshape(z * o, 1).astype(jnp.float32)

    def tap_major(name):
        w = params[name]["w"][:, :, :, 0, :]  # (Z, O, I, K)
        return jnp.transpose(w, (0, 1, 3, 2)).reshape(z, o, -1)

    return w12r, b12r, tap_major("cnn3"), tap_major("cnn4")


# ---------------------------------------------------------------------------
# CVBlock — EEGNet-style head (reference fast.py:32-100)
# ---------------------------------------------------------------------------

_CV_F1, _CV_D, _CV_F2, _CV_KC, _CV_KC2 = 8, 2, 16, 64, 16


def _cv_flat_dim(window_len: int) -> int:
    """Analytic flat dim (replaces the reference's dummy-forward probe at
    ``fast.py:66-74``, which hard-codes a 250-sample dummy; here the real
    window length drives the shape, so non-default windows work too)."""
    t1 = window_len + 2 * (_CV_KC // 2) - _CV_KC + 1  # conv1, pad Kc/2
    t2 = t1 // 8  # pool1 (1, 8)
    t3 = t2 + 2 * (_CV_KC2 // 2) - _CV_KC2 + 1  # conv3, pad Kc2/2
    t4 = t3 // 2  # pool2 (1, 2)
    return _CV_F2 * t4


def cvblock_init(key, c_max: int, dim_token: int = 32, window_len: int = 250, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    f1, d, f2 = _CV_F1, _CV_D, _CV_F2
    params = {
        "conv1": nn.conv2d_init(k1, 1, f1, (1, _CV_KC), bias=False, dtype=dtype),
        "conv2": nn.conv2d_init(k2, f1, f1 * d, (c_max, 1), bias=False, groups=f1, dtype=dtype),
        "conv3": nn.conv2d_init(k3, f1 * d, f2, (1, _CV_KC2), bias=False, dtype=dtype),
        "projector": nn.linear_init(k4, _cv_flat_dim(window_len), dim_token, dtype=dtype),
    }
    bn1p, bn1s = bn_init(f1, dtype)
    bn2p, bn2s = bn_init(f1 * d, dtype)
    bn3p, bn3s = bn_init(f2, dtype)
    params.update({"bn1": bn1p, "bn2": bn2p, "bn3": bn3p})
    state = {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}
    return params, state


def cvblock_apply(params, state, x, mask, *, train=False, rng=None, dropout_rate=0.5,
                  sample_mask=None):
    r1, r2 = nn.split_rng(rng, 2)
    h = x[:, None, :, :]
    h = nn.conv2d(params["conv1"], h, padding=[(0, 0), (_CV_KC // 2, _CV_KC // 2)])
    h, bn1s = batch_norm(h, params["bn1"], state["bn1"], train=train,
                         mask=bn_sample_mask(h, sample_mask, _bn_mask(mask)))
    h = _mask_rows(h, mask)  # BN affine writes into padded rows
    h = nn.conv2d(params["conv2"], h, groups=_CV_F1)  # (B, 16, 1, T+1)
    h, bn2s = batch_norm(h, params["bn2"], state["bn2"], train=train,
                         mask=bn_sample_mask(h, sample_mask))
    h = jax.nn.elu(h)
    h = nn.avg_pool(h, (1, 8))
    h = nn.dropout(h, dropout_rate, r1, train)
    h = nn.conv2d(params["conv3"], h, padding=[(0, 0), (_CV_KC2 // 2, _CV_KC2 // 2)])
    h, bn3s = batch_norm(h, params["bn3"], state["bn3"], train=train,
                         mask=bn_sample_mask(h, sample_mask))
    h = jax.nn.elu(h)
    h = nn.avg_pool(h, (1, 2))
    h = nn.dropout(h, dropout_rate, r2, train)
    h = h.reshape(h.shape[0], -1)
    feat = nn.linear(params["projector"], h)
    return feat, {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}


# ---------------------------------------------------------------------------
# EEGNetEncoder — canonical EEGNet adapted to zone tokenization
# (reference fast.py:122-167)
# ---------------------------------------------------------------------------

_EN_F1, _EN_D, _EN_KL = 8, 2, 64


def eegnet_encoder_init(key, c_max: int, feature_dim: int = 32, window_len: int = 250, dtype=jnp.float32):
    f1, d = _EN_F1, _EN_D
    f2 = f1 * d
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "temporal": nn.conv2d_init(k1, 1, f1, (1, _EN_KL), bias=False, dtype=dtype),
        "spatial": nn.conv2d_init(k2, f1, f2, (c_max, 1), bias=False, groups=f1, dtype=dtype),
        "sep_depth": nn.conv2d_init(k3, f2, f2, (1, 16), bias=False, groups=f2, dtype=dtype),
        "sep_point": nn.conv2d_init(k4, f2, f2, (1, 1), bias=False, dtype=dtype),
        "projector": nn.linear_init(k5, f2, feature_dim, dtype=dtype),
    }
    bn1p, bn1s = bn_init(f1, dtype)
    bn2p, bn2s = bn_init(f2, dtype)
    bn3p, bn3s = bn_init(f2, dtype)
    params.update({"bn1": bn1p, "bn2": bn2p, "bn3": bn3p})
    return params, {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}


def eegnet_encoder_apply(params, state, x, mask, *, train=False, rng=None, dropout_rate=0.25,
                         sample_mask=None):
    r1, r2 = nn.split_rng(rng, 2)
    f1, f2 = _EN_F1, _EN_F1 * _EN_D
    h = x[:, None, :, :]
    h = nn.conv2d(params["temporal"], h, padding=[(0, 0), (_EN_KL // 2, _EN_KL // 2)])
    h, bn1s = batch_norm(h, params["bn1"], state["bn1"], train=train,
                         mask=bn_sample_mask(h, sample_mask, _bn_mask(mask)))
    h = _mask_rows(h, mask)
    h = nn.conv2d(params["spatial"], h, groups=f1)  # (B, F2, 1, T+1)
    h, bn2s = batch_norm(h, params["bn2"], state["bn2"], train=train,
                         mask=bn_sample_mask(h, sample_mask))
    h = jax.nn.elu(h)
    h = nn.avg_pool(h, (1, 4))
    h = nn.dropout(h, dropout_rate, r1, train)
    h = nn.conv2d(params["sep_depth"], h, padding=[(0, 0), (8, 8)], groups=f2)
    h = nn.conv2d(params["sep_point"], h)
    h, bn3s = batch_norm(h, params["bn3"], state["bn3"], train=train,
                         mask=bn_sample_mask(h, sample_mask))
    h = jax.nn.elu(h)
    h = nn.avg_pool(h, (1, 8))
    h = nn.dropout(h, dropout_rate, r2, train)
    h = nn.adaptive_avg_pool_1(h)  # (B, F2)
    feat = nn.linear(params["projector"], h)
    return feat, {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}


# ---------------------------------------------------------------------------
# HeadConvPaper — the paper-version conv head (reference fast.py:170-196)
# ---------------------------------------------------------------------------

def headconv_paper_init(key, c_max: int, feature_dim: int = 32, window_len: int = 250, dtype=jnp.float32):
    f1, f2, f3, f4 = feature_dim // 2, feature_dim // 3, feature_dim // 3, feature_dim
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "cnn1_t": nn.conv2d_init(k1, 1, f1, (1, 3), bias=True, dtype=dtype),
        "cnn1_s": nn.conv2d_init(k2, f1, f1, (c_max, 1), bias=False, dtype=dtype),
        "cnn2": nn.conv2d_init(k3, f1, f2, (1, 3), bias=False, dtype=dtype),
        "cnn3": nn.conv2d_init(k4, f2, f3, (1, 3), bias=False, dtype=dtype),
        "cnn4": nn.conv2d_init(k5, f3, f4, (1, 3), bias=False, dtype=dtype),
    }
    state = {}
    for i, f in zip(range(1, 5), (f1, f2, f3, f4)):
        p, s = bn_init(f, dtype)
        params[f"norm{i}"] = p
        state[f"norm{i}"] = s
    return params, state


def _max_pool_time2(h: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping (1, 2) max pool over the last axis of ``(B, F, T)``
    (torch ``MaxPool2d((1, 2))`` floor semantics)."""
    t = h.shape[-1] // 2 * 2
    return h[..., :t].reshape(*h.shape[:-1], t // 2, 2).max(axis=-1)


def headconv_paper_apply(params, state, x, mask, *, train=False, rng=None,
                         sample_mask=None):
    # temporal+bias → mask → spatial fused into one conv (see
    # _fuse_temporal_spatial) to avoid the (B, F1, C_max, T) intermediate;
    # all convs as shifted GEMMs (nn.temporal_conv) for vmap efficiency.
    w12, b12 = _fuse_temporal_spatial(
        params["cnn1_t"]["w"], params["cnn1_t"]["b"], params["cnn1_s"]["w"], mask
    )
    h = nn.temporal_conv(x, w12[:, 0], b12)  # (B, F1, T-2)
    new_state = {}
    h, new_state["norm1"] = batch_norm(h, params["norm1"], state["norm1"], train=train,
                                       mask=bn_sample_mask(h, sample_mask))
    h = jax.nn.gelu(h, approximate=False)
    h = _max_pool_time2(h)
    for i in (2, 3, 4):
        h = nn.temporal_conv(h, params[f"cnn{i}"]["w"][:, :, 0, :])
        h, new_state[f"norm{i}"] = batch_norm(
            h, params[f"norm{i}"], state[f"norm{i}"], train=train,
            mask=bn_sample_mask(h, sample_mask),
        )
        h = jax.nn.gelu(h, approximate=False)
        h = _max_pool_time2(h)
    return jnp.mean(h, axis=-1), new_state


# ---------------------------------------------------------------------------
# Registry (replaces the reference's globals()-by-name lookup, fast.py:203)
# ---------------------------------------------------------------------------

HEAD_REGISTRY: Dict[str, ZoneEncoder] = {
    "Conv4Layers": ZoneEncoder(conv4layers_init, conv4layers_apply, stochastic=False),
    "CVBlock": ZoneEncoder(cvblock_init, cvblock_apply),
    "EEGNet_Encoder": ZoneEncoder(eegnet_encoder_init, eegnet_encoder_apply),
    "HeadConv_Paper_Version": ZoneEncoder(headconv_paper_init, headconv_paper_apply, stochastic=False),
}


def get_head(name: str) -> ZoneEncoder:
    if name not in HEAD_REGISTRY:
        raise KeyError(f"unknown head {name!r}; available: {sorted(HEAD_REGISTRY)}")
    return HEAD_REGISTRY[name]


# ---------------------------------------------------------------------------
# Zone-batched Head: one vmapped encoder across all zones
# (replaces the reference's Python loop over 8 encoders, fast.py:199-210)
# ---------------------------------------------------------------------------

def head_init(key, head_name: str, n_zones: int, c_max: int, feature_dim: int,
              window_len: int, dtype=jnp.float32):
    """Stack per-zone params/state along a leading zone axis."""
    enc = get_head(head_name)
    keys = jax.random.split(key, n_zones)
    ps, ss = zip(*(enc.init(k, c_max, feature_dim, window_len, dtype) for k in keys))
    params = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    state = jax.tree.map(lambda *xs: jnp.stack(xs), *ss) if ss[0] else {}
    return params, state


def head_apply(
    head_name: str, params, state, x_zones, zone_mask, *, train=False, rng=None,
    remat: bool = False, sample_mask=None,
):
    """Apply the zone-batched head.

    ``x_zones (B, Z, C_max, T)`` (padded rows pre-zeroed), ``zone_mask
    (Z, C_max)`` → features ``(B, Z, F)`` + new stacked state. One
    ``vmap`` over the zone axis maps per-zone params onto per-zone data.
    ``sample_mask (B,)`` flags ragged-batch padding rows for BN-bearing
    heads (shared across zones).

    ``remat=True`` wraps the encoder in ``jax.checkpoint``: backward
    recomputes the conv activations instead of storing them — the
    memory lever that lets ~75 stacked models train concurrently in one
    chip's HBM (the per-stage conv activations are the largest tensors
    in the program; the recompute is bandwidth-cheap).
    """
    enc = get_head(head_name)
    rngs = None if rng is None else jax.random.split(rng, x_zones.shape[1])

    def one_zone(p, s, xz, mz, rz):
        return enc.apply(p, s, xz, mz, train=train, rng=rz, sample_mask=sample_mask)

    if remat:
        one_zone = jax.checkpoint(one_zone)

    feat, new_state = jax.vmap(
        one_zone,
        in_axes=(0, 0, 1, 0, 0 if rngs is not None else None),
        out_axes=(1, 0),
    )(params, state, x_zones, zone_mask, rngs)
    return feat, new_state
