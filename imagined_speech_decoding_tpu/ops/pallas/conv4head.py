"""Pallas TPU kernel: the fused Conv4Layers zone head.

The hot op of FAST training (reference ``src/fast/models/fast.py:103-119``
+ the window tokenizer ``:242-252``): sliding-window tokenize a raw EEG
batch, run the fused temporal→spatial conv (zone-scattered weights) and
two temporal convs per zone, GELU, mean over time → per-window zone
features.

XLA schedules this chain as dozens of HBM-bound patch/transpose/GEMM
ops per micro-chunk (measured ~200 ms fwd / ~470 ms bwd for the 75-model
stack on v5e). This kernel keeps the whole chain in VMEM: each grid cell
reads a block of raw trials, builds tap-patch matrices in VMEM, and runs
one MXU dot per conv with the large (batch x time) dim in lanes — HBM
traffic is a few reads of x and one write of the (tiny) features.

Backward is a custom VJP with in-kernel recompute (no residuals beyond
x), split into a weight-grad kernel and an x-grad kernel so XLA drops
the latter when d/dx is not needed (training differentiates params only;
attribution differentiates x).

Mosaic constraints that shape this design (each was hit empirically):
  * reshapes only merge/split the minor dim at lane (128) multiples —
    per-window time axes are zero-padded 246→256 before merging with the
    trial axis into dot columns;
  * no in-kernel transposes of big tensors — the caller passes ``x``
    channel-major ``(C, B, T)``; features come out ``(N, Z, B, O)`` with
    B in sublanes (dynamic sublane offsets must be 8-multiples; dynamic
    LANE offsets must be 128-multiples, so B-in-lanes would be illegal);
  * dynamic lane slicing is impossible (125-sample window offsets are
    not 128-aligned) and lane-dim blocks must be 128-multiples, so the
    window axis lives in the GRID and each kernel body selects its
    window with a ``lax.switch`` over static slices;
  * fully unrolling windows in one body makes Mosaic compile time blow
    up superlinearly (5x unroll -> >10 min); the switch keeps the body
    one window's worth of code;
  * the window grid dim is OUTER (grid = (N, B-blocks)) so the per-
    window output block is written once, not thrashed per batch block.

Operand layouts (single model; ``jax.vmap`` prepends the model axis as
an outer grid dimension):
  xt    (C, B, T)           bf16/f32 raw trials, channel-major
  w12   (Z*O, K1*C)         fused+zone-scattered conv1∘conv2, tap-major
  b12   (Z*O, 1)  f32       fused bias
  w3,w4 (Z, O, K2*O)        per-zone temporal convs, tap-major columns
  feat  (N, Z, B, O) f32    per-window zone features
  dx    (N, C, B, W)        per-window input grads (overlap-added in XLA)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — below
    f32 noise for gelu parity). Pallas TPU has no erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # jax.nn.gelu(approximate=False) ≡ x * Phi(x).
    return 0.5 * x * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))


def _gelu_grad(x):
    # d/dx [x * Phi(x)] = Phi(x) + x * phi(x)
    phi = jnp.exp(-0.5 * x * x) * (1.0 / np.sqrt(2.0 * np.pi))
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))
    return cdf + x * phi


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _taps_to_cols(src, offs: int, k: int, t_out: int, tp: int):
    """Static tap slices of ``src (R, Bt, T)`` starting at ``offs`` →
    tap-major patch matrix ``(K*R, Bt*tp)`` with zero-padded tail cols."""
    r, bt, _ = src.shape
    rows = []
    for i in range(k):
        s = jax.lax.slice_in_dim(src, offs + i, offs + i + t_out, axis=2)
        s = jnp.pad(s, [(0, 0), (0, 0), (0, tp - t_out)])
        rows.append(s.reshape(r, bt * tp))
    return jnp.concatenate(rows, axis=0)


def _window_patches(xt, w, cfg):
    """Patch matrix for window ``w`` (traced): lax.switch over the static
    per-window slice offsets (dynamic lane offsets are not lowerable)."""
    branches = [
        functools.partial(
            _taps_to_cols, offs=j * cfg["step"], k=cfg["k1"],
            t_out=cfg["t1"], tp=cfg["tp"],
        )
        for j in range(cfg["n_windows"])
    ]
    return jax.lax.switch(w, branches, xt)


def _cols_untap(dp, k: int, bt: int, tp: int, t_out: int, t_in: int):
    """Transpose of ``_taps_to_cols``: ``(K*R, Bt*tp)`` → ``(R, Bt, t_in)``
    summing overlapping tap contributions (``t_in = t_out + k - 1``)."""
    kr = dp.shape[0]
    r = kr // k
    out = jnp.zeros((r, bt, t_in), dp.dtype)
    for i in range(k):
        s = dp[i * r : (i + 1) * r].reshape(r, bt, tp)[:, :, :t_out]
        out = out + jnp.pad(s, [(0, 0), (0, 0), (i, t_in - t_out - i)])
    return out


def _zone_tail(hz, wc, zi, k2, t1, tp, cols_dtype):
    """One temporal conv of the per-zone tail: ``hz (O, Bt, t1)`` →
    (patches, out (O, Bt, t1) f32)."""
    hp = jnp.pad(hz, [(0, 0), (0, 0), (k2 // 2, k2 // 2)])
    pz = _taps_to_cols(hp.astype(cols_dtype), 0, k2, t1, tp)
    o, bt = hz.shape[0], hz.shape[1]
    out = jax.lax.dot(
        wc[zi].astype(cols_dtype), pz, preferred_element_type=jnp.float32
    ).reshape(o, bt, tp)[:, :, :t1]
    return pz, out


def _fwd_kernel(xt_ref, w12_ref, b12_ref, w3_ref, w4_ref, out_ref, *, cfg):
    w = pl.program_id(0)
    i = pl.program_id(1)
    xt = xt_ref[:]
    w12, b12, w3, w4 = w12_ref[:], b12_ref[:], w3_ref[:], w4_ref[:]
    c, bt, t = xt.shape
    zo = w12.shape[0]
    z = w3.shape[0]
    o = zo // z
    k2, t1, tp = cfg["k2"], cfg["t1"], cfg["tp"]
    dt = xt.dtype
    p = _window_patches(xt, w, cfg)  # (K1*C, Bt*tp)
    h1 = jax.lax.dot(w12.astype(dt), p, preferred_element_type=jnp.float32)
    h1 = (h1 + b12).astype(dt)  # (Z*O, Bt*tp)
    for zi in range(z):
        hz = h1[zi * o : (zi + 1) * o].reshape(o, bt, tp)[:, :, :t1]
        _, h2 = _zone_tail(hz, w3, zi, k2, t1, tp, dt)
        _, h3 = _zone_tail(h2.astype(dt), w4, zi, k2, t1, tp, dt)
        g = _gelu_exact(h3)
        out_ref[0, zi, pl.ds(i * bt, bt), :] = jnp.mean(g, axis=2).T.astype(
            out_ref.dtype
        )


def _bwd_zone(g_wz, xt_dtype, w3, w4, zi, hz, k2, t1, tp):
    """Backward through one zone's tail for one window.

    ``g_wz (O, Bt)`` cotangent of the time-mean; ``hz`` the zone's conv12
    output. Returns (dh1z (O, Bt, t1) f32, dh3_cols, dh2_cols, p3, p4)."""
    o, bt = hz.shape[0], hz.shape[1]
    p3, h2 = _zone_tail(hz, w3, zi, k2, t1, tp, xt_dtype)
    p4, h3 = _zone_tail(h2.astype(xt_dtype), w4, zi, k2, t1, tp, xt_dtype)
    # d(mean over t): broadcast g/t1 over the REAL t columns, zero the pad
    # (pad columns must not leak into weight-grad sums).
    dmean = jnp.broadcast_to(g_wz[:, :, None] / t1, (o, bt, t1))
    dh3 = dmean * _gelu_grad(h3)
    dh3c = jnp.pad(dh3, [(0, 0), (0, 0), (0, tp - t1)]).reshape(o, bt * tp)
    dh3c = dh3c.astype(xt_dtype)
    dp4 = jax.lax.dot(
        w4[zi].T.astype(xt_dtype), dh3c, preferred_element_type=jnp.float32
    )
    dh2 = _cols_untap(dp4, k2, bt, tp, t1, t1 + k2 - 1)[:, :, k2 // 2 : k2 // 2 + t1]
    dh2c = jnp.pad(dh2, [(0, 0), (0, 0), (0, tp - t1)]).reshape(o, bt * tp)
    dh2c = dh2c.astype(xt_dtype)
    dp3 = jax.lax.dot(
        w3[zi].T.astype(xt_dtype), dh2c, preferred_element_type=jnp.float32
    )
    dh1z = _cols_untap(dp3, k2, bt, tp, t1, t1 + k2 - 1)[:, :, k2 // 2 : k2 // 2 + t1]
    return dh1z, dh3c, dh2c, p3, p4


def _bwd_w_kernel(g_ref, xt_ref, w12_ref, b12_ref, w3_ref, w4_ref,
                  dw12_ref, db12_ref, dw3_ref, dw4_ref, *, cfg):
    """Weight grads, accumulated across both grid dims (the output blocks
    are revisited by every cell; the first cell zero-initializes)."""
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw12_ref[:] = jnp.zeros_like(dw12_ref)
        db12_ref[:] = jnp.zeros_like(db12_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        dw4_ref[:] = jnp.zeros_like(dw4_ref)

    w = pl.program_id(0)
    i = pl.program_id(1)
    xt = xt_ref[:]
    w12, b12, w3, w4 = w12_ref[:], b12_ref[:], w3_ref[:], w4_ref[:]
    c, bt, t = xt.shape
    zo = w12.shape[0]
    z = w3.shape[0]
    o = zo // z
    k2, t1, tp = cfg["k2"], cfg["t1"], cfg["tp"]
    dt = xt.dtype
    p = _window_patches(xt, w, cfg)
    h1 = jax.lax.dot(w12.astype(dt), p, preferred_element_type=jnp.float32)
    h1 = (h1 + b12).astype(dt)
    dh1_rows = []
    for zi in range(z):
        hz = h1[zi * o : (zi + 1) * o].reshape(o, bt, tp)[:, :, :t1]
        g_wz = g_ref[0, zi, pl.ds(i * bt, bt), :].T.astype(jnp.float32)
        dh1z, dh3c, dh2c, p3, p4 = _bwd_zone(g_wz, dt, w3, w4, zi, hz, k2, t1, tp)
        dw4_ref[zi] += jax.lax.dot(dh3c, p4.T, preferred_element_type=jnp.float32)
        dw3_ref[zi] += jax.lax.dot(dh2c, p3.T, preferred_element_type=jnp.float32)
        dh1_rows.append(
            jnp.pad(dh1z, [(0, 0), (0, 0), (0, tp - t1)]).reshape(o, bt * tp)
        )
    dh1 = jnp.concatenate(dh1_rows, axis=0)  # (Z*O, Bt*tp) f32
    db12_ref[:] += jnp.sum(dh1, axis=1, keepdims=True)
    dw12_ref[:] += jax.lax.dot(dh1.astype(dt), p.T, preferred_element_type=jnp.float32)


def _bwd_x_kernel(g_ref, xt_ref, w12_ref, b12_ref, w3_ref, w4_ref, dxw_ref, *, cfg):
    """Per-window input grads ``(1, C, Bt, window_len)`` — the caller
    overlap-adds windows in XLA (lane-offset stores can't be unaligned)."""
    w = pl.program_id(0)
    i = pl.program_id(1)
    xt = xt_ref[:]
    w12, b12, w3, w4 = w12_ref[:], b12_ref[:], w3_ref[:], w4_ref[:]
    c, bt, t = xt.shape
    zo = w12.shape[0]
    z = w3.shape[0]
    o = zo // z
    k1, k2, t1, tp = cfg["k1"], cfg["k2"], cfg["t1"], cfg["tp"]
    dt = xt.dtype
    p = _window_patches(xt, w, cfg)
    h1 = jax.lax.dot(w12.astype(dt), p, preferred_element_type=jnp.float32)
    h1 = (h1 + b12).astype(dt)
    dh1_rows = []
    for zi in range(z):
        hz = h1[zi * o : (zi + 1) * o].reshape(o, bt, tp)[:, :, :t1]
        g_wz = g_ref[0, zi, pl.ds(i * bt, bt), :].T.astype(jnp.float32)
        dh1z, *_ = _bwd_zone(g_wz, dt, w3, w4, zi, hz, k2, t1, tp)
        dh1_rows.append(
            jnp.pad(dh1z, [(0, 0), (0, 0), (0, tp - t1)]).reshape(o, bt * tp)
        )
    dh1 = jnp.concatenate(dh1_rows, axis=0).astype(dt)
    dp = jax.lax.dot(w12.T.astype(dt), dh1, preferred_element_type=jnp.float32)
    dxw_ref[0] = _cols_untap(dp, k1, bt, tp, t1, cfg["window_len"]).astype(
        dxw_ref.dtype
    )


def _pick_block(b: int, target: int = 8) -> int:
    """Largest divisor of b that is <= target AND a sublane multiple (8)
    — per-cell dynamic store offsets (i*bt) must be 8-aligned. When no
    such divisor exists (b < 8 or b odd), fall back to the whole batch
    as one block (a single cell stores at offset 0, always legal)."""
    aligned = [d for d in range(8, min(b, target) + 1, 8) if b % d == 0]
    return max(aligned) if aligned else b


def _cfg_of(t: int, window_len: int, step: int, k1: int = 5, k2: int = 5):
    t1 = window_len - k1 + 1
    return dict(
        window_len=window_len, step=step, n_windows=(t - window_len) // step + 1,
        k1=k1, k2=k2, t1=t1, tp=_round_up(t1, LANE),
    )


def _specs(b, bt, n, zo, c, t, kc1, z, o, ok2):
    xs = pl.BlockSpec((c, bt, t), lambda w, i: (0, i, 0), memory_space=pltpu.VMEM)
    ws = [
        pl.BlockSpec((zo, kc1), lambda w, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((zo, 1), lambda w, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((z, o, ok2), lambda w, i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((z, o, ok2), lambda w, i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    # One (Z, B, O) feature block per window; B lives in sublanes so each
    # batch-block cell can store at its (8-aligned) dynamic offset.
    gs = pl.BlockSpec((1, z, b, o), lambda w, i: (w, 0, 0, 0), memory_space=pltpu.VMEM)
    return xs, ws, gs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_conv4_head_cmajor(xt, w12, b12, w3, w4, window_len: int, step: int):
    """Fused sliding-window Conv4Layers head, channel-major in/out.

    ``xt (C, B, T)`` → ``feat (N, Z, B, O)`` f32. See module docstring
    for operand layouts; differentiable in all tensor args.
    """
    return _fwd_impl(xt, w12, b12, w3, w4, window_len, step)


def _fwd_impl(xt, w12, b12, w3, w4, window_len, step):
    c, b, t = xt.shape
    zo, kc1 = w12.shape
    z, o, ok2 = w3.shape
    cfg = _cfg_of(t, window_len, step)
    bt = _pick_block(b)
    xs, ws, gs = _specs(b, bt, cfg["n_windows"], zo, c, t, kc1, z, o, ok2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid=(cfg["n_windows"], b // bt),
        in_specs=[xs] + ws,
        out_specs=gs,
        out_shape=jax.ShapeDtypeStruct((cfg["n_windows"], z, b, o), jnp.float32),
    )(xt, w12, b12, w3, w4)


def _fwd_rule(xt, w12, b12, w3, w4, window_len, step):
    return _fwd_impl(xt, w12, b12, w3, w4, window_len, step), (xt, w12, b12, w3, w4)


def _bwd_rule(window_len, step, res, g):
    xt, w12, b12, w3, w4 = res
    c, b, t = xt.shape
    zo, kc1 = w12.shape
    z, o, ok2 = w3.shape
    cfg = _cfg_of(t, window_len, step)
    n = cfg["n_windows"]
    bt = _pick_block(b)
    xs, ws, gs = _specs(b, bt, n, zo, c, t, kc1, z, o, ok2)
    grid = (n, b // bt)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda w, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    dw12, db12, dw3, dw4 = pl.pallas_call(
        functools.partial(_bwd_w_kernel, cfg=cfg),
        grid=grid,
        in_specs=[gs, xs] + ws,
        out_specs=[const(zo, kc1), const(zo, 1), const(z, o, ok2), const(z, o, ok2)],
        out_shape=[
            jax.ShapeDtypeStruct((zo, kc1), jnp.float32),
            jax.ShapeDtypeStruct((zo, 1), jnp.float32),
            jax.ShapeDtypeStruct((z, o, ok2), jnp.float32),
            jax.ShapeDtypeStruct((z, o, ok2), jnp.float32),
        ],
    )(g, xt, w12, b12, w3, w4)

    wl = cfg["window_len"]
    dxw = pl.pallas_call(
        functools.partial(_bwd_x_kernel, cfg=cfg),
        grid=grid,
        in_specs=[gs, xs] + ws,
        out_specs=pl.BlockSpec(
            (1, c, bt, wl), lambda w, i: (w, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, b, wl), jnp.float32),
    )(g, xt, w12, b12, w3, w4)

    # Overlap-add the per-window input grads (windows overlap by
    # window_len - step samples); plain XLA, only runs when d/dx is used.
    dxt = jnp.zeros((c, b, t), jnp.float32)
    for w in range(n):
        off = w * cfg["step"]
        dxt = dxt + jnp.pad(dxw[w], [(0, 0), (0, 0), (off, t - off - wl)])

    return (
        dxt.astype(xt.dtype),
        dw12.astype(w12.dtype),
        db12.astype(b12.dtype),
        dw3.astype(w3.dtype),
        dw4.astype(w4.dtype),
    )


fused_conv4_head_cmajor.defvjp(_fwd_rule, _bwd_rule)


def fused_conv4_head(x, w12, b12, w3, w4, window_len: int, step: int):
    """Batch-major convenience wrapper: ``x (B, C, T)`` → ``(B, N, Z*O)``.

    The transposes/reshapes are plain XLA ops outside the kernel (and
    outside the custom VJP), so autodiff handles them.
    """
    feat = fused_conv4_head_cmajor(
        jnp.transpose(x, (1, 0, 2)), w12, b12, w3, w4, window_len, step
    )  # (N, Z, B, O)
    n, z, b, o = feat.shape
    return jnp.transpose(feat, (2, 0, 1, 3)).reshape(b, n, z * o)
