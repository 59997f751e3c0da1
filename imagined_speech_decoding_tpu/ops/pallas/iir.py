"""Pallas TPU kernel: biquad-cascade IIR filtering.

The XLA path (``ops.filters.sosfilt``) expresses the recurrence as a
``lax.scan`` over time — correct, but each scan iteration is a tiny
VPU op with loop overhead, and the carried state round-trips through
the loop machinery. This kernel keeps the section states in registers
and streams the signal time-major through VMEM: one ``fori_loop`` over
T per row-tile, all rows of the tile advancing in lock-step on the VPU.

Layout: input is transposed to time-major ``(T, R)`` (R = flattened
trials x channels) so each time step reads one contiguous ``(1, R_tile)``
lane vector. The grid tiles R; T stays whole per program (the recurrence
is sequential in T). Coefficients are static (baked into the kernel at
trace time); the per-row initial state ``zi`` is a kernel input, so
SciPy's ``sosfilt_zi`` seeding — and therefore exact ``sosfiltfilt``
parity — carries over unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(sos: np.ndarray, t_len: int):
    """Kernel body for a static SOS cascade and signal length.

    Refs: ``x (T, Rt)``, ``zi (2S, Rt)``, ``out (T, Rt)``,
    ``zf (2S, Rt)`` (final section states, for chunked continuation).
    """
    n_sections = sos.shape[0]
    coef = [tuple(float(c) for c in row) for row in sos]  # static constants

    def kernel(x_ref, zi_ref, out_ref, zf_ref):
        def body(t, z):
            out = x_ref[t, :]
            new_z = []
            for s in range(n_sections):
                b0, b1, b2, _, a1, a2 = coef[s]
                z0, z1 = z[2 * s], z[2 * s + 1]
                y = b0 * out + z0
                new_z.append(b1 * out - a1 * y + z1)
                new_z.append(b2 * out - a2 * y)
                out = y
            out_ref[t, :] = out
            return tuple(new_z)

        z0 = tuple(zi_ref[i, :] for i in range(2 * n_sections))
        z_final = jax.lax.fori_loop(0, t_len, body, z0)
        for i in range(2 * n_sections):
            zf_ref[i, :] = z_final[i]

    return kernel


def sosfilt_time_major(
    sos: np.ndarray,
    xt: jnp.ndarray,  # (T, R) time-major
    zi: Optional[jnp.ndarray] = None,  # (2S, R)
    row_tile: int = 1024,
    interpret: bool = False,
    return_zf: bool = False,
):
    """Causal biquad cascade over axis 0 of a time-major ``(T, R)`` array.

    With ``return_zf=True`` also returns the final section states
    ``(2S, R)`` for chunked/streaming continuation."""
    sos = np.asarray(sos, np.float64)
    sos = sos / sos[:, 3:4]
    n_sections = sos.shape[0]
    t_len, r = xt.shape
    row_tile = min(_round_up(row_tile, _LANE), _round_up(max(r, _LANE), _LANE))
    r_pad = _round_up(max(r, _LANE), row_tile)  # grid must cover every row
    if zi is None:
        zi = jnp.zeros((2 * n_sections, r), xt.dtype)
    if r_pad != r:
        xt = jnp.pad(xt, ((0, 0), (0, r_pad - r)))
        zi = jnp.pad(zi, ((0, 0), (0, r_pad - r)))

    kernel = _make_kernel(sos, t_len)
    grid = (r_pad // row_tile,)
    state_spec = pl.BlockSpec(
        (2 * n_sections, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out, zf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_len, r_pad), xt.dtype),
            jax.ShapeDtypeStruct((2 * n_sections, r_pad), xt.dtype),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((t_len, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                state_spec,
            ],
            out_specs=(
                pl.BlockSpec((t_len, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                state_spec,
            ),
        ),
        interpret=interpret,
    )(xt, zi.astype(xt.dtype))
    if return_zf:
        return out[:, :r], zf[:, :r]
    return out[:, :r]


def sosfilt_pallas(
    sos: np.ndarray,
    x: jnp.ndarray,
    zi: Optional[jnp.ndarray] = None,  # (..., S, 2) scipy layout
    row_tile: int = 1024,
    interpret: bool = False,
):
    """Drop-in for ``ops.filters.sosfilt``: causal filtering over the
    trailing axis of ``(..., T)``, batched, optional scipy-layout ``zi``.
    Like ``ops.filters.sosfilt``, returns ``(y, zf)`` — ``zf`` the final
    section states ``(..., S, 2)`` — when ``zi`` is given, else ``y``."""
    batch_shape = x.shape[:-1]
    t_len = x.shape[-1]
    n_sections = np.asarray(sos).shape[0]
    xt = jnp.moveaxis(x.reshape((-1, t_len)), -1, 0)  # (T, R)
    zi_t = None
    if zi is not None:
        zi_b = jnp.broadcast_to(zi, batch_shape + (n_sections, 2))
        zi_t = jnp.moveaxis(zi_b.reshape((-1, n_sections * 2)), -1, 0)  # (2S, R)
    if zi is None:
        yt = sosfilt_time_major(sos, xt, zi=None, row_tile=row_tile, interpret=interpret)
        return jnp.moveaxis(yt, 0, -1).reshape(batch_shape + (t_len,))
    yt, zf_t = sosfilt_time_major(
        sos, xt, zi=zi_t, row_tile=row_tile, interpret=interpret, return_zf=True
    )
    y = jnp.moveaxis(yt, 0, -1).reshape(batch_shape + (t_len,))
    zf = jnp.moveaxis(zf_t, 0, -1).reshape(batch_shape + (n_sections, 2))
    return y, zf


def sosfiltfilt_pallas(
    sos: np.ndarray,
    x: jnp.ndarray,
    padlen: Optional[int] = None,
    row_tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Zero-phase forward-backward filtering, SciPy ``sosfiltfilt``
    semantics, with both passes running through the Pallas kernel. The
    trace-time machinery (padlen formula, odd extension, ``sosfilt_zi``
    seeding) is the SAME code as the XLA path (``filters.sos_zero_phase``)
    so the two can never drift apart."""
    from ..filters import sos_zero_phase

    return sos_zero_phase(
        lambda s, v, zi: sosfilt_pallas(
            s, v, zi=zi, row_tile=row_tile, interpret=interpret
        ),
        sos, x, padlen,
    )
