"""Online decoding: one jitted graph from raw EEG window to posteriors.

BASELINE.json north star: "Inference is a single jitted graph from raw
EEG window to class posteriors so online decoding runs at fixed low
latency." ``make_online_decoder`` fuses the whole serving chain into one
XLA program with static shapes:

    raw (B, C, T) -> [notch -> band-pass zero-phase IIR] -> FAST
        -> softmax posteriors (B, K)

The filters are the same SciPy-parity ops used in training
(``ops.filters``); because coefficients are static the entire chain
compiles once and replays at fixed latency. A streaming variant decodes
a sliding window from a ring buffer of the latest samples.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import FASTConfig
from .data.constants import SFREQ


def _build_decode_fn(
    apply_fn: Callable,
    sfreq: float,
    notch_hz: Optional[float],
    band: Optional[Tuple[float, float]],
    use_pallas: Optional[bool],
) -> Callable:
    """The serving chain as a pure ``(params, state, x) -> posteriors``
    function: notch + band-pass zero-phase IIR, model forward, softmax.
    Shared by the live decoder and the AOT export path."""
    from scipy.signal import tf2sos

    from .ops.filters import butter_sos, notch_ba, sosfiltfilt

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .ops.pallas import sosfiltfilt_pallas as _sff
    else:
        _sff = sosfiltfilt

    # Both stages run as SOS cascades through one backend: the notch's
    # (b, a) pair converts exactly to a single second-order section.
    notch_sos = tf2sos(*notch_ba(sfreq, notch_hz)) if notch_hz else None
    sos = butter_sos(sfreq, band[0], band[1]) if band else None

    def _decode(p, s, x):
        if notch_sos is not None:
            x = _sff(notch_sos, x)
        if sos is not None:
            x = _sff(sos, x)
        logits, _ = apply_fn(p, s, x, train=False, rng=None)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return _decode


def make_online_decoder(
    apply_fn: Callable,
    params,
    state,
    *,
    sfreq: float = SFREQ,
    notch_hz: Optional[float] = 60.0,
    band: Optional[Tuple[float, float]] = (4.0, 40.0),
    donate: bool = False,
    weights_as_constants: bool = False,
    use_pallas: Optional[bool] = None,
) -> Callable:
    """Build the jitted raw-window → posterior function.

    Returns ``decode(x (B, C, T)) -> posteriors (B, K)`` with an
    attached ``decode.swap_weights(params, state)`` that replaces the
    serving weights WITHOUT recompiling (params/state are runtime
    arguments of the compiled graph, partially applied). Set
    ``weights_as_constants=True`` to bake them into the executable
    instead (marginally faster dispatch; reload requires a rebuild).

    ``use_pallas`` selects the IIR backend for the notch/band-pass
    stages: the Pallas biquad kernel (``ops.pallas.iir`` — section
    states in registers, no per-step scan overhead; bit-identical
    trace-time machinery, see ``filters.sos_zero_phase``) or the
    ``lax.scan`` path. Default: Pallas on TPU, scan elsewhere (the
    kernel only lowers on TPU).
    """
    _decode = _build_decode_fn(apply_fn, sfreq, notch_hz, band, use_pallas)

    if weights_as_constants:
        fn = jax.jit(
            lambda x: _decode(params, state, x),
            donate_argnums=(0,) if donate else (),
        )
        fn.swap_weights = None  # constants are baked in; rebuild to reload
        return fn

    jitted = jax.jit(_decode, donate_argnums=(2,) if donate else ())
    live = {"params": jax.device_put(params), "state": jax.device_put(state)}

    def decode(x):
        return jitted(live["params"], live["state"], x)

    def swap_weights(new_params, new_state):
        """Hot-swap serving weights; the compiled graph is reused (same
        shapes/dtypes), so no recompilation happens."""
        live["params"] = jax.device_put(new_params)
        live["state"] = jax.device_put(new_state)

    decode.swap_weights = swap_weights
    return decode


def stack_checkpoints(paths, model):
    """Load per-model ``.npz`` checkpoints into ONE stacked pytree.

    ``model`` is a ``models.api`` model whose ``init`` provides the leaf
    templates; every checkpoint must match its geometry. Returns
    ``(stacked_params, stacked_state)`` with a leading model axis of
    length ``len(paths)`` on every leaf — the layout ``fit_many`` trains
    in and ``make_fleet_decoder`` serves from.
    """
    from .train.checkpoint import load_model_npz

    if not paths:
        raise ValueError("stack_checkpoints needs at least one checkpoint path")
    p0, s0 = model.init(jax.random.PRNGKey(0))
    loaded = [load_model_npz(p, p0, s0)[:2] for p in paths]
    stack = lambda *xs: jnp.stack([jnp.asarray(x) for x in xs])
    params = jax.tree.map(stack, *[lp for lp, _ in loaded])
    state = jax.tree.map(stack, *[ls for _, ls in loaded])
    return params, state


def make_fleet_decoder(
    apply_fn: Callable,
    stacked_params,
    stacked_state,
    *,
    sfreq: float = SFREQ,
    notch_hz: Optional[float] = 60.0,
    band: Optional[Tuple[float, float]] = (4.0, 40.0),
    use_pallas: Optional[bool] = None,
) -> Callable:
    """Serve a whole model fleet (e.g. all 15 subjects' best checkpoints)
    as ONE jitted graph.

    The reference deploys per-subject models one process at a time
    (each consumer script re-instantiates one torch model,
    ``/root/reference/scripts/explain_fast.py:32-54``); on TPU the
    natural shape is megabatched inference: filter the raw windows ONCE,
    then ``vmap`` the ~0.2 M-param forward over the stacked model axis —
    M models' posteriors for the price of one preprocessing pass and one
    dispatch.

    Returns ``decode_all(x (B, C, T)) -> (M, B, K)`` with:

    * ``decode_all.ensemble(x) -> (B, K)`` — soft-vote mean over the
      fleet (the serving-side counterpart of ``train.ensemble``'s
      soft voting), computed on device;
    * ``decode_all.n_models`` — M;
    * ``decode_all.swap_weights(params, state)`` — hot-swap the whole
      stacked fleet without recompiling.
    """
    _decode = _build_decode_fn(apply_fn, sfreq, notch_hz, band, use_pallas)

    def _all(p, s, x):
        # filters are model-independent: run once, share across the fleet
        return jax.vmap(lambda pi, si: _decode(pi, si, x))(p, s)

    jitted_all = jax.jit(_all)
    jitted_mean = jax.jit(lambda p, s, x: jnp.mean(_all(p, s, x), axis=0))
    live = {
        "params": jax.device_put(stacked_params),
        "state": jax.device_put(stacked_state),
    }

    def decode_all(x):
        return jitted_all(live["params"], live["state"], x)

    def ensemble(x):
        return jitted_mean(live["params"], live["state"], x)

    def swap_weights(new_params, new_state):
        live["params"] = jax.device_put(new_params)
        live["state"] = jax.device_put(new_state)

    decode_all.ensemble = ensemble
    decode_all.swap_weights = swap_weights
    decode_all.n_models = int(
        jax.tree.leaves(stacked_params)[0].shape[0]
    )
    return decode_all


class StreamingDecoder:
    """Fixed-latency continuous decoding over a host-side ring buffer.

    Push arbitrary-length sample chunks; when at least ``seq_len`` samples
    are buffered, ``decode_latest`` runs the jitted decoder on the most
    recent window. The device graph sees one static shape only.

    ``native=True`` backs the ring with the lock-free C++ SPSC buffer
    (``ringbuf.NativeRingBuffer``, ``native/eegring.cpp``): ``push`` may
    then run on a separate acquisition thread concurrently with
    ``decode_latest`` — snapshots are tear-checked — whereas the numpy
    ring serializes producer and consumer through the GIL.
    ``ring_capacity`` (native only, default ``4 * seq_len``) sets how far
    the producer can run ahead during one decode.
    """

    def __init__(
        self,
        decoder: Callable,
        n_channels: int,
        seq_len: int,
        *,
        native: bool = False,
        ring_capacity: Optional[int] = None,
    ):
        self.decoder = decoder
        self.seq_len = seq_len
        self._ring = None
        if native:
            from .ringbuf import NativeRingBuffer

            cap = ring_capacity or 4 * seq_len
            if cap < seq_len:
                raise ValueError(
                    f"ring_capacity ({cap}) must be >= seq_len ({seq_len}); "
                    "a smaller ring could never hold one decode window"
                )
            self._ring = NativeRingBuffer(n_channels, cap)
        else:
            self.buffer = np.zeros((n_channels, seq_len), np.float32)
            self.filled = 0

    def push(self, chunk: np.ndarray) -> None:
        """Append ``(C, n)`` new samples to the ring."""
        if self._ring is not None:
            self._ring.push(chunk)
            return
        n = chunk.shape[-1]
        if n >= self.seq_len:
            self.buffer = chunk[:, -self.seq_len:].astype(np.float32)
        else:
            # f32 cast here too: concatenating a float64 chunk would
            # silently promote the buffer and retrace the jitted decoder.
            self.buffer = np.concatenate(
                [self.buffer[:, n:], chunk.astype(np.float32)], axis=-1
            )
        self.filled = min(self.filled + n, self.seq_len)

    @property
    def ready(self) -> bool:
        if self._ring is not None:
            return self._ring.ready(self.seq_len)
        return self.filled >= self.seq_len

    def decode_latest(self) -> np.ndarray:
        """Posterior over classes for the latest full window ``(K,)``."""
        if self._ring is not None:
            window, _ = self._ring.snapshot_latest(self.seq_len)
            post = self.decoder(jnp.asarray(window)[None])
            return np.asarray(post)[0]
        if not self.ready:
            raise RuntimeError(
                f"buffer has {self.filled}/{self.seq_len} samples; push more first"
            )
        post = self.decoder(jnp.asarray(self.buffer)[None])
        return np.asarray(post)[0]

    def close(self) -> None:
        if self._ring is not None:
            self._ring.close()


def export_decoder_artifact(
    path: str,
    apply_fn: Callable,
    params,
    state,
    *,
    n_channels: int,
    seq_len: int,
    sfreq: float = SFREQ,
    notch_hz: Optional[float] = 60.0,
    band: Optional[Tuple[float, float]] = (4.0, 40.0),
    batch_size: Optional[int] = None,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
) -> str:
    """AOT-export the full serving chain to a self-contained artifact.

    Serializes the raw-window → posterior graph (filters + model forward
    + softmax, weights baked in as constants) via ``jax.export`` to
    portable StableHLO bytes at ``path``. The artifact needs NO Python
    model code to serve — only jax — so deployment ships one file:

        from imagined_speech_decoding_tpu.serving import load_decoder_artifact
        decode = load_decoder_artifact("decoder.stablehlo")
        posteriors = decode(raw)           # (B, C, T) f32 -> (B, K)

    ``batch_size=None`` exports a symbolic batch dimension — one
    artifact serves any B. ``platforms`` lowers the same graph for every
    listed backend (default TPU + CPU, so the artifact runs both on the
    serving chip and in CPU CI). The IIR stages use the ``lax.scan``
    path rather than the Pallas kernel: Pallas lowers to a
    backend-specific custom call that would pin the artifact to one
    platform, and serving compute is sub-millisecond either way
    (docs/PERFORMANCE.md, "Online-decode latency anatomy").

    Replaces what the reference leaves to pickle/state_dict + Python
    model code at serving time (``scripts/explain_fast.py:32-54``'s
    load-model dance) with a single compiled, versioned artifact.
    """
    from jax import export as jax_export

    _decode = _build_decode_fn(apply_fn, sfreq, notch_hz, band, use_pallas=False)
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b, n_channels, seq_len), jnp.float32)
    exported = jax_export.export(
        jax.jit(lambda x: _decode(params, state, x)), platforms=list(platforms)
    )(spec)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_decoder_artifact(path: str) -> Callable:
    """Load a ``export_decoder_artifact`` file into a jitted callable.

    Returns ``decode(x (B, C, T) f32) -> posteriors (B, K)``. The
    deserialized graph re-jits on first call for the local backend (one
    of the platforms the artifact was exported for)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)


def export_decoder_weights(path: str, params, state) -> str:
    """Persist serving weights (flat .npz, see ``train.checkpoint``)."""
    from .train.checkpoint import save_state_dict

    return save_state_dict(path, {"params": params, "state": state})


def load_decoder_weights(path: str, params_template, state_template):
    from .train.checkpoint import load_state_dict

    tree = load_state_dict(
        path, {"params": params_template, "state": state_template}, strip_prefix=""
    )
    return tree["params"], tree["state"]
