"""Network serving daemon: decode posteriors for remote clients.

The reference has no serving story at all — consuming a trained model
means re-instantiating the torch class and loading a ``state_dict``
with prefix surgery inside each analysis script
(``/root/reference/scripts/explain_fast.py:32-54``). This module is the
deployment tier above ``serving.py``'s in-process decoders: one
long-lived process owns the TPU-compiled decode graph and any number of
acquisition / analysis clients talk to it over a socket.

Wire protocol (version ``ISD1``, little-endian, length-prefixed —
deliberately dependency-free so non-Python acquisition hosts can speak
it from ~30 lines of C):

    header   <4s B I   = magic b"ISD1", message type u8, payload bytes u32
    INFO     0x01      -> 0x81 + JSON {n_channels, seq_len, n_classes, ...}
    DECODE   0x02      payload <III (B, C, T) + B*C*T f32
                       -> 0x82 + <II (B, K) + B*K f32 posteriors
    RELOAD   0x03      payload utf-8 checkpoint path (live mode only)
                       -> 0x80 (weights hot-swapped, no recompile)
    SHUTDOWN 0x04      -> 0x80, then the server stops accepting
    DECODE_ALL 0x05    same payload as DECODE (fleet mode only)
                       -> 0x83 + <III (M, B, K) + M*B*K f32: every
                       model's posteriors for the same windows
    error    0xFF      + utf-8 message (any request may fail)

Deployment hardening (this is the tier exposed to a network, so the
mutating requests are constrained):

  * RELOAD paths are confined to a configured checkpoint root
    (``reload_root``): relative paths resolve under it, and any request
    escaping it after symlink/``..`` resolution is rejected — a client
    cannot use RELOAD to probe or load arbitrary filesystem paths.
  * With ``auth_token`` set, RELOAD and SHUTDOWN payloads must start
    with ``<token>\\n`` (constant-time compared); read-only requests
    (INFO/DECODE/DECODE_ALL) stay token-free.
  * Once a frame header arrives, its payload must complete within
    ``io_timeout`` seconds — a stalled or hostile peer cannot pin a
    handler thread mid-frame forever. Idle waits between frames remain
    unbounded (persistent connections are the intended use).

In fleet mode (``isd-serve --checkpoint-dir``: all subjects' best
checkpoints vmapped into one graph) DECODE returns the fleet's
soft-vote ensemble mean and DECODE_ALL the per-model posteriors.

Connections are persistent (many requests per socket); concurrent
clients are handled by a thread per connection with the device calls
serialized through one lock — the decode graph is a single compiled
executable on a single chip, so a queue in front of it IS the correct
concurrency model.
"""

from __future__ import annotations

import hmac
import json
import os
import socket
import socketserver
import struct
import threading
import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np

MAGIC = b"ISD1"
_HDR = struct.Struct("<4sBI")

MSG_INFO = 0x01
MSG_DECODE = 0x02
MSG_RELOAD = 0x03
MSG_SHUTDOWN = 0x04
MSG_DECODE_ALL = 0x05
RSP_OK = 0x80
RSP_INFO = 0x81
RSP_DECODE = 0x82
RSP_DECODE_ALL = 0x83
RSP_ERR = 0xFF

# One decode request is at most this many payload bytes (default allows
# a ~2000-window batch at the canonical 64x800 geometry). Guards the
# server against a corrupt/hostile length field allocating unbounded
# memory, not against legitimate large batches — raise it if needed.
MAX_PAYLOAD = 512 * 1024 * 1024


class ProtocolError(RuntimeError):
    """Malformed frame (bad magic, truncated payload, bogus lengths)."""


def _recv_exact(
    sock: socket.socket, n: int, deadline: Optional[float] = None
) -> bytes:
    """Read exactly ``n`` bytes or raise ``ConnectionError`` on EOF.

    ``deadline`` (a ``time.monotonic()`` instant) bounds the WHOLE read:
    the socket timeout is re-armed to the remaining budget before every
    ``recv``, so a peer drip-feeding one byte per timeout window cannot
    keep resetting the clock — without it, a per-``recv`` timeout bounds
    only the gap between chunks, and a hostile peer could pin a handler
    thread for up to MAX_PAYLOAD bytes x the timeout."""
    buf = bytearray()
    while len(buf) < n:
        if deadline is not None:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise socket.timeout("payload deadline exceeded")
            sock.settimeout(remaining)
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            raise ConnectionError(f"peer closed mid-frame ({len(buf)}/{n} bytes)")
        buf.extend(chunk)
    return bytes(buf)


def _send_frame(sock: socket.socket, msg_type: int, payload: bytes = b"") -> None:
    sock.sendall(_HDR.pack(MAGIC, msg_type, len(payload)) + payload)


def _recv_frame(
    sock: socket.socket,
    max_payload: int = MAX_PAYLOAD,
    payload_timeout: Optional[float] = None,
) -> Tuple[int, bytes]:
    """Read one frame. ``payload_timeout`` bounds how long the WHOLE
    PAYLOAD may take once its header has arrived (an absolute deadline
    across all of its chunks — anti-stall AND anti-drip-feed); the
    header wait itself keeps the socket's own timeout (idle connections
    are fine)."""
    magic, msg_type, n = _HDR.unpack(_recv_exact(sock, _HDR.size))
    if magic != MAGIC:
        raise ProtocolError(f"bad magic {magic!r}")
    if n > max_payload:
        raise ProtocolError(f"payload {n} bytes exceeds limit {max_payload}")
    if not n:
        return msg_type, b""
    if payload_timeout is None:
        return msg_type, _recv_exact(sock, n)
    prev = sock.gettimeout()
    try:
        return msg_type, _recv_exact(
            sock, n, deadline=time.monotonic() + payload_timeout
        )
    except socket.timeout as e:
        raise ProtocolError(
            f"payload stalled (> {payload_timeout}s mid-frame)"
        ) from e
    finally:
        sock.settimeout(prev)


class DecoderServer:
    """Serve a raw-window → posterior decode function over TCP.

    ``decode_fn(x (B, C, T) f32) -> (B, K)`` is any in-process decoder:
    ``serving.make_online_decoder`` (live weights, hot-swappable),
    ``serving.load_decoder_artifact`` (AOT StableHLO), or a fleet
    ensemble (``serving.make_fleet_decoder(...).ensemble``).
    ``reload_fn``, when given, services RELOAD requests (receives the
    resolved path string) and REQUIRES ``reload_root``: requested paths
    resolve under that directory and escapes (absolute paths outside
    it, ``..``/symlink traversal) are rejected. Omit ``reload_fn`` for
    immutable artifact serving. ``decode_all_fn(x) -> (M, B, K)``, when
    given, services DECODE_ALL (fleet mode: per-model posteriors).
    ``auth_token``, when set, gates RELOAD and SHUTDOWN behind a shared
    secret (``<token>\\n`` payload prefix).

    Use as a context manager — ``with DecoderServer(...) as srv:`` —
    which starts ``serve_forever`` on a daemon thread and tears it down
    on exit; or call ``serve_forever()`` directly to block (the CLI
    does).
    """

    def __init__(
        self,
        decode_fn: Callable[[np.ndarray], np.ndarray],
        *,
        n_channels: int,
        seq_len: int,
        n_classes: int,
        host: str = "127.0.0.1",
        port: int = 0,
        reload_fn: Optional[Callable[[str], None]] = None,
        reload_root: Optional[str] = None,
        decode_all_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        info_extra: Optional[Dict] = None,
        max_requests: Optional[int] = None,
        auth_token: Optional[str] = None,
        io_timeout: Optional[float] = 30.0,
    ):
        if reload_fn is not None and reload_root is None:
            raise ValueError(
                "reload_fn requires reload_root: RELOAD must be confined to "
                "a checkpoint directory, not the whole filesystem"
            )
        self._decode = decode_fn
        self._decode_all = decode_all_fn
        self._reload = reload_fn
        self._reload_root = (
            os.path.realpath(reload_root) if reload_root is not None else None
        )
        self._auth = auth_token
        self._io_timeout = io_timeout
        self._meta = {
            "protocol": MAGIC.decode(),
            "n_channels": int(n_channels),
            "seq_len": int(seq_len),
            "n_classes": int(n_classes),
            "reloadable": reload_fn is not None,
            "fleet": decode_all_fn is not None,
            "authenticated": auth_token is not None,
            **(info_extra or {}),
        }
        self._lock = threading.Lock()  # serializes device access
        self._served = 0
        self._max_requests = max_requests
        self._thread: Optional[threading.Thread] = None
        outer = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):  # one persistent connection
                while True:
                    try:
                        msg_type, payload = _recv_frame(
                            self.request, payload_timeout=outer._io_timeout
                        )
                    except ConnectionError:
                        return  # client hung up between frames — normal
                    except ProtocolError as e:
                        # Frame boundaries are lost after a bad header;
                        # report and drop the connection.
                        try:
                            _send_frame(self.request, RSP_ERR, str(e).encode())
                        except OSError:
                            pass
                        return
                    try:
                        stop = outer._dispatch(self.request, msg_type, payload)
                    except BrokenPipeError:
                        return
                    except Exception as e:  # noqa: BLE001 — reported to client
                        try:
                            _send_frame(
                                self.request, RSP_ERR, f"{type(e).__name__}: {e}".encode()
                            )
                        except OSError:
                            return
                        continue
                    if stop:
                        return

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)

    # -- request dispatch ------------------------------------------------
    def _dispatch(self, sock, msg_type: int, payload: bytes) -> bool:
        """Handle one request; returns True when the connection (and for
        SHUTDOWN, the server) should stop."""
        if msg_type == MSG_INFO:
            _send_frame(sock, RSP_INFO, json.dumps(self._meta).encode())
            return False
        if msg_type in (MSG_DECODE, MSG_DECODE_ALL):
            x = self._parse_windows(payload)
            if msg_type == MSG_DECODE_ALL and self._decode_all is None:
                raise RuntimeError(
                    "DECODE_ALL needs fleet mode (serve with --checkpoint-dir)"
                )
            fn = self._decode_all if msg_type == MSG_DECODE_ALL else self._decode
            with self._lock:
                post = np.asarray(fn(x), dtype="<f4")
                self._served += 1
                done = self._max_requests is not None and self._served >= self._max_requests
            if msg_type == MSG_DECODE_ALL:
                rsp = RSP_DECODE_ALL
                hdr = struct.pack("<III", *post.shape)
            else:
                rsp = RSP_DECODE
                hdr = struct.pack("<II", *post.shape)
            _send_frame(sock, rsp, hdr + post.tobytes())
            if done:
                self._async_shutdown()
                return True
            return False
        if msg_type == MSG_RELOAD:
            payload = self._check_auth(payload)
            if self._reload is None:
                raise RuntimeError(
                    "server is immutable (artifact mode); RELOAD needs live weights"
                )
            path = self._confine_reload_path(payload.decode())
            with self._lock:
                self._reload(path)
            _send_frame(sock, RSP_OK)
            return False
        if msg_type == MSG_SHUTDOWN:
            self._check_auth(payload)
            _send_frame(sock, RSP_OK)
            self._async_shutdown()
            return True
        raise ProtocolError(f"unknown message type 0x{msg_type:02x}")

    def _check_auth(self, payload: bytes) -> bytes:
        """Enforce the shared secret on mutating requests; returns the
        payload with the token prefix stripped."""
        if self._auth is None:
            return payload
        tok, sep, rest = payload.partition(b"\n")
        if not sep or not hmac.compare_digest(tok, self._auth.encode()):
            raise PermissionError("bad or missing auth token")
        return rest

    def _confine_reload_path(self, path: str) -> str:
        """Resolve a RELOAD path under the configured checkpoint root;
        reject anything that escapes it after symlink/.. resolution.

        Threat-model note: the realpath check happens before
        ``reload_fn`` opens the file, so a symlink INSIDE the root
        swapped between check and open could still redirect the read
        (TOCTOU). The root is a trusted checkpoint directory written by
        the training pipeline — anyone who can plant symlinks there can
        already replace the checkpoints themselves — so the check's job
        is confining honest-but-wrong client paths, not defeating a
        root-writing attacker. Stricter confinement would need
        dirfd-relative ``os.open(..., O_NOFOLLOW)`` walks in
        ``reload_fn`` itself."""
        root = self._reload_root
        assert root is not None  # constructor invariant with reload_fn
        cand = path if os.path.isabs(path) else os.path.join(root, path)
        real = os.path.realpath(cand)
        if real != root and not real.startswith(root + os.sep):
            raise PermissionError(
                f"RELOAD path {path!r} escapes the checkpoint root"
            )
        return real

    def _parse_windows(self, payload: bytes) -> np.ndarray:
        """Validate a DECODE/DECODE_ALL payload into its (B, C, T) array."""
        if len(payload) < 12:
            raise ProtocolError("DECODE payload shorter than its (B, C, T) header")
        b, c, t = struct.unpack_from("<III", payload)
        want = 12 + 4 * b * c * t
        if len(payload) != want:
            raise ProtocolError(
                f"DECODE length {len(payload)} != {want} for shape ({b}, {c}, {t})"
            )
        if (c, t) != (self._meta["n_channels"], self._meta["seq_len"]):
            raise ValueError(
                f"window shape ({c}, {t}) does not match the served model's "
                f"({self._meta['n_channels']}, {self._meta['seq_len']})"
            )
        if b == 0:
            raise ValueError("empty batch")
        return np.frombuffer(payload, "<f4", offset=12).reshape(b, c, t)

    def _async_shutdown(self):
        # shutdown() blocks until serve_forever exits, so it must not run
        # on a handler thread (self-deadlock under the non-threading mixin).
        threading.Thread(target=self._server.shutdown, daemon=True).start()

    # -- lifecycle ---------------------------------------------------------
    @property
    def address(self) -> Tuple[str, int]:
        return self._server.server_address[:2]

    @property
    def info(self) -> Dict:
        return dict(self._meta)

    @property
    def requests_served(self) -> int:
        return self._served

    def serve_forever(self) -> None:
        self._server.serve_forever(poll_interval=0.05)

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "DecoderServer":
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=5)


class DecoderClient:
    """Blocking client for :class:`DecoderServer` (one persistent socket).

    >>> with DecoderClient(host, port) as c:
    ...     c.info()["n_classes"]
    ...     posteriors = c.decode(raw)   # (B, C, T) f32 -> (B, K)
    """

    def __init__(
        self, host: str, port: int, timeout: float = 60.0,
        auth_token: Optional[str] = None,
    ):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._auth = auth_token

    def _authed(self, payload: bytes) -> bytes:
        """Prefix the shared secret for mutating requests when configured."""
        return payload if self._auth is None else self._auth.encode() + b"\n" + payload

    def _rpc(self, msg_type: int, payload: bytes, expect: int) -> bytes:
        _send_frame(self._sock, msg_type, payload)
        rsp, data = _recv_frame(self._sock)
        if rsp == RSP_ERR:
            raise RuntimeError(f"server error: {data.decode(errors='replace')}")
        if rsp != expect:
            raise ProtocolError(f"expected response 0x{expect:02x}, got 0x{rsp:02x}")
        return data

    def info(self) -> Dict:
        return json.loads(self._rpc(MSG_INFO, b"", RSP_INFO))

    def decode(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype="<f4")
        if x.ndim != 3:
            raise ValueError(f"expected (B, C, T), got shape {x.shape}")
        payload = struct.pack("<III", *x.shape) + x.tobytes()
        data = self._rpc(MSG_DECODE, payload, RSP_DECODE)
        b, k = struct.unpack_from("<II", data)
        return np.frombuffer(data, "<f4", offset=8).reshape(b, k).copy()

    def decode_all(self, x: np.ndarray) -> np.ndarray:
        """Fleet mode: every served model's posteriors, ``(M, B, K)``."""
        x = np.ascontiguousarray(x, dtype="<f4")
        if x.ndim != 3:
            raise ValueError(f"expected (B, C, T), got shape {x.shape}")
        payload = struct.pack("<III", *x.shape) + x.tobytes()
        data = self._rpc(MSG_DECODE_ALL, payload, RSP_DECODE_ALL)
        m, b, k = struct.unpack_from("<III", data)
        return np.frombuffer(data, "<f4", offset=12).reshape(m, b, k).copy()

    def reload(self, checkpoint_path: str) -> None:
        self._rpc(MSG_RELOAD, self._authed(checkpoint_path.encode()), RSP_OK)

    def shutdown_server(self) -> None:
        self._rpc(MSG_SHUTDOWN, self._authed(b""), RSP_OK)

    def close(self) -> None:
        self._sock.close()

    def __enter__(self) -> "DecoderClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def artifact_meta(exported) -> Dict[str, int]:
    """Pull (n_channels, seq_len, n_classes) out of a deserialized
    ``jax.export.Exported`` decode graph (shapes ``(b, C, T) -> (b, K)``;
    the batch dim may be symbolic)."""
    in_shape = exported.in_avals[0].shape
    out_shape = exported.out_avals[0].shape
    return {
        "n_channels": int(in_shape[-2]),
        "seq_len": int(in_shape[-1]),
        "n_classes": int(out_shape[-1]),
    }
