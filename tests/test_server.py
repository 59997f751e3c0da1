"""Serving-daemon tests: wire protocol, live + artifact modes, hot
reload, error paths, concurrent clients."""

import os
import socket
import struct
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.server import (
    MAGIC,
    MSG_DECODE,
    RSP_ERR,
    DecoderClient,
    DecoderServer,
    _HDR,
    _recv_frame,
    artifact_meta,
)
from imagined_speech_decoding_tpu.serving import (
    export_decoder_artifact,
    load_decoder_artifact,
    make_online_decoder,
)
from imagined_speech_decoding_tpu.train.checkpoint import load_model_npz, save_model_npz


@pytest.fixture(scope="module")
def served_model(request):
    cfg = request.getfixturevalue("small_config")
    model = make_fast_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    dec = make_online_decoder(
        model.apply, params, state, sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0)
    )
    return cfg, model, params, state, dec


def _make_server(cfg, dec, **kw):
    return DecoderServer(
        dec,
        n_channels=cfg.n_channels,
        seq_len=cfg.seq_len,
        n_classes=cfg.n_classes,
        port=0,
        **kw,
    )


class TestLiveServer:
    def test_decode_matches_direct(self, served_model, dummy_eeg_small):
        cfg, _, _, _, dec = served_model
        direct = np.asarray(dec(dummy_eeg_small))
        with _make_server(cfg, dec) as srv:
            with DecoderClient(*srv.address) as c:
                out = c.decode(dummy_eeg_small)
        np.testing.assert_array_equal(out, direct)

    def test_many_requests_one_connection(self, served_model, dummy_eeg_small):
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec) as srv:
            with DecoderClient(*srv.address) as c:
                for i in range(4):
                    out = c.decode(dummy_eeg_small[i : i + 2])
                    assert out.shape == (2, cfg.n_classes)
            assert srv.requests_served == 4

    def test_info(self, served_model):
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec, info_extra={"mode": "live"}) as srv:
            with DecoderClient(*srv.address) as c:
                info = c.info()
        assert info["n_channels"] == cfg.n_channels
        assert info["seq_len"] == cfg.seq_len
        assert info["n_classes"] == cfg.n_classes
        assert info["mode"] == "live"
        assert info["reloadable"] is False

    def test_hot_reload(self, served_model, dummy_eeg_small, tmp_path):
        cfg, model, params, state, _ = served_model
        # independent weights so decode output provably changes
        params2, state2 = model.init(jax.random.PRNGKey(7))
        ckpt = save_model_npz(str(tmp_path / "w2.npz"), params2, state2)
        dec = make_online_decoder(model.apply, params, state, notch_hz=None, band=None)
        expect2 = np.asarray(
            make_online_decoder(model.apply, params2, state2, notch_hz=None, band=None)(
                dummy_eeg_small
            )
        )

        def reload_fn(path):
            p0, s0 = model.init(jax.random.PRNGKey(0))
            p, s, _ = load_model_npz(path, p0, s0)
            dec.swap_weights(p, s)

        with _make_server(
            cfg, dec, reload_fn=reload_fn, reload_root=str(tmp_path)
        ) as srv:
            with DecoderClient(*srv.address) as c:
                before = c.decode(dummy_eeg_small)
                c.reload(ckpt)
                after = c.decode(dummy_eeg_small)
        assert not np.allclose(before, after)
        np.testing.assert_array_equal(after, expect2)

    def test_reload_rejected_without_reload_fn(self, served_model):
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec) as srv:
            with DecoderClient(*srv.address) as c:
                with pytest.raises(RuntimeError, match="immutable"):
                    c.reload("/nonexistent.npz")

    def test_wrong_shape_reports_error_and_survives(self, served_model, dummy_eeg_small):
        cfg, _, _, _, dec = served_model
        bad = np.zeros((2, cfg.n_channels + 1, cfg.seq_len), np.float32)
        with _make_server(cfg, dec) as srv:
            with DecoderClient(*srv.address) as c:
                with pytest.raises(RuntimeError, match="does not match"):
                    c.decode(bad)
                # connection stays usable after an application error
                out = c.decode(dummy_eeg_small)
                assert out.shape == (dummy_eeg_small.shape[0], cfg.n_classes)

    def test_truncated_decode_payload(self, served_model):
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec) as srv:
            with socket.create_connection(srv.address, timeout=10) as s:
                # claims (B,C,T) needing data but sends only the dims
                payload = struct.pack("<III", 1, cfg.n_channels, cfg.seq_len)
                s.sendall(_HDR.pack(MAGIC, MSG_DECODE, len(payload)) + payload)
                rsp, data = _recv_frame(s)
        assert rsp == RSP_ERR
        assert b"DECODE length" in data

    def test_bad_magic_drops_connection(self, served_model):
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec) as srv:
            with socket.create_connection(srv.address, timeout=10) as s:
                s.sendall(_HDR.pack(b"NOPE", MSG_DECODE, 0))
                rsp, data = _recv_frame(s)
                assert rsp == RSP_ERR and b"magic" in data
                # server closed the connection (frame sync is lost)
                assert s.recv(1) == b""

    def test_concurrent_clients(self, served_model, dummy_eeg_small):
        cfg, _, _, _, dec = served_model
        direct = np.asarray(dec(dummy_eeg_small))
        results, errs = {}, []

        def worker(i):
            try:
                with DecoderClient(*srv.address) as c:
                    results[i] = c.decode(dummy_eeg_small)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        with _make_server(cfg, dec) as srv:
            threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
            [t.start() for t in threads]
            [t.join(timeout=30) for t in threads]
        assert not errs
        for out in results.values():
            np.testing.assert_array_equal(out, direct)

    def test_shutdown_via_client(self, served_model):
        cfg, _, _, _, dec = served_model
        srv = _make_server(cfg, dec)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        with DecoderClient(*srv.address) as c:
            c.shutdown_server()
        t.join(timeout=10)
        assert not t.is_alive()
        srv.shutdown()


class TestArtifactServer:
    def test_serve_exported_artifact(self, served_model, dummy_eeg_small, tmp_path):
        cfg, model, params, state, _ = served_model
        path = str(tmp_path / "dec.stablehlo")
        export_decoder_artifact(
            path, model.apply, params, state,
            n_channels=cfg.n_channels, seq_len=cfg.seq_len,
            sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0), platforms=("cpu",),
        )
        decode = load_decoder_artifact(path)
        direct = np.asarray(decode(dummy_eeg_small))

        from jax import export as jax_export

        with open(path, "rb") as f:
            meta = artifact_meta(jax_export.deserialize(f.read()))
        assert meta == {
            "n_channels": cfg.n_channels,
            "seq_len": cfg.seq_len,
            "n_classes": cfg.n_classes,
        }
        with DecoderServer(decode, port=0, **meta) as srv:
            with DecoderClient(*srv.address) as c:
                out = c.decode(dummy_eeg_small)
        np.testing.assert_array_equal(out, direct)


class TestFleetServer:
    """Fleet mode: all subjects' checkpoints vmapped into one graph
    (serving.make_fleet_decoder), DECODE = ensemble, DECODE_ALL = per-
    model posteriors (reference deployment analogue: one torch model
    re-instantiated per process, scripts/explain_fast.py:32-54)."""

    @pytest.fixture(scope="class")
    def fleet(self, request, tmp_path_factory):
        cfg = request.getfixturevalue("small_config")
        model = make_fast_model(cfg)
        root = tmp_path_factory.mktemp("results")
        paths, weights = [], []
        for i in range(3):
            p, s = model.init(jax.random.PRNGKey(100 + i))
            d = root / f"sub-{i + 1:02d}"
            d.mkdir()
            paths.append(save_model_npz(str(d / "best_subject.npz"), p, s))
            weights.append((p, s))
        from imagined_speech_decoding_tpu.serving import (
            make_fleet_decoder,
            stack_checkpoints,
        )

        sp, ss = stack_checkpoints(paths, model)
        dec = make_fleet_decoder(model.apply, sp, ss, notch_hz=None, band=None)
        return cfg, model, str(root), weights, dec

    def test_rows_match_individual_decoders(self, fleet, dummy_eeg_small):
        cfg, model, _, weights, dec = fleet
        alls = np.asarray(dec(dummy_eeg_small))
        assert alls.shape == (3, dummy_eeg_small.shape[0], cfg.n_classes)
        for i, (p, s) in enumerate(weights):
            single = make_online_decoder(model.apply, p, s, notch_hz=None, band=None)
            np.testing.assert_allclose(
                alls[i], np.asarray(single(dummy_eeg_small)), rtol=1e-5, atol=1e-6
            )

    def test_ensemble_is_mean(self, fleet, dummy_eeg_small):
        _, _, _, _, dec = fleet
        alls = np.asarray(dec(dummy_eeg_small))
        np.testing.assert_allclose(
            np.asarray(dec.ensemble(dummy_eeg_small)),
            alls.mean(axis=0),
            rtol=1e-5, atol=1e-6,
        )

    def test_filtering_shared_across_fleet(self, fleet, dummy_eeg_small):
        """With filters on, every fleet row sees identically filtered
        input (the filter runs once, unbatched under vmap)."""
        cfg, model, _, weights, _ = fleet
        from imagined_speech_decoding_tpu.serving import make_fleet_decoder

        sp = jax.tree.map(lambda *xs: jnp.stack(xs), *[p for p, _ in weights])
        ss = jax.tree.map(lambda *xs: jnp.stack(xs), *[s for _, s in weights])
        dec = make_fleet_decoder(
            model.apply, sp, ss, sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0)
        )
        single = make_online_decoder(
            model.apply, *weights[1], sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0)
        )
        np.testing.assert_allclose(
            np.asarray(dec(dummy_eeg_small))[1],
            np.asarray(single(dummy_eeg_small)),
            rtol=1e-5, atol=1e-6,
        )

    def test_served_fleet_round_trip(self, fleet, dummy_eeg_small):
        cfg, _, _, _, dec = fleet
        with _make_server(cfg, dec.ensemble, decode_all_fn=dec) as srv:
            assert srv.info["fleet"] is True
            with DecoderClient(*srv.address) as c:
                alls = c.decode_all(dummy_eeg_small)
                mean = c.decode(dummy_eeg_small)
        np.testing.assert_allclose(mean, alls.mean(axis=0), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(alls, np.asarray(dec(dummy_eeg_small)))

    def test_decode_all_rejected_without_fleet(self, served_model, dummy_eeg_small):
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec) as srv:
            assert srv.info["fleet"] is False
            with DecoderClient(*srv.address) as c:
                with pytest.raises(RuntimeError, match="fleet"):
                    c.decode_all(dummy_eeg_small)

    def test_cli_checkpoint_dir(self, fleet, dummy_eeg_small, tmp_path):
        import yaml

        from imagined_speech_decoding_tpu.cli.serve import build_parser, build_server

        cfg, _, root, _, dec = fleet
        cfg_yaml = tmp_path / "cfg.yaml"
        cfg_yaml.write_text(
            yaml.safe_dump(
                {
                    "model": {
                        "electrodes": list(cfg.electrodes),
                        "zone_dict": {k: list(v) for k, v in cfg.zone_dict.items()},
                        "dim_cnn": cfg.dim_cnn, "dim_token": cfg.dim_token,
                        "seq_len": cfg.seq_len, "window_len": cfg.window_len,
                        "slide_step": cfg.slide_step, "num_layers": cfg.num_layers,
                        "num_heads": cfg.num_heads, "dropout": cfg.dropout,
                    }
                }
            )
        )
        args = build_parser().parse_args(
            ["--checkpoint-dir", root, "--config", str(cfg_yaml), "--port", "0",
             "--notch", "0", "--band", "0", "0"]
        )
        srv = build_server(args)
        assert srv.info["mode"] == "fleet"
        assert srv.info["n_models"] == 3
        assert srv.info["subjects"] == ["sub-01", "sub-02", "sub-03"]
        with srv:
            with DecoderClient(*srv.address) as c:
                alls = c.decode_all(dummy_eeg_small)
        # rtol as in TestServeCLI: the persistent XLA:CPU cache may serve
        # an AOT entry compiled on a different host whose codegen orders
        # fused FP math differently than the fixture's executable.
        np.testing.assert_allclose(
            alls, np.asarray(dec(dummy_eeg_small)), rtol=2e-3, atol=1e-4
        )


def _isd_client_bin():
    """Path to the compiled native C client, building on demand; None
    when no C toolchain is available."""
    import subprocess

    from imagined_speech_decoding_tpu._native import native_dir

    path = os.path.join(native_dir(), "isd_client")
    if not os.path.exists(path):
        try:
            subprocess.run(
                ["sh", os.path.join(native_dir(), "build.sh")],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return path if os.path.exists(path) else None


class TestNativeCClient:
    """The dependency-free-protocol claim, proven: ``native/isd_client.c``
    (plain C99 + POSIX sockets) speaks ISD1 against a live server."""

    @pytest.fixture(scope="class")
    def stub_server(self):
        # numpy stub decoder — exercises the wire + server machinery
        # without any device compile; output depends on the input so a
        # byte-order or framing bug in the C client shows up as a
        # numerical mismatch, not just a crash.
        rng = np.random.default_rng(3)
        w = rng.standard_normal((8 * 20, 5)).astype(np.float32)

        def decode(x):
            z = x.reshape(x.shape[0], -1)[:, : w.shape[0]] @ w
            e = np.exp(z - z.max(axis=1, keepdims=True))
            return e / e.sum(axis=1, keepdims=True)

        with DecoderServer(decode, n_channels=8, seq_len=20, n_classes=5) as srv:
            yield srv, decode

    @pytest.fixture(scope="class")
    def client_bin(self):
        path = _isd_client_bin()
        if path is None:
            pytest.skip("no C toolchain for isd_client")
        return path

    def _run(self, client_bin, srv, *args, stdin=None):
        import subprocess

        host, port = srv.address
        return subprocess.run(
            [client_bin, host, str(port), *args],
            input=stdin, capture_output=True, timeout=60,
        )

    def test_info(self, stub_server, client_bin):
        import json

        srv, _ = stub_server
        r = self._run(client_bin, srv, "info")
        assert r.returncode == 0, r.stderr
        assert json.loads(r.stdout) == srv.info

    def test_decode_matches_stub(self, stub_server, client_bin):
        srv, decode = stub_server
        rng = np.random.default_rng(11)
        x = rng.standard_normal((3, 8, 20)).astype("<f4")
        r = self._run(client_bin, srv, "decode", "3", "8", "20", stdin=x.tobytes())
        assert r.returncode == 0, r.stderr
        got = np.array(
            [[float(v) for v in line.split()] for line in r.stdout.decode().splitlines()]
        )
        np.testing.assert_allclose(got, decode(x), rtol=1e-5, atol=1e-6)

    def test_server_error_reaches_c_client(self, stub_server, client_bin):
        srv, _ = stub_server
        x = np.zeros((1, 4, 4), "<f4")  # wrong geometry
        r = self._run(client_bin, srv, "decode", "1", "4", "4", stdin=x.tobytes())
        assert r.returncode == 2
        assert b"does not match" in r.stderr

    def test_decode_all_fleet(self, client_bin):
        rng = np.random.default_rng(4)
        ws = [rng.standard_normal((8 * 20, 5)).astype(np.float32) for _ in range(3)]

        def one(x, w):
            z = x.reshape(x.shape[0], -1)[:, : w.shape[0]] @ w
            e = np.exp(z - z.max(axis=1, keepdims=True))
            return e / e.sum(axis=1, keepdims=True)

        def decode_all(x):
            return np.stack([one(x, w) for w in ws])

        x = rng.standard_normal((2, 8, 20)).astype("<f4")
        with DecoderServer(
            lambda v: decode_all(v).mean(axis=0),
            decode_all_fn=decode_all,
            n_channels=8, seq_len=20, n_classes=5,
        ) as srv:
            r = self._run(
                client_bin, srv, "decode_all", "2", "8", "20", stdin=x.tobytes()
            )
        assert r.returncode == 0, r.stderr
        got = np.array(
            [[float(v) for v in line.split()] for line in r.stdout.decode().splitlines()]
        ).reshape(3, 2, 5)
        np.testing.assert_allclose(got, decode_all(x), rtol=1e-5, atol=1e-6)

    def test_shutdown(self, client_bin):
        with DecoderServer(
            lambda x: np.zeros((x.shape[0], 5), np.float32),
            n_channels=8, seq_len=20, n_classes=5,
        ) as srv:
            r = self._run(client_bin, srv, "shutdown")
            assert r.returncode == 0, r.stderr
            assert b"server stopped" in r.stdout


class TestServerHardening:
    """Deployment-tier constraints on the mutating requests (VERDICT r2
    item 6): RELOAD confinement, shared-secret auth, mid-frame stalls."""

    def _reloading_server(self, served_model, tmp_path, **kw):
        cfg, model, params, state, _ = served_model
        dec = make_online_decoder(model.apply, params, state, notch_hz=None, band=None)
        calls = []
        return _make_server(
            cfg, dec, reload_fn=calls.append, reload_root=str(tmp_path), **kw
        ), calls

    def test_reload_requires_root(self, served_model):
        cfg, _, _, _, dec = served_model
        with pytest.raises(ValueError, match="reload_root"):
            _make_server(cfg, dec, reload_fn=lambda p: None)

    def test_reload_path_traversal_rejected(self, served_model, tmp_path):
        srv, calls = self._reloading_server(served_model, tmp_path)
        with srv:
            with DecoderClient(*srv.address) as c:
                for hostile in (
                    "../../../etc/passwd",
                    "/etc/passwd",
                    "sub-01/../../outside.npz",
                ):
                    with pytest.raises(RuntimeError, match="escapes"):
                        c.reload(hostile)
                assert calls == []
                # relative paths resolve under the root and are allowed
                (tmp_path / "ok.npz").write_bytes(b"")
                c.reload("ok.npz")
                assert calls == [str(tmp_path / "ok.npz")]

    def test_reload_symlink_escape_rejected(self, served_model, tmp_path):
        outside = tmp_path.parent / "outside_root.npz"
        outside.write_bytes(b"")
        link = tmp_path / "sneaky.npz"
        os.symlink(outside, link)
        srv, calls = self._reloading_server(served_model, tmp_path)
        with srv:
            with DecoderClient(*srv.address) as c:
                with pytest.raises(RuntimeError, match="escapes"):
                    c.reload("sneaky.npz")
        assert calls == []

    def test_auth_gates_reload_and_shutdown(self, served_model, tmp_path):
        srv, calls = self._reloading_server(
            served_model, tmp_path, auth_token="sesame"
        )
        (tmp_path / "w.npz").write_bytes(b"")
        with srv:
            addr = srv.address
            # no token -> rejected; wrong token -> rejected
            with DecoderClient(*addr) as c:
                with pytest.raises(RuntimeError, match="auth"):
                    c.reload("w.npz")
            with DecoderClient(*addr, auth_token="wrong") as c:
                with pytest.raises(RuntimeError, match="auth"):
                    c.shutdown_server()
            # read-only requests stay open without a token
            with DecoderClient(*addr) as c:
                assert c.info()["authenticated"] is True
            # correct token -> accepted
            with DecoderClient(*addr, auth_token="sesame") as c:
                c.reload("w.npz")
                assert calls == [str(tmp_path / "w.npz")]
                c.shutdown_server()

    def test_unauthenticated_shutdown_allowed_without_token(self, served_model):
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec) as srv:
            with DecoderClient(*srv.address) as c:
                c.shutdown_server()  # lab-bench default: open

    def test_midframe_drip_feed_hits_absolute_deadline(self, served_model):
        """io_timeout is an ABSOLUTE payload deadline: a peer trickling
        bytes faster than the per-recv timeout still gets cut off once
        the whole frame exceeds the budget (advisor r3: a drip-feeder
        must not reset the clock chunk by chunk)."""
        import time as _time

        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec, io_timeout=0.6) as srv:
            with socket.create_connection(srv.address, timeout=10) as s:
                s.sendall(_HDR.pack(MAGIC, MSG_DECODE, 100))
                t0 = _time.monotonic()
                try:
                    for _ in range(50):  # 1 byte per 0.1 s < io_timeout apart
                        s.sendall(b"\x00")
                        _time.sleep(0.1)
                except OSError:
                    pass  # server already dropped us mid-drip
                s.settimeout(10)
                try:
                    rsp, data = _recv_frame(s)
                    assert rsp == RSP_ERR and b"stalled" in data
                except (ConnectionError, OSError):
                    pass  # error frame may be lost to the reset — drop is what matters
                elapsed = _time.monotonic() - t0
                assert elapsed < 4.0, f"drip-feed survived {elapsed:.1f}s"

    def test_midframe_stall_drops_connection(self, served_model):
        """A peer that sends a header then stalls the payload is cut off
        after io_timeout instead of pinning the handler thread."""
        cfg, _, _, _, dec = served_model
        with _make_server(cfg, dec, io_timeout=0.3) as srv:
            with socket.create_connection(srv.address, timeout=10) as s:
                # header promises 100 payload bytes; send only 4 and stall
                s.sendall(_HDR.pack(MAGIC, MSG_DECODE, 100) + b"\x00\x00\x00\x00")
                rsp, data = _recv_frame(s)
                assert rsp == RSP_ERR and b"stalled" in data
                # server closed the connection after the error
                assert s.recv(1) == b""
            # and stays healthy for the next client
            with DecoderClient(*srv.address) as c:
                assert c.info()["n_classes"] == cfg.n_classes


class TestServeCLI:
    def test_build_server_live_and_max_requests(
        self, served_model, dummy_eeg_small, tmp_path
    ):
        from imagined_speech_decoding_tpu.cli.serve import build_parser, build_server

        import yaml

        cfg, model, params, state, _ = served_model
        ckpt = save_model_npz(str(tmp_path / "best.npz"), params, state)
        cfg_yaml = tmp_path / "cfg.yaml"
        cfg_yaml.write_text(
            yaml.safe_dump(
                {
                    "model": {
                        "electrodes": list(cfg.electrodes),
                        "zone_dict": {k: list(v) for k, v in cfg.zone_dict.items()},
                        "dim_cnn": cfg.dim_cnn, "dim_token": cfg.dim_token,
                        "seq_len": cfg.seq_len, "window_len": cfg.window_len,
                        "slide_step": cfg.slide_step, "num_layers": cfg.num_layers,
                        "num_heads": cfg.num_heads, "dropout": cfg.dropout,
                    }
                }
            )
        )
        args = build_parser().parse_args(
            ["--checkpoint", ckpt, "--config", str(cfg_yaml), "--port", "0",
             "--notch", "0", "--band", "0", "0", "--max-requests", "2"]
        )
        srv = build_server(args)
        assert srv.info["mode"] == "live" and srv.info["reloadable"]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        expect = np.asarray(
            make_online_decoder(model.apply, params, state, notch_hz=None, band=None)(
                dummy_eeg_small
            )
        )
        with DecoderClient(*srv.address) as c:
            # rtol covers executable-level skew: the persistent XLA:CPU
            # cache may serve an AOT entry compiled on a different host
            # whose codegen orders fused FP math differently.
            np.testing.assert_allclose(
                c.decode(dummy_eeg_small), expect, rtol=2e-3, atol=1e-5
            )
            c.decode(dummy_eeg_small)  # request #2 triggers max-requests exit
        t.join(timeout=10)
        assert not t.is_alive()
        srv.shutdown()
