"""Serving-path tests: fused raw→posterior graph, streaming ring buffer,
weight export/reload."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.serving import (
    StreamingDecoder,
    export_decoder_artifact,
    export_decoder_weights,
    load_decoder_artifact,
    load_decoder_weights,
    make_online_decoder,
)


@pytest.fixture(scope="module")
def decoder_setup(request):
    cfg = request.getfixturevalue("small_config")
    model = make_fast_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    dec = make_online_decoder(
        model.apply, params, state, sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0)
    )
    return cfg, model, params, state, dec


class TestOnlineDecoder:
    def test_posteriors_valid(self, decoder_setup, dummy_eeg_small):
        cfg, _, _, _, dec = decoder_setup
        post = np.asarray(dec(jnp.asarray(dummy_eeg_small)))
        assert post.shape == (6, cfg.n_classes)
        np.testing.assert_allclose(post.sum(axis=-1), 1.0, rtol=1e-5)
        assert (post >= 0).all()

    def test_deterministic(self, decoder_setup, dummy_eeg_small):
        *_, dec = decoder_setup
        p1 = np.asarray(dec(jnp.asarray(dummy_eeg_small)))
        p2 = np.asarray(dec(jnp.asarray(dummy_eeg_small)))
        np.testing.assert_array_equal(p1, p2)

    def test_filtering_matters(self, decoder_setup, dummy_eeg_small):
        cfg, model, params, state, dec = decoder_setup
        raw_dec = make_online_decoder(
            model.apply, params, state, notch_hz=None, band=None
        )
        p_filt = np.asarray(dec(jnp.asarray(dummy_eeg_small)))
        p_raw = np.asarray(raw_dec(jnp.asarray(dummy_eeg_small)))
        assert not np.allclose(p_filt, p_raw)


class TestStreamingDecoder:
    def test_ring_buffer_flow(self, decoder_setup):
        cfg, *_, dec = decoder_setup
        sd = StreamingDecoder(dec, cfg.n_channels, cfg.seq_len)
        assert not sd.ready
        with pytest.raises(RuntimeError):
            sd.decode_latest()
        rng = np.random.default_rng(0)
        for _ in range(4):
            sd.push(rng.normal(size=(cfg.n_channels, cfg.seq_len // 4)).astype(np.float32))
        assert sd.ready
        post = sd.decode_latest()
        assert post.shape == (cfg.n_classes,)
        np.testing.assert_allclose(post.sum(), 1.0, rtol=1e-5)

    def test_big_chunk_replaces_buffer(self, decoder_setup):
        cfg, *_, dec = decoder_setup
        sd = StreamingDecoder(dec, cfg.n_channels, cfg.seq_len)
        chunk = np.random.default_rng(1).normal(
            size=(cfg.n_channels, cfg.seq_len + 50)
        ).astype(np.float32)
        sd.push(chunk)
        np.testing.assert_array_equal(sd.buffer, chunk[:, -cfg.seq_len:])

    def test_latest_window_semantics(self, decoder_setup):
        cfg, *_, dec = decoder_setup
        sd = StreamingDecoder(dec, cfg.n_channels, cfg.seq_len)
        rng = np.random.default_rng(2)
        full = rng.normal(size=(cfg.n_channels, cfg.seq_len * 2)).astype(np.float32)
        for i in range(0, full.shape[-1], 50):
            sd.push(full[:, i : i + 50])
        direct = np.asarray(dec(jnp.asarray(full[:, -cfg.seq_len:])[None]))[0]
        np.testing.assert_allclose(sd.decode_latest(), direct, rtol=1e-5, atol=1e-6)


class TestWeightSwap:
    def test_hot_swap_without_recompile(self, decoder_setup, dummy_eeg_small):
        cfg, model, params, state, dec = decoder_setup
        params2, state2 = model.init(jax.random.PRNGKey(99))
        x = jnp.asarray(dummy_eeg_small)
        before = np.asarray(dec(x))
        dec.swap_weights(params2, state2)
        swapped = np.asarray(dec(x))
        assert not np.allclose(before, swapped)
        # same weights via a fresh decoder -> identical posteriors
        dec_ref = make_online_decoder(
            model.apply, params2, state2, sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0)
        )
        np.testing.assert_allclose(swapped, np.asarray(dec_ref(x)), rtol=1e-6)
        dec.swap_weights(params, state)  # restore for other tests
        np.testing.assert_allclose(np.asarray(dec(x)), before, rtol=1e-6)

    def test_constants_mode(self, decoder_setup, dummy_eeg_small):
        cfg, model, params, state, dec = decoder_setup
        dec_c = make_online_decoder(
            model.apply, params, state, sfreq=100.0, notch_hz=25.0,
            band=(2.0, 30.0), weights_as_constants=True,
        )
        np.testing.assert_allclose(
            np.asarray(dec_c(jnp.asarray(dummy_eeg_small))),
            np.asarray(dec(jnp.asarray(dummy_eeg_small))),
            rtol=1e-5, atol=1e-6,
        )
        assert dec_c.swap_weights is None


class TestStreamingChunked:
    def test_non_divisible_chunk_sizes(self, decoder_setup):
        """Ragged pushes (sizes that don't divide seq_len) must preserve
        exact latest-window semantics through the zero-prefill phase."""
        cfg, *_, dec = decoder_setup
        sd = StreamingDecoder(dec, cfg.n_channels, cfg.seq_len)
        rng = np.random.default_rng(3)
        stream = rng.normal(size=(cfg.n_channels, cfg.seq_len * 3 + 17)).astype(np.float32)
        pos = 0
        for size in [7, 33, 50, 1, 129, 64]* 20:
            if pos >= stream.shape[-1]:
                break
            chunk = stream[:, pos : pos + size]
            if chunk.shape[-1] == 0:
                break
            sd.push(chunk)
            pos += chunk.shape[-1]
            if sd.ready and pos >= cfg.seq_len:
                direct = np.asarray(
                    dec(jnp.asarray(stream[:, pos - cfg.seq_len : pos])[None])
                )[0]
                np.testing.assert_allclose(sd.decode_latest(), direct, rtol=1e-5, atol=1e-6)


class TestWeightRoundTrip:
    def test_export_reload(self, decoder_setup, tmp_dir, dummy_eeg_small):
        cfg, model, params, state, dec = decoder_setup
        path = export_decoder_weights(f"{tmp_dir}/serve.npz", params, state)
        p2, s2 = load_decoder_weights(path, params, state)
        dec2 = make_online_decoder(
            model.apply, p2, s2, sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0)
        )
        np.testing.assert_allclose(
            np.asarray(dec(jnp.asarray(dummy_eeg_small))),
            np.asarray(dec2(jnp.asarray(dummy_eeg_small))),
            rtol=1e-6,
        )


class TestExportedArtifact:
    """AOT serving artifact (jax.export): self-contained StableHLO file,
    symbolic batch, equivalence with the live decoder."""

    @pytest.fixture(scope="class")
    def artifact(self, request, tmp_path_factory):
        cfg = request.getfixturevalue("small_config")
        model = make_fast_model(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        path = str(tmp_path_factory.mktemp("export") / "decoder.stablehlo")
        export_decoder_artifact(
            path, model.apply, params, state,
            n_channels=cfg.n_channels, seq_len=cfg.seq_len,
            sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0),
        )
        return cfg, model, params, state, path

    def test_matches_live_decoder_any_batch(self, artifact):
        cfg, model, params, state, path = artifact
        decode = load_decoder_artifact(path)
        live = make_online_decoder(
            model.apply, params, state, sfreq=100.0, notch_hz=25.0,
            band=(2.0, 30.0), use_pallas=False,
        )
        rng = np.random.default_rng(0)
        # symbolic batch: one artifact serves any B
        for b in (1, 3, 6):
            x = rng.normal(size=(b, cfg.n_channels, cfg.seq_len)).astype(np.float32)
            # symbolic-batch lowering fuses slightly differently than the
            # static-shape live graph -> float32-epsilon differences
            np.testing.assert_allclose(
                np.asarray(decode(x)), np.asarray(live(jnp.asarray(x))),
                rtol=1e-5, atol=1e-6,
            )

    def test_selfcontained_no_model_code(self, artifact):
        """The artifact must serve with ONLY jax imported — no package
        model code, no checkpoint machinery."""
        import subprocess
        import sys

        cfg, *_, path = artifact
        script = (
            "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
            "import jax, numpy as np\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from jax import export\n"
            f"exp = export.deserialize(open({path!r}, 'rb').read())\n"
            f"x = np.zeros(({2}, {cfg.n_channels}, {cfg.seq_len}), np.float32)\n"
            "post = np.asarray(jax.jit(exp.call)(x))\n"
            f"assert post.shape == (2, {cfg.n_classes}), post.shape\n"
            "assert np.isfinite(post).all()\n"
            "assert np.allclose(post.sum(-1), 1.0, atol=1e-5)\n"
            "print('SERVED-OK')\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "SERVED-OK" in out.stdout

    def test_fixed_batch_export(self, artifact, tmp_dir):
        cfg, model, params, state, _ = artifact
        path = f"{tmp_dir}/decoder_b2.stablehlo"
        export_decoder_artifact(
            path, model.apply, params, state,
            n_channels=cfg.n_channels, seq_len=cfg.seq_len,
            sfreq=100.0, notch_hz=25.0, band=(2.0, 30.0), batch_size=2,
        )
        decode = load_decoder_artifact(path)
        x = np.zeros((2, cfg.n_channels, cfg.seq_len), np.float32)
        assert np.asarray(decode(x)).shape == (2, cfg.n_classes)
        with pytest.raises(Exception):
            decode(np.zeros((3, cfg.n_channels, cfg.seq_len), np.float32))

    def test_cli(self, tmp_dir):
        """isd-export-decoder end-to-end on a tiny YAML config."""
        import yaml

        from imagined_speech_decoding_tpu.cli.export_decoder import main

        electrodes = [f"E{i}" for i in range(8)]
        cfg_yaml = {
            "model": {
                "electrodes": electrodes,
                "zone_dict": {
                    "A": electrodes[:3], "B": electrodes[3:6], "C": electrodes[6:],
                },
                "dim_cnn": 8, "dim_token": 8, "seq_len": 200,
                "window_len": 100, "slide_step": 50,
                "num_layers": 1, "num_heads": 2, "dropout": 0.0,
            }
        }
        cfg_path = f"{tmp_dir}/tiny.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg_yaml, f)
        out_path = f"{tmp_dir}/decoder.stablehlo"
        ret = main([
            "--config", cfg_path, "--out", out_path,
            "--notch", "25.0", "--band", "2.0", "30.0",
        ])
        assert ret == out_path and os.path.getsize(out_path) > 0
        decode = load_decoder_artifact(out_path)
        post = np.asarray(decode(np.zeros((4, 8, 200), np.float32)))
        assert post.shape == (4, 5)
        np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-5)
