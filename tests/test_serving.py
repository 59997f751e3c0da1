"""Serving-path tests: fused raw→posterior graph, streaming ring buffer,
weight export/reload."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagined_speech_decoding_tpu.models.api import make_fast_model
from imagined_speech_decoding_tpu.serving import (
    StreamingDecoder,
    export_decoder_weights,
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
