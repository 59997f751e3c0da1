"""Pallas kernel tests (interpret mode on CPU): SciPy parity of the IIR
biquad kernel, zi seeding, grid-coverage edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from imagined_speech_decoding_tpu.ops import butter_sos
from imagined_speech_decoding_tpu.ops.pallas import (
    sosfilt_pallas,
    sosfiltfilt_pallas,
)

RTOL = 1e-4


@pytest.fixture(scope="module")
def eeg():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 4, 400)).astype(np.float64)
    x = np.cumsum(x, axis=-1) * 0.05 + x
    return x.astype(np.float32)


class TestSosfiltPallas:
    def test_matches_scipy(self, eeg):
        sos = butter_sos(250.0, 4.0, 40.0, 4)
        ours = np.asarray(sosfilt_pallas(sos, jnp.asarray(eeg), interpret=True))
        ref = sps.sosfilt(sos, eeg.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=RTOL * np.abs(ref).max())

    def test_zi_seeding_matches_scipy(self, eeg):
        sos = butter_sos(250.0, None, 30.0, 2)
        zi = sps.sosfilt_zi(sos)  # (S, 2)
        x0 = eeg[..., :1]
        ours, zf_ours = sosfilt_pallas(
            sos, jnp.asarray(eeg), zi=jnp.asarray(zi * x0[..., None]), interpret=True
        )
        # scipy wants zi as (n_sections, ..batch.., 2)
        zi_ref = zi[:, None, None, :] * x0[None, :, :, :].astype(np.float64)
        ref, zf_ref = sps.sosfilt(sos, eeg.astype(np.float64), axis=-1, zi=zi_ref)
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=RTOL, atol=RTOL * np.abs(ref).max()
        )
        # final state parity (the streaming/chunked-continuation contract)
        zf_ref_ours_layout = np.moveaxis(zf_ref, 0, -2)  # (..., S, 2)
        np.testing.assert_allclose(
            np.asarray(zf_ours), zf_ref_ours_layout,
            rtol=RTOL, atol=RTOL * np.abs(zf_ref).max(),
        )

    def test_chunked_continuation_matches_whole(self, eeg):
        """Filtering in two chunks with the returned zf must equal one
        whole-signal pass (the drop-in sosfilt streaming contract)."""
        sos = butter_sos(250.0, 4.0, 40.0, 2)
        x = jnp.asarray(eeg)
        zi0 = jnp.zeros(eeg.shape[:-1] + (sos.shape[0], 2), x.dtype)
        whole, _ = sosfilt_pallas(sos, x, zi=zi0, interpret=True)
        t_half = eeg.shape[-1] // 2
        y1, zf = sosfilt_pallas(sos, x[..., :t_half], zi=zi0, interpret=True)
        y2, _ = sosfilt_pallas(sos, x[..., t_half:], zi=zf, interpret=True)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1),
            np.asarray(whole), rtol=1e-5, atol=1e-5,
        )

    def test_odd_row_count_covered(self):
        """Row counts that don't divide the tile must still be computed
        (regression: grid under-coverage left garbage in the tail)."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=(37, 3, 100)).astype(np.float32)  # 111 rows
        sos = butter_sos(100.0, 2.0, 20.0, 2)
        ours = np.asarray(sosfilt_pallas(sos, jnp.asarray(x), row_tile=128, interpret=True))
        ref = sps.sosfilt(sos, x.astype(np.float64), axis=-1)
        assert np.isfinite(ours).all()
        np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=RTOL * np.abs(ref).max())


class TestSosfiltfiltPallas:
    def test_matches_scipy(self, eeg):
        sos = butter_sos(250.0, 4.0, 40.0, 4)
        ours = np.asarray(sosfiltfilt_pallas(sos, jnp.asarray(eeg), interpret=True))
        ref = sps.sosfiltfilt(sos, eeg.astype(np.float64), axis=-1)
        np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=RTOL * np.abs(ref).max())

    def test_matches_xla_path(self, eeg):
        from imagined_speech_decoding_tpu.ops import sosfiltfilt

        sos = butter_sos(250.0, 8.0, 30.0, 3)
        a = np.asarray(sosfiltfilt_pallas(sos, jnp.asarray(eeg), interpret=True))
        b = np.asarray(sosfiltfilt(sos, jnp.asarray(eeg)))
        np.testing.assert_allclose(a, b, rtol=RTOL, atol=RTOL * np.abs(b).max())

    def test_jit_compatible(self, eeg):
        sos = butter_sos(250.0, 4.0, 40.0, 2)
        f = jax.jit(lambda x: sosfiltfilt_pallas(sos, x, interpret=True))
        y = np.asarray(f(jnp.asarray(eeg)))
        assert y.shape == eeg.shape and np.isfinite(y).all()
