"""Native cache (libeegcache) tests: build, round-trip, sliced reads,
error paths. Skipped when no C++ toolchain is available."""

import numpy as np
import pytest

from imagined_speech_decoding_tpu.data import fastcache

pytestmark = pytest.mark.skipif(
    not fastcache.available(), reason="libeegcache not buildable (no g++)"
)


class TestFastCache:
    def test_round_trip_f32(self, tmp_dir):
        rng = np.random.default_rng(0)
        arr = rng.normal(size=(7, 4, 50)).astype(np.float32)
        path = fastcache.write_cache(f"{tmp_dir}/c.eegc", arr)
        with fastcache.FastCache(path) as c:
            assert c.shape == (7, 4, 50)
            assert c.dtype == np.float32
            np.testing.assert_array_equal(c.read_all(), arr)

    def test_round_trip_u8(self, tmp_dir):
        arr = np.random.default_rng(1).integers(0, 5, (30,)).astype(np.uint8)
        path = fastcache.write_cache(f"{tmp_dir}/y.eegc", arr)
        with fastcache.FastCache(path) as c:
            np.testing.assert_array_equal(c.read_all(), arr)

    def test_read_rows(self, tmp_dir):
        arr = np.arange(6 * 3 * 4, dtype=np.float32).reshape(6, 3, 4)
        path = fastcache.write_cache(f"{tmp_dir}/r.eegc", arr)
        with fastcache.FastCache(path) as c:
            np.testing.assert_array_equal(c.read_rows(2, 3), arr[2:5])
            with pytest.raises(IOError):
                c.read_rows(4, 5)  # out of range

    def test_threaded_read_matches(self, tmp_dir):
        arr = np.random.default_rng(2).normal(size=(64, 64, 100)).astype(np.float32)
        path = fastcache.write_cache(f"{tmp_dir}/big.eegc", arr)
        with fastcache.FastCache(path) as c:
            np.testing.assert_array_equal(c.read_all(n_threads=1), arr)
            np.testing.assert_array_equal(c.read_all(n_threads=7), arr)

    def test_bad_file_rejected(self, tmp_dir):
        path = f"{tmp_dir}/junk.eegc"
        with open(path, "wb") as f:
            f.write(b"not a cache file at all........")
        with pytest.raises(IOError):
            fastcache.FastCache(path)

    def test_bad_dtype_rejected(self, tmp_dir):
        with pytest.raises(TypeError):
            fastcache.write_cache(f"{tmp_dir}/x.eegc", np.zeros(3, np.float64))


def test_closed_reader_raises_not_segfaults(tmp_path):
    from imagined_speech_decoding_tpu.data import fastcache

    if not fastcache.available():
        pytest.skip("no native toolchain")
    import numpy as np

    p = str(tmp_path / "c.eegc")
    fastcache.write_cache(p, np.arange(12, dtype=np.float32).reshape(3, 4))
    fc = fastcache.FastCache(p)
    fc.close()
    with pytest.raises(RuntimeError, match="closed"):
        fc.read_all()
    with pytest.raises(RuntimeError, match="closed"):
        fc.read_rows(0, 1)
