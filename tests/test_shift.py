import numpy as np
import pytest

from oracle import OracleArray, OracleShift
from quadrs_tpu.formats import FileFormat
from quadrs_tpu.sources import SampleSource
from quadrs_tpu.stream import Shift


def _capture(n=4096, sr=48_000, seed=3):
    rng = np.random.default_rng(seed)
    data = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    src = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    )
    return src, OracleArray(data, sr)


def test_shift_matches_oracle():
    src, osrc = _capture()
    got, valid = Shift(src, 1234, 48_000).read_at(0, 4096)
    want = OracleShift(osrc, 1234, 48_000).read_at(0, 4096)
    assert valid == 4096
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_shift_negative_frequency():
    src, osrc = _capture()
    got, _ = Shift(src, -9999, 48_000).read_at(100, 1000)
    want = OracleShift(osrc, -9999, 48_000).read_at(100, 1000)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_shift_random_access_phase_coherent():
    # read_at(k, n) must equal the slice of read_at(0, k+n): absolute-index
    # phase, reference src/shift.rs:49
    src, _ = _capture()
    sh = Shift(src, 777, 48_000)
    whole, _ = sh.read_at(0, 2048)
    part, _ = sh.read_at(1500, 256)
    np.testing.assert_allclose(part, whole[1500:1756], atol=5e-6)


def test_shift_preserves_len_and_rate():
    src, _ = _capture()
    sh = Shift(src, 1000, 48_000)
    assert sh.length == src.length
    assert sh.sample_rate == 48_000


def test_shift_rejects_fast_frequencies():
    src, _ = _capture()
    with pytest.raises(ValueError):
        Shift(src, 24_000, 48_000)
    with pytest.raises(ValueError):
        Shift(src, -24_000, 48_000)
    # just under the limit is fine (reference: abs(f) < sr/2)
    Shift(src, 23_999, 48_000)


def test_shift_short_read_passthrough():
    src, _ = _capture(n=100)
    got, valid = Shift(src, 10, 48_000).read_at(90, 64)
    assert valid == 10
    assert np.all(got[10:] == 0)
