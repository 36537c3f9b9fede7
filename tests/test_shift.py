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


def test_shift_huge_sample_rate():
    # the reference's f64 NCO accepts any u64 rate (src/shift.rs:28);
    # ExactNCO's bigint path covers sr >= 2^31 (`-sr 3G` parses fine)
    sr = 3_000_000_000
    src, osrc = _capture(sr=sr)
    got, _ = Shift(src, 280_000, sr).read_at(0, 2048)
    want = OracleShift(osrc, 280_000, sr).read_at(0, 2048)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_exact_nco_bigint_reduction():
    # bigint path must agree with the exact closed form at huge absolute
    # offsets, including rates past 2^63 (u64 range)
    from quadrs_tpu.ops.nco import TAU, ExactNCO

    for f, sr in [(280_000, 3_000_000_000), (123_457, (1 << 63) + 9)]:
        nco = ExactNCO(f, sr)
        idx = np.asarray([0, 1, 7, 3_000_000_000_017, (1 << 62) + 5], dtype=np.int64)
        got = nco.angles(idx, dtype=np.float64)
        want = np.asarray(
            [float((int(i) * f) % sr) * (TAU / sr) for i in idx], dtype=np.float64
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)
        # cis tables go through the same path
        c, s = nco.cis(idx)
        np.testing.assert_allclose(c, np.cos(want).astype(np.float32), atol=2e-7)
