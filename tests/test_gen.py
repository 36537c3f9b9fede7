import numpy as np
import pytest

from oracle import OracleGen
from quadrs_tpu.sources import ToneGen


def test_gen_matches_oracle_single_tone():
    g = ToneGen([20], 400, 1.0)
    o = OracleGen([20], 400, 1.0)
    got, valid = g.read_at(0, 400)
    assert valid == 400
    np.testing.assert_allclose(got, o.read_at(0, 400), atol=3e-7)


def test_gen_matches_oracle_multi_tone_offset():
    g = ToneGen([-7000, 1, 12_345], 48_000, 0.25)
    o = OracleGen([-7000, 1, 12_345], 48_000, 0.25)
    got, valid = g.read_at(777, 512)
    assert valid == 512
    np.testing.assert_allclose(got, o.read_at(777, 512), atol=4e-6)


def test_gen_phase_coherent_at_huge_offsets():
    # absolute-index phase must stay exact far beyond f32 range
    g = ToneGen([333], 48_000, 1.0)
    off = 3_000_000_000_017
    got, _ = g.read_at(off, 8)
    want = np.array(
        [
            np.exp(2j * np.pi * ((333 * (off + k)) % 48_000) / 48_000)
            for k in range(8)
        ],
        dtype=np.complex64,
    )
    np.testing.assert_allclose(got, want, atol=3e-7)


def test_gen_length_truncates():
    assert ToneGen([1], 400, 1.0).length == 400
    assert ToneGen([1], 400, 0.9999).length == 399  # f64 multiply, trunc
    assert ToneGen([1], 3, 0.5).length == 1


def test_gen_always_fills():
    g = ToneGen([10], 100, 0.1)  # length 10
    got, valid = g.read_at(8, 64)
    assert valid == 64  # reference Gen ignores its len (src/gen.rs:35-47)
    assert np.all(np.abs(got) > 0.99)


def test_gen_validation():
    with pytest.raises(ValueError):
        ToneGen([], 400, 1.0)
    with pytest.raises(ValueError):
        ToneGen([1], 0, 1.0)
    with pytest.raises(ValueError):
        ToneGen([1], 400, 0.0)
