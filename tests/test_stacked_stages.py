"""Arbitrary stage stacking: the reference lets any operation wrap any
other (src/bin/quadrs.rs:48-57); the batched executor must recurse
through multiple wrapped stages with the same per-read semantics."""

import numpy as np
import pytest

from oracle import OracleArray, OracleLowPass, OracleShift
from quadrs_tpu.formats import FileFormat
from quadrs_tpu.sources import SampleSource
from quadrs_tpu.stream import LowPass, Shift


def _capture(n=20000, sr=96_000, seed=31):
    rng = np.random.default_rng(seed)
    data = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    src = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    )
    return src, OracleArray(data, sr)


def test_double_lowpass_matches_oracle():
    src, osrc = _capture()
    chain = LowPass(LowPass(src, 8000, 4, 32), 2000, 4, 32)
    ochain = OracleLowPass(OracleLowPass(osrc, 8000, 4, 32), 2000, 4, 32)
    assert chain.sample_rate == 96_000 // 16
    got, valid = chain.read_at(0, 64)
    want = ochain.read_at(0, 64)
    assert valid == len(want)
    np.testing.assert_allclose(got[:valid], want, atol=2e-5)


def test_shift_lowpass_shift_lowpass_matches_oracle():
    src, osrc = _capture()
    chain = LowPass(
        Shift(LowPass(Shift(src, 10_000, 96_000), 12_000, 4, 40), 2_000, 24_000),
        3_000,
        2,
        40,
    )
    ochain = OracleLowPass(
        OracleShift(
            OracleLowPass(OracleShift(osrc, 10_000, 96_000), 12_000, 4, 40),
            2_000,
            24_000,
        ),
        3_000,
        2,
        40,
    )
    got, valid = chain.read_at(5, 128)
    want = ochain.read_at(5, 128)
    assert valid == len(want)
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(got[:valid], want, atol=3e-5 * scale)


def test_write_after_lowpass_short_read_parity(tmp_path):
    """With heavy decimation the claimed length over-reports and the
    final pull yields zero samples — the reference panics with 'short
    read' (src/lib.rs:203); we raise the equivalent error."""
    from quadrs_tpu import sinks

    src, _ = _capture(n=144_000, sr=48_000)
    lp = LowPass(src, 1000, 32, 400)
    # len = 1 + (144000-400)//32 = 4488, but the pull at offset 4487
    # reads only 416 raw samples -> (416-400)//32 == 0 output samples
    with pytest.raises(RuntimeError, match="short read"):
        sinks.do_write(lp, False, str(tmp_path / "t"))
