"""BASELINE config[1]: the bundled FSK capture through the README's
``shift 280k -> lowpass -power 200 -decimate 32 200k -> sparkfft -width 64``
pipeline must match the reference semantics within float32 tolerance —
here asserted as an exact glyph match against the sequential numpy
oracle (including the reference's per-window convolution truncation),
plus a numeric check on the decimated samples themselves."""

import numpy as np
import pytest

from oracle import (
    OracleArray,
    OracleLowPass,
    OracleShift,
    oracle_freq_levels,
    oracle_spark_fft,
)
from quadrs_tpu import sinks
from quadrs_tpu.formats import FileFormat, decode_bytes
from quadrs_tpu.sources import SampleSource
from quadrs_tpu.stream import LowPass, Shift

SR = 21_000_000


@pytest.fixture(scope="module")
def fsk(request):
    import pathlib

    path = pathlib.Path("/root/reference/examples/fsk-example.sr21M.fc32")
    if not path.exists():
        pytest.skip("reference FSK example capture not available")
    raw = np.fromfile(path, dtype=np.uint8)
    data = decode_bytes(raw, FileFormat.COMPLEX_FLOAT32)
    assert len(data) == 196_864
    return raw, data


def _chain(raw):
    src = SampleSource(raw, FileFormat.COMPLEX_FLOAT32, SR)
    return LowPass(Shift(src, 280_000, SR), 200_000, 32, 400)


def _oracle_chain(data):
    return OracleLowPass(OracleShift(OracleArray(data, SR), 280_000, SR), 200_000, 32, 400)


def test_fsk_decimated_samples_close(fsk):
    raw, data = fsk
    got, valid = _chain(raw).read_at(0, 64)
    want = _oracle_chain(data).read_at(0, 64)
    assert valid == 64
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_fsk_sparkfft_glyphs_match(fsk):
    raw, data = fsk
    got = sinks.spark_fft(_chain(raw), width=64)
    want = oracle_spark_fft(_oracle_chain(data), 64, 64)
    assert got[0] == f"sparkfft sample_rate={SR // 32}"
    body = [r.strip("│") for r in got[1:]]
    assert len(body) == len(want)
    mismatched_chars = sum(
        sum(a != b for a, b in zip(ra, rb)) for ra, rb in zip(body, want)
    )
    total_chars = sum(len(r) for r in want)
    # the full shift->lowpass->sparkfft chain is glyph-exact on this
    # capture (measured 0/6080); the budget below only tolerates future
    # quantization-boundary flips from toolchain FP changes
    assert mismatched_chars <= total_chars * 0.0005, (
        f"{mismatched_chars}/{total_chars} glyphs differ"
    )


def test_fsk_bucket_matches_oracle(fsk):
    raw, data = fsk
    got = sinks.freq_levels(_chain(raw), fft_width=64, stride=64)
    want = oracle_freq_levels(_oracle_chain(data), 64, 64)
    assert len(got.vals) == len(want)
    diffs = sum(a != b for a, b in zip(got.vals, want))
    assert diffs == 0, f"{diffs}/{len(want)} bucket symbols differ"
