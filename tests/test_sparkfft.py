import numpy as np
import pytest

from oracle import OracleArray, OracleGen, oracle_fft_norms, oracle_spark_fft
from quadrs_tpu import sinks
from quadrs_tpu.formats import FileFormat, decode_bytes
from quadrs_tpu.sources import SampleSource, ToneGen


def test_glyph_quantization_boundaries():
    norms = np.array(
        [[0.0, 0.0799, 0.08, 0.08 + 0.132, 0.5, 0.999, 1.0, 5.0]], dtype=np.float32
    )
    rows = sinks.glyph_rows(norms, 0.08, 1.0)
    # distinction = (1.0 - 0.08)/7 = 0.13142857...
    assert rows == [" " + " " + "▁" + "▂" + "▄" + "▇" + "█" + "█"]


def test_sparkfft_matches_oracle_on_gen():
    g = ToneGen([21, -53], 400, 1.0)
    o = OracleGen([21, -53], 400, 1.0)
    got = sinks.spark_fft(g, width=64, stride=32)
    want = oracle_spark_fft(o, 64, 32)
    assert got[0] == "sparkfft sample_rate=400"
    body = [r.strip("│") for r in got[1:]]
    assert len(body) == len(want)
    # on arbitrary gen data a norm can sit within f32 noise of a glyph
    # quantization boundary, where pipeline-vs-oracle rounding may
    # legitimately land on adjacent glyphs.  Exclude exactly those
    # boundary-straddling norms (same margin logic as
    # test_ook_quantization_margins) and demand EXACT equality on every
    # other glyph.
    lo, hi = np.float32(0.08), np.float32(1.0)
    step = (hi - lo) / np.float32(7)
    bounds = np.concatenate([[lo, hi], lo + step * np.arange(1, 7)])
    checked = 0
    for row, (i, ra, rb) in enumerate(zip(range(0, o.length - 64, 32), body, want)):
        norms = oracle_fft_norms(o.read_at(i, 64))
        margins = np.abs(bounds[None, :] - norms[:, None]).min(axis=1) / np.maximum(
            norms, 1e-12
        )
        for a, b, m in zip(ra, rb, margins):
            if m > 1e-5:
                assert a == b, f"row {row}: non-boundary glyph {a!r} != {b!r} (margin {m})"
                checked += 1
    # the exclusion must not have eaten the test
    assert checked >= 0.99 * sum(len(r) for r in want)


def test_sparkfft_window_count():
    # while i < len - width, step stride (src/fft.rs:27-65)
    g = ToneGen([5], 400, 1.0)  # len 400
    rows = sinks.spark_fft(g, width=64, stride=64)
    assert len(rows) - 1 == len(range(0, 400 - 64, 64))


def test_ook_capture_bit_match(ook_capture):
    """BASELINE config[0]: the OOK fixture through
    ``sparkfft -width 4 -stride 2 -range 0.001:0.01`` must glyph-match."""
    raw = np.fromfile(ook_capture, dtype=np.uint8)
    data = decode_bytes(raw, FileFormat.COMPLEX_FLOAT32)
    assert len(data) == 1994

    src = SampleSource(raw, FileFormat.COMPLEX_FLOAT32, 400)
    got = sinks.spark_fft(src, width=4, stride=2, lo=0.001, hi=0.01)

    want = oracle_spark_fft(OracleArray(data, 400), 4, 2, 0.001, 0.01)
    assert got[0] == "sparkfft sample_rate=400"
    body = [r.strip("│") for r in got[1:]]
    assert len(body) == len(want)
    mismatches = [i for i, (a, b) in enumerate(zip(body, want)) if a != b]
    assert mismatches == []


def test_ook_quantization_margins(ook_capture):
    """The glyph boundaries must not sit within f32 noise of the data,
    otherwise 'bit-match' would be implementation-defined."""
    raw = np.fromfile(ook_capture, dtype=np.uint8)
    data = decode_bytes(raw, FileFormat.COMPLEX_FLOAT32)
    o = OracleArray(data, 400)
    lo, hi = np.float32(0.001), np.float32(0.01)
    step = (hi - lo) / np.float32(7)
    margins = []
    i = 0
    while i < o.length - 4:
        norms = oracle_fft_norms(o.read_at(i, 4))
        for n in norms:
            # distance to the nearest decision boundary, relative to value
            bounds = np.concatenate([[lo, hi], lo + step * np.arange(1, 7)])
            margins.append(np.abs(bounds - n).min() / max(n, 1e-12))
        i += 2
    assert min(margins) > 1e-5  # far beyond f32 rounding of the pipeline
