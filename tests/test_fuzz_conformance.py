"""Seeded fuzz: random pipelines and pull patterns vs the oracle.

Randomizes stage composition (shift/lowpass chains), parameters, and
read offsets/lengths, then checks the batched executor against the
sequential numpy oracle — broad-spectrum conformance evidence beyond the
hand-picked configurations.
"""

import numpy as np
import pytest

from oracle import OracleArray, OracleGen, OracleLowPass, OracleShift
from quadrs_tpu.formats import FileFormat
from quadrs_tpu.sources import SampleSource, ToneGen
from quadrs_tpu.stream import LowPass, Shift


def _random_chain(rng, n, sr):
    data = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    stream = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    )
    oracle = OracleArray(data, sr)

    n_stages = rng.integers(1, 4)
    for _ in range(n_stages):
        kind = rng.choice(["shift", "lowpass"])
        if kind == "shift":
            limit = stream.sample_rate // 2
            if limit < 2:
                continue
            f = int(rng.integers(-(limit - 1), limit))
            stream = Shift(stream, f, stream.sample_rate)
            oracle = OracleShift(oracle, f, oracle.sample_rate)
        else:
            size = int(rng.choice([8, 16, 40, 64]))
            dec = int(rng.choice([1, 2, 3, 4, 8]))
            if stream.length < size * 4:
                continue
            freq = int(rng.integers(1, max(2, stream.sample_rate // 3)))
            stream = LowPass(stream, freq, dec, size)
            oracle = OracleLowPass(oracle, freq, dec, size)
    return stream, oracle


@pytest.mark.parametrize("seed", range(12))
def test_random_pipeline_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(4000, 20000))
    sr = int(rng.choice([8_000, 44_100, 96_000, 1_000_000]))
    stream, oracle = _random_chain(rng, n, sr)

    for _ in range(3):
        max_off = max(1, stream.length - 16)
        off = int(rng.integers(0, max_off))
        count = int(rng.integers(8, 200))
        got, valid = stream.read_at(off, count)
        try:
            want = oracle.read_at(off, count)
        except RuntimeError:
            continue  # oracle would panic (reference behavior); skip pull
        assert valid == len(want), (off, count)
        if valid:
            scale = max(np.abs(want).max(), 1e-3)
            np.testing.assert_allclose(
                got[:valid], want, atol=5e-5 * scale, err_msg=f"off={off} n={count}"
            )


@pytest.mark.parametrize("seed", range(6))
def test_random_gen_pipeline_matches_oracle(seed):
    rng = np.random.default_rng(2000 + seed)
    sr = int(rng.choice([400, 4_000, 48_000]))
    tones = [int(rng.integers(-(sr // 2) + 1, sr // 2)) for _ in range(rng.integers(1, 4))]
    secs = float(rng.uniform(0.2, 1.5))
    stream = ToneGen(tones, sr, secs)
    oracle = OracleGen(tones, sr, secs)
    for _ in range(3):
        off = int(rng.integers(0, max(1, stream.length)))
        count = int(rng.integers(8, 300))
        got, valid = stream.read_at(off, count)
        want = oracle.read_at(off, count)
        assert valid == count
        np.testing.assert_allclose(got, want, atol=len(tones) * 1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_random_sparkfft_params_match_oracle(seed):
    from oracle import oracle_spark_fft
    from quadrs_tpu import sinks

    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(1500, 8000))
    sr = int(rng.choice([400, 48_000]))
    data = (0.3 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
    stream = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    )
    oracle = OracleArray(data, sr)

    width = int(rng.choice([4, 8, 16, 64, 128]))
    stride = int(rng.integers(1, 3 * width))
    lo = float(rng.uniform(0.01, 0.3))
    hi = lo + float(rng.uniform(0.5, 2.0))

    got = [r.strip("│") for r in sinks.spark_fft(stream, width, stride, lo, hi)[1:]]
    want = oracle_spark_fft(oracle, width, stride, lo, hi)
    assert len(got) == len(want), (width, stride)
    mism = sum(sum(a != b for a, b in zip(ra, rb)) for ra, rb in zip(got, want))
    total = max(1, sum(len(r) for r in want))
    assert mism <= total * 0.001, f"{mism}/{total} glyphs (w={width}, s={stride})"


@pytest.mark.parametrize("seed", range(6))
def test_random_bucket_params_match_oracle(seed):
    from oracle import oracle_freq_levels
    from quadrs_tpu import sinks

    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(2000, 9000))
    data = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    stream = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, 48_000
    )
    oracle = OracleArray(data, 48_000)
    width = int(rng.choice([8, 32, 64, 256]))
    stride = int(rng.integers(1, 2 * width))
    got = sinks.freq_levels(stream, width, stride).vals
    want = oracle_freq_levels(oracle, width, stride)
    assert len(got) == len(want)
    diffs = sum(a != b for a, b in zip(got, want))
    assert diffs <= max(1, len(want) // 500), (width, stride, diffs)
