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
