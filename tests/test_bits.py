import numpy as np
import pytest

from quadrs_tpu.bits import run_of, scan


def parse(s: str) -> list[bool]:
    return [c == "1" for c in s if c in "01"]


def test_run_of_reference_cases():
    # the reference's own unit test (src/bits.rs:57-69)
    assert run_of(parse("0000"), 2, False) == 4
    assert run_of(parse("00001000111"), 2, False) == 8


def test_run_of_more():
    assert run_of(parse("111100"), 1, True) == 4
    # a contrary burst that never exceeds the tolerance: whole buffer
    assert run_of(parse("1"), 2, False) == 1
    assert run_of(parse(""), 2, False) == 0
    # tolerance zero: stops at the first contrary sample
    assert run_of(parse("0010"), 0, False) == 2


def _scan_reference(data, scale):
    """Literal sequential transcription of src/bits.rs:3-38 for cross-check."""
    i = 0
    half = int(np.floor(scale / 2.0 + 0.5))
    bit = False
    error = 0.0
    ret = []
    while i != len(data):
        found = run_of(data[i:], half, bit)
        i += found
        if found <= half:
            continue
        bits = found / scale
        rounded = float(np.floor(bits + 0.5))
        error += abs(bits - rounded)
        ret.extend([bit] * int(rounded))
        bit = not bit
    return error, ret


def test_scan_simple_pulses():
    # 8 samples per bit: 0 0 1 1 0
    data = parse("00000000" "00000000" "11111111" "11111111" "00000000")
    error, bits = scan(data, 8.0)
    assert bits == [False, False, True, True, False]
    assert error < 1e-9


def test_scan_with_glitches_and_jitter():
    data = parse("0000000" "000100000" "1111111" "11011111" "0000000100")
    error, bits = scan(data, 8.0)
    want_error, want_bits = _scan_reference(data, 8.0)
    assert bits == want_bits
    assert error == pytest.approx(want_error)


def test_scan_matches_reference_on_random_streams():
    rng = np.random.default_rng(11)
    for scale in (4.0, 7.5, 16.0):
        # random bit stream expanded to pulses with jitter and noise
        bits_in = rng.integers(0, 2, 40).astype(bool)
        samples = []
        val = False
        for b in bits_in:
            run = int(scale) + int(rng.integers(-1, 2))
            samples.extend([val] * run)
            val = not val
        noisy = np.array(samples)
        flips = rng.integers(0, len(noisy), 5)
        noisy[flips] = ~noisy[flips]
        got = scan(noisy, scale)
        want = _scan_reference(list(noisy), scale)
        assert got[1] == want[1]
        assert got[0] == pytest.approx(want[0])


def test_scan_of_ook_capture(ook_capture):
    """End-to-end: the README's OOK shell workflow (README.md:122-186)
    with bits.scan instead of sed: sparkfft rows -> blank/non-blank
    pulses -> clock recovery at 8 rows/bit -> the documented Manchester
    payload (first byte 00011000 = 24)."""
    import quadrs_tpu as q
    from quadrs_tpu import sinks

    src = q.open_capture(str(ook_capture))
    rows = sinks.spark_fft(src, width=4, stride=2, lo=0.001, hi=0.01)[1:]
    pulses = [any(c != " " for c in r.strip("│")) for r in rows]
    error, bits = scan(pulses, 8.0)
    assert len(bits) > 50
    s = "".join("1" if b else "0" for b in bits)
    # Manchester with A=pulse(1), B=gap(0): bit0 = "10", bit1 = "01";
    # first payload byte 00011000 (README.md:181-186)
    manchester_24 = "10" * 3 + "01" * 2 + "10" * 3
    assert manchester_24 in s


def test_scan_stream_starting_high_terminates():
    """The reference's scan spins forever when the stream opens with a
    long run of True (run_of returns 0 and nothing advances,
    src/bits.rs:9-35); we flip the expected bit and continue."""
    data = parse("1111111111111111" "00000000" "11111111")
    error, bits = scan(data, 8.0)
    assert bits == [True, True, False, True]

    # pathological mid-stream flip-flop also terminates
    data = parse("111111111111" + "000000000000" + "111111111111")
    error, bits = scan(data, 8.0)
    assert len(bits) >= 3
