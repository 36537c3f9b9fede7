import pathlib

import numpy as np
import pytest

import quadrs_tpu as q
from quadrs_tpu.models.demod import FskDemod, OokDemod, manchester_decode

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"


def test_manchester_decode():
    # bit1 = (1,0), bit0 = (0,1)
    raw = [True, False, False, True, True, False]
    assert manchester_decode(raw) == [1, 0, 1]
    # phase-shifted stream still decodes (leading pad)
    assert manchester_decode([False] + raw + [True]) == [1, 0, 1]


def test_ook_demod_recovers_payload():
    src = q.open_capture(str(EXAMPLES / "ook-sim.sr400.cf32"))
    demod = OokDemod(width=4, stride=2, threshold=0.001, samples_per_bit=16.0)
    bits = demod.decode_manchester(src)
    s = "".join(str(b) for b in bits)
    # preamble 00011 then payload byte 00011000 (0x18)
    assert "00011" + "00011000" in s


def test_fsk_demod_symbols_alternate():
    src = q.open_capture(str(EXAMPLES / "fsk-sim.sr48k.cf32"))
    demod = FskDemod(center=0, bandwidth=8_000, decimate=4, taps=40, fft_width=64, stride=600)
    syms = demod.symbols(src)
    assert len(syms) > 8
    flips = sum(a != b for a, b in zip(syms, syms[1:]))
    assert flips >= len(syms) // 3


def test_fsk_demod_on_reference_capture():
    path = pathlib.Path("/root/reference/examples/fsk-example.sr21M.fc32")
    if not path.exists():
        pytest.skip("reference capture unavailable")
    src = q.open_capture(str(path))
    demod = FskDemod(center=280_000)
    syms = demod.symbols(src)
    assert len(syms) == 94  # (6140-64)//64 windows
    assert set(syms) <= {0, 1}


def test_fsk_demod_under_noise():
    """End-to-end SNR robustness: alternating FSK symbols synthesized
    with `gen -noise`-style seeded noise still demodulate exactly."""
    import numpy as np

    from quadrs_tpu.models.demod import FskDemod
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.sources import SampleSource, ToneGen

    sr, sym = 48_000, 600  # samples per symbol
    n_sym = 40
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, n_sym)
    # two tones +/-4 kHz around a 6 kHz channel center
    t = np.arange(n_sym * sym) / sr
    f = np.where(np.repeat(bits, sym), 6_000 + 4_000, 6_000 - 4_000)
    phase = 2 * np.pi * np.cumsum(f) / sr
    iq = np.exp(1j * phase).astype(np.complex64)
    # seeded noise at sigma 0.3 per component (SNR ~ 4.4 dB per sample)
    noise_src = ToneGen([1], sr, n_sym * sym / sr, noise=0.3, seed=9)
    nz, _ = noise_src.read_at(0, len(iq))
    clean_src = ToneGen([1], sr, n_sym * sym / sr)
    cl, _ = clean_src.read_at(0, len(iq))
    iq = iq + (np.asarray(nz) - np.asarray(cl))
    raw = np.empty(2 * len(iq), dtype="<f4")
    raw[0::2] = iq.real
    raw[1::2] = iq.imag
    src = SampleSource(np.frombuffer(raw.tobytes(), dtype=np.uint8),
                       FileFormat.COMPLEX_FLOAT32, sr)
    demod = FskDemod(center=-6_000, bandwidth=8_000, decimate=4, taps=64,
                     fft_width=64, stride=sym // 4)
    syms = np.asarray(demod.symbols(src))
    # one window per symbol: stride = one symbol's worth of channel
    # samples, and the 64-sample window sits inside the symbol (group
    # delay ~8 channel samples << the 150-sample period); the trailing
    # symbols may fall off the window count
    assert len(syms) >= n_sym - 2
    got = [int(v) for v in syms[: min(n_sym, len(syms))]]
    # bit 1 = the +4 kHz tone, which after the -6 kHz shift lands in the
    # UNSHIFTED spectrum's first half -> bucket symbol 1
    want = [int(b) for b in bits][: len(got)]
    assert got == want


def _force_executor(monkeypatch):
    """Disable the streaming strided front end so the windowed Executor
    path (the pinned semantics) runs."""
    from quadrs_tpu.models import demod as dm

    monkeypatch.setattr(dm, "_strided_windows_dev", lambda *a, **k: None)


def test_freq_levels_streaming_matches_executor(monkeypatch):
    """The streaming strided front end must agree with the windowed
    Executor path on a full shift->lowpass chain (values agree to f32
    rounding of the mix; comparator flips need a near-tie)."""
    from quadrs_tpu import sinks
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.sources import SampleSource
    from quadrs_tpu.stream import LowPass, Shift

    rng = np.random.default_rng(77)
    data = (rng.normal(size=9000) + 1j * rng.normal(size=9000)).astype(np.complex64)
    src = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, 48_000
    )
    chain = LowPass(Shift(src, 7_000, 48_000), 8_000, 4, 40)
    fast = sinks.freq_levels(chain, 32, 20).vals
    _force_executor(monkeypatch)
    slow = sinks.freq_levels(chain, 32, 20).vals
    assert len(fast) == len(slow) > 50
    diffs = sum(a != b for a, b in zip(fast, slow))
    assert diffs <= max(1, len(slow) // 500)


def test_ook_pulses_streaming_matches_executor(monkeypatch):
    """OOK envelope flags: streaming bare-source windows are bit-exact
    vs the Executor path (identical decode, no mix), and a shift-only
    chain agrees within comparator-flip tolerance."""
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.sources import SampleSource
    from quadrs_tpu.stream import Shift

    rng = np.random.default_rng(78)
    data = (rng.normal(size=6000) + 1j * rng.normal(size=6000)).astype(
        np.complex64
    ) * np.float32(0.02)
    src = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, 400
    )
    demod = OokDemod(width=4, stride=2, threshold=0.05)
    fast_bare = demod.pulses(src)
    fast_shift = demod.pulses(Shift(src, 60, 400))
    _force_executor(monkeypatch)
    assert np.array_equal(fast_bare, demod.pulses(src))
    slow_shift = demod.pulses(Shift(src, 60, 400))
    assert fast_shift.shape == slow_shift.shape
    assert np.mean(fast_shift != slow_shift) < 0.002


def test_ook_pulses_overlapped_stride_streams(monkeypatch):
    """stride-1 width-16 windows (heavily overlapped) used to be
    Executor-only — the frame duplication guard rejected the streaming
    path; the banded chunk-level envelope never builds the frames, so
    it streams now and must match the Executor flags (same DFT;
    matmul-accumulation flag flips need a near-tie)."""
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.sources import SampleSource

    rng = np.random.default_rng(79)
    data = (rng.normal(size=5000) + 1j * rng.normal(size=5000)).astype(
        np.complex64
    ) * np.float32(0.02)
    src = SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, 400
    )
    demod = OokDemod(width=16, stride=1, threshold=0.15)
    fast = demod.pulses(src)
    _force_executor(monkeypatch)
    slow = demod.pulses(src)
    assert fast.shape == slow.shape
    assert np.mean(np.asarray(fast) != np.asarray(slow)) < 0.002
