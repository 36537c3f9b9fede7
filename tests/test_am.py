"""AM demodulator model + ``quadjax am`` CLI.

Like FM (see test_fm.py), there is no reference counterpart: the
contract is the model's own — the envelope ``|x[n]|`` of the
shift->lowpass channel pulled in ``chunk``-sized windows, normalized to
modulation-depth units by the capture-mean carrier estimate.
"""

from __future__ import annotations

import numpy as np
import pytest

from quadrs_tpu.models.demod import AmDemod

from oracle import OracleArray, OracleLowPass
from test_fm import cf32_source

TAU = 2.0 * np.pi


def am_iq(modulation: np.ndarray) -> np.ndarray:
    """Baseband AM: a real positive envelope around a unit carrier at
    DC (shift the capture first if the carrier is offset)."""
    return (1.0 + np.asarray(modulation, dtype=np.float64)).astype(np.complex64)


def oracle_envelope(
    data: np.ndarray, sr: int, bw: int, dec: int, taps: int, chunk: int
) -> tuple[int, np.ndarray]:
    chan = OracleLowPass(OracleArray(data, sr), bw, dec, taps)
    out = np.empty(chan.length, dtype=np.float32)
    c = min(chunk, chan.length)
    o = 0
    while o < chan.length:
        x = chan.read_at(o, c)
        v = len(x)
        out[o : o + v] = np.abs(x).astype(np.float32)
        if v < c:
            return chan.sample_rate, out[: o + v]
        o += c
    return chan.sample_rate, out


@pytest.mark.parametrize("chunk", [313, 1024])
def test_envelope_matches_oracle(chunk):
    rng = np.random.default_rng(3)
    sr, bw, dec, taps = 100_000, 8_000, 4, 80
    n = 30_000
    t = np.arange(n) / sr
    mod = 0.5 * np.sin(TAU * 400.0 * t) + 0.2 * np.cos(TAU * 90.0 * t)
    x = am_iq(mod)
    src = cf32_source(x, sr)

    demod = AmDemod(bandwidth=bw, decimate=dec, taps=taps, chunk=chunk)
    rate, got = demod.envelope(src)
    want_rate, want = oracle_envelope(x, sr, bw, dec, taps, chunk)
    assert rate == want_rate == sr // dec
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_tone_recovery():
    """A 200 Hz tone at modulation depth 0.6 comes back at depth 0.6
    (interior; the envelope is band-limited well inside the channel)."""
    sr, bw, dec, taps = 100_000, 8_000, 4, 120
    n = 80_000
    t = np.arange(n) / sr
    m, f_m = 0.6, 200.0
    src = cf32_source(am_iq(m * np.cos(TAU * f_m * t)), sr)

    demod = AmDemod(bandwidth=bw, decimate=dec, taps=taps)
    rate, audio = demod.demodulate(src)
    assert rate == sr // dec

    # audio sample i reflects raw index i*dec + taps - 0.5 (the channel
    # FIR center; no discriminator midpoint here, unlike FM)
    i = np.arange(len(audio))
    center = (i * dec + taps - 0.5) / sr
    want = m * np.cos(TAU * f_m * center)
    sel = slice(rate // 10, -rate // 10)
    assert np.percentile(np.abs(audio[sel] - want[sel]), 95) < 0.01


def test_offset_carrier_via_shift():
    """A carrier at +5 kHz demodulates through -shift 5k exactly like
    the baseband capture (the channel re-centers it)."""
    sr, bw, dec, taps = 100_000, 8_000, 4, 120
    n = 60_000
    t = np.arange(n) / sr
    m, f_m, f_c = 0.4, 150.0, 5_000
    mod = m * np.cos(TAU * f_m * t)
    carrier = np.exp(1j * TAU * f_c * t)
    x = ((1.0 + mod) * carrier).astype(np.complex64)
    src = cf32_source(x, sr)

    demod = AmDemod(center=-f_c, bandwidth=bw, decimate=dec, taps=taps)
    rate, audio = demod.demodulate(src)
    i = np.arange(len(audio))
    want = m * np.cos(TAU * f_m * (i * dec + taps - 0.5) / sr)
    sel = slice(rate // 10, -rate // 10)
    assert np.percentile(np.abs(audio[sel] - want[sel]), 95) < 0.01


def test_audio_stage_and_gain_invariance():
    """Scaling the capture gain leaves modulation-depth audio unchanged
    (the carrier estimate normalizes it), and the audio FIR decimates
    with the LowPass length convention."""
    sr, dec = 100_000, 4
    n = 50_000
    t = np.arange(n) / sr
    mod = 0.3 * np.cos(TAU * 100.0 * t)
    x = am_iq(mod)

    demod = AmDemod(
        bandwidth=8_000, decimate=dec, taps=80,
        audio_decimate=5, audio_taps=40,
    )
    rate, audio = demod.demodulate(cf32_source(x, sr))
    assert rate == sr // dec // 5

    _, scaled = demod.demodulate(cf32_source(7.5 * x, sr))
    np.testing.assert_allclose(scaled, audio, atol=1e-6)

    plain = AmDemod(bandwidth=8_000, decimate=dec, taps=80)
    _, base = plain.demodulate(cf32_source(x, sr))
    assert len(audio) == 1 + (len(base) - 40) // 5


def test_zero_envelope_raises():
    src = cf32_source(np.zeros(5_000, dtype=np.complex64), 10_000)
    with pytest.raises(ValueError, match="no carrier"):
        AmDemod(bandwidth=1_000, decimate=2, taps=40).demodulate(src)


class TestCli:
    def _capture(self, tmp_path):
        sr = 100_000
        t = np.arange(40_000) / sr
        x = am_iq(0.5 * np.cos(TAU * 250.0 * t))
        raw = np.empty(2 * len(x), dtype=np.float32)
        raw[0::2], raw[1::2] = x.real, x.imag
        path = tmp_path / f"am-sim.sr{sr}.cf32"
        path.write_bytes(raw.tobytes())
        return path, x, sr

    def test_am_out_matches_library(self, tmp_path, capsys):
        from quadrs_tpu.cli import main

        path, x, sr = self._capture(tmp_path)
        prefix = tmp_path / "audio"
        rc = main(
            ["am", "-lowpass", "8k", "-decimate", "4", "-power", "40",
             "-out", str(prefix), str(path)]
        )
        assert rc == 0
        out = capsys.readouterr().out
        rate = sr // 4
        written = tmp_path / f"audio.sr{rate}.f32"
        assert str(written) in out
        assert "peak modulation" in out

        demod = AmDemod(bandwidth=8_000, decimate=4, taps=80)
        want_rate, want = demod.demodulate(cf32_source(x, sr))
        got = np.frombuffer(written.read_bytes(), dtype="<f4")
        assert want_rate == rate
        np.testing.assert_array_equal(got, want)

    def test_am_parse_errors(self, capsys):
        from quadrs_tpu.cli import main

        assert main(["am"]) == 1
        assert "requires a capture filename" in capsys.readouterr().err
        assert main(["am", "-deviation", "75k", "x.cf32"]) == 1  # fm-only flag
        capsys.readouterr()

    def test_usage_lists_am(self):
        from quadrs_tpu.cli import USAGE

        assert "am [-shift 0]" in USAGE
