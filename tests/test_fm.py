"""FM demodulator model + ``quadjax fm`` CLI.

No reference counterpart (quadrs demodulates OOK/FSK only): the
conformance target here is the model's own contract — the quadrature
discriminator ``angle(x[n] * conj(x[n-1])) * rate / (2*pi)`` over the
shift->lowpass channel, with the channel pulled in ``chunk``-sized
windows (per-read truncated convolution makes the pull size part of the
semantics, exactly as for the sparkfft/writer sinks).
"""

from __future__ import annotations

import numpy as np
import pytest

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.models.demod import FmDemod
from quadrs_tpu.sources import SampleSource

from oracle import OracleArray, OracleLowPass

TAU = 2.0 * np.pi


def fm_iq(inst_freq_hz: np.ndarray, sr: int) -> np.ndarray:
    """Unit-amplitude FM: phase integrates the instantaneous frequency."""
    phase = TAU * np.cumsum(np.asarray(inst_freq_hz, dtype=np.float64)) / sr
    return (np.cos(phase) + 1j * np.sin(phase)).astype(np.complex64)


def cf32_source(x: np.ndarray, sr: int) -> SampleSource:
    raw = np.empty(2 * len(x), dtype=np.float32)
    raw[0::2] = x.real
    raw[1::2] = x.imag
    return SampleSource(
        np.frombuffer(raw.tobytes(), dtype=np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    )


def oracle_discriminate(
    data: np.ndarray, sr: int, bw: int, dec: int, taps: int, chunk: int
) -> tuple[int, np.ndarray]:
    """Sequential numpy mirror of FmDemod.discriminate: the channel is
    pulled in (chunk+1)-sample windows stepping by chunk, so each pull
    sees the reference's per-read truncation at its own tail."""
    chan = OracleLowPass(OracleArray(data, sr), bw, dec, taps)
    rate = chan.sample_rate
    out = np.empty(chan.length - 1, dtype=np.float32)
    c = min(chunk, chan.length - 1)
    o = 0
    while o < chan.length - 1:
        x = chan.read_at(o, c + 1)
        v = len(x)
        d = x[1:] * np.conj(x[:-1])
        out[o : o + v - 1] = (
            np.arctan2(d.imag, d.real).astype(np.float32)
            * np.float32(rate / TAU)
        )
        if v < c + 1:
            return rate, out[: o + max(v - 1, 0)]
        o += c
    return rate, out


@pytest.mark.parametrize("chunk", [257, 1024])
def test_discriminate_matches_oracle(chunk):
    """Whole-model path (Executor windows included) vs the sequential
    numpy oracle, at two pull sizes — the pull size shifts where the
    truncated-convolution tails land, and both sides must agree."""
    rng = np.random.default_rng(7)
    sr, bw, dec, taps = 200_000, 20_000, 4, 80
    n = 40_000
    # a smooth, band-limited instantaneous frequency well inside the
    # decimated Nyquist (so the discriminator never nears +/-pi)
    t = np.arange(n) / sr
    inst = 4_000.0 * np.sin(TAU * 300.0 * t) + 1_500.0 * np.cos(TAU * 170.0 * t)
    x = fm_iq(inst, sr)
    src = cf32_source(x, sr)

    demod = FmDemod(bandwidth=bw, decimate=dec, taps=taps, chunk=chunk)
    rate, got = demod.discriminate(src)

    want_rate, want = oracle_discriminate(x, sr, bw, dec, taps, chunk)
    assert rate == want_rate == sr // dec
    assert got.shape == want.shape
    # f32 chain vs f64 oracle; angles are O(1) rad scaled by rate/2pi
    np.testing.assert_allclose(got, want, atol=rate * 1e-4, rtol=1e-3)


def test_tone_recovery():
    """End-to-end sanity: a 300 Hz tone at 4 kHz deviation comes back as
    a 300 Hz tone of the right amplitude (interior, filter settled)."""
    sr, bw, dec, taps = 200_000, 20_000, 4, 120
    n = 100_000
    t = np.arange(n) / sr
    f_m, dev = 300.0, 4_000.0
    inst = dev * np.cos(TAU * f_m * t)
    src = cf32_source(fm_iq(inst, sr), sr)

    demod = FmDemod(bandwidth=bw, decimate=dec, taps=taps, deviation=dev)
    rate, audio = demod.demodulate(src)
    assert rate == sr // dec

    # audio sample i reflects the instantaneous frequency at raw index
    # i*dec + dec/2 + (taps - 0.5): the channel FIR's center sits at
    # raw k*dec + ceil(taps/2) + (taps-1)/2 = k*dec + taps - 0.5 (even
    # taps) and the discriminator midpoints channel samples i and i+1
    i = np.arange(len(audio))
    center = (i * dec + dec / 2 + taps - 0.5) / sr
    want = np.cos(TAU * f_m * center)
    sel = slice(rate // 10, -rate // 10)
    err = np.abs(audio[sel] - want[sel])
    assert np.percentile(err, 95) < 0.02
    assert abs(np.max(audio[sel]) - 1.0) < 0.02


def test_constant_frequency_and_audio_stage():
    """A constant +2 kHz offset demodulates to a constant 2/dev
    everywhere, and survives the audio FIR (unit-sum taps) unchanged;
    the audio stage decimates with the LowPass length convention."""
    sr, dec = 100_000, 4
    n = 60_000
    inst = np.full(n, 2_000.0)
    src = cf32_source(fm_iq(inst, sr), sr)

    demod = FmDemod(
        bandwidth=10_000, decimate=dec, taps=80, deviation=4_000.0,
        audio_decimate=5, audio_taps=40,
    )
    rate, audio = demod.demodulate(src)
    chan_rate = sr // dec
    assert rate == chan_rate // 5

    plain = FmDemod(bandwidth=10_000, decimate=dec, taps=80, deviation=4_000.0)
    _, base = plain.demodulate(src)
    assert len(audio) == 1 + (len(base) - 40) // 5

    interior = audio[len(audio) // 4 : -len(audio) // 4]
    np.testing.assert_allclose(interior, 0.5, atol=5e-3)


def test_too_short_input_raises():
    src = cf32_source(np.ones(50, dtype=np.complex64), 1000)
    with pytest.raises((ValueError, RuntimeError)):
        FmDemod(taps=400).discriminate(src)


class TestCli:
    def _capture(self, tmp_path):
        sr = 100_000
        t = np.arange(50_000) / sr
        inst = 3_000.0 * np.cos(TAU * 200.0 * t)
        x = fm_iq(inst, sr)
        raw = np.empty(2 * len(x), dtype=np.float32)
        raw[0::2] = x.real
        raw[1::2] = x.imag
        path = tmp_path / f"fm-sim.sr{sr}.cf32"
        path.write_bytes(raw.tobytes())
        return path, x, sr

    def test_fm_out_matches_library(self, tmp_path, capsys):
        from quadrs_tpu.cli import main

        path, x, sr = self._capture(tmp_path)
        prefix = tmp_path / "audio"
        rc = main(
            ["fm", "-lowpass", "10k", "-decimate", "4", "-power", "40",
             "-deviation", "4k", "-out", str(prefix), str(path)]
        )
        assert rc == 0
        out = capsys.readouterr().out
        rate = sr // 4
        written = tmp_path / f"audio.sr{rate}.f32"
        assert str(written) in out
        assert f"@ {rate} Hz" in out

        demod = FmDemod(
            bandwidth=10_000, decimate=4, taps=80, deviation=4_000.0
        )
        want_rate, want = demod.demodulate(cf32_source(x, sr))
        got = np.frombuffer(written.read_bytes(), dtype="<f4")
        assert want_rate == rate
        np.testing.assert_array_equal(got, want)

    def test_fm_no_out_prints_meter(self, tmp_path, capsys):
        from quadrs_tpu.cli import main

        path, _, _ = self._capture(tmp_path)
        rc = main(["fm", "-lowpass", "10k", "-decimate", "4", str(path)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "peak deviation" in out and "rms" in out

    def test_fm_overwrite_guard(self, tmp_path, capsys):
        from quadrs_tpu.cli import main

        path, _, sr = self._capture(tmp_path)
        prefix = tmp_path / "audio"
        args = ["fm", "-lowpass", "10k", "-decimate", "4", "-out",
                str(prefix), str(path)]
        assert main(args) == 0
        capsys.readouterr()
        assert main(args) == 1  # create-new refuses (FileExistsError)
        assert "Error:" in capsys.readouterr().err
        assert main(args[:1] + ["-overwrite", "yes"] + args[1:]) == 0

    def test_fm_parse_errors(self, capsys):
        from quadrs_tpu.cli import main

        assert main(["fm"]) == 1
        assert "requires a capture filename" in capsys.readouterr().err
        assert main(["fm", "-deviation", "0", "x.cf32"]) == 1
        assert "-deviation must be positive" in capsys.readouterr().err
        assert main(["fm", "-bogus", "1", "x.cf32"]) == 1
        capsys.readouterr()

    def test_usage_lists_fm(self):
        from quadrs_tpu.cli import USAGE

        assert "fm [-shift 0]" in USAGE
