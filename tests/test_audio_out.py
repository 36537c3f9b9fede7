"""Audio-rate conversion and WAV output for the analog demods.

``resample_real`` (the demod models' audio stage) is pinned to the same
sequential f64 oracle family as the complex resampler; the WAV writer
is checked byte-level against the RIFF float spec and round-tripped.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from quadrs_tpu.models.demod import FmDemod
from quadrs_tpu.ops.fir import lowpass_taps
from quadrs_tpu.ops.resample import resample_real
from quadrs_tpu.utils.wav import read_wav_f32, wav_bytes, write_wav

from test_fm import cf32_source, fm_iq

TAU = 2.0 * np.pi


def oracle_resample_real(x, up, down, size):
    taps = lowpass_taps(min(1 / (2 * up), 1 / (2 * down)), size).astype(np.float64) * up
    c = size - size // 2
    u = np.zeros(len(x) * up)
    u[::up] = x
    ys, p = [], 0
    while p * down + c < len(u):
        lo = p * down + c
        seg = u[lo : lo + size]
        ys.append(float(np.dot(taps[: len(seg)], seg)))
        p += 1
    return np.asarray(ys, dtype=np.float64)


@pytest.mark.parametrize("rate,target", [(32_000, 48_000), (250_000, 48_000), (12_000, 8_000)])
def test_resample_real_matches_oracle(rate, target):
    import math

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(4000).astype(np.float32)
    new_rate, out = resample_real(audio, rate, target)
    assert new_rate == target
    g = math.gcd(rate, target)
    l, m = target // g, rate // g
    size = 2 * 8 * max(l, m)
    ref = oracle_resample_real(audio, l, m, size)
    assert len(out) <= len(ref)
    np.testing.assert_allclose(out, ref[: len(out)], atol=4e-6, rtol=4e-6)
    # duration is preserved up to the filter span: the output loses at
    # most the window length plus the gamma_min lead-in (both in
    # upsampled ticks, so /m in output ticks), never gains
    from quadrs_tpu.ops.resample import resample_tables

    _, gamma_min, _, _ = resample_tables(size, l, m)
    shortfall = len(audio) * target / rate - len(out)
    assert 0 <= shortfall <= (gamma_min * l + size) / m + l + 1


def test_resample_real_identity_and_errors():
    audio = np.ones(100, dtype=np.float32)
    rate, out = resample_real(audio, 48_000, 48_000)
    assert rate == 48_000 and out is audio
    with pytest.raises(ValueError, match="positive"):
        resample_real(audio, 0, 48_000)
    with pytest.raises(ValueError, match="shorter"):
        resample_real(np.ones(4, dtype=np.float32), 32_000, 48_000)


def test_resample_real_tone():
    """A 1 kHz tone at 32 kHz resampled to 48 kHz is the 1 kHz tone at
    48 kHz, unit amplitude (the *L gain) — at the house FIR delay:
    output i is the upsampled signal at tick i*M + c + (N-1)/2
    (the correlation-with-group-delay-pick convention, ops/resample.py)."""
    sr, target, f = 32_000, 48_000, 1_000
    t = np.arange(8000) / sr
    audio = np.sin(TAU * f * t).astype(np.float32)
    rate, out = resample_real(audio, sr, target)
    size = 2 * 8 * 3  # L/M = 3/2
    l, m = 3, 2
    c = size - size // 2
    k = np.arange(len(out))
    ticks = k * m + c + (size - 1) / 2  # upsampled (L*sr) ticks
    expect = np.sin(TAU * f * ticks / (l * sr))
    np.testing.assert_allclose(out[size:-size], expect[size : len(out) - size], atol=2e-3)


def test_fm_demod_audio_rate():
    """FmDemod(audio_rate=48k): a 2 kHz modulation tone comes out at
    2 kHz of a 48 kHz stream."""
    sr, dec = 384_000, 8
    n = 1 << 16
    mod = 4000.0 * np.sin(TAU * 2_000 * np.arange(n) / sr)
    src = cf32_source(fm_iq(mod, sr), sr)
    demod = FmDemod(
        bandwidth=20_000, decimate=dec, taps=128, deviation=4000.0, audio_rate=48_000
    )
    rate, audio = demod.demodulate(src)
    assert rate == 48_000
    # the channel rate is 48k exactly here? no: 384k/8 = 48k -> identity.
    # force a non-trivial ratio too:
    demod2 = FmDemod(
        bandwidth=20_000, decimate=dec, taps=128, deviation=4000.0, audio_rate=32_000
    )
    rate2, audio2 = demod2.demodulate(src)
    assert rate2 == 32_000  # 48k -> 32k is a 2/3 resample
    # both recover the 2 kHz modulation at unit-ish amplitude
    for r, a in ((rate, audio), (rate2, audio2)):
        a = a[len(a) // 4 : 3 * len(a) // 4]
        k = np.arange(len(a))
        # fit amplitude of the expected tone (phase unknown): project on
        # the sin/cos pair
        s = np.sin(TAU * 2_000 * k / r)
        c = np.cos(TAU * 2_000 * k / r)
        amp = np.hypot(2 * np.mean(a * s), 2 * np.mean(a * c))
        assert amp == pytest.approx(1.0, abs=0.05)


def test_wav_bytes_spec():
    audio = np.asarray([0.5, -0.25, 1.0], dtype=np.float32)
    raw = wav_bytes(48_000, audio)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    (riff_size,) = struct.unpack_from("<I", raw, 4)
    assert riff_size == len(raw) - 8
    # fmt chunk: IEEE float, mono, 32-bit
    i = raw.index(b"fmt ")
    tag, ch, rate, byte_rate, align, bits = struct.unpack_from("<HHIIHH", raw, i + 8)
    assert (tag, ch, rate, byte_rate, align, bits) == (3, 1, 48_000, 192_000, 4, 32)
    # fact chunk carries the frame count (required for non-PCM)
    i = raw.index(b"fact")
    assert struct.unpack_from("<I", raw, i + 8)[0] == 3
    # data payload is the LE f32 samples verbatim
    i = raw.index(b"data")
    assert struct.unpack_from("<I", raw, i + 4)[0] == 12
    assert raw[i + 8 : i + 20] == audio.astype("<f4").tobytes()


def test_wav_roundtrip(tmp_path):
    audio = np.linspace(-1, 1, 777, dtype=np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, 44_100, audio)
    rate, back = read_wav_f32(path)
    assert rate == 44_100
    assert back.tobytes() == audio.tobytes()
    with pytest.raises(FileExistsError):
        write_wav(path, 44_100, audio)
    write_wav(path, 22_050, audio[:10], overwrite=True)
    rate, back = read_wav_f32(path)
    assert rate == 22_050 and len(back) == 10


def test_cli_fm_wav_and_audio_rate(tmp_path, monkeypatch, capsys):
    """quadjax fm -audio-rate 32k -wav yes -out x writes x.wav with the
    model's exact samples."""
    from quadrs_tpu.cli import main

    sr = 384_000
    n = 1 << 15
    mod = 4000.0 * np.sin(TAU * 2_000 * np.arange(n) / sr)
    iq = fm_iq(mod, sr)
    raw = np.empty(2 * n, dtype=np.float32)
    raw[0::2] = iq.real
    raw[1::2] = iq.imag
    cap = tmp_path / f"fmtone.sr{sr}.cf32"
    cap.write_bytes(raw.tobytes())

    monkeypatch.chdir(tmp_path)
    rc = main(
        f"fm -lowpass 20k -power 64 -decimate 8 -deviation 4k "
        f"-audio-rate 32k -wav yes -out voice {cap}".split()
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "voice.wav" in out
    rate, audio = read_wav_f32(str(tmp_path / "voice.wav"))
    assert rate == 32_000

    demod = FmDemod(
        bandwidth=20_000, decimate=8, taps=128, deviation=4000.0, audio_rate=32_000
    )
    src = cf32_source(iq, sr)
    rate2, expect = demod.demodulate(src)
    assert rate2 == 32_000
    assert audio.tobytes() == expect.tobytes()


def test_cli_wav_requires_out(capsys):
    from quadrs_tpu.cli import main

    assert main("fm -wav yes nothere.sr8k.cf32".split()) == 1
    assert "-wav requires -out" in capsys.readouterr().err


def test_cli_fm_stdout_audio(tmp_path, monkeypatch, capfdbinary):
    """``fm -out -`` streams the audio bytes to stdout (pipe into a
    player) and moves the meter line to stderr."""
    from quadrs_tpu.cli import main

    sr = 384_000
    n = 1 << 15
    mod = 4000.0 * np.sin(TAU * 2_000 * np.arange(n) / sr)
    iq = fm_iq(mod, sr)
    raw = np.empty(2 * n, dtype=np.float32)
    raw[0::2] = iq.real
    raw[1::2] = iq.imag
    cap = tmp_path / f"fmtone.sr{sr}.cf32"
    cap.write_bytes(raw.tobytes())

    args = f"fm -lowpass 20k -power 64 -decimate 8 -deviation 4k -out - {cap}"
    rc = main(args.split())
    assert rc == 0
    out, err = capfdbinary.readouterr()
    assert b"fm: " in err and b"fm: " not in out

    demod = FmDemod(bandwidth=20_000, decimate=8, taps=128, deviation=4000.0)
    rate, expect = demod.demodulate(cf32_source(iq, sr))
    assert out == expect.astype("<f4").tobytes()

    # wav container to stdout too
    rc = main(
        f"fm -lowpass 20k -power 64 -decimate 8 -deviation 4k "
        f"-wav yes -out - {cap}".split()
    )
    assert rc == 0
    out, _ = capfdbinary.readouterr()
    assert out[:4] == b"RIFF"
