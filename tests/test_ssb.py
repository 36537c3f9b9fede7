"""Single-sideband receiver (``SsbDemod`` / ``quadjax ssb``): filter
method, usb/lsb, built on the validated Shift/LowPass stages.

A unit USB tone ``e^{j 2 pi (fc + fa) t}`` must recover
``cos(2 pi fa t + phi)`` at unit amplitude while the opposite sideband
is rejected by the FIR's stopband; phase offsets (FIR group delay) are
absorbed by projecting on the sin/cos pair.
"""

from __future__ import annotations

import numpy as np
import pytest

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.models.demod import SsbDemod
from quadrs_tpu.sources import SampleSource

TAU = 2.0 * np.pi
SR = 48_000


def _cap(iq: np.ndarray) -> SampleSource:
    raw = np.empty(2 * len(iq), dtype="<f4")
    raw[0::2] = iq.real
    raw[1::2] = iq.imag
    return SampleSource(
        np.frombuffer(raw.tobytes(), dtype=np.uint8),
        FileFormat.COMPLEX_FLOAT32,
        SR,
    )


def _tone(freq: float, n: int = 1 << 16) -> np.ndarray:
    t = np.arange(n) / SR
    return np.exp(1j * TAU * freq * t).astype(np.complex64)


def _amp(audio: np.ndarray, f: float, rate: int) -> float:
    a = audio[len(audio) // 4 : 3 * len(audio) // 4]
    k = np.arange(len(a))
    return float(
        np.hypot(
            2 * np.mean(a * np.sin(TAU * f * k / rate)),
            2 * np.mean(a * np.cos(TAU * f * k / rate)),
        )
    )


def test_usb_tone_unit_gain_and_lsb_rejection():
    """Carrier at +5 kHz, 1 kHz audio -> complex tone at 6 kHz: the USB
    demod recovers it at unit amplitude; the LSB demod rejects it."""
    cap = _cap(_tone(6_000))
    usb = SsbDemod(center=-5_000, bandwidth=3_000, decimate=4, taps=256)
    rate, audio = usb.demodulate(cap)
    assert rate == SR // 4
    assert _amp(audio, 1_000, rate) == pytest.approx(1.0, abs=0.01)
    lsb = SsbDemod(
        center=-5_000, bandwidth=3_000, decimate=4, taps=256, sideband="lsb"
    )
    _, rej = lsb.demodulate(_cap(_tone(6_000)))
    assert _amp(rej, 1_000, rate) < 5e-3


def test_lsb_tone():
    """800 Hz audio below the carrier (tone at 4.2 kHz, carrier 5 kHz)."""
    lsb = SsbDemod(
        center=-5_000, bandwidth=3_000, decimate=4, taps=256, sideband="lsb"
    )
    rate, audio = lsb.demodulate(_cap(_tone(4_200)))
    assert _amp(audio, 800, rate) == pytest.approx(1.0, abs=0.01)


def test_two_tone_and_chunk_boundaries():
    """A USB two-tone signal recovers both audio tones.  Away from the
    pull boundaries the chunked extraction is bit-identical at any
    chunk size; the last ~(taps/2)/D outputs of each pull see the
    house per-read truncated convolution (reference semantics, like
    the FM/AM demods — see CLAUDE.md's conformance invariants)."""
    iq = (_tone(5_700) + 0.5 * _tone(6_900)).astype(np.complex64)
    d = SsbDemod(center=-5_000, bandwidth=4_000, decimate=4, taps=256)
    rate, audio = d.demodulate(_cap(iq))
    assert _amp(audio, 700, rate) == pytest.approx(1.0, abs=0.02)
    assert _amp(audio, 1_900, rate) == pytest.approx(0.5, abs=0.02)
    c = 777
    small = SsbDemod(
        center=-5_000, bandwidth=4_000, decimate=4, taps=256, chunk=c
    )
    _, audio2 = small.demodulate(_cap(iq))
    assert len(audio2) == len(audio)
    mask = np.ones(len(audio), bool)
    edge = 256 // 4  # truncated outputs per pull (taps lookahead / D)
    for b in list(range(c, len(audio) + 1, c)) + [len(audio)]:
        mask[max(0, b - edge) : b] = False
    # away from the truncation edges the values agree to f32 noise (the
    # two chunkings compile different batch shapes -> ulp differences)
    np.testing.assert_allclose(
        audio2[mask], audio[mask], atol=2e-5 * np.abs(audio).max()
    )
    # both tones still recovered from the chunked run
    assert _amp(audio2, 700, rate) == pytest.approx(1.0, abs=0.02)


def test_audio_stage_and_errors():
    d = SsbDemod(
        center=-5_000, bandwidth=3_000, decimate=4, taps=256, audio_rate=8_000
    )
    rate, audio = d.demodulate(_cap(_tone(6_000)))
    assert rate == 8_000  # 12 kHz -> 8 kHz is a 2/3 resample
    assert _amp(audio, 1_000, rate) == pytest.approx(1.0, abs=0.02)
    with pytest.raises(ValueError, match="even"):
        SsbDemod(bandwidth=3_001).channel(_cap(_tone(6_000)))
    with pytest.raises(ValueError, match="usb|lsb"):
        SsbDemod(sideband="dsb").channel(_cap(_tone(6_000)))
    with pytest.raises(ValueError, match="channel rate"):
        SsbDemod(bandwidth=20_000, decimate=8).channel(_cap(_tone(6_000)))
    # the guard is bandwidth <= rate/2 (audio past rate/2 would FOLD,
    # not error): at decimate 8 / 48 kHz the channel rate is 6 kHz
    SsbDemod(bandwidth=3_000, decimate=8).channel(_cap(_tone(6_000)))
    with pytest.raises(ValueError, match="half the channel rate"):
        SsbDemod(bandwidth=3_002, decimate=8).channel(_cap(_tone(6_000)))


def test_cli_ssb(tmp_path, capsys):
    """quadjax ssb writes the recovered audio; meter names the sideband."""
    from quadrs_tpu.cli import main

    iq = _tone(6_000, n=1 << 15)
    raw = np.empty(2 * len(iq), dtype="<f4")
    raw[0::2] = iq.real
    raw[1::2] = iq.imag
    cap = tmp_path / f"ssb.sr{SR}.cf32"
    cap.write_bytes(raw.tobytes())
    out = tmp_path / "voice"
    rc = main(
        f"ssb -shift -5k -sideband usb -bandwidth 3k -power 128 -decimate 4 "
        f"-out {out} {cap}".split()
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "usb" in captured and f"{out}.sr12000.f32" in captured
    audio = np.fromfile(f"{out}.sr12000.f32", dtype="<f4")
    assert _amp(audio, 1_000, 12_000) == pytest.approx(1.0, abs=0.01)
    # grammar
    assert main(f"ssb -sideband dsb {cap}".split()) == 1
    assert "unknown -sideband" in capsys.readouterr().err
    assert main(f"ssb -wav yes {cap}".split()) == 1
    assert "-wav requires -out" in capsys.readouterr().err


def test_serve_ssb_mode(capsys):
    """serve -mode ssb answers a burst with the audio framing."""
    import socket
    import threading

    from quadrs_tpu import args as argmod
    from quadrs_tpu.serve import run_serve

    iq = _tone(6_000, n=1 << 15)
    raw = np.empty(2 * len(iq), dtype="<f4")
    raw[0::2] = iq.real
    raw[1::2] = iq.imag
    payload = raw.tobytes()

    (cmd,) = argmod.parse(
        "serve -port 0 -once yes -mode ssb -sr 48k -format cf32 "
        "-shift -5k -sideband usb -bandwidth 3k -power 128 -decimate 4".split()
    )
    port_box: list[int] = []
    evt = threading.Event()

    def ready(p):
        port_box.append(p)
        evt.set()

    th = threading.Thread(target=run_serve, args=(cmd,), kwargs={"ready": ready})
    th.start()
    assert evt.wait(30)
    out: list[bytes] = []
    with socket.create_connection(("127.0.0.1", port_box[0]), timeout=30) as s:
        s.settimeout(None)

        def drain():
            while True:
                b = s.recv(1 << 16)
                if not b:
                    return
                out.append(b)

        rd = threading.Thread(target=drain)
        rd.start()
        s.sendall(payload)
        s.shutdown(socket.SHUT_WR)
        rd.join(timeout=120)
    th.join(timeout=60)
    resp = b"".join(out)
    nl = resp.index(b"\n")
    tag, mode, n, rate = resp[:nl].decode().split()
    assert (tag, mode, rate) == ("#", "ssb", "12000")
    audio = np.frombuffer(resp[nl + 1 : nl + 1 + 4 * int(n)], dtype="<f4")
    assert _amp(audio, 1_000, 12_000) == pytest.approx(1.0, abs=0.01)
    # gating: -lowpass/-deviation don't apply to ssb
    with pytest.raises(ValueError, match="does not apply to -mode ssb"):
        argmod.parse("serve -mode ssb -lowpass 3k -sr 48k -format cf32".split())
    with pytest.raises(ValueError, match="does not apply to -mode fm"):
        argmod.parse("serve -mode fm -sideband lsb -sr 48k -format cf32".split())
