"""The bundled example captures must support their README walkthroughs."""

import pathlib

import numpy as np

import quadrs_tpu as q
from quadrs_tpu import sinks
from quadrs_tpu.bits import scan

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"


def test_ook_sim_decodes_to_payload_byte():
    src = q.open_capture(str(EXAMPLES / "ook-sim.sr400.cf32"))
    assert src.sample_rate == 400
    rows = sinks.spark_fft(src, width=4, stride=2, lo=0.001, hi=0.01)[1:]
    pulses = [any(c != " " for c in r.strip("│")) for r in rows]
    _, bits = scan(pulses, 16.0)  # 32 samples/bit -> 16 rows/bit at stride 2
    s = "".join("1" if b else "0" for b in bits)
    # Manchester 0x18 (bit1='10', bit0='01' in pulse polarity):
    manchester_24 = "01" * 3 + "10" * 2 + "01" * 3
    assert manchester_24 in s or ("10" * 3 + "01" * 2 + "10" * 3) in s


def test_fsk_sim_alternates_symbols():
    src = q.open_capture(str(EXAMPLES / "fsk-sim.sr48k.cf32"))
    levels = sinks.freq_levels(src, fft_width=64, stride=2400)
    vals = levels.vals
    assert len(vals) >= 8
    assert {0, 1} == set(vals)
    flips = sum(a != b for a, b in zip(vals, vals[1:]))
    assert flips >= len(vals) // 2  # alternating FSK symbols


def test_cu8_rtl433_style_end_to_end(tmp_path, monkeypatch, capsys):
    """A cu8 capture named in rtl_433 convention: sniffed rate+format,
    decoded on-chip (with the reference's odd -127.5 offset), through
    sparkfft and write."""
    import numpy as np

    from quadrs_tpu.cli import main

    rng = np.random.default_rng(77)
    n = 4096
    t = np.arange(n)
    tone = 0.4 * np.exp(2j * np.pi * 31_250 * t / 250_000)
    iq = np.empty(2 * n, dtype=np.uint8)
    iq[0::2] = np.clip(np.round(tone.real * 100 + 127.5), 0, 255).astype(np.uint8)
    iq[1::2] = np.clip(np.round(tone.imag * 100 + 127.5), 0, 255).astype(np.uint8)
    path = tmp_path / "g001_433.92M_250k.cu8"
    iq.tofile(path)

    monkeypatch.chdir(tmp_path)
    rc = main([str(path), ][0:0] + f"from {path} sparkfft -width 64 -range 30:50".split())
    assert rc == 0
    out = capsys.readouterr().out
    assert "sparkfft sample_rate=250000" in out
    # cu8 decode offset puts the DC magnitude enormous (~127.5*2*64);
    # the tone's bin rides on top; rows must be well-formed
    assert out.count("│") == 2 * ((n - 64) // 64)

    rc = main(f"from {path} write -overwrite yes dump".split())
    assert rc == 0
    import quadrs_tpu as q

    back = q.open_capture("dump.sr250000.cf32")
    got, valid = back.read_at(0, 16)
    from quadrs_tpu.formats import FileFormat, decode_bytes

    want = decode_bytes(iq[:32], FileFormat.COMPLEX_UINT8)
    assert np.asarray(got).tobytes() == want.tobytes()  # bit-exact round trip
