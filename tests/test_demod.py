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
