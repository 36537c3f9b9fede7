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
