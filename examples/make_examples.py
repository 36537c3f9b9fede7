"""Generate the bundled example captures (deterministic).

Counterparts of the reference's two fixtures: a multi-tone FSK-style
capture and an OOK pulse capture whose README walkthroughs work
self-contained.  Run from the repo root:

    python examples/make_examples.py
"""

from __future__ import annotations

import pathlib

import numpy as np

HERE = pathlib.Path(__file__).parent


def two_tone() -> None:
    """FSK-ish: two tones that alternate, 48 kHz, 0.5 s."""
    sr = 48_000
    n = sr // 2
    t = np.arange(n)
    symbol = (t // 2400) % 2  # 10 baud alternation
    freq = np.where(symbol == 0, 3_000, -5_000)
    phase = 2 * np.pi * np.cumsum(freq) / sr
    x = (0.5 * np.exp(1j * phase)).astype(np.complex64)
    rng = np.random.default_rng(0)
    x += (0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
    x.astype(np.complex64).tofile(HERE / "fsk-sim.sr48k.cf32")


def ook() -> None:
    """OOK at 400 Hz, 32 samples/bit, Manchester '00011' preamble then
    the byte 0x18 — readable with the README's sparkfft settings."""
    sr = 400
    bit_samples = 32
    preamble = [0, 0, 0, 1, 1]
    payload_bits = [0, 0, 0, 1, 1, 0, 0, 0]  # 0x18 = 24
    manchester = []
    for b in preamble + payload_bits:
        manchester += [1, 0] if b else [0, 1]
    pattern = [0] * 8 + manchester + [0] * 8
    gate = np.repeat(np.array(pattern, dtype=np.float32), bit_samples)
    n = len(gate)
    t = np.arange(n)
    carrier = np.exp(2j * np.pi * 100 * t / sr)  # bin-exact for width-4 FFTs
    rng = np.random.default_rng(1)
    noise = 0.00005 * (rng.normal(size=n) + 1j * rng.normal(size=n))
    x = (0.002 * gate * carrier + noise).astype(np.complex64)
    x.tofile(HERE / "ook-sim.sr400.cf32")


if __name__ == "__main__":
    two_tone()
    ook()
    print("wrote", sorted(p.name for p in HERE.glob("*.cf32")))
