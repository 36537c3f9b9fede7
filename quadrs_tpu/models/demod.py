"""Demodulator models: capture in, bits out.

Composed end-to-end receivers built from the framework's stages — the
"model family" layer above the raw pipeline.  Device side: decode, mix,
filter, energy/discriminator reductions (one fused program per chunk);
host side: clock recovery (inherently sequential, see
:mod:`quadrs_tpu.bits`).

``OokDemod`` implements the README's OOK workflow programmatically
(envelope -> threshold -> run-length clock recovery -> Manchester).
``FskDemod`` wraps shift -> lowpass -> halves-energy discriminator ->
clock recovery.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from quadrs_tpu import bits as bits_mod
from quadrs_tpu import sinks
from quadrs_tpu.stream import LowPass, Shift, Stream


def manchester_decode(bitstream: list[bool]) -> list[int]:
    """Pair (a, b) -> 1 for pulse-first (10), 0 for gap-first (01);
    returns the longest aligned decode of the stream."""
    best: list[int] = []
    for phase in (0, 1):
        out: list[int] = []
        pairs = zip(bitstream[phase::2], bitstream[phase + 1 :: 2])
        for a, b in pairs:
            if a == b:
                if len(out) > len(best):
                    best = out
                out = []
                continue
            out.append(1 if a and not b else 0)
        if len(out) > len(best):
            best = out
    return best


@dataclass
class OokDemod:
    """On-off-keying receiver: spectral envelope -> pulses -> bits.

    ``width``/``stride`` window the envelope detector exactly like the
    README's `sparkfft -width 4 -stride 2` flow; ``threshold`` is the
    blank/active magnitude cut; ``samples_per_bit`` is in *windows*.
    """

    width: int = 4
    stride: int = 2
    threshold: float = 0.001
    samples_per_bit: float = 8.0

    def pulses(self, stream: Stream) -> np.ndarray:
        from quadrs_tpu.ops.stft import stft_norms
        from quadrs_tpu.runtime import Executor, root_step_of, window_batches

        offsets = np.arange(0, stream.length - self.width, self.stride, dtype=np.int64)
        if len(offsets) == 0:
            raise ValueError("input shorter than the envelope window")
        batch, batches = window_batches(offsets, self.width, root_step=root_step_of(stream))
        ex = Executor(stream, self.width, batch=batch, post=stft_norms)
        flags = []
        for offs in batches:
            norms, valid = ex.run(offs)
            if not np.all(valid == self.width):
                raise RuntimeError("short read in OOK demod")
            flags.append((norms >= np.float32(self.threshold)).any(axis=1))
        return np.concatenate(flags)

    def demodulate(self, stream: Stream) -> tuple[float, list[bool]]:
        """Returns (clock_error, raw pulse bits)."""
        return bits_mod.scan(self.pulses(stream), self.samples_per_bit)

    def decode_manchester(self, stream: Stream) -> list[int]:
        _, raw = self.demodulate(stream)
        return manchester_decode(raw)


@dataclass
class FskDemod:
    """Two-tone FSK receiver: shift -> lowpass -> halves-energy
    discriminator -> clock recovery.

    ``center``: offset of the FSK pair from DC (the `shift` amount);
    ``bandwidth``/``decimate``/``taps``: the channel filter;
    ``fft_width``/``stride``: discriminator windowing (output domain);
    ``symbols_per_window``: inverse symbol rate in windows.
    """

    center: int = 0
    bandwidth: int = 200_000
    decimate: int = 32
    taps: int = 400
    fft_width: int = 64
    stride: int | None = None
    samples_per_symbol: float = 1.0

    def channel(self, stream: Stream) -> Stream:
        chain: Stream = stream
        if self.center:
            chain = Shift(chain, self.center, chain.sample_rate)
        return LowPass(chain, self.bandwidth, self.decimate, self.taps)

    def symbols(self, stream: Stream) -> list[int]:
        levels = sinks.freq_levels(
            self.channel(stream), self.fft_width, self.stride, levels=2
        )
        return levels.vals

    def demodulate(self, stream: Stream) -> tuple[float, list[bool]]:
        """Run-length clock recovery over the symbol stream."""
        syms = [bool(v) for v in self.symbols(stream)]
        return bits_mod.scan(syms, self.samples_per_symbol)
