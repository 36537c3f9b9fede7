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


@dataclass
class FmDemod:
    """Frequency-modulation receiver: shift -> lowpass -> quadrature
    discriminator -> (optional) audio filter.  No reference counterpart
    (quadrs demodulates OOK/FSK only) — this is the TPU-native
    framework's analog-FM model family, built from the same stages.

    The discriminator is the classic polar one: the instantaneous
    frequency at channel sample ``n`` is
    ``angle(x[n] * conj(x[n-1])) * rate / (2*pi)`` Hz.  It is computed
    on device in large chunks (each chunk reads one extra leading
    sample, so chunk boundaries are exact: the output is independent of
    the chunk size).  Output sample ``i`` corresponds to channel sample
    ``i + 1`` — the first channel sample has no predecessor.

    ``deviation`` is the full-scale frequency swing in Hz: audio is
    ``inst_freq / deviation``, so a transmitter swinging +/-deviation
    yields audio in [-1, 1].  ``audio_bandwidth``/``audio_decimate``
    add a second (real) decimating FIR after the discriminator —
    broadcast FM channels decimate to ~250 kHz for the discriminator
    and again to an audio rate here.  ``audio_rate`` rationally
    resamples the result to an exact device rate (48 kHz is rarely an
    integer divisor of the channel rate; see
    :func:`quadrs_tpu.ops.resample.resample_real`).
    """

    center: int = 0
    bandwidth: int = 100_000
    decimate: int = 8
    taps: int = 400
    deviation: float = 75_000.0
    audio_bandwidth: int | None = None
    audio_decimate: int = 1
    audio_taps: int = 64
    audio_rate: int | None = None  # rational resample to this exact Hz
    chunk: int = 1 << 16  # discriminator samples per device window

    def channel(self, stream: Stream) -> Stream:
        chain: Stream = stream
        if self.center:
            chain = Shift(chain, self.center, chain.sample_rate)
        return LowPass(chain, self.bandwidth, self.decimate, self.taps)

    def discriminate(self, stream: Stream) -> tuple[int, np.ndarray]:
        """Instantaneous frequency of the filtered channel.

        Returns ``(channel_rate_hz, f32[channel_len - 1])`` in Hz.
        """
        import jax.numpy as jnp

        from quadrs_tpu.runtime import Executor, root_step_of, window_batches

        chan = self.channel(stream)
        if chan.length < 2:
            raise ValueError("input too short for the FM discriminator")
        rate = chan.sample_rate
        c = min(self.chunk, chan.length - 1)
        # window at offset o reads chan[o .. o+c]; emits d for samples
        # o+1 .. o+c (c outputs).  Offsets step by c, so every channel
        # sample >= 1 is produced exactly once.
        offsets = np.arange(0, chan.length - 1, c, dtype=np.int64)
        scale = np.float32(rate / (2.0 * np.pi))

        def post(x):  # (B, c+1) complex -> (B, c) f32 Hz
            d = x[:, 1:] * jnp.conj(x[:, :-1])
            return jnp.arctan2(jnp.imag(d), jnp.real(d)) * scale

        batch, batches = window_batches(
            offsets, c + 1, root_step=root_step_of(chan)
        )
        ex = Executor(chan, c + 1, batch=batch, post=post)
        out = np.empty(chan.length - 1, dtype=np.float32)
        for offs in batches:
            freqs, valid = ex.run(offs)
            for i in range(len(offs)):
                o, v = int(offs[i]), int(valid[i])
                if v >= 2:
                    out[o : o + v - 1] = freqs[i][: v - 1]
                if v < c + 1:
                    # short read: only possible at EOF (a decimated
                    # stage's claimed final sample may be unreadable,
                    # as in sinks.do_write) — the stream ends here
                    return rate, out[: o + max(v - 1, 0)]
        return rate, out

    def demodulate(self, stream: Stream) -> tuple[int, np.ndarray]:
        """Full receive chain to normalized audio.

        Returns ``(audio_rate_hz, f32 audio)`` with ``inst_freq /
        deviation`` scaling (and the audio FIR applied when
        configured).
        """
        rate, freq = self.discriminate(stream)
        audio = freq / np.float32(self.deviation)
        return _audio_stage(self, rate, audio)


def _audio_fir(
    rate: int,
    audio: np.ndarray,
    bandwidth: int | None,
    decimate: int,
    n_taps: int,
) -> tuple[int, np.ndarray]:
    """Real decimating FIR over a demodulated audio signal (device, one
    dispatch), with the same taps family and output-length convention as
    :class:`~quadrs_tpu.stream.LowPass`:
    ``n_out = 1 + (len - taps) // decimate``."""
    import jax
    import jax.numpy as jnp

    from quadrs_tpu.ops.fir import fir_decimate, lowpass_taps

    d = decimate
    cutoff_hz = (
        bandwidth
        if bandwidth is not None
        else rate // (2 * d)  # anti-alias at the output Nyquist
    )
    taps = lowpass_taps(cutoff_hz / rate, n_taps)
    n_out = 1 + (len(audio) - n_taps) // d
    if n_out < 1:
        raise ValueError("audio shorter than the audio filter")
    n_in = n_out * d + n_taps
    x = np.zeros(n_in, dtype=np.float32)
    x[: len(audio)] = audio[:n_in]

    @jax.jit
    def run(a):  # complex packing happens on device (tunnel rule)
        xc = jax.lax.complex(a, jnp.zeros_like(a))
        y = fir_decimate(xc[None, :], taps, d, n_out)
        return jnp.real(y[0])

    return rate // d, np.asarray(run(x))


def _audio_stage(demod, rate: int, audio: np.ndarray) -> tuple[int, np.ndarray]:
    """The shared audio tail of every analog demod (FM/AM/SSB):
    optional real decimating FIR, then optional rational resample to an
    exact device rate — driven by the model's ``audio_*`` fields."""
    if demod.audio_bandwidth is not None or demod.audio_decimate != 1:
        rate, audio = _audio_fir(
            rate, audio, demod.audio_bandwidth, demod.audio_decimate,
            demod.audio_taps,
        )
    if demod.audio_rate is not None and demod.audio_rate != rate:
        from quadrs_tpu.ops.resample import resample_real

        rate, audio = resample_real(audio, rate, demod.audio_rate)
    return rate, audio


@dataclass
class AmDemod:
    """Amplitude-modulation receiver: shift -> lowpass -> envelope
    detector -> (optional) audio filter.  No reference counterpart —
    the third analog product alongside :class:`FmDemod`, built from the
    same stages.

    The envelope is ``|x[n]|`` of the filtered channel; audio is the
    modulation ``envelope / mean(envelope) - 1`` (so a transmitter at
    modulation depth m yields audio swinging +/-m around zero,
    independent of capture gain).  The whole capture's mean is the
    carrier estimate — these are buffered bursts, like the other demod
    models.
    """

    center: int = 0
    bandwidth: int = 10_000
    decimate: int = 8
    taps: int = 400
    audio_bandwidth: int | None = None
    audio_decimate: int = 1
    audio_taps: int = 64
    audio_rate: int | None = None  # rational resample to this exact Hz
    chunk: int = 1 << 16  # envelope samples per device window

    def channel(self, stream: Stream) -> Stream:
        chain: Stream = stream
        if self.center:
            chain = Shift(chain, self.center, chain.sample_rate)
        return LowPass(chain, self.bandwidth, self.decimate, self.taps)

    def envelope(self, stream: Stream) -> tuple[int, np.ndarray]:
        """``(channel_rate_hz, |x| f32[channel_len])`` of the filtered
        channel (chunked on device; no window overlap needed)."""
        import jax.numpy as jnp

        from quadrs_tpu.runtime import Executor, root_step_of, window_batches

        chan = self.channel(stream)
        if chan.length < 1:
            raise ValueError("input too short for the AM envelope")
        rate = chan.sample_rate
        c = min(self.chunk, chan.length)
        offsets = np.arange(0, chan.length, c, dtype=np.int64)

        def post(x):  # (B, c) complex -> (B, c) f32
            return jnp.abs(x)

        batch, batches = window_batches(offsets, c, root_step=root_step_of(chan))
        ex = Executor(chan, c, batch=batch, post=post)
        out = np.empty(chan.length, dtype=np.float32)
        for offs in batches:
            envs, valid = ex.run(offs)
            for i in range(len(offs)):
                o, v = int(offs[i]), int(valid[i])
                out[o : o + v] = envs[i][:v]
                if v < c:
                    # short read: EOF only (see FmDemod.discriminate)
                    return rate, out[: o + v]
        return rate, out

    def demodulate(self, stream: Stream) -> tuple[int, np.ndarray]:
        """Full receive chain to audio in modulation-depth units
        (``envelope / carrier - 1``)."""
        rate, env = self.envelope(stream)
        carrier = float(np.mean(env, dtype=np.float64))
        if carrier <= 0.0:
            raise ValueError("no carrier: the channel envelope is all zero")
        audio = (env / np.float32(carrier)) - np.float32(1.0)
        return _audio_stage(self, rate, audio)


@dataclass
class SsbDemod:
    """Single-sideband receiver (filter method): shift the chosen
    sideband's midpoint to DC, symmetric lowpass + decimate, undo the
    midpoint shift at the channel rate, take the real part.  No
    reference counterpart — the fourth analog product alongside
    :class:`FmDemod`/:class:`AmDemod`, built from the same validated
    stages (two exact-NCO shifts and one decimating FIR).

    ``center`` follows the house shift convention (the value handed to
    :class:`~quadrs_tpu.stream.Shift`): bring the SUPPRESSED CARRIER to
    DC with ``center = -carrier_offset``.  USB then occupies
    ``[0, bandwidth]`` and LSB ``[-bandwidth, 0]`` around DC; the demod
    pre-shifts by ``-/+ bandwidth/2`` so the sideband is symmetric
    about DC, filters at ``bandwidth/2``, decimates, and re-shifts by
    ``+/- bandwidth/2`` at the channel rate so ``real(x)`` is the
    audio.  Gain is 1: a unit USB tone ``e^{j 2 pi (fc + fa) t}``
    recovers ``cos(2 pi fa t + phi)`` at unit amplitude (``phi`` from
    the FIR group delay).  ``bandwidth`` must be even (the midpoint
    shift is exact integer Hz) and under the channel rate.
    """

    center: int = 0
    bandwidth: int = 3_000
    decimate: int = 8
    taps: int = 400
    sideband: str = "usb"  # or "lsb"
    audio_bandwidth: int | None = None
    audio_decimate: int = 1
    audio_taps: int = 64
    audio_rate: int | None = None  # rational resample to this exact Hz
    chunk: int = 1 << 16  # baseband samples per device window

    def _sign(self) -> int:
        if self.sideband not in ("usb", "lsb"):
            raise ValueError(f"unknown sideband {self.sideband!r}: usb|lsb")
        return 1 if self.sideband == "usb" else -1

    def channel(self, stream: Stream) -> Stream:
        if self.bandwidth % 2 or self.bandwidth <= 0:
            raise ValueError("bandwidth must be positive and even")
        sign = self._sign()
        half = self.bandwidth // 2
        pre = self.center - sign * half  # carrier -> DC, then midpoint -> DC
        chain: Stream = stream
        if pre:
            chain = Shift(chain, pre, chain.sample_rate)
        chain = LowPass(chain, half, self.decimate, self.taps)
        # after the re-shift the audio occupies [0, bandwidth] of a REAL
        # stream at the channel rate: anything past rate/2 folds, so the
        # guard is bandwidth <= rate/2 (not merely < rate)
        if self.bandwidth * 2 > chain.sample_rate:
            raise ValueError(
                f"bandwidth {self.bandwidth} exceeds half the channel rate "
                f"{chain.sample_rate} (lower the decimation or the bandwidth)"
            )
        if half:  # undo the midpoint shift at the decimated rate
            chain = Shift(chain, sign * half, chain.sample_rate)
        return chain

    def baseband(self, stream: Stream) -> tuple[int, np.ndarray]:
        """``(channel_rate_hz, real(x) f32[channel_len])`` of the
        re-centered sideband (chunked on device, no overlap needed)."""
        import jax.numpy as jnp

        from quadrs_tpu.runtime import Executor, root_step_of, window_batches

        chan = self.channel(stream)
        if chan.length < 1:
            raise ValueError("input too short for the SSB demodulator")
        rate = chan.sample_rate
        c = min(self.chunk, chan.length)
        offsets = np.arange(0, chan.length, c, dtype=np.int64)

        def post(x):  # (B, c) complex -> (B, c) f32
            return jnp.real(x)

        batch, batches = window_batches(offsets, c, root_step=root_step_of(chan))
        ex = Executor(chan, c, batch=batch, post=post)
        out = np.empty(chan.length, dtype=np.float32)
        for offs in batches:
            vals, valid = ex.run(offs)
            for i in range(len(offs)):
                o, v = int(offs[i]), int(valid[i])
                out[o : o + v] = vals[i][:v]
                if v < c:
                    # short read: EOF only (see FmDemod.discriminate)
                    return rate, out[: o + v]
        return rate, out

    def demodulate(self, stream: Stream) -> tuple[int, np.ndarray]:
        """Full receive chain to audio (``real`` of the re-centered
        sideband, optional audio FIR / rational resample)."""
        rate, audio = self.baseband(stream)
        return _audio_stage(self, rate, audio)
