"""PSK demodulator model (BPSK/QPSK) + ``quadjax psk`` CLI.

No reference counterpart (quadrs demodulates OOK/FSK only): the
conformance target is the model's own contract — block-coherent
synchronization (order-th-power FFT carrier estimate, host-exact
derotation, one-symbol moving-average matched filter, Oerder-Meyr
timing) over the shift->lowpass channel — pinned by a sequential f64
oracle of the same estimator and by exact bit recovery of known
differentially-encoded payloads under carrier offset, phase, noise and
fractional samples-per-symbol.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.models.demod import PskDemod, PskEstimate
from quadrs_tpu.sources import SampleSource

from oracle import OracleArray, OracleLowPass

TAU = 2.0 * np.pi
QPSK_GRAY = {0: (0, 0), 1: (0, 1), 2: (1, 1), 3: (1, 0)}


def psk_iq(
    incr: np.ndarray,
    order: int,
    sps_raw: float,
    sr: int,
    f_off: float = 0.0,
    phase0: float = 0.0,
    noise: float = 0.0,
    seed: int = 0,
    drift: float = 0.0,
) -> np.ndarray:
    """Differentially-encoded PSK at the raw rate: symbol k holds phase
    ``2 pi a_k / order + offset`` with ``a_k = a_{k-1} + incr_k`` (rect
    pulses, symbol k spanning raw samples [k*sps_raw, (k+1)*sps_raw)),
    carried at ``f_off`` Hz with a common phase.  QPSK uses the usual
    pi/4 constellation offset — the receiver must absorb it.  ``drift``
    ramps the carrier linearly (Hz per second) across the burst — a
    warming crystal."""
    a = np.cumsum(np.asarray(incr, dtype=np.int64)) % order
    offset = np.pi / 4 if order == 4 else 0.0
    n = int(round(len(a) * sps_raw))
    k = np.minimum((np.arange(n) / sps_raw).astype(np.int64), len(a) - 1)
    t = np.arange(n) / sr
    ph = (TAU * a[k] / order + offset + phase0
          + TAU * (f_off * t + 0.5 * drift * t * t))
    x = np.cos(ph) + 1j * np.sin(ph)
    if noise:
        rng = np.random.default_rng(seed)
        x = x + noise * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return x.astype(np.complex64)


def want_bits(incr: np.ndarray, order: int) -> str:
    if order == 2:
        return "".join(str(int(v)) for v in incr)
    return "".join(
        "".join(map(str, QPSK_GRAY[int(v)])) for v in incr
    )


def cf32_source(x: np.ndarray, sr: int) -> SampleSource:
    raw = np.empty(2 * len(x), dtype=np.float32)
    raw[0::2] = x.real
    raw[1::2] = x.imag
    return SampleSource(
        np.frombuffer(raw.tobytes(), dtype=np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    )


def oracle_baseband(
    data: np.ndarray, sr: int, bw: int, dec: int, taps: int, chunk: int
) -> tuple[int, np.ndarray]:
    """Sequential mirror of PskDemod.baseband's chunked channel pulls."""
    chan = OracleLowPass(OracleArray(data, sr), bw, dec, taps)
    out = np.empty(chan.length, dtype=np.complex64)
    c = min(chunk, chan.length)
    o = 0
    while o < chan.length:
        x = chan.read_at(o, c)
        out[o : o + len(x)] = x
        if len(x) < c:
            return chan.sample_rate, out[: o + len(x)]
        o += c
    return chan.sample_rate, out


def oracle_analyze(
    rate: int, x: np.ndarray, symbol_rate: float, order: int
) -> tuple[PskEstimate, np.ndarray]:
    """Sequential f64 mirror of PskDemod.analyze: the same estimator
    equations with no device, no f32, no padding tricks beyond the same
    power-of-two FFT length."""
    sps = rate / symbol_rate
    mf_len = max(1, int(round(sps)))
    n = len(x)
    npad = max(256, 1 << (n - 1).bit_length())
    xp = np.zeros(npad, dtype=np.complex128)
    xp[:n] = x

    s_fft = np.fft.fft(xp**order)
    p = np.abs(s_fft) ** 2
    k0 = int(np.argmax(p))
    pm, p0, pp = p[(k0 - 1) % npad], p[k0], p[(k0 + 1) % npad]
    denom = pm - 2.0 * p0 + pp
    delta = 0.0 if denom == 0.0 else 0.5 * (pm - pp) / denom
    delta = min(0.5, max(-0.5, delta))
    khat = k0 + delta
    if khat > npad / 2:
        khat -= npad

    nn = np.arange(npad, dtype=np.float64)
    y = xp * np.exp(-1j * TAU * np.mod(khat * nn, order * npad) / (order * npad))
    s = np.sum(y[:n] ** order)
    phase = math.atan2(s.imag, s.real) / order

    c = np.cumsum(y)
    z = (c - np.concatenate([np.zeros(mf_len), c[:-mf_len]])) / mf_len
    idx = np.arange(npad)
    full = (idx >= mf_len - 1) & (idx < n)
    e = np.sum(np.abs(z) ** 2 * full * np.exp(-1j * TAU * np.mod(nn / sps, 1.0)))
    tau = (-math.atan2(e.imag, e.real) / TAU) % 1.0 * sps

    k_start = max(0, int(math.ceil((mf_len - 1 - tau) / sps)))
    k_end = int(math.floor((n - 1 - tau) / sps))
    t = tau + np.arange(k_start, k_end + 1, dtype=np.float64) * sps
    i = np.minimum(np.floor(t).astype(np.int64), n - 2)
    f = t - i
    sym = (z[i] * (1.0 - f) + z[i + 1] * f) * np.exp(-1j * phase)
    est = PskEstimate(
        freq_hz=khat / (order * npad) * rate,
        phase=phase,
        tau=tau,
        sps=sps,
        rate=int(rate),
        n=n,
    )
    return est, sym


SR, DEC, TAPS, BW = 1_024_000, 8, 128, 20_000
RATE = SR // DEC  # 128 kHz channel


def demod_for(order: int, symbol_rate: float = 8_000.0, **kw) -> PskDemod:
    return PskDemod(
        bandwidth=BW, decimate=DEC, taps=TAPS,
        symbol_rate=symbol_rate, order=order, **kw,
    )


@pytest.mark.parametrize("order", [2, 4])
def test_analyze_matches_oracle(order):
    """Device estimator (f32, planes, masked pad) vs the sequential f64
    oracle on the same baseband: estimates and symbols must agree to
    f32 tolerance."""
    rng = np.random.default_rng(11)
    incr = rng.integers(0, order, 200)
    x = psk_iq(incr, order, SR / 8_000.0, SR, f_off=310.0, phase0=1.1,
               noise=0.02, seed=5)
    demod = demod_for(order)
    rate, base = demod.baseband(cf32_source(x, SR))
    want_rate, want_base = oracle_baseband(x, SR, BW, DEC, TAPS, demod.chunk)
    assert rate == want_rate == RATE
    np.testing.assert_allclose(base, want_base, atol=2e-5)

    est, sym = demod.analyze(rate, base)
    want_est, want_sym = oracle_analyze(rate, want_base.astype(np.complex128),
                                        8_000.0, order)
    bin_hz = rate / (order * (1 << (len(base) - 1).bit_length()))
    assert abs(est.freq_hz - want_est.freq_hz) < 0.1 * bin_hz
    assert abs(est.tau - want_est.tau) < 0.05
    # phase branches are order-fold ambiguous but both sides use the
    # same atan2 branch of nearly-equal sums
    assert abs(est.phase - want_est.phase) < 0.02
    assert len(sym) == len(want_sym)
    np.testing.assert_allclose(sym, want_sym, atol=5e-3)


@pytest.mark.parametrize(
    "order,f_off,phase0,noise,symbol_rate",
    [
        (2, 0.0, 0.0, 0.0, 8_000.0),
        (2, 437.0, 0.3, 0.05, 8_000.0),
        (4, -512.0, 2.1, 0.05, 8_000.0),
        (2, 120.0, 5.0, 0.0, 7_000.0),  # fractional sps = 128000/7000
        (4, 89.0, 0.7, 0.03, 6_400.0),  # sps = 20
    ],
)
def test_exact_bit_recovery(order, f_off, phase0, noise, symbol_rate):
    """Known differential payloads come back exactly (as a substring:
    filter settling and timing clip edge symbols) under carrier offset,
    arbitrary phase, noise, and fractional samples-per-symbol."""
    rng = np.random.default_rng(order * 1000 + int(symbol_rate))
    incr = rng.integers(0, order, 256)
    x = psk_iq(incr, order, SR / symbol_rate, SR, f_off=f_off,
               phase0=phase0, noise=noise, seed=7)
    demod = demod_for(order, symbol_rate)
    est, bits = demod.demodulate(cf32_source(x, SR))
    got = "".join(map(str, bits))
    want = want_bits(incr, order)
    assert got in want
    assert len(got) >= len(want) - 4 * (2 if order == 4 else 1)
    assert abs(est.freq_hz - f_off) < 2.0
    assert abs(est.sps - RATE / symbol_rate) < 1e-9


def test_chunk_size_does_not_change_decisions():
    """The executor pull size moves only the EOF truncation tail; the
    recovered payload is identical at two pull sizes."""
    rng = np.random.default_rng(23)
    incr = rng.integers(0, 2, 200)
    x = psk_iq(incr, 2, SR / 8_000.0, SR, f_off=200.0, phase0=0.9)
    src = cf32_source(x, SR)
    bits_a = demod_for(2, chunk=1 << 16).demodulate(src)[1]
    bits_b = demod_for(2, chunk=977).demodulate(src)[1]
    assert bits_a == bits_b


def test_blockwise_recovers_carrier_drift():
    """A burst whose carrier drifts linearly across it (warming
    crystal): the single whole-burst estimate leaves a residual ramp
    that exceeds the differential drift budget ``symbol_rate / (2 *
    order)`` at the ends — bit errors — while ``block=512`` tracks the
    drift and recovers the payload exactly."""
    rng = np.random.default_rng(77)
    incr = rng.integers(0, 2, 256)
    # 256 symbols at 8k sym/s = 32 ms; 187.5 kHz/s drift sweeps the
    # carrier 6 kHz end-to-end, so the best single estimate (the mean)
    # still leaves ~±3 kHz at the edges > the 2 kHz BPSK budget
    x = psk_iq(incr, 2, SR / 8_000.0, SR, f_off=400.0, phase0=0.7,
               drift=187_500.0)
    src = cf32_source(x, SR)
    want = want_bits(incr, 2)

    _, bits_single = demod_for(2, block=0).demodulate(src)
    got_single = "".join(map(str, bits_single))
    errs = sum(a != b for a, b in zip(got_single, want))
    assert got_single not in want and errs > 5, (
        f"drift burst decoded clean ({errs} errors) — budget test is vacuous"
    )

    est, bits = demod_for(2, block=512).demodulate(src)
    got = "".join(map(str, bits))
    assert got in want
    assert len(got) >= len(want) - 4
    # the reported frequency is the burst-mean of the track: the sweep
    # midpoint (f_off + 3 kHz), not the meaningless single-line fit
    assert abs(est.freq_hz - (400.0 + 3_000.0)) < 150.0


def test_blockwise_matches_single_estimate_without_drift():
    """On a drift-free burst the blockwise path is a no-op detrend: the
    recovered payload is identical and the estimate agrees."""
    rng = np.random.default_rng(78)
    incr = rng.integers(0, 4, 200)
    x = psk_iq(incr, 4, SR / 8_000.0, SR, f_off=-900.0, phase0=1.3,
               noise=0.02, seed=11)
    src = cf32_source(x, SR)
    est0, bits0 = demod_for(4, block=0).demodulate(src)
    est1, bits1 = demod_for(4, block=512).demodulate(src)
    assert bits0 == bits1
    # per-block FFTs are shorter than the whole-burst one, so the
    # blockwise track is a few Hz coarser — irrelevant at 8k sym/s
    assert abs(est0.freq_hz - est1.freq_hz) < 10.0
    assert abs(est0.tau - est1.tau) < 0.05


def test_blockwise_block_too_small_raises():
    x = psk_iq(np.ones(64, np.int64), 2, SR / 8_000.0, SR)
    with pytest.raises(ValueError, match="raise -block"):
        demod_for(2, block=32).demodulate(cf32_source(x, SR))


def test_coherent_slice_positions():
    """differential=False slices absolute constellation positions: ideal
    root-of-unity symbols map straight through (BPSK) and through the
    Gray code (QPSK)."""
    d2 = demod_for(2, differential=False)
    sym = np.exp(1j * TAU * np.array([0, 1, 1, 0, 1]) / 2).astype(np.complex64)
    assert d2.slice(sym) == [0, 1, 1, 0, 1]

    d4 = demod_for(4, differential=False)
    pos = np.array([0, 1, 2, 3, 2])
    sym = np.exp(1j * TAU * pos / 4).astype(np.complex64)
    want = [b for p in pos for b in QPSK_GRAY[int(p)]]
    assert d4.slice(sym) == want


def test_differential_slice_needs_two_symbols():
    with pytest.raises(ValueError, match="2 symbols"):
        demod_for(2).slice(np.ones(1, dtype=np.complex64))


def test_error_surface():
    src = cf32_source(np.ones(4096, dtype=np.complex64), SR)
    with pytest.raises(ValueError, match="order"):
        PskDemod(order=3, symbol_rate=1000.0).channel(src)
    with pytest.raises(ValueError, match="symbol_rate"):
        PskDemod(order=2).channel(src)
    with pytest.raises(ValueError, match="samples/symbol"):
        demod_for(2, symbol_rate=100_000.0).demodulate(src)
    with pytest.raises(ValueError, match="too short"):
        # 4096 raw samples -> (4096-128)/8+1 = 497 channel samples; at
        # 16 sps that is fine, so shrink further via a tiny capture
        demod_for(2).demodulate(cf32_source(np.ones(512, np.complex64), SR))


class TestCli:
    def _capture(self, tmp_path, order, symbol_rate=8_000.0):
        rng = np.random.default_rng(41)
        incr = rng.integers(0, order, 128)
        x = psk_iq(incr, order, SR / symbol_rate, SR, f_off=150.0, phase0=0.4)
        raw = np.empty(2 * len(x), dtype=np.float32)
        raw[0::2] = x.real
        raw[1::2] = x.imag
        path = tmp_path / f"psk-sim.sr{SR}.cf32"
        path.write_bytes(raw.tobytes())
        return path, incr

    @pytest.mark.parametrize("order", [2, 4])
    def test_psk_prints_payload(self, tmp_path, capsys, order):
        from quadrs_tpu.cli import main

        path, incr = self._capture(tmp_path, order)
        rc = main(
            ["psk", "-lowpass", "20k", "-power", "64", "-decimate", "8",
             "-symbol-rate", "8k", "-order", str(order), str(path)]
        )
        assert rc == 0
        out = capsys.readouterr().out.splitlines()
        assert out[0] in want_bits(incr, order)
        assert f"psk: {len(out[0])} bits" in out[1]
        assert "freq" in out[1] and "sps 16" in out[1]

    def test_psk_block_flag_tracks_drift(self, tmp_path, capsys):
        """``-block`` from the shell: the drifting burst that defeats
        the single estimate decodes exactly with -block 512, and serve
        gates the flag to -mode psk."""
        from quadrs_tpu import args as argmod
        from quadrs_tpu.cli import main

        rng = np.random.default_rng(79)
        incr = rng.integers(0, 2, 256)
        x = psk_iq(incr, 2, SR / 8_000.0, SR, f_off=400.0, phase0=0.7,
                   drift=187_500.0)
        raw = np.empty(2 * len(x), dtype=np.float32)
        raw[0::2], raw[1::2] = x.real, x.imag
        path = tmp_path / f"psk-drift.sr{SR}.cf32"
        path.write_bytes(raw.tobytes())

        base = ["psk", "-lowpass", "20k", "-power", "64", "-decimate", "8",
                "-symbol-rate", "8k"]
        assert main(base + [str(path)]) == 0
        single = capsys.readouterr().out.splitlines()[0]
        assert main(base + ["-block", "512", str(path)]) == 0
        blocked = capsys.readouterr().out.splitlines()[0]
        want = want_bits(incr, 2)
        assert single not in want and blocked in want

        (cmd,) = argmod.parse(
            ["serve", "-mode", "psk", "-symbol-rate", "8k", "-block", "512",
             "-sr", "1M", "-format", "cf32"]
        )
        assert cmd.block == 512
        rc = main(["serve", "-mode", "stream", "-block", "512",
                   "-sr", "1M", "-format", "cf32"])
        assert rc == 1
        assert "-block does not apply to -mode stream" in (
            capsys.readouterr().err
        )

    def test_psk_matches_library(self, tmp_path, capsys):
        from quadrs_tpu.cli import main

        path, incr = self._capture(tmp_path, 2)
        assert main(["psk", "-lowpass", "20k", "-power", "64", "-decimate",
                     "8", "-symbol-rate", "8k", str(path)]) == 0
        line = capsys.readouterr().out.splitlines()[0]
        demod = PskDemod(bandwidth=20_000, decimate=8, taps=128,
                         symbol_rate=8_000.0, order=2)
        from quadrs_tpu.sources import open_capture

        _, bits = demod.demodulate(open_capture(str(path)))
        assert line == "".join(map(str, bits))

    def test_psk_plot_writes_constellation(self, tmp_path, capsys):
        from PIL import Image

        from quadrs_tpu.cli import main
        from quadrs_tpu.viz.constellation import SIZE, constellation_render

        path, _ = self._capture(tmp_path, 4)
        png = tmp_path / "const.png"
        args = ["psk", "-lowpass", "20k", "-power", "64", "-decimate", "8",
                "-symbol-rate", "8k", "-order", "4", "-plot", str(png),
                str(path)]
        assert main(args) == 0
        out = capsys.readouterr().out
        assert f"constellation -> {png}" in out
        img = np.asarray(Image.open(png))
        assert img.shape == (SIZE, SIZE, 3)
        assert (img[..., 2] > 0).sum() > 4  # symbol hits landed
        # overwrite guard, then -overwrite yes
        assert main(args) == 1
        assert "Error:" in capsys.readouterr().err
        assert main(args[:1] + ["-overwrite", "yes"] + args[1:]) == 0

    def test_constellation_ideal_burst_clusters_on_markers(self):
        """Symbols that ARE the four roots of unity land exactly on the
        ideal-marker centers (median magnitude 1, so the markers sit on
        the symbol pixels)."""
        from quadrs_tpu.viz.constellation import (
            SIZE,
            _MARK_HALF,
            constellation_render,
        )

        # magnitudes alternate 0.9/1.1 so the median is 1.0: markers sit
        # on the unit ring while symbol pixels cluster ~10 px off it
        # (exactly-ideal symbols would be overdrawn by the markers)
        mag = np.where((np.arange(400) // 4) % 2 == 0, 0.9, 1.1)
        sym = (mag * np.exp(1j * TAU * (np.arange(400) % 4) / 4)).astype(
            np.complex64
        )
        img = constellation_render(sym, 4)
        half, scale = SIZE // 2, 0.38 * SIZE
        centers = [
            (
                int(np.clip(round(half - np.sin(a) * scale), 0, SIZE - 1)),
                int(np.clip(round(half + np.cos(a) * scale), 0, SIZE - 1)),
            )
            for a in TAU * np.arange(4) / 4
        ]
        blue = np.argwhere(img[..., 2] > 80)
        assert len(blue) >= 8  # two magnitudes x four phases
        for r, c in blue:
            assert any(
                abs(r - mr) <= 14 and abs(c - mc) <= 14 for mr, mc in centers
            ), (r, c)
        # and the markers themselves are drawn (crosshair centers)
        for mr, mc in centers:
            assert img[mr, mc, 0] == 255
        assert _MARK_HALF >= 2  # the crosshairs are visible, not 1 px

    def test_psk_parse_errors(self, capsys):
        from quadrs_tpu.cli import main

        assert main(["psk"]) == 1
        assert "requires a capture filename" in capsys.readouterr().err
        assert main(["psk", "x.sr1M.cf32"]) == 1
        assert "-symbol-rate" in capsys.readouterr().err
        assert main(["psk", "-symbol-rate", "8k", "-order", "3",
                     "x.sr1M.cf32"]) == 1
        assert "-order" in capsys.readouterr().err

    def test_usage_lists_psk(self):
        from quadrs_tpu.cli import USAGE

        assert "psk [-shift 0]" in USAGE
