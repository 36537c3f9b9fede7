"""Extended benchmark suite: the BASELINE stretch configs.

``bench.py`` prints the single headline line for the driver (with this
suite folded into its ``suite`` field); standalone, this module measures
the stretch configurations (BASELINE.json configs 2-4) plus the
sustained disk paths and prints one JSON line each:

* ``cs16-sustained``   — on-chip cs16 decode -> shift -> lowpass(dec 64)
* ``long-fir``         — power=2000 (4000 taps) spectral chain
* ``waterfall-64xcs8`` — 64 parallel cs8 streams, 1024-pt STFT (fused kernel)
* ``waterfall-strided``— the same bank at 4x window overlap (in-kernel
  assembly; carries the strided ``search_msps`` too)
* ``waterfall-search`` — the bank reduced to peak bins in-kernel
* ``disk-staging``     — disk->host feed rate over the 1G-sample capture
* ``disk-sustained``   — the 1G-sample cs8 capture streamed end-to-end
  through StreamRunner (C++ ring prefetch -> host staging -> device)
* ``long-fir-sustained`` — BASELINE config 4 as written: the power=2000
  chain over the 1G-sample capture from disk
* ``staging-workers``  — prefetcher feed rate vs n_workers

Compute entries carry roofline annotations (algorithmic GFLOP/s, % of
the v5e f32-matmul ceiling, minimal HBM GB/s) and the observed
timing-linearity ratio; timing uses the full-output accumulator harness
(see bench.py / utils.timing).
"""

from __future__ import annotations

import json
import math
import os

import jax
import numpy as np

from quadrs_tpu.utils.timing import measure_msps_acc

# -- roofline constants (TPU v5e, public specs) -----------------------------
# 197 TFLOP/s bf16 MXU peak; f32 matmuls at Precision.HIGHEST run as
# ~6 bf16 passes, so the f32 ceiling is ~197/6.  HBM: 819 GB/s.
V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = V5E_BF16_TFLOPS / 6.0
V5E_HBM_GBPS = 819.0


def chain_flops_per_sample(taps: int, decimate: int, fft_width: int, mixed: bool = True) -> float:
    """Algorithmic (direct-form-equivalent) FLOPs per *input* sample of
    the shift -> FIR(decimate) -> STFT chain: complex NCO mix 6; real-tap
    complex FIR 4·taps per output at rate 1/D; complex FFT by the
    standard 5·W·log2(W) convention plus 4·W for the norms.  This counts
    useful work, independent of implementation (overlap-save or four-
    step kernels do fewer/other executed ops — DESIGN.md discusses)."""
    f = 6.0 if mixed else 0.0
    f += 4.0 * taps / decimate
    f += (5.0 * math.log2(fft_width) + 4.0) / decimate
    return f


def stft_flops_per_sample(fft_width: int, stride: int) -> float:
    """Waterfall bank: FFT + norms per input sample at window stride."""
    return (5.0 * fft_width * math.log2(fft_width) + 4.0 * fft_width) / stride


def roofline(msps: float, flops_ps: float, bytes_ps: float) -> dict:
    """Annotate a measured rate with its roofline position: algorithmic
    GFLOP/s (and % of the v5e f32-matmul ceiling) plus minimal HBM
    traffic GB/s (native input read + f32 output write, the fused-kernel
    traffic model; XLA-chain intermediates add more)."""
    g = msps * 1e6 * flops_ps / 1e9
    bw = msps * 1e6 * bytes_ps / 1e9
    return {
        "gflops": round(g, 1),
        "pct_f32_matmul_peak": round(100.0 * g / (V5E_F32_TFLOPS * 1e3), 2),
        "hbm_gbps": round(bw, 1),
        "pct_hbm_peak": round(100.0 * bw / V5E_HBM_GBPS, 2),
    }


def make_acc_step(model, chunk, on_accel):
    """Fused Pallas frontend on TPU when the config supports it; every
    iteration's full output is summed into the carried scalar so the
    lazily-materializing tunneled runtime cannot skip any of it (see
    bench.py / measure_msps_acc)."""
    import jax.numpy as jnp

    if on_accel and model.pallas_preferred():
        bases = [
            jax.device_put(np.asarray(model.stream_bases(k * chunk, chunk + model.cfg.taps)))
            for k in range(16)
        ]

        @jax.jit
        def _acc(raw, b, acc):
            return acc + jnp.sum(model.step_stream_pallas(raw, b))

    else:
        thetas = model.theta0(np.arange(16, dtype=np.int64) * chunk)
        bases = [jnp.float32(t) for t in thetas]

        @jax.jit
        def _acc(raw, theta, acc):
            return acc + jnp.sum(model.step_stream(raw, theta))

    def make(raw):
        def step(i, acc):
            return _acc(raw, bases[i % 16], acc)

        return step

    return make


def bench_cs16_sustained(on_accel: bool) -> dict:
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel

    cfg = PipelineConfig(
        sample_rate=61_440_000,
        shift_freq=1_000_000,
        lp_freq=480_000,
        decimate=64,
        taps=512,
        fft_width=64,
        fmt=FileFormat.COMPLEX_INT16,
    )
    model = PipelineModel(cfg)
    # round-4 chunk sweep: 2^22 -> 4999, 2^23 -> 4983, 2^24 -> 4522
    # Msps — the old 2^24 chunk left ~10% on the table
    chunk = (1 << 22) if on_accel else (1 << 20)
    raw = jax.device_put(model.synth_raw(chunk + cfg.taps))
    step = make_acc_step(model, chunk, on_accel)(raw)
    tstats: dict = {}
    msps = measure_msps_acc(
        step, chunk, 2.0 if on_accel else 0.3, min_iters=2, stats_out=tstats
    )
    entry = {
        "metric": "cs16 on-chip decode + shift + lowpass(dec64) + stft",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            chain_flops_per_sample(cfg.taps, cfg.decimate, cfg.fft_width),
            cfg.fmt.pair_bytes + 4.0 / cfg.decimate,
        )
    )
    return entry


def bench_long_fir(on_accel: bool) -> dict:
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel

    cfg = PipelineConfig(
        sample_rate=21_000_000,
        shift_freq=280_000,
        lp_freq=50_000,
        decimate=32,
        taps=4000,  # lowpass -power 2000
        fft_width=64,
        fmt=FileFormat.COMPLEX_FLOAT32,
    )
    model = PipelineModel(cfg)
    chunk = (1 << 23) if on_accel else (1 << 19)
    raw = jax.device_put(model.synth_raw(chunk + cfg.taps))
    step = make_acc_step(model, chunk, on_accel)(raw)
    tstats: dict = {}
    msps = measure_msps_acc(
        step, chunk, 2.0 if on_accel else 0.3, min_iters=2, stats_out=tstats
    )
    entry = {
        "metric": "power=2000 (4000-tap) lowpass chain",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            chain_flops_per_sample(cfg.taps, cfg.decimate, cfg.fft_width),
            cfg.fmt.pair_bytes + 4.0 / cfg.decimate,
        )
    )
    return entry


def bench_waterfall(on_accel: bool) -> dict:
    from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel

    import jax.numpy as jnp

    cfg = WaterfallConfig(n_streams=64, fft_width=1024, stride=1024)
    model = WaterfallModel(cfg)
    # measured on v5e with the fused Pallas kernel: 2^17/stream is the
    # sweet spot (15.7-16.6 Gsps; 2^16 -> 11.2, 2^18 -> 12.9); the XLA
    # fallback peaks lower and earlier (7.2 Gsps at 2^15-2^16)
    per_stream = (1 << 17) if on_accel else (1 << 14)
    raw = jax.device_put(model.synth_raw(per_stream))
    total = cfg.n_streams * per_stream

    # full-output reduction into the carried scalar (see bench.py)
    @jax.jit
    def _acc(raw, acc):
        return acc + jnp.sum(model.step(raw))

    def step(i, acc):
        return _acc(raw, acc)

    tstats: dict = {}
    msps = measure_msps_acc(
        step, total, 2.0 if on_accel else 0.3, min_iters=2, stats_out=tstats
    )

    # wide tiled coverage: 4096-pt stride 4096 routes through the
    # strided machinery (the tiled kernel itself needs 22.1M scoped
    # VMEM > the 16M limit at b=32); round 4 measured 14.3 Gsps vs 8.9
    # XLA with full 128-window tiles (2^19 samples/stream)
    wcfg = WaterfallConfig(n_streams=64, fft_width=4096, stride=4096)
    wmodel = WaterfallModel(wcfg)
    w_per = (1 << 19) if on_accel else (1 << 14)
    wraw = jax.device_put(wmodel.synth_raw(w_per))
    w_total = wcfg.n_streams * w_per

    @jax.jit
    def _acc_w(raw, acc):
        return acc + jnp.sum(wmodel.step(raw))

    wide_msps = measure_msps_acc(
        lambda i, acc: _acc_w(wraw, acc), w_total, 2.0 if on_accel else 0.3, min_iters=2
    )

    entry = {
        "metric": "64x parallel cs8 fused decode + 1024-pt strided STFT",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip (aggregate)",
        "vs_baseline": round(msps / 100.0, 2),
        "tiled_4096_msps": round(wide_msps, 1),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            stft_flops_per_sample(cfg.fft_width, cfg.stride),
            cfg.fmt.pair_bytes + 4.0 * cfg.fft_width / cfg.stride,
        )
    )
    return entry


def bench_waterfall_strided(on_accel: bool) -> dict:
    """Config 5's *strided* STFT at 4x overlap (1024-pt, stride 256):
    the in-kernel class-row window assembly reads and decodes each input
    sample once regardless of overlap (the round-2 XLA pre-arrangement
    paid ~2x: 1923 Msps; in-kernel measured 3155)."""
    from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel

    import jax.numpy as jnp

    cfg = WaterfallConfig(n_streams=64, fft_width=1024, stride=256)
    model = WaterfallModel(cfg)
    # smaller per-stream chunks win for the overlapped kernel (measured
    # 2^16 -> 3155, 2^17 -> 2412 Msps input)
    per_stream = (1 << 16) if on_accel else (1 << 13)
    raw = jax.device_put(model.synth_raw(per_stream))
    total = cfg.n_streams * per_stream

    @jax.jit
    def _acc(raw, acc):
        return acc + jnp.sum(model.step(raw))

    tstats: dict = {}
    msps = measure_msps_acc(
        lambda i, acc: _acc(raw, acc),
        total,
        2.0 if on_accel else 0.3,
        min_iters=2,
        stats_out=tstats,
    )
    # the config's literal ask is strided *search*: same windows, peak
    # reduced per page in VMEM (measured 4930 Msps input vs 3155 norms)
    sj = model.jit_search()

    @jax.jit
    def _acc_s(raw, acc):
        i, m = sj(raw)
        return acc + jnp.sum(m) + jnp.sum(i.astype(jnp.float32))

    search_msps = measure_msps_acc(
        lambda i, acc: _acc_s(raw, acc), total, 2.0 if on_accel else 0.3, min_iters=2
    )

    # wide-width coverage: 4096-pt at 4x overlap (b=32), where the
    # round-4 two-factor stage-A split lifted 931 -> 2833 Msps (search
    # 1099 -> 5075); 2^17/stream keeps tile padding negligible (nw=125)
    wcfg = WaterfallConfig(n_streams=64, fft_width=4096, stride=1024)
    wmodel = WaterfallModel(wcfg)
    w_per = (1 << 17) if on_accel else (1 << 14)
    wraw = jax.device_put(wmodel.synth_raw(w_per))
    w_total = wcfg.n_streams * w_per

    @jax.jit
    def _acc_w(raw, acc):
        return acc + jnp.sum(wmodel.step(raw))

    wide_msps = measure_msps_acc(
        lambda i, acc: _acc_w(wraw, acc), w_total, 2.0 if on_accel else 0.3, min_iters=2
    )
    wsj = wmodel.jit_search()

    @jax.jit
    def _acc_ws(raw, acc):
        i, m = wsj(raw)
        return acc + jnp.sum(m) + jnp.sum(i.astype(jnp.float32))

    wide_search = measure_msps_acc(
        lambda i, acc: _acc_ws(wraw, acc), w_total, 2.0 if on_accel else 0.3, min_iters=2
    )

    # small-chunk coverage: 2^15/stream is 29 windows, where the
    # round-4 adaptive window tile (_pick_win_tile: shrink to a
    # 32-multiple instead of padding to 128) stops the pro-rata
    # padding loss the fixed 128 tile paid on sub-tile chunks
    s_per = (1 << 15) if on_accel else (1 << 13)
    sraw = jax.device_put(wmodel.synth_raw(s_per))
    s_total = wcfg.n_streams * s_per
    small_msps = measure_msps_acc(
        lambda i, acc: _acc_w(sraw, acc), s_total, 2.0 if on_accel else 0.3, min_iters=2
    )
    small_search = measure_msps_acc(
        lambda i, acc: _acc_ws(sraw, acc), s_total, 2.0 if on_accel else 0.3, min_iters=2
    )

    # sublane-aligned stride coverage: stride 96 (g=32, P=4) routes the
    # SEARCH through the class-interleave wrapper (round 4: 1128 vs 845
    # Msps pre-arranged; norms measured a dead end and stay pre-arranged)
    acfg = WaterfallConfig(n_streams=64, fft_width=1024, stride=96)
    amodel = WaterfallModel(acfg)
    a_per = (1 << 16) if on_accel else (1 << 13)
    araw = jax.device_put(amodel.synth_raw(a_per))
    a_total = acfg.n_streams * a_per
    asj = amodel.jit_search()

    @jax.jit
    def _acc_as(raw, acc):
        i, m = asj(raw)
        return acc + jnp.sum(m) + jnp.sum(i.astype(jnp.float32))

    subal_search = measure_msps_acc(
        lambda i, acc: _acc_as(araw, acc), a_total, 2.0 if on_accel else 0.3, min_iters=2
    )

    entry = {
        "metric": "64x cs8 strided waterfall (1024-pt, stride 256: 4x overlap; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip (aggregate input)",
        "vs_baseline": round(msps / 100.0, 2),
        "search_msps": round(search_msps, 1),
        "wide_4096_msps": round(wide_msps, 1),
        "wide_4096_search_msps": round(wide_search, 1),
        "wide_4096_29win_msps": round(small_msps, 1),
        "wide_4096_29win_search_msps": round(small_search, 1),
        "subaligned_stride96_search_msps": round(subal_search, 1),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            stft_flops_per_sample(cfg.fft_width, cfg.stride),
            cfg.fmt.pair_bytes + 4.0 * cfg.fft_width / cfg.stride,
        )
    )
    return entry


def bench_waterfall_search(on_accel: bool) -> dict:
    """BASELINE config 5's stated purpose — spectrogram *search*: per
    (stream, window) peak bin + magnitude.  Through the fused kernel the
    reduction happens in VMEM and the spectrogram never touches HBM."""
    from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel

    import jax.numpy as jnp

    cfg = WaterfallConfig(n_streams=64, fft_width=1024, stride=1024)
    model = WaterfallModel(cfg)
    per_stream = (1 << 17) if on_accel else (1 << 14)
    raw = jax.device_put(model.synth_raw(per_stream))
    total = cfg.n_streams * per_stream
    sj = model.jit_search()

    @jax.jit
    def _acc(raw, acc):
        i, m = sj(raw)
        return acc + jnp.sum(m) + jnp.sum(i.astype(jnp.float32))

    tstats: dict = {}
    msps = measure_msps_acc(
        lambda i, acc: _acc(raw, acc),
        total,
        2.0 if on_accel else 0.3,
        min_iters=2,
        stats_out=tstats,
    )

    # band survey (quadjax scan): in-kernel window-axis reduction vs the
    # runner's pre-round-4 spelling (norms to HBM + jitted XLA reduce)
    scj = model.jit_scan()
    stepj = model.jit_step()

    @jax.jit
    def _acc_scan(raw, thr, acc):
        s, mx, ab = scj(raw, thr)
        return acc + jnp.sum(s) + jnp.sum(mx) + jnp.sum(ab)

    @jax.jit
    def _acc_scan_xla(raw, thr, acc):
        norms = stepj(raw)
        return (
            acc
            + jnp.sum(norms.astype(jnp.float32).sum(axis=1))
            + jnp.sum(jnp.max(norms, axis=1))
            + jnp.sum(jnp.sum((norms > thr).astype(jnp.float32), axis=1))
        )

    thr = jnp.float32(8.0)
    scan_msps = measure_msps_acc(
        lambda i, acc: _acc_scan(raw, thr, acc), total, 2.0 if on_accel else 0.3, min_iters=2
    )
    scan_xla = measure_msps_acc(
        lambda i, acc: _acc_scan_xla(raw, thr, acc), total, 2.0 if on_accel else 0.3, min_iters=2
    )

    entry = {
        "metric": "64x cs8 waterfall peak search (in-kernel reduction)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip (aggregate)",
        "vs_baseline": round(msps / 100.0, 2),
        "scan_msps": round(scan_msps, 1),
        "scan_xla_reduce_msps": round(scan_xla, 1),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            stft_flops_per_sample(cfg.fft_width, cfg.stride),
            # search output: one (bin, mag) pair per window — ~0 bytes/sample
            cfg.fmt.pair_bytes + 8.0 / cfg.fft_width,
        )
    )
    return entry


def bench_channelizer(on_accel: bool) -> dict:
    """Polyphase filter bank: all K channels in one pass vs K separate
    shift+lowpass chains (the reference's only way to extract them).

    Input rate of the bank step (branch FMAs + cross-branch MXU DFT);
    ``vs_separate`` A/Bs it against the naive composition — K
    full-rate NCO mixes + K decimating FIRs built from the same
    validated ops — on the same chunk in the same session.
    """
    import jax.numpy as jnp

    from quadrs_tpu.ops.channelizer import channelize_block
    from quadrs_tpu.ops.fir import fir_decimate, lowpass_taps

    k, taps_n = 16, 128
    n_out = (1 << 16) if on_accel else (1 << 13)
    chunk = n_out * k
    taps = lowpass_taps(1.0 / (2 * k), taps_n)

    rng = np.random.default_rng(7)
    xr = jnp.asarray(rng.standard_normal(chunk + taps_n).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(chunk + taps_n).astype(np.float32))
    gains = np.linspace(0.5, 1.5, 16, dtype=np.float32)  # defeat CSE

    @jax.jit
    def _bank(g, acc):
        x = (jax.lax.complex(xr, xi) * g)[None, :]
        out = channelize_block(x, taps, k, n_out)
        return acc + jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

    # the naive alternative: K premixed band-pass FIRs (mix folded into
    # complex taps — already the *fast* XLA spelling; a per-sample NCO
    # mix per channel would only be slower)
    premixed = [
        (taps.astype(np.complex128) * np.exp(-2j * np.pi * np.arange(taps_n) * ch / k)).astype(np.complex64)
        for ch in range(k)
    ]

    @jax.jit
    def _separate(g, acc):
        x = (jax.lax.complex(xr, xi) * g)[None, :]
        for ch in range(k):
            y = fir_decimate(x, premixed[ch], k, n_out, impl="auto")
            acc = acc + jnp.sum(jnp.real(y) ** 2 + jnp.imag(y) ** 2)
        return acc

    def step_of(fn):
        return lambda i, acc: fn(jnp.float32(gains[i % 16]), acc)

    secs = 2.0 if on_accel else 0.3
    tstats: dict = {}
    msps = measure_msps_acc(step_of(_bank), chunk, secs, min_iters=2, stats_out=tstats)
    sep = measure_msps_acc(step_of(_separate), chunk, secs, min_iters=2)
    entry = {
        "metric": f"{k}-channel polyphase bank (128-tap prototype; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        "separate_chains_msps": round(sep, 1),
        "vs_separate": round(msps / max(sep, 1e-9), 2),
        **tstats,
    }
    # per input sample: branch FIRs = N complex*real MACs (4 flops each)
    # and the dense K-point DFT = K^2 complex MACs per K inputs = 8*K
    entry.update(roofline(msps, 4.0 * taps_n + 8.0 * k, 8.0))

    # wide-K sweep at a fixed 8-taps-per-branch prototype (the standard
    # design scales the prototype with K; a fixed 128-tap prototype at
    # K=1024 would leave <1 tap per branch).  Checks the cross-branch
    # DFT's routing (ops/stft.batched_fft -> mxu_fft_choice at wide K)
    # and the (frames, U*K) layout for cliffs.
    k_sweep: dict = {}
    for kw in (64, 256, 1024):
        taps_w = lowpass_taps(1.0 / (2 * kw), 8 * kw)
        n_out_w = ((1 << 20) if on_accel else (1 << 15)) // kw
        chunk_w = n_out_w * kw
        xr_w = jnp.asarray(
            rng.standard_normal(chunk_w + 8 * kw).astype(np.float32)
        )
        xi_w = jnp.asarray(
            rng.standard_normal(chunk_w + 8 * kw).astype(np.float32)
        )

        def _bank_w(g, acc, xr_w=xr_w, xi_w=xi_w, taps_w=taps_w, kw=kw, n_out_w=n_out_w):
            x = (jax.lax.complex(xr_w, xi_w) * g)[None, :]
            out = channelize_block(x, taps_w, kw, n_out_w)
            return acc + jnp.sum(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

        bank_w = jax.jit(_bank_w)
        w_msps = measure_msps_acc(
            step_of(bank_w), chunk_w, 1.5 if on_accel else 0.3, min_iters=2
        )
        k_sweep[str(kw)] = round(w_msps, 1)
    entry["k_sweep_msps"] = k_sweep
    entry["k_sweep_taps_per_branch"] = 8
    return entry


def bench_resample(on_accel: bool) -> dict:
    """Rational resampler at L/M = 147/160 (the 48 kHz -> 44.1 kHz
    family — the classic awkward ratio) over a 64-stream bank: input
    rate of the per-phase weight matmul (``ops/resample.resample_block``,
    one ``(nb, m) @ (m, L)`` per stream per block)."""
    import jax.numpy as jnp

    from quadrs_tpu.ops.resample import resample_block, resample_tables

    up, down = 147, 160
    size = 2 * 8 * max(up, down)
    _, _, m, _ = resample_tables(size, up, down)
    b = 64
    n_out = (1 << 14) if on_accel else (1 << 11)
    nb = -(-n_out // up)
    n_in = (nb - 1) * down + m

    rng = np.random.default_rng(11)
    xr = jnp.asarray(rng.standard_normal((b, n_in)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, n_in)).astype(np.float32))
    w_sel = jnp.zeros((b,), dtype=jnp.int32)
    gains = np.linspace(0.5, 1.5, 16, dtype=np.float32)  # defeat CSE

    @jax.jit
    def _step(g, acc):
        x = jax.lax.complex(xr, xi) * g
        y = resample_block(x, w_sel, size, up, down, n_out)
        return acc + jnp.sum(jnp.real(y) ** 2 + jnp.imag(y) ** 2)

    step = lambda i, acc: _step(jnp.float32(gains[i % 16]), acc)
    chunk = b * nb * down  # input samples consumed per iteration
    secs = 2.0 if on_accel else 0.3
    tstats: dict = {}
    msps = measure_msps_acc(step, chunk, secs, min_iters=2, stats_out=tstats)
    entry = {
        "metric": f"64x rational resample {up}/{down} (per-phase weight matmul; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        **tstats,
    }
    # executed dense flops: nb*m*L complex-x-real MACs (4 flops) per
    # ~nb*down inputs (the weight matrix carries the polyphase zeros;
    # the MXU computes them — that IS the design, m x L stays matmul-
    # shaped instead of gather-shaped)
    entry.update(roofline(msps, 4.0 * m * up / down, 8.0 * (1.0 + up / down)))
    return entry


def bench_find(on_accel: bool) -> dict:
    """Matched-filter pattern search (sinks.find_pattern's device
    program): input rate at which capture samples are scanned for a
    1024-sample template — overlap-save FFT correlation + cumsum energy
    window, B windows per dispatch, each window advancing c-l+1 lags.
    ``freq_grid9_msps`` re-runs with a 9-row carrier-offset grid (the
    -freq-tol path; 9 matched filters per window on a batched axis)."""
    import jax.numpy as jnp

    from quadrs_tpu.ops.correlate import make_xcorr_post

    l = 1024
    c = (1 << 16) if on_accel else (1 << 13)
    n_out = c - l + 1
    b = 4
    rng = np.random.default_rng(11)
    pat = (rng.standard_normal(l) + 1j * rng.standard_normal(l)).astype(np.complex64)
    xr = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
    gains = np.linspace(0.5, 1.5, 16, dtype=np.float32)  # defeat CSE

    def step_of(post):
        @jax.jit
        def _run(g, acc):
            x = jax.lax.complex(xr, xi) * g
            score, scale, fidx = post(x)
            return acc + jnp.sum(score) + jnp.sum(scale) + jnp.sum(fidx)

        return lambda i, acc: _run(jnp.float32(gains[i % 16]), acc)

    secs = 2.0 if on_accel else 0.3
    tstats: dict = {}
    msps = measure_msps_acc(
        step_of(make_xcorr_post(pat, c)), b * n_out, secs, min_iters=2,
        stats_out=tstats,
    )
    grid = np.arange(-4, 5, dtype=np.float64) * 0.4 / l  # cycles/sample
    grid_msps = measure_msps_acc(
        step_of(make_xcorr_post(pat, c, grid)), b * n_out, secs, min_iters=2
    )
    # standing A/B: the default (auto -> the three-factor MXU split,
    # a+b1+b2 = 128 MACs/sample at c=65536) vs the two-factor split
    # (a+b = 1088) vs XLA's butterfly FFT.  At this THIN dispatch
    # (B=4, 262k samples) the three-vs-four ordering is session-
    # dependent on the tunneled v5e: 798/667/526 and 563/134/126 one
    # day (three first), 604-670 / 730-733 / 612-740 another (four
    # first, ~10-20%).  The fat-dispatch sweeps behind mxu_fft_choice
    # (~2M samples/dispatch) picked three at 65536 decisively; the
    # router keeps that, and these columns track the thin case.
    fs_msps = measure_msps_acc(
        step_of(make_xcorr_post(pat, c, fft_impl="four_step")),
        b * n_out, secs, min_iters=2,
    )
    xla_msps = measure_msps_acc(
        step_of(make_xcorr_post(pat, c, fft_impl="xla")),
        b * n_out, secs, min_iters=2,
    )
    # the PRODUCT dispatch: find_pattern's fat batches (FIND_DISPATCH_
    # BUDGET lags/dispatch) through the device-side hierarchical
    # candidate scan (per-block max/count + small top-k — the flat
    # lax.top_k sort it replaced out-cost the whole FFT correlation;
    # boundary scalars to the host instead of 12 bytes/lag).  Threshold
    # 0.5 on noise windows == the realistic zero-candidate scan regime
    # (noise scores ~ l^-1/2 ~ 0.03).  c_auto = max(4*l, 4096) is the
    # product default block (chunk=None): effective DFT MACs/sample
    # shrink faster than the lag yield once extraction stopped
    # dominating — measured single 1281 -> 2286 Msps, grid-9 247 -> 550
    # vs c=65536 (same-session v5e).  The c=65536 columns keep the
    # cross-round comparison alive.
    from quadrs_tpu.sinks import FIND_DISPATCH_BUDGET, FIND_TOPK

    def fat_rate(cw: int, freqs) -> float:
        n_o = cw - l + 1
        bf = max(4, FIND_DISPATCH_BUDGET // n_o) if on_accel else 8
        xrf = jnp.asarray(rng.standard_normal((bf, cw)).astype(np.float32))
        xif = jnp.asarray(rng.standard_normal((bf, cw)).astype(np.float32))
        post = make_xcorr_post(pat, cw, freqs, extract=(0.5, FIND_TOPK))

        @jax.jit
        def _run(g, acc):
            x = jax.lax.complex(xrf, xif) * g
            res = post(x, jnp.float32(-np.inf))
            for leaf in res:
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc

        return measure_msps_acc(
            lambda i, acc: _run(jnp.float32(gains[i % 16]), acc),
            bf * n_o, secs, min_iters=2,
        )

    c_auto = max(4 * l, 4096)
    fat_auto = fat_rate(c_auto, None)
    fat_auto_grid = fat_rate(c_auto, grid)
    fat_msps = fat_rate(c, None)
    fat_grid_msps = fat_rate(c, grid)
    entry = {
        "metric": (
            f"pattern search (l={l}, auto FFT block {c_auto}, product "
            "dispatch; input rate)"
        ),
        "value": round(fat_auto, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(fat_auto / 100.0, 2),
        "freq_grid9_msps": round(fat_auto_grid, 1),
        "thin_c65536_msps": round(msps, 1),
        "thin_grid9_c65536_msps": round(grid_msps, 1),
        "four_step_msps": round(fs_msps, 1),
        "xla_fft_msps": round(xla_msps, 1),
        "fat_c65536_msps": round(fat_msps, 1),
        "fat_grid9_c65536_msps": round(fat_grid_msps, 1),
        **tstats,
    }
    # per NEW input sample: one forward + one inverse FFT of c_auto
    # amortized over its lags (~5*c*log2(c) flops each), 6-flop
    # pointwise multiply, and the |.|^2 + prefix + divide epilogue
    entry.update(
        roofline(
            fat_auto,
            (10.0 * c_auto * np.log2(c_auto) + 6.0 * c_auto)
            / (c_auto - l + 1)
            + 12.0,
            8.0,
        )
    )
    return entry


# -- demodulator family ------------------------------------------------------


def _demod_capture(n: int) -> str:
    """Synthetic cf32 capture for the demod benches (noise + an FM-ish
    carrier at -280 kHz so `shift 280k` centers it), cached on disk."""
    path = f"/tmp/quadrs-demod-{n}.sr21M.cf32"
    want = n * 8
    if not (os.path.exists(path) and os.path.getsize(path) == want):
        rng = np.random.default_rng(17)
        t = np.arange(n, dtype=np.float64) / 21e6
        ph = 2 * np.pi * (-280e3 * t) + 1.5 * np.sin(2 * np.pi * 1e3 * t)
        x = 0.5 * np.exp(1j * ph)
        x += 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        x.astype(np.complex64).tofile(path)
    return path


def _staged_chain_step(chain, n: int, offs: np.ndarray, post):
    """One-time host staging of a window batch over ``chain`` (the same
    span/plan logic as runtime.Executor.run), returning a jitted step
    that re-runs the exact product program (read_batch -> post) with
    every output folded into the carried scalar.  A 16-value gain cycle
    on the staged planes defeats any cross-iteration caching (cf32
    decode is linear, so scaled planes are just a scaled capture)."""
    import jax.numpy as jnp

    from quadrs_tpu.runtime import _round_up_pow2

    src = chain.root()
    offs = np.asarray(offs, dtype=np.int64)
    lo, _ = chain.span(int(offs.min()), n)
    s_off, s_n = chain.span(int(offs.max()), n)
    lo = max(0, min(lo, src.length))
    hi = max(lo, min(s_off + s_n, src.length))
    staged = src.stage(lo, hi)
    cap = _round_up_pow2(staged.shape[-1])
    if staged.shape[-1] < cap:
        staged = np.pad(staged, ((0, 0), (0, cap - staged.shape[-1])))
    plan = chain.plan(offs, n, lo)
    raw = jax.device_put(staged)
    prep = jax.device_put(plan.prep)
    gains = np.linspace(0.5, 1.5, 16, dtype=np.float32)

    @jax.jit
    def _acc(g, acc):
        x = chain.read_batch({"buf": raw * g}, prep, n)
        y = post(x) if post is not None else x
        for leaf in jax.tree_util.tree_leaves(y):
            if jnp.issubdtype(leaf.dtype, jnp.complexfloating):
                acc = acc + jnp.sum(jnp.real(leaf)) + jnp.sum(jnp.imag(leaf))
            else:
                acc = acc + jnp.sum(leaf)
        return acc

    return lambda i, acc: _acc(jnp.float32(gains[i % 16]), acc)


def _streaming_chain_step(chan, c: int, lead: int, post, stride=None,
                          chunk_post=None):
    """Product-true chain step for the receivers: the exact jitted
    dispatch ``models.demod._channel_step`` builds (decode -> table mix
    -> per-pull-truncated FIR -> post, k windows from one contiguous
    staged chunk), re-run over the staged dispatch with a 16-value gain
    cycle on the planes (cf32 decode is linear).  ``stride`` selects the
    strided-window variant (freq_levels / OOK envelope).  Returns
    ``(step, raw_samples_per_step)`` — raw advance, not the overlapped
    span, matching the input-rate convention."""
    import jax.numpy as jnp

    from quadrs_tpu.models.demod import _channel_step

    built = _channel_step(chan, c, lead, post, stride=stride,
                          chunk_post=chunk_post)
    assert built is not None, "bench chain must match the streaming shape"
    run, args_for, geom = built
    planes, c0, s0, th_outer, valid_in, _v = args_for(0)
    gains = np.linspace(0.5, 1.5, 16, dtype=np.float32)

    @jax.jit
    def _acc(g, acc):
        out = run(planes * g, c0, s0, th_outer, valid_in)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    step = lambda i, acc: _acc(jnp.float32(gains[i % 16]), acc)
    return step, geom["step"] * geom["decimate"]


def _audio_tail_step(demod, rate: int, n_a: int):
    """Product-true audio stage step: calls demod._audio_stage (the
    fused single-program FIR + rational-resample tail) on a 4-buffer
    DEVICE-resident input cycle — exactly how demodulate feeds it (the
    chain output never visits the host) — with the final audio fetched
    each iteration as the product does; the fetch synchronizes, so wall
    differencing is honest."""
    from quadrs_tpu.models.demod import _audio_stage

    rng = np.random.default_rng(7)
    bufs = [
        jax.device_put(
            (0.5 + 0.1 * k) * rng.standard_normal(n_a).astype(np.float32)
        )
        for k in range(4)
    ]

    def step(i, acc):
        _, y = _audio_stage(demod, rate, bufs[i % 4], div=1.0 + 0.01 * (i % 16))
        return acc + float(np.float64(y.sum()))

    return step


def _audio_tail_step_dev(demod, rate: int, n_a: int):
    """The audio tail with the burst fetch taken out of the loop: the
    same fused program, audio summed into a carried device scalar (one
    fetch at the timing boundary).  Product-vs-this separates the tail
    program's own rate from the per-burst host-transfer latency — on
    the tunneled rig the fetch dominates ~35-85x; on a PCIe host it is
    noise.  Reported as audio_device_msps_at_channel_rate."""
    import jax.numpy as jnp

    from quadrs_tpu.models.demod import _audio_stage_fused

    fn, _ = _audio_stage_fused(
        n_a, rate, demod.audio_bandwidth, demod.audio_decimate,
        demod.audio_taps, demod.audio_rate,
    )
    rng = np.random.default_rng(7)
    bufs = [
        jax.device_put(
            (0.5 + 0.1 * k) * rng.standard_normal(n_a).astype(np.float32)
        )
        for k in range(4)
    ]

    @jax.jit
    def _acc(x, div, acc):
        return acc + jnp.sum(fn(x, div, jnp.float32(0.0)))

    return lambda i, acc: _acc(
        bufs[i % 4], jnp.float32(1.0 + 0.01 * (i % 16)), acc
    )


def _audio_both(demod, rate: int, n_a: int, secs: float) -> tuple[float, float]:
    """(product fetch-per-burst rate, device-accumulated rate) for the
    audio tail at channel rate."""
    prod = measure_msps_acc(_audio_tail_step(demod, rate, n_a), n_a, secs,
                            min_iters=2)
    dev = measure_msps_acc(_audio_tail_step_dev(demod, rate, n_a), n_a, secs,
                           min_iters=2)
    return prod, dev


def _combined(chain_msps: float, tail_msps: float, decimate: int) -> float:
    """End-to-end input rate of chain + tail stages run back to back:
    the tail consumes channel-rate samples (1/decimate of the input)."""
    return 1.0 / (1.0 / chain_msps + 1.0 / (decimate * tail_msps))


def bench_fm(on_accel: bool) -> dict:
    """FM receiver (models/demod.py FmDemod): shift -> 400-tap FIR
    (decimate 10) -> quadrature discriminator, then the audio tail
    (15 kHz FIR decimate 10 + rational resample 210k->48k)."""
    import jax.numpy as jnp

    from quadrs_tpu.models.demod import FmDemod

    from quadrs_tpu.sources import SampleSource

    fm = FmDemod(
        center=280_000, bandwidth=100_000, decimate=10, taps=400,
        audio_bandwidth=15_000, audio_decimate=10, audio_taps=64,
        audio_rate=48_000,
    )
    c = (1 << 16) if on_accel else (1 << 13)
    b = 8 if on_accel else 2
    src = SampleSource.from_file(_demod_capture(b * c * fm.decimate + 8192))
    chan = fm.channel(src)
    rate = chan.sample_rate
    scale = np.float32(rate / (2.0 * np.pi))

    def post(x):  # the discriminator (demod.py FmDemod.discriminate)
        d = x[:, 1:] * jnp.conj(x[:, :-1])
        return jnp.arctan2(jnp.imag(d), jnp.real(d)) * scale

    step, spp = _streaming_chain_step(chan, c, 1, post)
    secs = 1.5 if on_accel else 0.3
    tstats: dict = {}
    chain_msps = measure_msps_acc(step, spp, secs, min_iters=2, stats_out=tstats)
    n_a = (1 << 20) if on_accel else (1 << 15)
    audio_msps, audio_dev = _audio_both(fm, rate, n_a, secs)
    msps = _combined(chain_msps, audio_msps, fm.decimate)
    entry = {
        "metric": "FM receiver (shift->fir(10)->discriminator->audio tail; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        "chain_msps": round(chain_msps, 1),
        "audio_msps_at_channel_rate": round(audio_msps, 1),
        "audio_device_msps_at_channel_rate": round(audio_dev, 1),
        "e2e_device_msps": round(_combined(chain_msps, audio_dev, fm.decimate), 1),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            6.0 + (4.0 * fm.taps + 12.0) / fm.decimate
            + (2.0 * fm.audio_taps + 20.0) / fm.decimate,
            8.0,
        )
    )
    return entry


def bench_am(on_accel: bool) -> dict:
    """AM receiver (models/demod.py AmDemod): shift -> 400-tap FIR
    (decimate 20) -> envelope, then audio tail (FIR decimate 20 +
    resample 52.5k->48k)."""
    import jax.numpy as jnp

    from quadrs_tpu.models.demod import AmDemod
    from quadrs_tpu.sources import SampleSource

    am = AmDemod(
        center=280_000, bandwidth=10_000, decimate=20, taps=400,
        audio_bandwidth=20_000, audio_decimate=20, audio_taps=64,
        audio_rate=48_000,
    )
    c = (1 << 16) if on_accel else (1 << 13)
    b = 4 if on_accel else 2
    src = SampleSource.from_file(_demod_capture(b * c * am.decimate + 8192))
    chan = am.channel(src)
    step, spp = _streaming_chain_step(chan, c, 0, lambda x: jnp.abs(x))
    secs = 1.5 if on_accel else 0.3
    tstats: dict = {}
    chain_msps = measure_msps_acc(step, spp, secs, min_iters=2, stats_out=tstats)
    n_a = (1 << 20) if on_accel else (1 << 15)
    audio_msps, audio_dev = _audio_both(am, chan.sample_rate, n_a, secs)
    msps = _combined(chain_msps, audio_msps, am.decimate)
    entry = {
        "metric": "AM receiver (shift->fir(20)->envelope->audio tail; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        "chain_msps": round(chain_msps, 1),
        "audio_msps_at_channel_rate": round(audio_msps, 1),
        "audio_device_msps_at_channel_rate": round(audio_dev, 1),
        "e2e_device_msps": round(_combined(chain_msps, audio_dev, am.decimate), 1),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            6.0 + (4.0 * am.taps + 4.0 + 2.0 * am.audio_taps + 20.0) / am.decimate,
            8.0,
        )
    )
    return entry


def bench_ssb(on_accel: bool) -> dict:
    """SSB receiver (models/demod.py SsbDemod): pre-shift -> 2000-tap
    FIR (decimate 400) -> re-shift -> real, then resample 52.5k->48k."""
    import jax.numpy as jnp

    from quadrs_tpu.models.demod import SsbDemod
    from quadrs_tpu.sources import SampleSource

    ssb = SsbDemod(
        center=280_000, bandwidth=3_000, decimate=400, taps=2_000,
        sideband="usb", audio_rate=48_000,
    )
    c = (1 << 14) if on_accel else (1 << 11)
    b = 1
    src = SampleSource.from_file(_demod_capture(b * c * ssb.decimate + 16384))
    chan = ssb.channel(src)
    step, spp = _streaming_chain_step(chan, c, 0, lambda x: jnp.real(x))
    secs = 1.5 if on_accel else 0.3
    tstats: dict = {}
    chain_msps = measure_msps_acc(step, spp, secs, min_iters=2, stats_out=tstats)
    n_a = (1 << 18) if on_accel else (1 << 14)
    audio_msps, audio_dev = _audio_both(ssb, chan.sample_rate, n_a, secs)
    msps = _combined(chain_msps, audio_msps, ssb.decimate)
    entry = {
        "metric": "SSB receiver (usb filter method, fir(400)->resample; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        "chain_msps": round(chain_msps, 1),
        "audio_msps_at_channel_rate": round(audio_msps, 1),
        "audio_device_msps_at_channel_rate": round(audio_dev, 1),
        "e2e_device_msps": round(_combined(chain_msps, audio_dev, ssb.decimate), 1),
        **tstats,
    }
    entry.update(
        roofline(msps, 6.0 + (4.0 * ssb.taps + 26.0) / ssb.decimate, 8.0)
    )
    return entry


def bench_fsk(on_accel: bool) -> dict:
    """FSK receiver (models/demod.py FskDemod): shift -> 400-tap FIR
    (decimate 32) -> 64-pt halves-energy discriminator (the reference
    bucket flow, src/fft.rs:71-101, as a receiver)."""
    import jax.numpy as jnp

    from quadrs_tpu.models.demod import FskDemod
    from quadrs_tpu.ops.stft import stft_norms
    from quadrs_tpu.sources import SampleSource

    fsk = FskDemod(center=280_000, bandwidth=200_000, decimate=32, taps=400,
                   fft_width=64)
    w = fsk.fft_width
    b = 4096 if on_accel else 256  # windows; sized so k hits the raw budget
    src = SampleSource.from_file(_demod_capture(b * w * fsk.decimate + 8192))
    chan = fsk.channel(src)

    def post(x):  # sinks.freq_levels' comparator halves
        norms = stft_norms(x, shift=False)
        half = w // 2
        return norms[:, :half].sum(axis=1), norms[:, half:].sum(axis=1)

    # the product dispatch: freq_levels' streaming strided front end
    step, raw_per = _streaming_chain_step(chan, w, 0, post, stride=w)
    secs = 1.5 if on_accel else 0.3
    tstats: dict = {}
    msps = measure_msps_acc(step, raw_per, secs, min_iters=2, stats_out=tstats)
    entry = {
        "metric": "FSK receiver (shift->fir(32)->64-pt bucket discriminator; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            6.0 + (4.0 * fsk.taps + 5.0 * math.log2(w) + 6.0) / fsk.decimate,
            8.0,
        )
    )
    return entry


def bench_ook(on_accel: bool) -> dict:
    """OOK envelope detector (models/demod.py OokDemod): width-4
    stride-2 spectral envelope -> threshold (the reference sparkfft
    flow as a receiver).  2 new input samples per window."""
    import jax.numpy as jnp

    from quadrs_tpu.models.demod import OokDemod
    from quadrs_tpu.ops.stft import stft_norms
    from quadrs_tpu.sources import SampleSource

    ook = OokDemod()
    # 2M windows/dispatch: the banded chunk program has no (k, width)
    # frame footprint, and tiny-hop dispatches must be fat to clear the
    # dispatch floor (v5e: 1417 Msps at 256k windows -> 2461 at 2M)
    b = (1 << 21) if on_accel else (1 << 14)
    src = SampleSource.from_file(
        _demod_capture(b * ook.stride + ook.width + 4096)
    )

    def post(x):
        norms = stft_norms(x)
        return (norms >= np.float32(ook.threshold)).any(axis=1)

    # the product dispatch: pulses' streaming strided front end with
    # its banded chunk-level program (no (k, width) frame lane padding)
    from quadrs_tpu.models.demod import _envelope_chunk_post

    step, raw_per = _streaming_chain_step(
        src, ook.width, 0, post, stride=ook.stride,
        chunk_post=_envelope_chunk_post(ook.width, ook.stride, ook.threshold),
    )
    secs = 1.5 if on_accel else 0.3
    tstats: dict = {}
    msps = measure_msps_acc(step, raw_per, secs, min_iters=2,
                            stats_out=tstats)
    entry = {
        "metric": "OOK envelope detector (width 4, stride 2; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        **tstats,
    }
    entry.update(
        roofline(msps, stft_flops_per_sample(ook.width, ook.stride) + 0.5, 8.0)
    )
    return entry


def bench_psk(on_accel: bool) -> dict:
    """PSK receiver (models/demod.py PskDemod, QPSK): the baseband
    channel chain plus the per-burst sync programs (order-th-power FFT
    peak; derotate + matched filter + Oerder-Meyr reduction) at a 2^20
    burst.  ``value`` combines all three at their per-input-sample
    shares; ``sync_wall_msps`` is the product analyze() wall including
    host tables and the full z fetch (transfer-bound on tunneled rigs)."""
    import time as _time

    import jax.numpy as jnp

    from quadrs_tpu.models.demod import PskDemod, _psk_peak_fn, _psk_process_fn
    from quadrs_tpu.sources import SampleSource

    psk = PskDemod(center=280_000, bandwidth=200_000, decimate=32, taps=400,
                   symbol_rate=65_625.0, order=4)
    c = (1 << 16) if on_accel else (1 << 13)
    b = 2
    src = SampleSource.from_file(_demod_capture(b * c * psk.decimate + 8192))
    chan = psk.channel(src)
    rate = chan.sample_rate
    step, spp = _streaming_chain_step(
        chan, c, 0,
        lambda x: jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1),
    )
    secs = 1.5 if on_accel else 0.3
    tstats: dict = {}
    chain_msps = measure_msps_acc(step, spp, secs, min_iters=2, stats_out=tstats)

    npad = (1 << 20) if on_accel else (1 << 15)
    n = npad - 1000
    rng = np.random.default_rng(5)
    planes = rng.standard_normal((2, npad)).astype(np.float32)
    planes_dev = jax.device_put(planes)
    sps = rate / psk.symbol_rate
    mf_len = max(1, int(round(sps)))
    nn = np.arange(npad, dtype=np.float64)
    ph = -2 * np.pi * np.mod(0.37 * nn, psk.order * npad) / (psk.order * npad)
    rot = jax.device_put(np.stack([np.cos(ph), np.sin(ph)]).astype(np.float32))
    pht = -2 * np.pi * np.mod(nn / sps, 1.0)
    tim = jax.device_put(np.stack([np.cos(pht), np.sin(pht)]).astype(np.float32))
    peak_fn = _psk_peak_fn(npad, psk.order)
    proc_fn = _psk_process_fn(npad, psk.order, mf_len)
    gains = np.linspace(0.5, 1.5, 16, dtype=np.float32)

    @jax.jit
    def _sync_acc(g, acc):
        pl = planes_dev * g
        k0, pm, p0, pp = peak_fn(pl, jnp.int32(n))
        (zr, zi), (sr_, si), (er, ei) = proc_fn(pl, rot, tim, jnp.int32(n))
        return (
            acc + k0.astype(jnp.float32) + pm + p0 + pp
            + jnp.sum(zr) + jnp.sum(zi) + sr_ + si + er + ei
        )

    sync_msps = measure_msps_acc(
        lambda i, acc: _sync_acc(jnp.float32(gains[i % 16]), acc),
        npad, secs, min_iters=2,
    )

    # product analyze() wall (host tables + 2 dispatches + full fetch)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    psk.analyze(rate, x)  # compile
    t0 = _time.perf_counter()
    reps = 3
    for k in range(reps):
        psk.analyze(rate, x * np.complex64(1.0 + 0.1 * k))
    wall = (_time.perf_counter() - t0) / reps
    sync_wall_msps = n / wall / 1e6

    msps = 1.0 / (1.0 / chain_msps + 1.0 / (psk.decimate * sync_msps))
    entry = {
        "metric": "PSK receiver (QPSK chain + per-burst sync programs; input rate)",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        "chain_msps": round(chain_msps, 1),
        "sync_msps_at_channel_rate": round(sync_msps, 1),
        "analyze_wall_msps_at_channel_rate": round(sync_wall_msps, 1),
        **tstats,
    }
    entry.update(
        roofline(
            msps,
            6.0
            + (4.0 * psk.taps + 10.0 * math.log2(npad) + 40.0) / psk.decimate,
            8.0,
        )
    )
    return entry


def _sustained_capture(n_samples: int) -> str:
    """A synthetic cs8 capture file, cached across runs (2 bytes/sample)."""
    path = f"/tmp/quadrs-sustained-{n_samples}.sr21M.cs8"
    want_bytes = n_samples * 2
    if not (os.path.exists(path) and os.path.getsize(path) == want_bytes):
        tmp = path + ".part"
        rng = np.random.default_rng(3)
        with open(tmp, "wb") as fh:
            left = want_bytes
            while left:
                m = min(left, 1 << 27)
                fh.write(rng.integers(-127, 128, m, dtype=np.int8).tobytes())
                left -= m
        os.replace(tmp, path)
    return path


def _sustained_setup(on_accel: bool):
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
    from quadrs_tpu.sources import SampleSource

    n = (1 << 30) if on_accel else (1 << 25)
    path = _sustained_capture(n)
    cfg = PipelineConfig(
        sample_rate=21_000_000,
        shift_freq=280_000,
        lp_freq=200_000,
        decimate=32,
        taps=400,
        fft_width=64,
        fmt=FileFormat.COMPLEX_INT8,
    )
    return PipelineModel(cfg), SampleSource.from_file(path), path


def bench_disk_staging(on_accel: bool) -> dict:
    """The framework-owned half of the disk->chip loop: stream the whole
    1G-sample cs8 file through the C++ ring prefetcher + lookahead
    stitching (everything but the device), i.e. the rate at which the
    host path can FEED chips.  Demonstrates the headline's ~7.4 GB/s
    cs8 appetite is coverable by the loader."""
    import time

    from quadrs_tpu.stream_runner import StreamRunner
    from quadrs_tpu.utils.profiling import sync_fetch

    # drain queued device work first: the staging path is pure host C++
    # and on a single-core rig it otherwise competes with the jax
    # runtime threads finishing earlier benches (observed 9x swings)
    import jax.numpy as jnp

    sync_fetch(jax.jit(lambda: jnp.zeros(8))())

    model, src, path = _sustained_setup(on_accel)
    cfg = model.cfg
    runner = StreamRunner(src, model, chunk_samples=1 << 22)
    cap = 64 if on_accel else 8  # 256M samples bounds the artifact cost

    def feed_rate(r) -> float:
        """Msamples/s the runner's staging path delivers chunks at."""
        t0 = time.perf_counter()
        fed = 0
        it = r._prefetched(0)
        for i, (_off, planes, _valid) in enumerate(it):
            fed += planes.shape[1] - r._lookahead
            if i + 1 >= cap:
                break
        it.close()
        return fed / (time.perf_counter() - t0) / 1e6

    # best of 3: the host core is shared with the jax runtime threads,
    # so single passes swing wildly on small machines (min-time rule)
    msps = max(feed_rate(runner) for _ in range(3))

    # the live-pipe serving path (quadjax stream -stdin yes): the same
    # chunks fed through PipeSource's sequential reads + overlap carry
    # instead of the C++ ring prefetcher — the rate a radio could pipe
    # samples in at
    import threading

    from quadrs_tpu.sources import PipeSource

    def one_pipe_pass() -> float:
        r, w = os.pipe()

        def feed():
            try:
                with open(path, "rb") as fh, os.fdopen(w, "wb") as out:
                    while True:
                        b = fh.read(1 << 22)
                        if not b:
                            break
                        out.write(b)
            except (BrokenPipeError, OSError):
                pass

        th = threading.Thread(target=feed, daemon=True)
        th.start()
        rf = os.fdopen(r, "rb")
        psrc = PipeSource(rf, cfg.fmt, cfg.sample_rate)
        rate = feed_rate(StreamRunner(psrc, model, chunk_samples=1 << 22))
        rf.close()
        return rate

    pipe_msps = max(one_pipe_pass() for _ in range(3))
    return {
        "metric": "disk->host staging feed rate (C++ ring prefetch over the 1G-sample cs8 file)",
        "value": round(msps, 1),
        "unit": "Msamples/sec",
        "vs_baseline": round(msps / 100.0, 2),
        "pipe_feed_msps": round(pipe_msps, 1),
    }


class _PreStagedPlanes:
    """In-RAM deinterleaved native-dtype planes with a free ``stage()``
    (a view slice): the compute+transfer-only comparator behind the
    sustained entries' ``overlap_efficiency`` — the same StreamRunner
    loop with ALL disk->host staging work (pread + deinterleave +
    overlap stitching) removed.  e2e_rate / prestaged_rate == 1 means
    staging is fully hidden behind the device side of the pipe."""

    is_pipe = False
    native = None

    def __init__(self, planes: np.ndarray, fmt, sample_rate: int):
        self._planes = planes
        self.format = fmt
        self.sample_rate = sample_rate
        self.length = planes.shape[1]

    def stage(self, lo: int, hi: int) -> np.ndarray:
        lo = max(0, min(lo, self.length))
        hi = max(lo, min(hi, self.length))
        return self._planes[:, lo:hi]


def _overlap_fields(model, src, chunk: int, cap: int, e2e_msps: float,
                    staging_msps: float | None = None) -> dict:
    """Same-session compute+transfer-only pass over pre-staged planes
    (identical chunk shapes -> warm compile cache) and the derived
    overlap numbers.  ``serial_msps`` is the rate a NON-overlapped
    pipeline would predict (1/(1/prestaged + 1/staging)); where e2e
    lands between serial and prestaged says how much of the staging
    cost overlap actually hid."""
    from quadrs_tpu.stream_runner import StreamRunner

    runner0 = StreamRunner(src, model, chunk_samples=chunk)
    pre = _PreStagedPlanes(
        src.stage(0, cap * chunk + runner0._lookahead),
        model.cfg.fmt,
        model.cfg.sample_rate,
    )
    stats = StreamRunner(pre, model, chunk_samples=chunk).run(max_chunks=cap)
    fields = {
        "prestaged_msps": round(stats.msps, 1),
        "overlap_efficiency": round(e2e_msps / stats.msps, 3) if stats.msps else None,
    }
    if staging_msps:
        fields["serial_msps"] = round(
            1.0 / (1.0 / stats.msps + 1.0 / staging_msps), 1
        )
    return fields


def bench_disk_sustained(on_accel: bool) -> dict:
    """End-to-end disk->chip: file -> C++ ring prefetch -> host staging
    -> device decode+mix+FIR+STFT, the reference's execution model (pull
    bytes from a file through the chain, src/samples.rs:72-93) at
    production scale.  On this rig the host->device hop crosses the
    tunneled (networked) TPU runtime at ~9 MB/s, which bounds the whole
    pipe — the metric label says so; on a PCIe-attached host the bound
    is bench_disk_staging's feed rate.  A full 1G-sample pass was
    demonstrated (see STATUS.md); the recurring bench caps the pass to
    keep the artifact cheap — the steady-state rate is the same."""
    from quadrs_tpu.stream_runner import StreamRunner

    model, src, path = _sustained_setup(on_accel)
    cfg = model.cfg
    chunk = 1 << 22
    # warm the compile cache with a 2-chunk in-memory source (same chunk
    # shapes) so the measured file pass starts cold but compiled
    warm_bytes = (2 * chunk + cfg.taps * 4) * 2
    with open(path, "rb") as fh:
        warm_raw = np.frombuffer(fh.read(warm_bytes), dtype=np.uint8)
    from quadrs_tpu.sources import SampleSource

    StreamRunner(
        SampleSource(warm_raw, cfg.fmt, cfg.sample_rate), model, chunk_samples=chunk
    ).run()
    cap = 12 if on_accel else None  # ~50M samples; rate == steady state
    stats = StreamRunner(src, model, chunk_samples=chunk).run(max_chunks=cap)
    entry = {
        "metric": "sustained disk->chip cs8 stream (1G-sample file; transfer-bound "
        "by the tunneled runtime on this rig)"
        if on_accel
        else "sustained disk->chip cs8 stream (CPU-rig scale)",
        "value": round(stats.msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(stats.msps / 100.0, 2),
    }
    entry.update(
        _overlap_fields(model, src, chunk, cap if cap else 4, stats.msps)
    )
    return entry


def bench_long_fir_sustained(on_accel: bool) -> dict:
    """BASELINE config 4 *as written*: the power=2000 (4000-tap) FFT-
    convolution chain over a 1G-sample synthetic capture, end-to-end
    from disk through StreamRunner (C++ ring prefetch -> host staging ->
    device overlap-save chain).  Two numbers: the end-to-end rate
    (tunnel-transfer-bound on this rig, labeled) and the disk->host
    staging feed rate with this chain's lookahead (the framework-owned
    half).  The HBM-resident compute rate for the same chain is the
    separate ``power=2000`` suite entry."""
    import time

    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
    from quadrs_tpu.sources import SampleSource
    from quadrs_tpu.stream_runner import StreamRunner
    from quadrs_tpu.utils.profiling import sync_fetch

    import jax.numpy as jnp

    n = (1 << 30) if on_accel else (1 << 23)
    path = _sustained_capture(n)
    cfg = PipelineConfig(
        sample_rate=21_000_000,
        shift_freq=280_000,
        lp_freq=50_000,
        decimate=32,
        taps=4000,  # lowpass -power 2000
        fft_width=64,
        fmt=FileFormat.COMPLEX_INT8,
    )
    model = PipelineModel(cfg)
    src = SampleSource.from_file(path)
    chunk = 1 << 22

    # framework-owned half: disk -> host staging feed at this chain's
    # 6000-sample lookahead (pure host C++; drain device queue first)
    sync_fetch(jax.jit(lambda: jnp.zeros(8))())
    runner = StreamRunner(src, model, chunk_samples=chunk)
    cap = 64 if on_accel else 2

    def feed_pass() -> float:
        t0 = time.perf_counter()
        fed = 0
        it = runner._prefetched(0)
        for i, (_off, planes, _valid) in enumerate(it):
            fed += planes.shape[1] - runner._lookahead
            if i + 1 >= cap:
                break
        it.close()
        return fed / (time.perf_counter() - t0) / 1e6

    staging_msps = max(feed_pass() for _ in range(3))

    # end-to-end: bounded pass at steady state (a full 1G pass was
    # demonstrated on hardware; see STATUS.md)
    e2e_cap = 8 if on_accel else 2
    stats = StreamRunner(src, model, chunk_samples=chunk).run(max_chunks=e2e_cap)
    overlap = _overlap_fields(
        model, src, chunk, e2e_cap, stats.msps, staging_msps=staging_msps
    )
    return {
        "metric": "sustained power=2000 chain over the 1G-sample capture "
        "(disk->chip; transfer-bound by the tunneled runtime on this rig)"
        if on_accel
        else "sustained power=2000 chain from disk (CPU-rig scale)",
        "value": round(stats.msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(stats.msps / 100.0, 2),
        "staging_msps": round(staging_msps, 1),
        "samples_total": n,
        **overlap,
    }


def bench_staging_workers(on_accel: bool) -> dict:
    """Worker-count scaling of the C++ ring prefetcher: raw disk->host
    feed rate (pread + deinterleave + overlap re-read, no device work)
    per n_workers.  On a single-core rig the curve is flat by
    construction — the table records that honestly (host_cores says
    why); on many-core hosts it is the parallel-reader scaling proof."""
    import time

    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.sources import SampleSource

    # reuse the 1G capture the disk benches already cached
    n = (1 << 30) if on_accel else (1 << 23)
    src = SampleSource.from_file(_sustained_capture(n))
    if src.native is None:
        return {"metric": "prefetcher worker scaling", "value": 0.0, "unit": "Msamples/sec", "error": "native loader unavailable"}
    chunk = 1 << 22
    cap = max(2, min(48, n // chunk))
    table = {}
    for workers in (1, 2, 4):
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            fed = 0
            it = src.native.prefetch(chunk, start_off=0, overlap=4000, n_workers=workers)
            for i, (_off, planes) in enumerate(it):
                fed += chunk
                if i + 1 >= cap:
                    break
            it.close()
            best = max(best, fed / (time.perf_counter() - t0) / 1e6)
        table[str(workers)] = round(best, 1)
    peak = max(table.values())
    return {
        "metric": "disk->host prefetcher feed rate vs n_workers",
        "value": peak,
        "unit": "Msamples/sec",
        "vs_baseline": round(peak / 100.0, 2),
        "workers_msps": table,
        "host_cores": os.cpu_count(),
    }


_SUITE = (
    "bench_cs16_sustained",
    "bench_long_fir",
    "bench_waterfall",
    "bench_waterfall_strided",
    "bench_waterfall_search",
    "bench_channelizer",
    "bench_resample",
    "bench_find",
    "bench_fm",
    "bench_am",
    "bench_ssb",
    "bench_fsk",
    "bench_ook",
    "bench_psk",
    "bench_disk_staging",
    "bench_disk_sustained",
    "bench_long_fir_sustained",
    "bench_staging_workers",
)


def suite(on_accel: bool) -> list[dict]:
    """All stretch entries.  On the accelerator each entry runs in its
    OWN subprocess: entries measured back-to-back in one process read
    2-4x low on shapes the isolated re-run clears (same chip, same
    hour — channelizer 2960 isolated vs 702 in-sequence, FM chain 2791
    vs 1549; gc + jax.clear_caches() between entries recovers only half,
    so residual allocator/tunnel-client state, not the Python layer, is
    the carrier).  A fresh process per entry is the only arrangement
    that reproduces the isolated numbers, and the numbers are the
    artifact.  Costs one first-compile (~20-40 s) per entry; in-process
    mode remains for CPU runs and via QUADRS_BENCH_INPROC=1."""
    import os

    if not on_accel or os.environ.get("QUADRS_BENCH_INPROC"):
        return [globals()[name](on_accel) for name in _SUITE]
    return [_run_entry_subprocess(name) for name in _SUITE]


def _run_entry_subprocess(name: str) -> dict:
    """One suite entry in a fresh interpreter; parse its JSON line.  A
    generous timeout is an emergency valve only — killing a client
    mid-operation wedges the tunnel, but a wedged entry would hang the
    round-end bench forever otherwise."""
    import os
    import subprocess
    import sys

    code = (
        "import json, jax, bench_suite as bs; "
        f"e = bs.{name}(jax.devices()[0].platform != 'cpu'); "
        "print('QBENCH::' + json.dumps(e))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=2400,
        )
    except subprocess.TimeoutExpired:
        return {"metric": name, "error": "timeout after 2400s"}
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("QBENCH::"):
            return json.loads(line[len("QBENCH::"):])
    tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    return {"metric": name, "error": f"rc={r.returncode}: " + " | ".join(tail)}


def main() -> None:
    import os

    on_accel = jax.devices()[0].platform != "cpu"
    inproc = not on_accel or os.environ.get("QUADRS_BENCH_INPROC")
    for name in _SUITE:
        e = globals()[name](on_accel) if inproc else _run_entry_subprocess(name)
        print(json.dumps(e), flush=True)


if __name__ == "__main__":
    main()
