"""Extended benchmark suite: the BASELINE stretch configs.

``bench.py`` prints the single headline line for the driver; this suite
measures the stretch configurations (BASELINE.json configs 2-4) and
prints one JSON line each:

* ``cs16-sustained``  — on-chip cs16 decode -> shift -> lowpass(dec 64)
* ``long-fir``        — power=2000 (4000 taps) overlap-save chain
* ``waterfall-64xcs8``— 64 parallel cs8 streams, 1024-pt strided STFT

Timing uses scalar-fetch differencing (see bench.py).
"""

from __future__ import annotations

import json

import jax
import numpy as np

from quadrs_tpu.utils.timing import measure_msps


def _time(step, args, chunk, min_secs):
    return measure_msps(lambda i: step(*args(i)), chunk, min_secs, min_iters=2)


def _step_for(model, chunk, on_accel):
    """Fused Pallas frontend on TPU when the config supports it; phases
    rotate across iterations either way."""
    if on_accel and model.pallas_supported():
        bases = [
            np.asarray(model.stream_bases(k * chunk, chunk + model.cfg.taps))
            for k in range(16)
        ]
        return lambda raw: (
            lambda i: model.jit_step_stream_pallas(raw, bases[i % 16])
        )
    thetas = model.theta0(np.arange(16, dtype=np.int64) * chunk)
    return lambda raw: (lambda i: model.jit_step_stream(raw, thetas[i % 16]))


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
    chunk = (1 << 24) if on_accel else (1 << 20)
    raw = jax.device_put(model.synth_raw(chunk + cfg.taps))
    step = _step_for(model, chunk, on_accel)(raw)
    msps = _time(lambda i: step(i), lambda i: (i,), chunk, 2.0 if on_accel else 0.3)
    return {
        "metric": "cs16 on-chip decode + shift + lowpass(dec64) + stft",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
    }


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
    step = _step_for(model, chunk, on_accel)(raw)
    msps = _time(lambda i: step(i), lambda i: (i,), chunk, 2.0 if on_accel else 0.3)
    return {
        "metric": "power=2000 (4000-tap) lowpass chain",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
    }


def bench_waterfall(on_accel: bool) -> dict:
    from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel

    cfg = WaterfallConfig(n_streams=64, fft_width=1024, stride=1024)
    model = WaterfallModel(cfg)
    per_stream = (1 << 17) if on_accel else (1 << 14)
    raw = jax.device_put(model.synth_raw(per_stream))
    step = model.jit_step()
    total = cfg.n_streams * per_stream
    msps = _time(step, lambda i: (raw,), total, 2.0 if on_accel else 0.3)
    return {
        "metric": "64x parallel cs8 fused decode + 1024-pt strided STFT",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip (aggregate)",
        "vs_baseline": round(msps / 100.0, 2),
    }


def main() -> None:
    on_accel = jax.devices()[0].platform != "cpu"
    for fn in (bench_cs16_sustained, bench_long_fir, bench_waterfall):
        print(json.dumps(fn(on_accel)), flush=True)


if __name__ == "__main__":
    main()
