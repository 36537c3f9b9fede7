"""Benchmark: sustained throughput of the fused flagship pipeline.

Measures the BASELINE north-star chain — on-chip decode -> NCO shift ->
windowed-sinc FIR with decimate 32 -> 64-point strided STFT — in
streaming mode on the default device, host staging included.  Prints one
JSON line; ``vs_baseline`` is against the 100 Msamples/sec/chip target
(the reference publishes no numbers, see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main() -> None:
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"

    cfg = PipelineConfig(
        sample_rate=21_000_000,
        shift_freq=280_000,
        lp_freq=200_000,
        decimate=32,
        taps=400,
        fft_width=64,
        fmt=FileFormat.COMPLEX_FLOAT32,
    )
    model = PipelineModel(cfg)

    chunk = (1 << 23) if on_accel else (1 << 20)  # samples per step
    iters = 12 if on_accel else 3

    raw_host = model.synth_raw(chunk + cfg.taps)
    theta = np.float32(0.0)

    step = model.jit_step_stream

    # warmup / compile
    out = step(raw_host, theta)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(iters):
        # fresh host buffer each iter so PCIe staging is part of the cost
        out = step(raw_host, theta)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples = iters * chunk
    msps = samples / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "fused shift+lowpass(dec32,taps400)+stft64 throughput",
                "value": round(msps, 2),
                "unit": "Msamples/sec/chip",
                "vs_baseline": round(msps / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
