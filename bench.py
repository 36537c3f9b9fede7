"""Benchmark: sustained throughput of the fused flagship pipeline.

Measures the BASELINE north-star chain — on-chip cs8 decode -> NCO
shift -> windowed-sinc FIR (400 taps, decimate 32) -> 64-point strided
STFT — in streaming mode on one chip, through the fused Pallas frontend
(decode+mix+FIR in one VMEM pass) on TPU and the XLA chain elsewhere.
The capture chunk is resident in HBM (as in a production pipeline where
the double-buffered loader keeps the next chunk staged while the
current one computes); each iteration processes the chunk under fresh
NCO phases so nothing is cached or constant-folded.  Prints one JSON
line; ``vs_baseline`` is against the 100 Msamples/sec/chip north-star
target (the reference publishes no numbers, see BASELINE.md).
"""

from __future__ import annotations

import json
import os

import jax


def main() -> None:
    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
    from quadrs_tpu.utils.timing import measure_msps_acc

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"

    cfg = PipelineConfig(
        sample_rate=21_000_000,
        shift_freq=280_000,
        lp_freq=200_000,
        decimate=32,
        taps=400,
        fft_width=64,
        fmt=FileFormat.COMPLEX_INT8,
    )
    model = PipelineModel(cfg)

    # 4M-sample chunks measured fastest on v5e; larger chunks lose ~20%
    chunk = (1 << 22) if on_accel else (1 << 20)
    # tunnel throughput wanders ±20% one-sided; more best-of reps narrow
    # the artifact's downside without changing what is measured
    min_secs = 4.5 if on_accel else 0.5

    raw = jax.device_put(model.synth_raw(chunk + cfg.taps))

    # every iteration's FULL output is reduced into the carried scalar
    # that the timing fetch observes: the tunneled runtime materializes
    # lazily and only has to compute the fetched value's dependency
    # cone, so anything outside it can be skipped (measured up to 40x
    # inflation when chaining through a single output element).  The
    # step construction (phase rotation + accumulator contract) is
    # shared with the stretch-config suite.
    from bench_suite import make_acc_step

    step = make_acc_step(model, chunk, on_accel)(raw)
    label = (
        "fused pallas cs8 decode+shift+lowpass(dec32,taps400)+stft64"
        if on_accel and model.pallas_preferred()
        else "fused cs8 decode+shift+lowpass(dec32,taps400)+stft64"
    )

    tstats: dict = {}
    msps = measure_msps_acc(
        step, chunk, min_secs, reps=3 if on_accel else 2, stats_out=tstats
    )
    line = {
        "metric": label + " throughput",
        "value": round(msps, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msps / 100.0, 2),
        **tstats,
    }
    # roofline position: algorithmic GFLOP/s + minimal HBM traffic
    # (BASELINE.json's metric line names "FIR+FFT GFLOP/s")
    from bench_suite import chain_flops_per_sample, roofline

    line.update(
        roofline(
            msps,
            chain_flops_per_sample(cfg.taps, cfg.decimate, cfg.fft_width),
            cfg.fmt.pair_bytes + 4.0 / cfg.decimate,
        )
    )

    # fold the stretch configs + the sustained disk->chip run into the
    # same line so every round's artifact carries all five metrics
    # (QUADRS_BENCH_HEADLINE_ONLY=1 skips them)
    if not os.environ.get("QUADRS_BENCH_HEADLINE_ONLY"):
        try:
            import bench_suite

            line["suite"] = bench_suite.suite(on_accel)
        except Exception as e:  # the headline must survive a suite failure
            line["suite_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(line))


if __name__ == "__main__":
    main()
