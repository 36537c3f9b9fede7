"""Worker process for the multi-host test (tests/test_distributed.py).

Run as ``python distributed_worker.py PROCESS_ID PORT N_LOCAL``.  Each
process contributes N_LOCAL virtual CPU devices; the global mesh spans
2*N_LOCAL time-shards across both processes, so the sharded step's halo
``ppermute`` crosses the process boundary.  Every process verifies its
own addressable output shards against a locally computed single-device
reference and prints WORKER_OK.
"""

import os
import sys


def main() -> int:
    process_id, port, n_local = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
    from quadrs_tpu.parallel.distributed import (
        addressable_rows,
        init_distributed,
        replicate_tail_global,
        shard_chunk_global,
    )
    from quadrs_tpu.parallel.sharding import (
        halo_samples,
        make_mesh,
        make_sharded_stream_step,
        plan_shard_phases,
    )

    init_distributed(f"localhost:{port}", num_processes=2, process_id=process_id)
    assert len(jax.devices()) == 2 * n_local, len(jax.devices())
    assert len(jax.local_devices()) == n_local

    cfg = PipelineConfig(
        sample_rate=1_000_000,
        shift_freq=12_500,
        lp_freq=50_000,
        decimate=8,
        taps=64,
        fft_width=32,
        fmt=FileFormat.COMPLEX_INT8,
    )
    model = PipelineModel(cfg)
    halo = halo_samples(cfg)
    n_time = 2 * n_local  # every device is a time shard; shard n_local-1
    # lives on process 0 and its halo comes from process 1's first shard
    n_local_samps = cfg.decimate * cfg.fft_width * 2
    total = n_time * n_local_samps

    raw = model.synth_raw(total + halo, seed=7)[None]  # same on both procs
    mesh = make_mesh(n_time, 1)
    step = make_sharded_stream_step(model, mesh)
    theta0 = plan_shard_phases(model, n_local_samps, n_time, 1)

    out = step(
        shard_chunk_global(raw[:, :, :total], mesh),
        shard_chunk_global(theta0, mesh),
        replicate_tail_global(raw[:, :, total:], mesh),
    )

    want = np.asarray(model.jit_step_stream(raw[0], np.float32(0.0)))
    shards = addressable_rows(out)
    assert shards, "no addressable output shards"
    for index, rows in shards:
        ref = want[None][index]
        np.testing.assert_allclose(rows, ref, rtol=3e-4, atol=3e-4 * want.max())
    print(f"WORKER_OK {process_id} shards={len(shards)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
