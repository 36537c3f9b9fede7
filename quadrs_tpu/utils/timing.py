"""Shared benchmark timing: warmup, calibration, fetch-synchronized
differencing (``block_until_ready`` is unreliable on tunneled runtimes —
see CLAUDE.md)."""

from __future__ import annotations

import time
from typing import Callable


def measure_msps(
    step: Callable[[int], object],
    samples_per_step: int,
    min_secs: float,
    min_iters: int = 4,
    reps: int = 2,
) -> float:
    """Throughput of ``step(i)`` in Msamples/sec.

    Times windows of iterations, each synchronized by one tiny scalar
    fetch, and differences them so the fetch cost cancels; reports the
    best of ``reps`` differenced estimates (the standard min-time
    convention — scheduling noise only ever slows a run down).
    """
    import jax
    import jax.numpy as jnp

    checksum = jax.jit(lambda o: jnp.sum(o))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = step(i)
        float(checksum(out))
        return time.perf_counter() - t0

    float(checksum(step(0)))  # warmup / compile

    per = max(run(2) / 2, 1e-5)
    n1 = max(min_iters, int(min_secs / per / (2 * max(1, reps))))
    n2 = 3 * n1
    best = 0.0
    for _ in range(max(1, reps)):
        t1, t2 = run(n1), run(n2)
        msps = (n2 - n1) * samples_per_step / max(t2 - t1, 1e-9) / 1e6
        best = max(best, msps)
    return best
