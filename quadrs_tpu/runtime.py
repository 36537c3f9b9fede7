"""Batch executor: turns stream-graph pulls into jitted XLA programs.

One ``Executor`` owns one compiled program for a fixed window length
``n`` and batch width ``B``: the host stages the raw source span for a
batch of window offsets (zero-copy native-dtype views of the capture),
plans all offset math exactly, and the device computes every window in
one fused program.  Staged-buffer lengths are quantized to power-of-two
buckets so the number of distinct compilations stays logarithmic.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from quadrs_tpu.stream import Stream


def _round_up_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


class Executor:
    def __init__(
        self,
        stream: Stream,
        n: int,
        batch: int | None = None,
        post: Callable[[jnp.ndarray], Any] | None = None,
    ):
        """``post``: optional traced transform of the (B, n) sample batch
        (e.g. windowed FFT norms) fused into the same program."""
        self.stream = stream
        self.n = int(n)
        self.batch = batch
        self.post = post
        self.source = stream.root()

        def call(buf, prep):
            out = stream.read_batch({"buf": buf}, prep, self.n)
            return post(out) if post is not None else out

        self._fn = jax.jit(call)

    def run(self, offs: np.ndarray) -> tuple[Any, np.ndarray]:
        """Execute one batch of window offsets.

        Returns ``(outputs, valid)`` where ``outputs`` has leading dim
        ``len(offs)`` (padding rows stripped) and ``valid`` gives each
        window's true sample count per the reference's short-read
        semantics.
        """
        offs = np.asarray(offs, dtype=np.int64)
        b_real = len(offs)
        if b_real == 0:
            raise ValueError("empty offset batch")
        b = self.batch or b_real
        if b_real > b:
            raise ValueError(f"batch of {b_real} exceeds executor width {b}")
        padded = np.concatenate([offs, np.repeat(offs[-1], b - b_real)])

        if getattr(self.source, "has_staging", False):
            lo, _ = self.stream.span(int(padded.min()), self.n)
            s_off, s_n = self.stream.span(int(padded.max()), self.n)
            lo = max(0, min(lo, self.source.length))
            hi = max(lo, min(s_off + s_n, self.source.length))
            staged = self.source.stage(lo, hi)
            cap = _round_up_pow2(len(staged))
            if len(staged) < cap:
                staged = np.concatenate(
                    [staged, np.zeros(cap - len(staged), dtype=staged.dtype)]
                )
            base = lo
        else:
            staged = np.zeros(2, dtype=np.float32)
            base = 0

        plan = self.stream.plan(padded, self.n, base)
        out = self._fn(staged, plan.prep)
        out = jax.tree_util.tree_map(lambda a: np.asarray(a[:b_real]), out)
        return out, plan.valid[:b_real]
