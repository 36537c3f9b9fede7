"""Sustained streaming: capture file -> fused pipeline -> spectrogram.

The production serving path.  Where the sinks in :mod:`quadrs_tpu.sinks`
reproduce the reference's pull semantics exactly (per-window truncated
convolution), this runner processes a capture as one continuous stream:
the native loader prefetches chunks in a background thread, a carry
buffer stitches chunk boundaries (so the FIR sees the true continuation,
no per-read truncation), and each chunk runs through
``PipelineModel.step_stream`` — one fused XLA program per chunk.

Every chunk's NCO phase is planned exactly on the host from its absolute
offset, so chunking is invisible in the output.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np

from quadrs_tpu.models.receiver import PipelineModel
from quadrs_tpu.sources import SampleSource
from quadrs_tpu.utils.profiling import PROFILER, sync_fetch


@dataclass
class RunStats:
    samples_in: int = 0
    windows_out: int = 0
    seconds: float = 0.0

    @property
    def msps(self) -> float:
        return self.samples_in / self.seconds / 1e6 if self.seconds else 0.0


class StreamRunner:
    """Drive a capture through the fused pipeline at full rate.

    ``source``: a :class:`SampleSource` (its format must match the
    model's config).  ``chunk_samples`` is rounded down to a whole
    number of STFT windows.

    With ``mesh`` (a ``(stream, time)`` mesh from
    :func:`quadrs_tpu.parallel.sharding.make_mesh`), each chunk's time
    axis is sharded across the mesh's 'time' chips with ICI halo
    exchange — the capture streams through the whole pod slice.
    """

    def __init__(
        self,
        source: SampleSource,
        model: PipelineModel,
        chunk_samples: int = 1 << 22,
        mesh=None,
        frontend: str = "auto",
    ):
        if source.format is not model.cfg.fmt:
            raise ValueError(
                f"source format {source.format} != model format {model.cfg.fmt}"
            )
        self.source = source
        self.model = model
        self.mesh = mesh
        self._sharded_step = None
        self.frontend = frontend
        cfg = model.cfg
        self._win_raw = cfg.decimate * cfg.fft_width
        # lookahead: the last FIR output of a chunk reads ceil(taps/2) +
        # taps past its decimation point (group delay), and step_stream's
        # window reshape floor-drops the few extra decimated outputs
        self._lookahead = cfg.taps + (cfg.taps - cfg.taps // 2)
        if cfg.taps // 2 // cfg.decimate >= cfg.fft_width:
            raise ValueError("fft window shorter than the FIR group delay span")
        quantum = self._win_raw
        if mesh is not None:
            from quadrs_tpu.parallel.sharding import make_sharded_stream_step

            if mesh.shape["stream"] != 1:
                raise ValueError("StreamRunner shards time only; use n_stream=1")
            quantum = self._win_raw * mesh.shape["time"]
            self._sharded_step = make_sharded_stream_step(
                model, mesh, frontend="pallas" if self._use_pallas() else "xla"
            )
        self.chunk_samples = max(quantum, chunk_samples // quantum * quantum)
        self._quantum = quantum

    def _chunks(self, start_off: int = 0) -> Iterator[tuple[int, np.ndarray]]:
        """(offset, (2, chunk+taps) planes) with the taps lookahead."""
        la = self._lookahead
        length = self.source.length
        off = start_off
        while off < length - self.model.cfg.taps:
            n = min(self.chunk_samples, (length - off) // self._win_raw * self._win_raw)
            if n <= 0:
                return
            planes = self.source.stage(off, off + n + la)
            valid = planes.shape[1]
            if valid < n + la:
                # raw zero bytes decode to nonzero values for cu8/cs16,
                # so the model masks [valid:] in the decoded domain
                planes = np.pad(planes, ((0, 0), (0, n + la - valid)))
            yield off, planes, valid
            off += n

    def _prefetched(self, start_off: int = 0, depth: int = 2) -> Iterator:
        """Run :meth:`_chunks` staging on a background thread so disk
        reads + deinterleave of chunk k+1 overlap the device compute of
        chunk k.  (The C++ loader's own ring prefetcher,
        NativeCapture.prefetch, is a building block for custom pipelines;
        this runner gets its overlap from this thread.)  If the consumer
        abandons the generator (callback raised, interrupted), the fill
        thread notices and exits instead of pinning buffers."""
        q: queue.Queue = queue.Queue(maxsize=depth)
        _DONE = object()
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def fill():
            try:
                for item in self._chunks(start_off):
                    if not put(item):
                        return
                put(_DONE)
            except BaseException as e:  # surface staging errors to the consumer
                put(e)

        t = threading.Thread(target=fill, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():
                q.get_nowait()

    def run(
        self,
        on_windows: Callable[[int, np.ndarray], None] | None = None,
        start_window: int = 0,
    ) -> RunStats:
        """Process the capture from ``start_window`` onward.

        ``on_windows(first_window_index, norms)`` receives each chunk's
        (windows, fft_width) f32 rows.  Resuming mid-capture is exact —
        NCO phases are planned from absolute offsets, so a resumed run
        produces bit-identical rows to the corresponding tail of a full
        run (the checkpoint/resume counterpart of the reference's
        write-then-re-`from` workflow).
        """
        import time

        model = self.model
        stats = RunStats()
        t0 = time.perf_counter()
        last = None
        if self._sharded_step is not None and start_window:
            raise NotImplementedError("resume is single-device for now")
        if self._sharded_step is None:
            use_pallas = self._use_pallas()
            for off, planes, valid in self._prefetched(start_window * self._win_raw):
                if use_pallas:
                    # fused decode+mix+FIR Pallas frontend: ~2x for the
                    # integer formats (one HBM read of narrow input)
                    bases = model.stream_bases(off, planes.shape[1])
                    nv = None if valid == planes.shape[1] else int(valid)
                    norms = model.jit_step_stream_pallas(planes, bases, n_valid=nv)
                else:
                    theta0 = model.theta0(np.asarray([off]))[0]
                    norms = model.jit_step_stream(planes, theta0, np.int32(valid))
                last = norms
                stats.samples_in += planes.shape[1] - self._lookahead
                stats.windows_out += norms.shape[0]
                if on_windows is not None:
                    on_windows(off // self._win_raw, np.asarray(norms))
        else:
            last = self._run_sharded(on_windows, stats)
        if last is not None and on_windows is None:
            sync_fetch(last)
        stats.seconds = time.perf_counter() - t0
        PROFILER.account("stream_runner", stats.samples_in, stats.seconds)
        return stats

    def _use_pallas(self) -> bool:
        import jax

        from quadrs_tpu.formats import FileFormat

        if self.frontend == "pallas":
            return True
        if self.frontend != "auto":
            return False
        return (
            jax.devices()[0].platform == "tpu"
            and self.model.cfg.fmt is not FileFormat.COMPLEX_FLOAT32
            and self.model.pallas_supported()
        )

    def _run_sharded(self, on_windows, stats: RunStats):
        """Time-sharded chunks over the mesh.  The final shard's halo
        wraps circularly, so each chunk's last ``wrap`` windows are
        dropped and recomputed as the next chunk's first windows (chunks
        overlap by that amount); the ragged tail runs single-device."""
        from quadrs_tpu.parallel.sharding import shard_chunk

        model = self.model
        cfg = model.cfg
        n_time = self.mesh.shape["time"]
        wrap = -(-self._lookahead // self._win_raw)
        n = self.chunk_samples
        n_local = n // n_time
        advance = n - wrap * self._win_raw
        if advance <= 0:
            raise ValueError("chunk too small for the halo wrap overlap")
        length = self.source.length
        last = None
        off = 0
        while off + n <= length:
            planes = self.source.stage(off, off + n)[None]  # (1, 2, n)
            theta = model.theta0(off + np.arange(n_time, dtype=np.int64) * n_local)[
                None
            ]
            out = self._sharded_step(
                shard_chunk(planes, self.mesh), shard_chunk(theta, self.mesh)
            )[0]
            keep = out.shape[0] - wrap
            last = out
            stats.samples_in += advance
            stats.windows_out += keep
            if on_windows is not None:
                on_windows(off // self._win_raw, np.asarray(out[:keep]))
            off += advance
        # ragged tail on one device
        while off < length - cfg.taps:
            m = (length - off) // self._win_raw * self._win_raw
            if m <= 0:
                break
            planes = self.source.stage(off, off + m + self._lookahead)
            valid = planes.shape[1]
            if valid < m + self._lookahead:
                planes = np.pad(planes, ((0, 0), (0, m + self._lookahead - valid)))
            norms = model.jit_step_stream(
                planes, model.theta0(np.asarray([off]))[0], np.int32(valid)
            )
            last = norms
            stats.samples_in += m
            stats.windows_out += norms.shape[0]
            if on_windows is not None:
                on_windows(off // self._win_raw, np.asarray(norms))
            off += m
        return last
