import numpy as np

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.ops.stft import stft_norms
from quadrs_tpu.runtime import Executor
from quadrs_tpu.sources import SampleSource
from quadrs_tpu.stream import Shift


def _src(n=1 << 16, sr=48_000):
    rng = np.random.default_rng(41)
    data = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    return SampleSource(
        np.ascontiguousarray(data).view(np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    ), data


def test_executor_compiles_once_across_batches():
    """Sliding batches reuse one compiled program: staged buffers are
    padded to power-of-two buckets and batch width is fixed."""
    src, _ = _src()
    ex = Executor(Shift(src, 1000, 48_000), 128, batch=32, post=stft_norms)
    for start in range(0, 4096, 1024):
        offs = start + np.arange(32, dtype=np.int64) * 128
        out, valid = ex.run(offs)
        assert out.shape == (32, 128)
    assert ex._fn._cache_size() == 1


def test_executor_partial_batch_padding():
    src, data = _src()
    ex = Executor(src, 64, batch=16)
    out, valid = ex.run(np.asarray([0, 64, 128], dtype=np.int64))
    assert out.shape == (3, 64)
    assert np.all(valid == 64)
    assert out[1].tobytes() == data[64:128].tobytes()


def test_executor_rejects_oversized_and_empty_batches():
    import pytest

    src, _ = _src()
    ex = Executor(src, 64, batch=4)
    with pytest.raises(ValueError):
        ex.run(np.arange(5, dtype=np.int64))
    with pytest.raises(ValueError):
        ex.run(np.asarray([], dtype=np.int64))


def test_window_batches_span_cap():
    from quadrs_tpu.runtime import window_batches

    # widely strided offsets force span-based splitting
    offsets = np.arange(0, 1 << 28, 1 << 22, dtype=np.int64)
    batch, batches = window_batches(offsets, 128, span_cap=1 << 24)
    assert sum(len(b) for b in batches) == len(offsets)
    for b in batches:
        assert b[-1] - b[0] <= 1 << 24
    # contiguous offsets keep one big batch
    offsets = np.arange(0, 4096 * 64, 64, dtype=np.int64)
    _, batches = window_batches(offsets, 64)
    assert len(batches) == 1


def test_executor_rejects_int32_overflow_span():
    import pytest

    # a fake huge source: staging never actually materializes because
    # the guard fires first
    class Huge(SampleSource):
        def __init__(self):
            self._bytes = np.zeros(0, dtype=np.uint8)
            self._native = None
            self.format = FileFormat.COMPLEX_INT8
            self.sample_rate = 1_000_000
            self.length = 1 << 33

    ex = Executor(Huge(), 64, batch=2)
    with pytest.raises(ValueError, match="spans"):
        ex.run(np.asarray([0, (1 << 31) + 100], dtype=np.int64))
