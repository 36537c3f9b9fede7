import numpy as np
import pytest

from quadrs_tpu.formats import FileFormat, planes_from_bytes
from quadrs_tpu.native import NativeCapture, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader unavailable (no compiler)"
)


@pytest.fixture(params=list(FileFormat))
def capture(request, tmp_path):
    fmt = request.param
    rng = np.random.default_rng(17)
    n = 10_000
    raw = rng.integers(0, 256, n * fmt.pair_bytes, dtype=np.int64).astype(np.uint8)
    path = tmp_path / f"cap.{fmt.value}"
    raw.tofile(path)
    return path, fmt, raw


def test_read_planes_matches_numpy(capture):
    path, fmt, raw = capture
    cap = NativeCapture(path, fmt)
    assert cap.length == 10_000
    want = planes_from_bytes(raw, fmt)
    got = cap.read_planes(0, 10_000)
    assert got.tobytes() == want.tobytes()
    # offset read
    got = cap.read_planes(1234, 100)
    assert got.tobytes() == want[:, 1234:1334].tobytes()


def test_read_past_eof_zero_padded(capture):
    path, fmt, raw = capture
    cap = NativeCapture(path, fmt)
    got = cap.read_planes(9_990, 100)
    want = planes_from_bytes(raw, fmt)[:, 9_990:]
    assert got[:, :10].tobytes() == want.tobytes()
    assert not np.any(got[:, 10:].view(np.uint8))


def test_prefetch_streams_whole_file(capture):
    path, fmt, raw = capture
    cap = NativeCapture(path, fmt)
    want = planes_from_bytes(raw, fmt)
    seen = []
    for off, planes in cap.prefetch(chunk_samples=1024, n_buffers=3):
        assert planes.tobytes() == want[:, off : off + planes.shape[1]].tobytes()
        seen.append((off, planes.shape[1]))
    assert sum(n for _, n in seen) == 10_000
    assert [off for off, _ in seen] == sorted(off for off, _ in seen)


def test_prefetch_overlap_and_workers(capture):
    """Chunks arrive in stream order regardless of worker count, each
    carrying the next `overlap` samples re-read from the following
    chunk's head; offsets still advance by chunk_samples."""
    path, fmt, raw = capture
    cap = NativeCapture(path, fmt)
    want = planes_from_bytes(raw, fmt)
    for n_workers in (1, 2, 3):
        offs = []
        for off, planes in cap.prefetch(
            chunk_samples=1000, overlap=96, n_workers=n_workers
        ):
            assert planes.tobytes() == want[:, off : off + planes.shape[1]].tobytes()
            offs.append(off)
            # full interior chunks carry chunk+overlap samples
            if off + 1096 <= 10_000:
                assert planes.shape[1] == 1096
        assert offs == list(range(0, 10_000, 1000))


def test_prefetch_early_close_joins_workers(capture):
    """Abandoning the iterator mid-stream must stop the C++ workers
    cleanly (no hang, no crash)."""
    path, fmt, raw = capture
    cap = NativeCapture(path, fmt)
    it = cap.prefetch(chunk_samples=512, n_workers=2)
    next(it)
    next(it)
    it.close()  # triggers qt_prefetch_stop with workers mid-flight


def test_sample_source_uses_native(tmp_path):
    rng = np.random.default_rng(3)
    data = (rng.normal(size=2048) + 1j * rng.normal(size=2048)).astype(np.complex64)
    path = tmp_path / "x.sr1k.cf32"
    data.tofile(path)

    from quadrs_tpu.sources import SampleSource

    src = SampleSource.from_file(str(path))
    assert src._native is not None
    got, valid = src.read_at(7, 100)
    assert valid == 100
    assert np.asarray(got).tobytes() == data[7:107].tobytes()
