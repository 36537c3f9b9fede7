"""Band survey (``run_scan`` / ``quadjax scan``): per-bin avg/max power
and occupancy over every window, reduced on device chunk by chunk.

The oracle is the validated ``WaterfallModel.jit_step`` norms over the
whole capture, reduced sequentially in numpy f64 — the scan must match
it from chunked runs at any chunk size, through the CLI, off a pipe,
and on a mesh.
"""

from __future__ import annotations

import io
import pathlib
import sys
from types import SimpleNamespace

import numpy as np
import pytest

from quadrs_tpu.cli import USAGE, main
from quadrs_tpu.formats import FileFormat
from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel
from quadrs_tpu.sources import SampleSource, open_capture
from quadrs_tpu.stream_runner import WaterfallRunner


def _mem_bank(n_streams: int, n: int, seed: int = 5, sr: int = 48_000):
    """In-memory cf32 sources with distinct random content per stream."""
    rng = np.random.default_rng(seed)
    sources = []
    for _ in range(n_streams):
        iq = (rng.standard_normal(2 * n) * 0.3).astype("<f4")
        sources.append(
            SampleSource(
                np.frombuffer(iq.tobytes(), dtype=np.uint8),
                FileFormat.COMPLEX_FLOAT32,
                sr,
            )
        )
    return sources


def _oracle(sources, cfg, threshold: float):
    model = WaterfallModel(cfg)
    raw = np.stack([s.stage(0, s.length) for s in sources])
    norms = np.asarray(model.jit_step()(raw))  # (S, W_n, width)
    return (
        norms.astype(np.float64).sum(axis=1),
        norms.max(axis=1),
        (norms > threshold).sum(axis=1).astype(np.int64),
        norms.shape[1],
        norms,
    )


@pytest.mark.parametrize("stride", [128, 64, 192])
def test_run_scan_matches_oracle(stride):
    cfg = WaterfallConfig(
        n_streams=2, fft_width=128, stride=stride, fmt=FileFormat.COMPLEX_FLOAT32
    )
    sources = _mem_bank(2, 4096)
    want_sum, want_max, _, want_windows, norms = _oracle(sources, cfg, 0.0)
    thr = float(np.median(norms))
    want_above = (norms > thr).sum(axis=1).astype(np.int64)
    runner = WaterfallRunner(sources, WaterfallModel(cfg), chunk_windows=7)
    res = runner.run_scan(threshold=thr)
    assert res.windows == want_windows
    np.testing.assert_allclose(res.sum_norms, want_sum, rtol=1e-5)
    np.testing.assert_allclose(res.max_norms, want_max, rtol=1e-6)
    np.testing.assert_array_equal(res.above, want_above)
    # derived views
    np.testing.assert_allclose(res.avg, want_sum / want_windows, rtol=1e-6)
    assert res.occupancy.min() >= 0 and res.occupancy.max() <= 1
    assert res.stats.windows_out == 2 * want_windows


def test_run_scan_chunk_invariance():
    cfg = WaterfallConfig(
        n_streams=1, fft_width=64, stride=32, fmt=FileFormat.COMPLEX_FLOAT32
    )
    sources = _mem_bank(1, 2048, seed=9)
    model = WaterfallModel(cfg)
    a = WaterfallRunner(sources, model, chunk_windows=5).run_scan(threshold=1.0)
    b = WaterfallRunner(sources, model, chunk_windows=1000).run_scan(threshold=1.0)
    np.testing.assert_allclose(a.sum_norms, b.sum_norms, rtol=1e-6)
    np.testing.assert_array_equal(a.max_norms, b.max_norms)
    np.testing.assert_array_equal(a.above, b.above)
    assert a.windows == b.windows


def test_run_scan_max_chunks():
    cfg = WaterfallConfig(
        n_streams=1, fft_width=64, stride=64, fmt=FileFormat.COMPLEX_FLOAT32
    )
    sources = _mem_bank(1, 64 * 12, seed=2)
    res = WaterfallRunner(sources, WaterfallModel(cfg), chunk_windows=4).run_scan(
        max_chunks=2
    )
    assert res.windows == 8  # 2 chunks x 4 windows


@pytest.fixture(scope="module")
def tone_capture(tmp_path_factory) -> pathlib.Path:
    d = tmp_path_factory.mktemp("scan")
    prefix = d / "tones"
    rc = main(
        ["gen", "-cos", "6k", "-cos", "-12k", "-len", "0.1", "48k",
         "write", str(prefix)]
    )
    assert rc == 0
    return d / "tones.sr48000.cf32"


def test_cli_scan_finds_tones(tone_capture, tmp_path, capsys):
    """The two generated tones are the two strongest bins, at the right
    frequency offsets, with ~100% occupancy above a threshold that the
    noise floor never crosses."""
    out = tmp_path / "survey"
    rc = main(
        ["scan", "-width", "256", "-stride", "128", "-chunk", "9",
         "-threshold", "10", "-top", "3", "-out", str(out), str(tone_capture)]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    lines = captured.strip().splitlines()
    assert lines[-1].startswith("scan: ")
    assert any("wrote" in ln for ln in lines)

    csv = (tmp_path / "survey.s0.scan.csv").read_text().splitlines()
    assert csv[0] == "bin,freq_hz,avg,max,above,occupancy"
    assert len(csv) == 1 + 256
    rows = [ln.split(",") for ln in csv[1:]]
    avg = np.array([float(r[2]) for r in rows])
    occ = np.array([float(r[5]) for r in rows])
    freq = np.array([float(r[1]) for r in rows])
    # strongest two bins sit at the tone offsets (bin width 187.5 Hz)
    top2 = np.argsort(avg)[::-1][:2]
    got = sorted(freq[top2])
    assert abs(got[0] - (-12_000)) <= 48_000 / 256
    assert abs(got[1] - 6_000) <= 48_000 / 256
    # the tones are on in (almost) every window; spectral floor never is
    assert occ[top2].min() > 0.9
    assert occ[np.argsort(avg)[: 200]].max() == 0.0
    # the printed table leads with the same two bins
    table = [ln for ln in lines if ln.strip() and ln.lstrip()[0].isdigit()]
    printed_bins = [int(ln.split()[0]) for ln in table[:2]]
    assert set(printed_bins) == set(int(b) for b in top2)


def test_cli_scan_db_and_errors(tone_capture, capsys):
    rc = main(
        ["scan", "-width", "64", "-top", "1", "-db", "yes", str(tone_capture)]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert " dB " in captured or captured.count("dB") >= 1
    # grammar errors
    assert main(["scan"]) == 1
    assert "requires at least one capture" in capsys.readouterr().err
    assert main(["scan", "-stdin", "yes"]) == 1
    assert "-sr and -format" in capsys.readouterr().err
    assert main(["scan", "-window", "hann", str(tone_capture)]) == 1
    assert "unknown -window" in capsys.readouterr().err


def test_usage_lists_scan():
    assert "scan [-width 1024]" in USAGE


def test_cli_scan_stdin_matches_file(tone_capture, tmp_path, capsys, monkeypatch):
    """``scan -stdin yes`` over the piped bytes == the file scan."""
    out_f = tmp_path / "file"
    assert (
        main(
            ["scan", "-width", "128", "-stride", "96", "-chunk", "5",
             "-threshold", "10", "-out", str(out_f), str(tone_capture)]
        )
        == 0
    )
    data = tone_capture.read_bytes()
    monkeypatch.setattr(sys, "stdin", SimpleNamespace(buffer=io.BytesIO(data)))
    out_p = tmp_path / "pipe"
    assert (
        main(
            ["scan", "-width", "128", "-stride", "96", "-chunk", "5",
             "-threshold", "10", "-out", str(out_p), "-stdin", "yes",
             "-sr", "48k", "-format", "cf32"]
        )
        == 0
    )
    capsys.readouterr()
    a = (tmp_path / "file.s0.scan.csv").read_text()
    b = (tmp_path / "pipe.s0.scan.csv").read_text()
    assert a == b


def test_scan_mesh_matches_single(tone_capture, tmp_path, capsys):
    """``scan -mesh 2x2`` (time x stream) over a two-file bank must
    reproduce the single-device survey."""
    import shutil

    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    second = tmp_path / "tones2.sr48000.cf32"
    shutil.copy(tone_capture, second)
    base = ["scan", "-width", "256", "-stride", "128", "-chunk", "8",
            "-threshold", "10"]
    solo, meshed = tmp_path / "solo", tmp_path / "mesh"
    assert main([*base, "-out", str(solo), str(tone_capture), str(second)]) == 0
    assert (
        main([*base, "-mesh", "2x2", "-out", str(meshed), str(tone_capture),
              str(second)])
        == 0
    )
    capsys.readouterr()
    for s in range(2):
        a = (tmp_path / f"solo.s{s}.scan.csv").read_text().splitlines()
        b = (tmp_path / f"mesh.s{s}.scan.csv").read_text().splitlines()
        assert len(a) == len(b) == 257
        for la, lb in zip(a[1:], b[1:]):
            ra, rb = la.split(","), lb.split(",")
            assert ra[0] == rb[0] and ra[4] == rb[4]  # bin, above
            np.testing.assert_allclose(float(rb[2]), float(ra[2]), rtol=1e-5)
            np.testing.assert_allclose(float(rb[3]), float(ra[3]), rtol=1e-5)


# ---------------------------------------------------------------------------
# StreamRunner.run_scan (survey of the decimated shift+FIR channel)


def _stream_rig(n=40_000, sr=48_000, seed=13):
    from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel

    rng = np.random.default_rng(seed)
    iq = (rng.standard_normal(2 * n) * 0.3).astype("<f4")
    src = SampleSource(
        np.frombuffer(iq.tobytes(), dtype=np.uint8), FileFormat.COMPLEX_FLOAT32, sr
    )
    cfg = PipelineConfig(
        sample_rate=sr, shift_freq=1_000, lp_freq=8_000, decimate=4,
        taps=40, fft_width=32, fmt=FileFormat.COMPLEX_FLOAT32,
    )
    return src, PipelineModel(cfg)


def test_stream_run_scan_matches_run_reduce():
    """run_scan == reducing run()'s rows, chunk-count invariant."""
    from quadrs_tpu.stream_runner import StreamRunner

    src, model = _stream_rig()
    rows = []
    StreamRunner(src, model, chunk_samples=6_000).run(
        lambda w0, r: rows.append(r)
    )
    norms = np.concatenate(rows, axis=0)
    thr = float(np.median(norms))
    res = StreamRunner(src, model, chunk_samples=6_000).run_scan(threshold=thr)
    assert res.windows == norms.shape[0]
    np.testing.assert_allclose(res.sum_norms[0], norms.astype(np.float64).sum(axis=0), rtol=1e-6)
    np.testing.assert_array_equal(res.max_norms[0], norms.max(axis=0))
    np.testing.assert_array_equal(res.above[0], (norms > thr).sum(axis=0))
    # a different chunking compiles a different batch shape, so values
    # wobble by ulps (documented f32 behavior); the survey agrees within
    # noise and counts can flip only for norms within that noise of thr
    res2 = StreamRunner(src, model, chunk_samples=20_000).run_scan(threshold=thr)
    np.testing.assert_allclose(res2.sum_norms, res.sum_norms, rtol=1e-5)
    np.testing.assert_allclose(res2.max_norms, res.max_norms, rtol=1e-5)
    noise = 1e-5 * norms.max()
    lo = (norms > thr + noise).sum(axis=0)
    hi = (norms > thr - noise).sum(axis=0)
    assert np.all(res2.above[0] >= lo) and np.all(res2.above[0] <= hi)


def test_stream_run_scan_mesh_matches_single():
    import jax

    from quadrs_tpu.parallel.sharding import make_mesh
    from quadrs_tpu.stream_runner import StreamRunner

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    src, model = _stream_rig(seed=14)
    solo = StreamRunner(src, model, chunk_samples=8_000).run_scan(threshold=1.0)
    mesh = make_mesh(n_time=4, n_stream=1)
    shard = StreamRunner(src, model, chunk_samples=8_000, mesh=mesh).run_scan(
        threshold=1.0
    )
    assert shard.windows == solo.windows
    np.testing.assert_allclose(shard.sum_norms, solo.sum_norms, rtol=1e-5)
    np.testing.assert_allclose(shard.max_norms, solo.max_norms, rtol=1e-5)
    # counts can wobble only where a norm sits within f32 noise of thr
    assert np.abs(shard.above - solo.above).max() <= 1


def test_cli_stream_scan(tone_capture, tmp_path, capsys):
    """stream -scan surveys the decimated channel; the tone at -12 kHz
    shifted to the channel center shows up at its absolute frequency."""
    from quadrs_tpu.cli import main

    out = tmp_path / "ch"
    # shift 12k centers the channel on the capture's -12 kHz tone
    rc = main(
        ["stream", "-shift", "12k", "-lowpass", "8k", "-power", "20",
         "-decimate", "4", "-width", "32", "-chunk", "6000",
         "-scan", "yes", "-threshold", "0.5", "-top", "3",
         "-out", str(out), str(tone_capture)]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    lines = captured.strip().splitlines()
    assert lines[-1].startswith("stream: ")
    assert any(ln.startswith("stream scan: ") for ln in lines)
    csv = (tmp_path / "ch.scan.csv").read_text().splitlines()
    assert csv[0] == "bin,freq_hz,avg,max,above,occupancy"
    assert len(csv) == 1 + 32
    rows = [ln.split(",") for ln in csv[1:]]
    avg = np.array([float(r[2]) for r in rows])
    freq = np.array([float(r[1]) for r in rows])
    # channel rate 12 kHz over 32 bins = 375 Hz/bin; the -12 kHz tone
    # sits at the channel center (= -shift) after the shift
    assert abs(freq[int(np.argmax(avg))] - (-12_000)) <= 375
    # gating: scan-only flags and -search/-scan exclusivity
    assert main(["stream", "-top", "5", str(tone_capture)]) == 1
    assert "requires 'stream -scan yes'" in capsys.readouterr().err
    assert main(["stream", "-scan", "yes", "-search", "yes", str(tone_capture)]) == 1
    assert "not both" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# stream -trigger (burst recorder)


def test_burst_spans():
    from quadrs_tpu.stream_runner import burst_spans

    assert burst_spans([]) == []
    assert burst_spans([False, False]) == []
    assert burst_spans([True, True, False]) == [(0, 1)]
    assert burst_spans([False, True, False, False, True], pre=0, post=0) == [
        (1, 1), (4, 4)
    ]
    # pre/post widen and merge touching spans
    assert burst_spans([False, True, False, False, True, False], pre=1, post=1) == [
        (0, 5)
    ]
    assert burst_spans([False, True] + [False] * 5 + [True, False], pre=1, post=1) == [
        (0, 2), (6, 8)
    ]
    # clamped at the edges
    assert burst_spans([True, False, False], pre=3, post=0) == [(0, 0)]


def test_cli_stream_trigger(tmp_path, capsys):
    """Two tone bursts in a noise-free capture come out as two
    byte-exact, re-from-able slices of the original file."""
    from quadrs_tpu.cli import main

    sr, dec, w = 48_000, 4, 32
    win_raw = dec * w  # 128 raw samples per window
    n = 300 * win_raw
    t = np.arange(n)
    x = np.zeros(n, dtype=np.complex64)
    # bursts on windows [50, 80) and [200, 210): a strong DC tone
    for a, b in ((50, 80), (200, 210)):
        x[a * win_raw : b * win_raw] = 1.0
    raw = np.empty(2 * n, dtype=np.float32)
    raw[0::2] = x.real
    raw[1::2] = x.imag
    cap = tmp_path / f"bursty.sr{sr}.cf32"
    cap.write_bytes(raw.tobytes())

    out = tmp_path / "rec"
    rc = main(
        ["stream", "-lowpass", "8k", "-power", "20", "-decimate", str(dec),
         "-width", str(w), "-chunk", "32k", "-trigger", "5",
         "-pre", "2", "-post", "2", "-out", str(out), str(cap)]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    lines = captured.strip().splitlines()
    assert any(ln.startswith("stream trigger: 2 bursts") for ln in lines)

    import glob

    files = sorted(glob.glob(str(tmp_path / "rec.b*")))
    assert len(files) == 2
    src_bytes = cap.read_bytes()
    pair = 8  # cf32
    for path, (a, b) in zip(files, ((50 - 2, 80 + 2), (200 - 2, 210 + 2))):
        name = pathlib.Path(path).name
        s0 = int(name.split(".s")[1].split(".")[0])
        # burst window bounds within one window of the injected spans
        # (FIR group delay smears the envelope edge)
        assert abs(s0 - a * win_raw) <= 2 * win_raw
        data = pathlib.Path(path).read_bytes()
        assert data == src_bytes[s0 * pair : s0 * pair + len(data)]
        assert name.endswith(f".sr{sr}.cf32")
        # the burst file is a valid capture: from + sparkfft runs
        assert main(["from", path, "sparkfft", "-width", "4"]) == 0
    capsys.readouterr()
    # gating
    assert main(["stream", "-trigger", "5", str(cap)]) == 1
    assert "requires -out" in capsys.readouterr().err
    assert main(["stream", "-pre", "2", str(cap)]) == 1
    assert "requires 'stream -trigger" in capsys.readouterr().err
    assert main(
        ["stream", "-trigger", "5", "-scan", "yes", "-out", "x", str(cap)]
    ) == 1
    assert "excludes" in capsys.readouterr().err


def test_burst_gate_streams_exactly():
    """BurstGate fed any activity mask in ragged pieces yields exactly
    burst_spans of the whole — including runs ending at feed edges."""
    from quadrs_tpu.stream_runner import BurstGate, burst_spans

    rng = np.random.default_rng(77)
    for _ in range(300):
        n = int(rng.integers(1, 160))
        active = rng.random(n) < rng.uniform(0.05, 0.6)
        pre, post = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        gate = BurstGate(pre, post)
        got = []
        i = 0
        while i < n:
            sz = int(rng.integers(1, 20))
            got += gate.feed(active[i : i + sz])
            i += sz
        got += gate.finish(n)
        assert got == burst_spans(active, pre, post), (pre, post, active)


def test_raw_ring():
    from quadrs_tpu.sources import RawRing

    r = RawRing(pair_bytes=2, cap_bytes=64)
    r.append(bytes(range(10)))  # samples 0..4
    r.append(bytes(range(10, 20)))  # samples 5..9
    assert r.end == 10
    assert r.slice(2, 5) == bytes(range(4, 10))
    r.prune(3)
    assert r.base == 3 and r.end == 10
    assert r.slice(3, 10) == bytes(range(6, 20))
    assert r.slice(8, 99) == bytes(range(16, 20))  # clipped at end
    with pytest.raises(ValueError, match="pruned"):
        r.slice(2, 5)
    with pytest.raises(ValueError, match="exceeds"):
        r.append(bytes(80))


def test_cli_stream_trigger_live_pipe_matches_file(tmp_path, capsys, monkeypatch):
    """``stream -stdin -trigger`` over a pipe writes byte-identical
    burst files (same names, same bytes) and the same summary lines as
    the file run — the rolling ring + incremental gate reproduce the
    whole-capture segmentation."""
    import glob
    import io
    import sys
    from types import SimpleNamespace

    from quadrs_tpu.cli import main

    sr, dec, w = 48_000, 4, 32
    win_raw = dec * w
    n = 300 * win_raw
    rng = np.random.default_rng(13)
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    for a, b in ((50, 80), (200, 210)):
        x[a * win_raw : b * win_raw] += 1.0
    raw = np.empty(2 * n, dtype=np.float32)
    raw[0::2] = x.real
    raw[1::2] = x.imag
    cap = tmp_path / f"bursty.sr{sr}.cf32"
    cap.write_bytes(raw.tobytes())

    flags = ["-lowpass", "8k", "-power", "20", "-decimate", str(dec),
             "-width", str(w), "-chunk", "32k", "-trigger", "5",
             "-pre", "2", "-post", "2"]
    f_dir = tmp_path / "f"
    p_dir = tmp_path / "p"
    f_dir.mkdir()
    p_dir.mkdir()
    rc = main(["stream", *flags, "-out", str(f_dir / "rec"), str(cap)])
    assert rc == 0
    file_lines = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("stream burst") or ln.startswith("stream trigger")
    ]

    monkeypatch.setattr(
        sys, "stdin", SimpleNamespace(buffer=io.BytesIO(cap.read_bytes()))
    )
    rc = main(["stream", *flags, "-out", str(p_dir / "rec"), "-stdin", "yes",
               "-sr", str(sr), "-format", "cf32"])
    assert rc == 0
    pipe_lines = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("stream burst") or ln.startswith("stream trigger")
    ]
    assert [ln.replace(str(p_dir), str(f_dir)) for ln in pipe_lines] == file_lines

    f_files = sorted(glob.glob(str(f_dir / "rec.b*")))
    p_files = sorted(glob.glob(str(p_dir / "rec.b*")))
    assert len(f_files) == len(p_files) == 2
    for fp, pp in zip(f_files, p_files):
        assert pathlib.Path(fp).name == pathlib.Path(pp).name
        assert pathlib.Path(fp).read_bytes() == pathlib.Path(pp).read_bytes()


def test_survey_render_and_cli_plot(tone_capture, tmp_path, capsys):
    """The survey PNG marks the tone bins: brighter spectrum columns and
    a lit occupancy strip only at the tones."""
    from quadrs_tpu.viz.survey import SPECTRUM_H, STRIP_H, survey_render

    width = 64
    avg = np.full(width, 1e-3)
    mx = np.full(width, 2e-3)
    occ = np.zeros(width)
    avg[40], mx[40], occ[40] = 10.0, 12.0, 1.0
    img = survey_render(avg, mx, occ)
    assert img.shape == (SPECTRUM_H + 1 + STRIP_H, width, 3)
    # the tone column's filled area is much taller than the floor's
    tone_fill = (img[:SPECTRUM_H, 40, 0] > 0).sum()
    floor_fill = (img[:SPECTRUM_H, 10, 0] > 0).sum()
    assert tone_fill > 3 * floor_fill
    # occupancy strip lit only at the tone
    strip = img[SPECTRUM_H + 1 :, :, 2]
    assert strip[:, 40].min() == 255
    assert strip[:, 10].max() == 0

    from quadrs_tpu.cli import main

    out = tmp_path / "sv"
    rc = main(
        ["scan", "-width", "128", "-threshold", "10", "-plot", "yes",
         "-out", str(out), str(tone_capture)]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert f"wrote {out}.s0.png" in captured
    from PIL import Image

    im = np.asarray(Image.open(f"{out}.s0.png"))
    assert im.shape == (SPECTRUM_H + 1 + STRIP_H, 128, 3)
    # the CSV's top bin is also the brightest plot column
    csv = (tmp_path / "sv.s0.scan.csv").read_text().splitlines()[1:]
    avg_csv = np.array([float(l.split(",")[2]) for l in csv])
    top = int(np.argmax(avg_csv))
    fills = (im[:SPECTRUM_H, :, 0] > 60).sum(axis=0)
    assert int(np.argmax(fills)) == top
