"""The ``quadjax serve`` TCP service: raw IQ in, results out, model
compiled once across connections.  Clients send their capture, half-close
the write side, and read to server close."""

import socket
import threading

import numpy as np
import pytest

from quadrs_tpu import args as argmod
from quadrs_tpu.formats import FileFormat
from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
from quadrs_tpu.serve import run_serve
from quadrs_tpu.sources import SampleSource
from quadrs_tpu.stream_runner import StreamRunner


def _capture(n, fmt=FileFormat.COMPLEX_INT8, seed=41) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, n * fmt.pair_bytes, dtype=np.int64).astype(
        np.uint8
    ).tobytes()


def _serve_cmd(**kw) -> argmod.ServeCmd:
    base = dict(
        port=0, host="127.0.0.1", once=True, search=False, shift=1_000,
        lowpass=8_000, size=40, decimate=4, fft_width=32, chunk=8_000,
        sample_rate="48k", format="cs8",
    )
    base.update(kw)
    return argmod.ServeCmd(**base)


def _start_server(cmd, max_connections=None):
    """run_serve on a thread; returns (thread, bound_port)."""
    port_box: list[int] = []
    evt = threading.Event()

    def ready(p):
        port_box.append(p)
        evt.set()

    th = threading.Thread(
        target=run_serve,
        args=(cmd,),
        kwargs={"ready": ready, "max_connections": max_connections},
    )
    th.start()
    assert evt.wait(30), "server never came up"
    return th, port_box[0]


def _session(port: int, payload: bytes) -> bytes:
    """One client session: send all, half-close, read to EOF.

    A reader thread drains concurrently so norms-mode responses larger
    than the socket buffer cannot deadlock the send."""
    out: list[bytes] = []
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:

        def drain():
            while True:
                b = s.recv(1 << 16)
                if not b:
                    return
                out.append(b)

        rd = threading.Thread(target=drain)
        rd.start()
        s.sendall(payload)
        s.shutdown(socket.SHUT_WR)
        rd.join(timeout=60)
        assert not rd.is_alive(), "server never closed the connection"
    return b"".join(out)


def _direct_rows(data: bytes, cmd, search=False):
    cfg = PipelineConfig(
        sample_rate=48_000, shift_freq=cmd.shift, lp_freq=cmd.lowpass,
        decimate=cmd.decimate, taps=cmd.size, fft_width=cmd.fft_width,
        fmt=FileFormat.COMPLEX_INT8,
    )
    runner = StreamRunner(
        SampleSource(np.frombuffer(data, dtype=np.uint8), cfg.fmt, 48_000),
        PipelineModel(cfg), chunk_samples=cmd.chunk,
    )
    rows = []
    (runner.run_search if search else runner.run)(lambda w, o: rows.append((w, o)))
    return rows


def test_serve_norms_roundtrip(capsys):
    data = _capture(30_000)
    cmd = _serve_cmd()
    th, port = _start_server(cmd)
    got = _session(port, data)
    th.join(timeout=60)
    assert not th.is_alive()

    want = np.concatenate([n for _, n in _direct_rows(data, cmd)])
    np.testing.assert_array_equal(
        np.frombuffer(got, dtype=np.float32).reshape(-1, cmd.fft_width), want
    )
    out = capsys.readouterr().out
    assert "serve: listening on 127.0.0.1:" in out
    assert "serve: conn 1 " in out and "Msps" in out


def test_serve_search_two_connections_no_recompile(capsys):
    """Two sequential sessions against one server process: the second
    reuses the jitted model (same chunk shapes) and both match direct
    runs exactly."""
    cmd = _serve_cmd(search=True, once=False)
    th, port = _start_server(cmd, max_connections=3)
    for seed in (42, 43):
        data = _capture(25_000, seed=seed)
        text = _session(port, data).decode()
        lines = text.strip().splitlines()
        assert lines[0] == "window,bin,mag"
        assert lines[-1].startswith("# stream: ")
        got = [tuple(l.split(",")) for l in lines[1:-1]]

        want = []
        for w0, (idx, val) in _direct_rows(data, cmd, search=True):
            for i in range(len(idx)):
                want.append((str(w0 + i), str(int(idx[i])),
                             f"{float(val[i]):.9g}"))
        assert got == want
    # empty session: zero windows, server stays healthy and exits after
    # its third (final) connection
    empty = _session(port, b"")
    assert empty.decode().strip().splitlines()[0] == "window,bin,mag"
    th.join(timeout=60)
    assert not th.is_alive()


def test_serve_waterfall_mode(capsys):
    """-mode waterfall serves the raw fused spectrogram search: one
    pipe stream per connection through WaterfallRunner, identical to a
    direct pipe run."""
    import io

    from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel
    from quadrs_tpu.sources import PipeSource
    from quadrs_tpu.stream_runner import WaterfallRunner

    data = _capture(20_000, seed=44)
    cmd = _serve_cmd(search=True, mode="waterfall", fft_width=128, chunk=50,
                     stride=64)
    th, port = _start_server(cmd)
    text = _session(port, data).decode()
    th.join(timeout=60)
    lines = text.strip().splitlines()
    assert lines[0] == "window,bin,mag" and lines[-1].startswith("# waterfall: ")

    model = WaterfallModel(
        WaterfallConfig(n_streams=1, fft_width=128, stride=64,
                        fmt=FileFormat.COMPLEX_INT8)
    )
    runner = WaterfallRunner(
        [PipeSource(io.BytesIO(data), FileFormat.COMPLEX_INT8, 48_000)],
        model, chunk_windows=50,
    )
    want = []
    runner.run_search(
        lambda w0, o: [
            want.append((str(w0 + i), str(int(o[0][0, i])), f"{float(o[1][0, i]):.9g}"))
            for i in range(o[0].shape[1])
        ]
    )
    assert [tuple(l.split(",")) for l in lines[1:-1]] == want


def test_serve_waterfall_norms_mode(capsys):
    """-mode waterfall without -search streams raw f32 spectrogram rows."""
    import io

    from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel
    from quadrs_tpu.sources import PipeSource
    from quadrs_tpu.stream_runner import WaterfallRunner

    data = _capture(15_000, seed=45)
    cmd = _serve_cmd(mode="waterfall", fft_width=128, chunk=40)
    th, port = _start_server(cmd)
    got = _session(port, data)
    th.join(timeout=60)

    model = WaterfallModel(
        WaterfallConfig(n_streams=1, fft_width=128, stride=128,
                        fmt=FileFormat.COMPLEX_INT8)
    )
    want = []
    WaterfallRunner(
        [PipeSource(io.BytesIO(data), FileFormat.COMPLEX_INT8, 48_000)],
        model, chunk_windows=40,
    ).run(lambda w0, n: want.append(n[0]))
    np.testing.assert_array_equal(
        np.frombuffer(got, dtype=np.float32).reshape(-1, 128),
        np.concatenate(want),
    )


def test_serve_mesh_matches_direct_mesh_run(capsys):
    """``serve -mesh 4x1`` shards each connection's chunks across the
    mesh (the socket is a live pipe, wrapped in the sliding facade);
    the response is bit-equal to a direct mesh StreamRunner over the
    same bytes."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    from quadrs_tpu.parallel.sharding import make_mesh

    data = _capture(30_000, seed=46)
    cmd = _serve_cmd(mesh=(4, 1))
    th, port = _start_server(cmd)
    got = _session(port, data)
    th.join(timeout=60)
    assert not th.is_alive()

    cfg = PipelineConfig(
        sample_rate=48_000, shift_freq=cmd.shift, lp_freq=cmd.lowpass,
        decimate=cmd.decimate, taps=cmd.size, fft_width=cmd.fft_width,
        fmt=FileFormat.COMPLEX_INT8,
    )
    rows = []
    StreamRunner(
        SampleSource(np.frombuffer(data, dtype=np.uint8), cfg.fmt, 48_000),
        PipelineModel(cfg), chunk_samples=cmd.chunk,
        mesh=make_mesh(n_time=4, n_stream=1),
    ).run(lambda w, n: rows.append(n))
    np.testing.assert_array_equal(
        np.frombuffer(got, dtype=np.float32).reshape(-1, cmd.fft_width),
        np.concatenate(rows),
    )
    assert "mesh 4x1" in capsys.readouterr().out


def test_serve_parallel_concurrent_sessions(capsys):
    """``-parallel 2`` serves two simultaneous connections on the shared
    compiled chain; each response matches its own direct run exactly."""
    cmd = _serve_cmd(search=True, once=False, parallel=2)
    th, port = _start_server(cmd, max_connections=2)

    payloads = [_capture(25_000, seed=s) for s in (47, 48)]
    results: list[bytes | None] = [None, None]

    def client(i):
        results[i] = _session(port, payloads[i])

    clients = [threading.Thread(target=client, args=(i,)) for i in range(2)]
    for c in clients:
        c.start()
    for c in clients:
        c.join(timeout=120)
        assert not c.is_alive()
    th.join(timeout=60)
    assert not th.is_alive()

    for i in range(2):
        lines = results[i].decode().strip().splitlines()
        assert lines[0] == "window,bin,mag"
        assert lines[-1].startswith("# stream: ")
        got = [tuple(l.split(",")) for l in lines[1:-1]]
        want = []
        for w0, (idx, val) in _direct_rows(payloads[i], cmd, search=True):
            for j in range(len(idx)):
                want.append((str(w0 + j), str(int(idx[j])),
                             f"{float(val[j]):.9g}"))
        assert got == want
    out = capsys.readouterr().out
    assert "parallel 2" in out
    assert "serve: conn 1 " in out and "serve: conn 2 " in out


def test_serve_timeout_drops_stalled_client(capsys):
    """``-timeout S``: a client that connects and then sends nothing is
    dropped after ~S seconds — the sequential accept loop recovers and
    the next (well-behaved) connection is served normally."""
    import time

    cmd = _serve_cmd(once=False, timeout=0.5)
    th, port = _start_server(cmd, max_connections=2)

    stalled = socket.create_connection(("127.0.0.1", port), timeout=30)
    try:
        # no bytes, no half-close: the server's first read must block
        # until the idle timeout fires, then the session is dropped —
        # observed here as EOF (or reset) on the stalled socket
        stalled.settimeout(10)
        t0 = time.perf_counter()
        try:
            got = stalled.recv(1024)
        except OSError:
            got = b""
        waited = time.perf_counter() - t0
        assert got == b"", "expected the server to close the stalled session"
        assert waited < 8, f"stalled session held for {waited:.1f}s"
    finally:
        stalled.close()

    data = _capture(20_000, seed=71)
    good = _session(port, data)
    th.join(timeout=60)
    assert not th.is_alive()
    want = np.concatenate([n for _, n in _direct_rows(data, cmd)])
    np.testing.assert_array_equal(
        np.frombuffer(good, dtype=np.float32).reshape(-1, cmd.fft_width), want
    )
    out = capsys.readouterr().out
    assert "timeout 0.5s" in out
    assert "serve: conn 1 failed: TimeoutError" in out
    assert "serve: conn 2 " in out and "done" in out


def test_serve_timeout_frees_parallel_slots(capsys):
    """Two stalled clients fill both ``-parallel 2`` slots; the idle
    timeout frees them, so a third (real) session still completes
    instead of starving in the pool queue."""
    cmd = _serve_cmd(once=False, parallel=2, timeout=0.5)
    th, port = _start_server(cmd, max_connections=3)

    stalled = [
        socket.create_connection(("127.0.0.1", port), timeout=30)
        for _ in range(2)
    ]
    try:
        data = _capture(20_000, seed=72)
        good = _session(port, data)  # queued behind the stalled pair
        want = np.concatenate([n for _, n in _direct_rows(data, cmd)])
        np.testing.assert_array_equal(
            np.frombuffer(good, dtype=np.float32).reshape(-1, cmd.fft_width),
            want,
        )
    finally:
        for s in stalled:
            s.close()
    th.join(timeout=60)
    assert not th.is_alive()
    out = capsys.readouterr().out
    assert out.count("failed: TimeoutError") == 2


def test_serve_parallel_soak_interleaved_slow_fast(capsys):
    """``-parallel 4`` soak: eight concurrent sessions, half trickling
    their capture in small timed pieces, half sending at once.  Every
    response matches its own direct run; no trickler is killed by the
    idle timeout (the clock resets per completed socket op)."""
    import time

    cmd = _serve_cmd(search=True, once=False, parallel=4, timeout=5.0)
    th, port = _start_server(cmd, max_connections=8)

    payloads = [_capture(15_000, seed=80 + i) for i in range(8)]
    results: list[bytes | None] = [None] * 8

    def fast(i):
        results[i] = _session(port, payloads[i])

    def slow(i):
        out: list[bytes] = []
        with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
            def drain():
                while True:
                    b = s.recv(1 << 16)
                    if not b:
                        return
                    out.append(b)
            rd = threading.Thread(target=drain)
            rd.start()
            step = max(1, len(payloads[i]) // 6)
            for off in range(0, len(payloads[i]), step):
                s.sendall(payloads[i][off : off + step])
                time.sleep(0.05)
            s.shutdown(socket.SHUT_WR)
            rd.join(timeout=120)
            assert not rd.is_alive()
        results[i] = b"".join(out)

    clients = [
        threading.Thread(target=(slow if i % 2 else fast), args=(i,))
        for i in range(8)
    ]
    for c in clients:
        c.start()
    for c in clients:
        c.join(timeout=300)
        assert not c.is_alive()
    th.join(timeout=60)
    assert not th.is_alive()

    for i in range(8):
        lines = results[i].decode().strip().splitlines()
        assert lines[0] == "window,bin,mag"
        assert lines[-1].startswith("# stream: ")
        got = [tuple(l.split(",")) for l in lines[1:-1]]
        want = []
        for w0, (idx, val) in _direct_rows(payloads[i], cmd, search=True):
            for j in range(len(idx)):
                want.append((str(w0 + j), str(int(idx[j])),
                             f"{float(val[j]):.9g}"))
        assert got == want, f"session {i} mismatch"
    out = capsys.readouterr().out
    assert out.count("done") == 8 and "failed" not in out


def test_serve_timeout_parse_and_banner(capsys):
    (cmd,) = argmod.parse(
        "serve -timeout 2.5 -sr 48k -format cs8".split()
    )
    assert cmd.timeout == 2.5
    from quadrs_tpu.cli import main

    rc = main(["serve", "-timeout", "-1", "-sr", "48k", "-format", "cs8"])
    assert rc == 1
    assert "-timeout must be >= 0" in capsys.readouterr().err


def test_serve_ook_demod_mode(capsys):
    """``serve -mode ook`` buffers the connection's burst and answers
    with exactly the lines ``quadjax ook`` prints for the same bytes."""
    import pathlib

    from quadrs_tpu.cli import main

    path = pathlib.Path(__file__).parent.parent / "examples" / "ook-sim.sr400.cf32"
    cmd = _serve_cmd(
        mode="ook", fft_width=4, stride=2, bit=16.0, threshold=0.001,
        raw=False, sample_rate="400", format="cf32",
    )
    th, port = _start_server(cmd)
    reply = _session(port, path.read_bytes()).decode()
    th.join(timeout=60)
    assert not th.is_alive()
    server_out = capsys.readouterr().out
    assert "ook bits" in server_out

    assert main(["ook", "-bit", "16", str(path)]) == 0
    want_bits, want_stats = capsys.readouterr().out.strip().splitlines()
    got = reply.strip().splitlines()
    assert got[0] == want_bits
    assert got[1] == f"# {want_stats}"


def test_serve_fsk_demod_mode(capsys):
    """``serve -mode fsk`` answers with the discriminator symbols the
    ``fsk`` command prints (no -bit: raw symbols)."""
    import pathlib

    from quadrs_tpu.cli import main

    path = pathlib.Path(__file__).parent.parent / "examples" / "fsk-sim.sr48k.cf32"
    cmd = _serve_cmd(
        mode="fsk", shift=0, lowpass=8_000, size=20, decimate=4,
        fft_width=64, stride=600, bit=None, sample_rate="48k", format="cf32",
    )
    th, port = _start_server(cmd)
    reply = _session(port, path.read_bytes()).decode()
    th.join(timeout=60)
    assert not th.is_alive()
    assert "fsk bits" in capsys.readouterr().out

    assert main(
        ["fsk", "-lowpass", "8k", "-power", "10", "-decimate", "4",
         "-width", "64", "-stride", "600", str(path)]
    ) == 0
    want_syms, want_stats = capsys.readouterr().out.strip().splitlines()
    got = reply.strip().splitlines()
    assert got[0] == want_syms
    assert got[1] == f"# {want_stats}"


def test_serve_fsk_demod_mode_mesh(capsys):
    """``serve -mode fsk -mesh 4`` time-shards each burst's streaming
    front end across the device mesh; the reply must be byte-equal to
    the unmeshed daemon's."""
    import pathlib

    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")

    path = pathlib.Path(__file__).parent.parent / "examples" / "fsk-sim.sr48k.cf32"
    kw = dict(
        mode="fsk", shift=0, lowpass=8_000, size=20, decimate=4,
        fft_width=64, stride=600, bit=None, sample_rate="48k",
        format="cf32",
    )
    th, port = _start_server(_serve_cmd(**kw))
    want = _session(port, path.read_bytes())
    th.join(timeout=60)
    th, port = _start_server(_serve_cmd(mesh=(4, 1), **kw))
    got = _session(port, path.read_bytes())
    th.join(timeout=60)
    assert not th.is_alive()
    assert "mesh 4x1" in capsys.readouterr().out
    assert got == want


def test_serve_psk_demod_mode(capsys, tmp_path):
    """``serve -mode psk`` answers with exactly the lines ``quadjax
    psk`` prints for the same bytes (differential BPSK burst with a
    carrier offset and a common phase — the block estimator must
    absorb both)."""
    from quadrs_tpu.cli import main

    tau = 2 * np.pi
    rng = np.random.default_rng(9)
    incr = rng.integers(0, 2, 96)
    sr, sps_raw = 128_000, 64.0
    a = np.cumsum(incr) % 2
    n = int(len(a) * sps_raw)
    k = np.minimum((np.arange(n) / sps_raw).astype(np.int64), len(a) - 1)
    ph = tau * a[k] / 2 + 0.5 + tau * 60.0 * np.arange(n) / sr
    raw = np.empty(2 * n, np.float32)
    raw[0::2] = np.cos(ph)
    raw[1::2] = np.sin(ph)
    payload = raw.tobytes()

    cmd = _serve_cmd(
        mode="psk", shift=0, lowpass=5_000, size=64, decimate=4,
        symbol_rate=2_000.0, order=2, sample_rate="128k", format="cf32",
    )
    th, port = _start_server(cmd)
    reply = _session(port, payload).decode()
    th.join(timeout=60)
    assert not th.is_alive()
    assert "psk bits" in capsys.readouterr().out

    path = tmp_path / "psk-sim.sr128k.cf32"
    path.write_bytes(payload)
    assert main(["psk", "-lowpass", "5k", "-power", "32", "-decimate", "4",
                 "-symbol-rate", "2k", str(path)]) == 0
    want_bits, want_stats = capsys.readouterr().out.strip().splitlines()
    got = reply.strip().splitlines()
    assert got[0] == want_bits
    assert got[1] == f"# {want_stats}"
    assert want_bits in "".join(map(str, incr))


def test_serve_psk_mode_gating(capsys):
    """-mode psk requires -symbol-rate; psk knobs are rejected
    elsewhere; demod-inapplicable flags are rejected for psk."""
    from quadrs_tpu.cli import main

    (cmd,) = argmod.parse(
        ["serve", "-mode", "psk", "-symbol-rate", "2k", "-order", "4",
         "-sr", "128k", "-format", "cf32"]
    )
    assert cmd.mode == "psk" and cmd.symbol_rate == 2_000.0 and cmd.order == 4

    rc = main(["serve", "-mode", "psk", "-sr", "128k", "-format", "cf32"])
    assert rc == 1
    assert "-mode psk requires -symbol-rate" in capsys.readouterr().err
    rc = main(["serve", "-mode", "stream", "-symbol-rate", "2k",
               "-sr", "128k", "-format", "cf32"])
    assert rc == 1
    assert "-symbol-rate does not apply to -mode stream" in (
        capsys.readouterr().err
    )
    rc = main(["serve", "-mode", "psk", "-symbol-rate", "2k", "-search",
               "yes", "-sr", "128k", "-format", "cf32"])
    assert rc == 1
    assert "-search does not apply to -mode psk" in capsys.readouterr().err


def test_serve_find_mode(capsys, tmp_path, monkeypatch):
    """``serve -mode find`` streams each connection through the matched
    filter and answers with exactly the lines ``find -stdin`` prints."""
    import io
    import sys
    from types import SimpleNamespace

    from quadrs_tpu.cli import main

    rng = np.random.default_rng(61)
    n, l = 50_000, 300
    p = (rng.standard_normal(l) + 1j * rng.standard_normal(l)).astype(np.complex64)
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    for o in (3_000, 30_000):
        x[o : o + l] += 0.5 * p
    raw = np.empty(2 * n, dtype=np.float32)
    raw[0::2] = x.real
    raw[1::2] = x.imag
    payload = raw.tobytes()
    pat_path = tmp_path / "sync.sr48k.cf32"
    praw = np.empty(2 * l, dtype=np.float32)
    praw[0::2] = p.real
    praw[1::2] = p.imag
    pat_path.write_bytes(praw.tobytes())

    cmd = _serve_cmd(
        mode="find", patterns=(str(pat_path),), threshold=0.8, chunk=1 << 16,
        sample_rate="48k", format="cf32",
    )
    th, port = _start_server(cmd)
    reply = _session(port, payload).decode()
    th.join(timeout=60)
    assert not th.is_alive()
    assert "find matches" in capsys.readouterr().out

    monkeypatch.setattr(sys, "stdin", SimpleNamespace(buffer=io.BytesIO(payload)))
    rc = main(["find", "-pattern", str(pat_path), "-threshold", "0.8",
               "-stdin", "yes", "-sr", "48k", "-format", "cf32"])
    assert rc == 0
    want = capsys.readouterr().out.strip().splitlines()
    got = reply.strip().splitlines()
    assert got[:-1] == want[:-1]
    assert got[-1] == f"# {want[-1]}"
    assert [int(ln.split(",")[0]) for ln in got[:-1]] == [3_000, 30_000]


def test_serve_find_mesh(capsys, tmp_path):
    """``serve -mode find -mesh Tx1`` buffers each burst and time-shards
    the correlation; the reply lines equal the unsharded session's."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    rng = np.random.default_rng(62)
    n, l = 50_000, 300
    p = (rng.standard_normal(l) + 1j * rng.standard_normal(l)).astype(np.complex64)
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    for o in (3_000, 30_000):
        x[o : o + l] += 0.5 * p
    raw = np.empty(2 * n, dtype=np.float32)
    raw[0::2] = x.real
    raw[1::2] = x.imag
    payload = raw.tobytes()
    pat_path = tmp_path / "sync.sr48k.cf32"
    praw = np.empty(2 * l, dtype=np.float32)
    praw[0::2] = p.real
    praw[1::2] = p.imag
    pat_path.write_bytes(praw.tobytes())

    replies = []
    for mesh in (None, (4, 1)):
        cmd = _serve_cmd(
            mode="find", patterns=(str(pat_path),), threshold=0.8,
            chunk=1 << 13, sample_rate="48k", format="cf32", mesh=mesh,
        )
        th, port = _start_server(cmd)
        replies.append(_session(port, payload).decode())
        th.join(timeout=60)
        assert not th.is_alive()
    want, got = (r.strip().splitlines() for r in replies)
    assert [ln.split(",")[0] for ln in got[:-1]] == ["3000", "30000"]
    assert got == want
    capsys.readouterr()


def test_serve_find_mode_gating(capsys):
    from quadrs_tpu.cli import main

    (cmd,) = argmod.parse(
        ["serve", "-mode", "find", "-pattern", "a.sr48k.cf32", "-pattern",
         "b.sr48k.cf32", "-freq-tol", "200", "-sr", "48k", "-format", "cf32"]
    )
    assert cmd.mode == "find" and cmd.patterns == ("a.sr48k.cf32", "b.sr48k.cf32")
    assert cmd.threshold == 0.5 and cmd.freq_tol == 200.0

    rc = main(["serve", "-mode", "find", "-sr", "48k", "-format", "cf32"])
    assert rc == 1
    assert "-mode find requires -pattern" in capsys.readouterr().err
    rc = main(["serve", "-mode", "find", "-pattern", "a.sr48k.cf32",
               "-shift", "1k", "-sr", "48k", "-format", "cf32"])
    assert rc == 1
    assert "-shift does not apply to -mode find" in capsys.readouterr().err
    rc = main(["serve", "-mode", "stream", "-pattern", "a.sr48k.cf32",
               "-sr", "48k", "-format", "cf32"])
    assert rc == 1
    assert "-pattern does not apply to -mode stream" in capsys.readouterr().err


def test_serve_demod_mode_parse_and_gating(capsys):
    """The demod modes parse their knobs and reject inapplicable flags."""
    from quadrs_tpu.cli import main

    (cmd,) = argmod.parse(
        ["serve", "-mode", "ook", "-bit", "16", "-threshold", "0.01",
         "-raw", "yes", "-sr", "400", "-format", "cf32"]
    )
    assert cmd.mode == "ook" and cmd.bit == 16.0 and cmd.threshold == 0.01
    assert cmd.raw and cmd.fft_width == 4 and cmd.stride == 2

    (cmd,) = argmod.parse(
        ["serve", "-mode", "fsk", "-lowpass", "8k", "-sr", "48k",
         "-format", "cf32"]
    )
    assert cmd.mode == "fsk" and cmd.bit is None and cmd.fft_width == 64

    rc = main(["serve", "-mode", "ook", "-search", "yes",
               "-sr", "400", "-format", "cf32"])
    assert rc == 1
    assert "-search does not apply to -mode ook" in capsys.readouterr().err
    rc = main(["serve", "-mode", "fsk", "-threshold", "0.1",
               "-sr", "48k", "-format", "cf32"])
    assert rc == 1
    assert "-threshold does not apply to -mode fsk" in capsys.readouterr().err
    rc = main(["serve", "-mode", "stream", "-bit", "8",
               "-sr", "48k", "-format", "cf32"])
    assert rc == 1
    assert "-bit does not apply to -mode stream" in capsys.readouterr().err


def test_serve_requires_sr_and_format(capsys):
    from quadrs_tpu.cli import main

    assert main(["serve", "-once", "yes"]) == 1
    assert "requires -sr and -format" in capsys.readouterr().err


def test_serve_rejects_mode_inapplicable_flags(capsys):
    """Flags the chosen mode would silently ignore are errors, like the
    sibling commands' inapplicable-combination checks."""
    from quadrs_tpu.cli import main

    rc = main(["serve", "-mode", "waterfall", "-shift", "280k",
               "-sr", "2M", "-format", "cu8"])
    assert rc == 1
    assert "-shift does not apply to -mode waterfall" in capsys.readouterr().err
    rc = main(["serve", "-stride", "32", "-sr", "2M", "-format", "cu8"])
    assert rc == 1
    assert "-stride does not apply to -mode stream" in capsys.readouterr().err
    rc = main(["serve", "-mode", "bogus", "-sr", "2M", "-format", "cu8"])
    assert rc == 1
    assert "unknown -mode" in capsys.readouterr().err


def test_usage_lists_serve():
    from quadrs_tpu.cli import USAGE

    assert "serve [-port 7373]" in USAGE


def test_serve_demod_empty_burst_answers_error_and_survives(capsys):
    """An empty (or too-short) burst must not kill the daemon NOR leave
    the client with silence: the server answers ``# error: ...`` and the
    next connection is served normally."""
    import pathlib

    from quadrs_tpu.cli import main

    path = pathlib.Path(__file__).parent.parent / "examples" / "ook-sim.sr400.cf32"
    cmd = _serve_cmd(
        mode="ook", fft_width=4, stride=2, bit=16.0, threshold=0.001,
        raw=False, sample_rate="400", format="cf32", once=False,
    )
    th, port = _start_server(cmd, max_connections=2)
    bad = _session(port, b"").decode()
    assert bad.startswith("# error: "), bad
    assert "shorter than the envelope window" in bad

    good = _session(port, path.read_bytes()).decode()
    th.join(timeout=60)
    assert not th.is_alive()
    capsys.readouterr()

    assert main(["ook", "-bit", "16", str(path)]) == 0
    want_bits = capsys.readouterr().out.strip().splitlines()[0]
    assert good.strip().splitlines()[0] == want_bits


def test_serve_fm_demod_mode(capsys, tmp_path):
    """``serve -mode fm`` answers with a self-describing header line,
    the f32 audio bytes, and a stats trailer; the audio equals the
    library FmDemod run on the same bytes."""
    import numpy as np

    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.demod import FmDemod
    from quadrs_tpu.sources import SampleSource

    sr = 100_000
    t = np.arange(60_000) / sr
    inst = 3_000.0 * np.cos(2 * np.pi * 200.0 * t)
    phase = 2 * np.pi * np.cumsum(inst) / sr
    x = (np.cos(phase) + 1j * np.sin(phase)).astype(np.complex64)
    raw = np.empty(2 * len(x), dtype=np.float32)
    raw[0::2], raw[1::2] = x.real, x.imag
    payload = raw.tobytes()

    cmd = _serve_cmd(
        mode="fm", shift=0, lowpass=10_000, size=80, decimate=4,
        bit=None, sample_rate="100k", format="cf32",
    )
    cmd = type(cmd)(**{**cmd.__dict__, "deviation": 3_000.0})
    th, port = _start_server(cmd)
    reply = _session(port, payload)
    th.join(timeout=60)
    assert not th.is_alive()
    assert "fm audio" in capsys.readouterr().out

    header, rest = reply.split(b"\n", 1)
    n, rate = header.decode().removeprefix("# fm ").split()
    n, rate = int(n), int(rate)
    assert rate == sr // 4
    audio = np.frombuffer(rest[: 4 * n], dtype="<f4")
    trailer = rest[4 * n :].decode()
    assert trailer.startswith("\n# fm: ")

    demod = FmDemod(bandwidth=10_000, decimate=4, taps=80, deviation=3_000.0)
    want_rate, want = demod.demodulate(
        SampleSource(
            np.frombuffer(payload, dtype=np.uint8), FileFormat.COMPLEX_FLOAT32, sr
        )
    )
    assert want_rate == rate and len(want) == n
    np.testing.assert_array_equal(audio, want)


def test_serve_fm_mode_gating(capsys):
    from quadrs_tpu.cli import main

    rc = main(["serve", "-mode", "fm", "-threshold", "0.5",
               "-sr", "2M", "-format", "cu8"])
    assert rc == 1
    assert "-threshold does not apply to -mode fm" in capsys.readouterr().err
    rc = main(["serve", "-mode", "ook", "-deviation", "75k",
               "-sr", "400", "-format", "cf32"])
    assert rc == 1
    assert "-deviation does not apply to -mode ook" in capsys.readouterr().err


def test_serve_am_demod_mode(capsys):
    """``serve -mode am`` answers with the "# am N RATE" header, the
    f32 audio, and a trailer; audio equals the library AmDemod run."""
    import numpy as np

    from quadrs_tpu.formats import FileFormat
    from quadrs_tpu.models.demod import AmDemod
    from quadrs_tpu.sources import SampleSource

    sr = 100_000
    t = np.arange(40_000) / sr
    x = (1.0 + 0.5 * np.cos(2 * np.pi * 250.0 * t)).astype(np.complex64)
    raw = np.empty(2 * len(x), dtype=np.float32)
    raw[0::2], raw[1::2] = x.real, x.imag
    payload = raw.tobytes()

    cmd = _serve_cmd(
        mode="am", shift=0, lowpass=8_000, size=80, decimate=4,
        bit=None, sample_rate="100k", format="cf32",
    )
    th, port = _start_server(cmd)
    reply = _session(port, payload)
    th.join(timeout=60)
    assert not th.is_alive()
    assert "am audio" in capsys.readouterr().out

    header, rest = reply.split(b"\n", 1)
    n, rate = map(int, header.decode().removeprefix("# am ").split())
    audio = np.frombuffer(rest[: 4 * n], dtype="<f4")
    assert rest[4 * n :].decode().startswith("\n# am: ")

    demod = AmDemod(bandwidth=8_000, decimate=4, taps=80)
    want_rate, want = demod.demodulate(
        SampleSource(
            np.frombuffer(payload, dtype=np.uint8), FileFormat.COMPLEX_FLOAT32, sr
        )
    )
    assert (want_rate, len(want)) == (rate, n)
    np.testing.assert_array_equal(audio, want)


def test_serve_scan_mode(capsys):
    """-mode scan answers each connection with the band-survey CSV —
    identical to a direct pipe run_scan over the same bytes."""
    import io

    from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel
    from quadrs_tpu.serve import _scan_csv_lines
    from quadrs_tpu.sources import PipeSource
    from quadrs_tpu.stream_runner import WaterfallRunner

    data = _capture(20_000, seed=47)
    cmd = _serve_cmd(mode="scan", fft_width=128, chunk=50, stride=64,
                     threshold=8.0)
    th, port = _start_server(cmd)
    text = _session(port, data).decode()
    th.join(timeout=60)
    lines = text.strip().splitlines()
    assert lines[0] == "bin,freq_hz,avg,max,above,occupancy"
    assert len(lines) == 1 + 128 + 1
    assert lines[-1].startswith("# scan: ") and "threshold 8" in lines[-1]

    model = WaterfallModel(
        WaterfallConfig(n_streams=1, fft_width=128, stride=64,
                        fmt=FileFormat.COMPLEX_INT8)
    )
    runner = WaterfallRunner(
        [PipeSource(io.BytesIO(data), FileFormat.COMPLEX_INT8, 48_000)],
        model, chunk_windows=50,
    )
    result = runner.run_scan(threshold=8.0)
    freq = (np.arange(128) - 64) * (48_000 / 128)
    want = [ln.rstrip("\n") for ln in _scan_csv_lines(result, 0, freq)]
    assert lines[: 1 + 128] == want
    # occupancy actually discriminates at this threshold
    occ = np.array([float(l.split(",")[5]) for l in lines[1:129]])
    assert 0.0 < occ.mean() < 1.0


def _fuzz_bursts(fmt_bytes: int, seed: int) -> list[bytes]:
    """Adversarial burst corpus: empty, sub-sample, partial-pair tails,
    NaN/inf/all-zero f32 payloads, and random garbage at odd lengths."""
    rng = np.random.default_rng(seed)
    bursts = [
        b"",
        b"\x01",
        bytes(fmt_bytes - 1),  # under one sample
        rng.integers(0, 256, 4097, dtype=np.int64).astype(np.uint8).tobytes(),
        np.full(512, np.nan, dtype=np.float32).tobytes(),
        np.full(512, np.inf, dtype=np.float32).tobytes(),
        bytes(8192),  # all zero (psk: no power; am: zero carrier)
    ]
    for _ in range(3):
        n = int(rng.integers(1, 20_000))
        bursts.append(
            rng.integers(0, 256, n, dtype=np.int64).astype(np.uint8).tobytes()
        )
    return bursts


@pytest.mark.parametrize(
    "mode_kw, good_payload",
    [
        (dict(mode="psk", format="cf32", symbol_rate=1_500.0, decimate=4,
              size=40, lowpass=8_000, chunk=None), None),
        (dict(mode="fm", format="cf32", decimate=4, size=40, lowpass=8_000,
              chunk=None), None),
        (dict(mode="ook", format="cu8", fft_width=4, stride=2,
              threshold=0.05, chunk=None), None),
        (dict(mode="stream", format="cs8"), None),
    ],
)
def test_serve_fuzz_garbage_bursts_survive(capsys, mode_kw, good_payload):
    """Fuzz the wire: malformed bursts (empty, partial pairs, NaN/inf
    cf32, all-zero, random garbage, and one abrupt RST) must never kill
    the daemon — every session is answered with result text or an
    ``# error:`` line, or closed cleanly — and a well-formed burst
    AFTER the garbage is still served.  Closes the STATUS.md roadmap
    item (decode-time errors were answered but never fuzzed)."""
    fmt = FileFormat(mode_kw["format"])
    bursts = _fuzz_bursts(fmt.pair_bytes, seed=hash(mode_kw["mode"]) % 1000)
    cmd = _serve_cmd(once=False, **mode_kw)
    # every fuzz burst + one RST + one good burst
    th, port = _start_server(cmd, max_connections=len(bursts) + 2)

    for payload in bursts:
        got = _session(port, payload)
        # demod modes answer errors in-band; stream mode may close with
        # no rows for degenerate input — either way the socket closed
        assert b"Traceback" not in got

    # abrupt RST mid-send: SO_LINGER 0 + close without half-close
    import struct

    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.setsockopt(
        socket.SOL_SOCKET, socket.SO_LINGER, struct.pack("ii", 1, 0)
    )
    s.sendall(bytes(1024))
    s.close()

    # the daemon still serves a well-formed burst correctly
    if good_payload is None:
        if mode_kw["mode"] == "psk":
            good_payload = _psk_burst_cf32()
        elif mode_kw["mode"] == "fm":
            rng = np.random.default_rng(5)
            x = (0.5 * np.exp(2j * np.pi * 900.0 *
                              np.arange(12_000) / 48_000)).astype(np.complex64)
            good_payload = x.tobytes()
        elif mode_kw["mode"] == "ook":
            n = 4_000
            env = np.zeros(n, dtype=np.float32)
            env[: n // 2] = 0.4
            x = (env + 1j * env).astype(np.complex64)
            u = np.empty(2 * n, dtype=np.float32)
            u[0::2], u[1::2] = x.real, x.imag
            good_payload = (
                np.round(u * 255.0 + 127.5).clip(0, 255).astype(np.uint8).tobytes()
            )
        else:
            good_payload = _capture(30_000)
    got = _session(port, good_payload)
    th.join(timeout=60)
    assert not th.is_alive()
    if mode_kw["mode"] == "stream":
        want = np.concatenate([n for _, n in _direct_rows(good_payload, cmd)])
        np.testing.assert_array_equal(
            np.frombuffer(got, dtype=np.float32).reshape(-1, cmd.fft_width),
            want,
        )
    else:
        assert b"# error:" not in got and got  # a real answer
    out = capsys.readouterr().out
    assert "Traceback" not in out


def _psk_burst_cf32() -> bytes:
    """A clean differential-BPSK burst at 48 kHz, 1.5 kbaud, cf32."""
    rng = np.random.default_rng(3)
    rate, sps = 48_000, 8  # after decimate 4: 12 kHz, 8 sps at 1.5 kbaud
    bits = rng.integers(0, 2, 200)
    phases = np.cumsum(np.where(bits, np.pi, 0.0))
    sym = np.exp(1j * phases)
    bb = np.repeat(sym, sps * 4)  # raw-rate rectangular pulses
    t = np.arange(len(bb)) / rate
    x = (0.5 * bb * np.exp(2j * np.pi * 0.0 * t)).astype(np.complex64)
    return x.tobytes()


def test_serve_scan_mode_gating(capsys):
    with pytest.raises(ValueError, match="does not apply to -mode scan"):
        argmod.parse(
            "serve -mode scan -search yes -sr 48k -format cs8".split()
        )
    with pytest.raises(ValueError, match="does not apply to -mode scan"):
        argmod.parse(
            "serve -mode scan -deviation 75k -sr 48k -format cs8".split()
        )
    # threshold/stride/width/chunk/mesh all apply
    (c,) = argmod.parse(
        "serve -mode scan -width 256 -stride 128 -threshold 0.5 "
        "-chunk 100 -sr 48k -format cs8".split()
    )
    assert c.mode == "scan" and c.threshold == 0.5 and c.stride == 128
