"""Live terminal waterfall (viz/live.py): the interactive loop the
reference ships as GUI windows (src/ui/mod.rs:87-258), drivable
headlessly via injected key events."""

import io
import pathlib

import numpy as np
import pytest

from quadrs_tpu.sources import SampleSource
from quadrs_tpu.utils.sniff import guess_details
from quadrs_tpu.viz.live import LiveParams, _pool_bins, live_waterfall

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"
CAPTURE = EXAMPLES / "fsk-sim.sr48k.cf32"


def _source() -> SampleSource:
    return SampleSource.from_file(str(CAPTURE), guess_details(str(CAPTURE)))


def test_live_streams_rows_and_applies_keys():
    out = io.StringIO()
    stats = live_waterfall(
        _source(),
        LiveParams(fft_width=16, stride=64, cols=24, max_rows=30, batch=8),
        out=out,
        keys=[(5, "+"), (10, "]"), (20, "q")],
    )
    # '+' doubled the fft width at row 5, ']' doubled the stride at row
    # 10, 'q' quit at row 20 (before the 30-row bound)
    assert stats == {"rows": 20, "fft_width": 32, "stride": 128}
    text = out.getvalue()
    lines = text.strip().splitlines()
    headers = [l for l in lines if l.startswith("-- live ")]
    data = [l for l in lines if not l.startswith("-- live ")]
    assert len(data) == 20
    # every data row renders exactly `cols` background-colored cells
    assert all(l.count("\x1b[48;2;") == 24 for l in data)
    # the retunes re-announce the state
    assert "-- live fft 32 stride 64 --" in headers
    assert "-- live fft 32 stride 128 --" in headers


def test_live_runs_to_eof_without_bound():
    src = _source()
    fw, stride = 32, 1024
    out = io.StringIO()
    stats = live_waterfall(
        src, LiveParams(fft_width=fw, stride=stride, cols=16), out=out
    )
    avail = src.length - fw + 1
    assert stats["rows"] == (avail - 1) // stride + 1


def test_live_row_colors_track_magnitude():
    """A louder window must not render as an all-black row: check the
    pooled-bin path keeps energy visible at terminal width."""
    norms = np.zeros((1, 64), dtype=np.float32)
    norms[0, 37] = 2.0  # single hot bin
    pooled = _pool_bins(norms, 8)
    assert pooled.shape == (1, 8)
    assert pooled[0, (37 * 8) // 64] == 2.0  # max-pool keeps the peak


def test_live_rejects_bad_params():
    with pytest.raises(ValueError, match="fft width"):
        live_waterfall(_source(), LiveParams(fft_width=1), out=io.StringIO())


def test_live_blue_colormap_and_bh_window():
    """eui flavor: Blackman-Harris window, blue-channel colormap —
    every cell's red and green stay zero."""
    out = io.StringIO()
    stats = live_waterfall(
        _source(),
        LiveParams(
            fft_width=32, stride=512, cols=16, max_rows=6,
            windowing="blackman-harris", colormap="blue",
        ),
        out=out,
    )
    assert stats["rows"] == 6
    import re

    cells = re.findall(r"\x1b\[48;2;(\d+);(\d+);(\d+)m", out.getvalue())
    assert len(cells) == 6 * 16
    assert all(r == "0" and g == "0" for r, g, _ in cells)
    assert any(int(b) > 0 for _, _, b in cells)


def test_cli_eui_live(capsys):
    from quadrs_tpu.cli import main

    rc = main(
        ["eui", "-live", "yes", "-fft", "32", "-rows", "3", "-cols", "10",
         str(CAPTURE)]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert captured.strip().splitlines()[-1] == "live: 3 rows, fft 32, stride 32"
    data = [l for l in captured.splitlines() if "\x1b[48;2;" in l]
    assert len(data) == 3 and all(l.count("\x1b[48;2;0;0;") == 10 for l in data)


def test_cli_ui_live(capsys):
    from quadrs_tpu.cli import main

    rc = main(
        ["from", str(CAPTURE), "ui", "-live", "yes", "-fft", "16",
         "-stride", "256", "-rows", "4", "-cols", "12"]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    lines = captured.strip().splitlines()
    assert lines[-1] == "live: 4 rows, fft 16, stride 256"
    data = [l for l in lines if "\x1b[48;2;" in l]
    assert len(data) == 4 and all(l.count("\x1b[48;2;") == 12 for l in data)
