import numpy as np
import pytest

from quadrs_tpu.sources import ToneGen
from quadrs_tpu.viz.waterfall import (
    EuiParams,
    UiParams,
    _hsv_to_rgb_u8,
    eui_render,
    eui_render_file,
    ui_render,
    ui_render_file,
)


def test_hsv_colormap_reference_points():
    # scaled=1 (strong): hue 0 (red), value 1 -> pure red
    rgb = _hsv_to_rgb_u8(np.array([1.0]))
    assert tuple(rgb[0]) == (255, 0, 0)
    # scaled=0 (silent): value 0 -> black
    rgb = _hsv_to_rgb_u8(np.array([0.0]))
    assert tuple(rgb[0]) == (0, 0, 0)
    # mid value: hue 0.5*0.8*360 = 144deg (green-ish), v=0.5
    rgb = _hsv_to_rgb_u8(np.array([0.5]))
    r, g, b = rgb[0]
    assert g > r and g > b


def test_ui_render_shapes_and_content():
    g = ToneGen([100], 4000, 0.5)  # 2000 samples
    img, lo, hi = ui_render(g, UiParams(width=100, height=80, fft_width=8, stretch=2))
    assert img.shape == (80, 100, 3)
    assert hi > lo >= 0.0
    # stride-1 default blacks out every column (src/ui/mod.rs:374-376:
    # scan_pos==0 every window when stride==1) -> image all black
    assert img.sum() == 0

    img, _, _ = ui_render(g, UiParams(width=100, height=80, fft_width=8, stretch=2, stride=5))
    assert img.sum() > 0  # non-separator columns carry color


def test_ui_render_validation():
    g = ToneGen([100], 4000, 0.5)
    with pytest.raises(ValueError):
        ui_render(g, UiParams(width=8, height=80, fft_width=8))
    with pytest.raises(ValueError):
        ui_render(g, UiParams(stretch=0))


def test_ui_render_file(tmp_path):
    from PIL import Image

    g = ToneGen([100, -300], 4000, 0.5)
    out = ui_render_file(g, tmp_path / "ui.png", UiParams(width=64, height=48, stride=3))
    img = np.asarray(Image.open(out))
    assert img.shape == (48, 64, 3)


def test_eui_render_blue_channel(tmp_path):
    from PIL import Image

    from quadrs_tpu import sinks

    g = ToneGen([500, -1200], 48_000, 1.0)
    path = sinks.do_write(g, False, str(tmp_path / "x"))
    out = eui_render_file(path, tmp_path / "eui.png", EuiParams(0.0, 80.0, 64, 128))
    img = np.asarray(Image.open(out))
    assert img.shape == (128, 64, 3)
    assert img[:, :, 2].sum() > 0  # blue energy present
    assert img[:, :, 0].sum() == 0 and img[:, :, 1].sum() == 0  # blue-only map


def test_eui_requires_filename():
    with pytest.raises(ValueError):
        eui_render_file(None)


def test_hsv_colormap_golden_pixels():
    """Exact hand-computed RGB goldens for the legacy colormap
    (src/ui/mod.rs:351-372: hue=(1-s)*0.8*360, sat=1, val=s, then
    Rust's saturating `(c*256) as u8`)."""
    cases = {
        # s=1.0: hue 0 -> sector 0, c=1 -> (256,0,0) saturates to 255
        1.0: (255, 0, 0),
        # s=0.5: hue 144 -> sector 2 (r=0,g=c,b=x); x=0.5*(1-|2.4%2-1|)=0.2
        0.5: (0, 128, 51),
        # s=0.25: hue 216 -> sector 3 (r=0,g=x,b=c); x=0.25*0.4=0.1
        0.25: (0, 25, 64),
        # s=0.75: hue 72 -> sector 1 (r=x,g=c,b=0); x=0.75*(1-|1.2-1|)=0.6
        0.75: (153, 192, 0),
        # overdriven s=1.1: hue=-28.8 wraps to 331.2 -> sector 5
        # (r=c,g=0,b=x); c=1.1 saturates, x=1.1*(1-|5.52%2-1|)=0.528
        1.1: (255, 0, 135),
        0.0: (0, 0, 0),
    }
    got = _hsv_to_rgb_u8(np.array(list(cases), dtype=np.float64))
    for (s, want), rgb in zip(cases.items(), got):
        assert tuple(rgb) == want, f"scaled={s}: {tuple(rgb)} != {want}"


def test_eui_colormap_golden_pixels():
    """The blue map is `(mag/10*256) as u8` with Rust's saturating cast
    (src/eui/mod.rs:103-106); pin exact bytes incl. saturation."""
    norms = np.array([[0.0, 1.0, 5.0, 9.96, 10.0, 1e6]], dtype=np.float32)
    b = np.clip(norms / 10.0 * 256.0, 0, 255).astype(np.uint8)
    assert list(b[0]) == [0, 25, 128, 254, 255, 255]
    # and the renderer produces exactly that in the blue channel
    from quadrs_tpu.sinks import FftResult

    res = FftResult(norms=norms, fft_width=6)
    img = np.zeros((1, 6, 3), dtype=np.uint8)
    img[:, :, 2] = np.clip(res.norms / 10.0 * 256.0, 0, 255).astype(np.uint8)
    assert list(img[0, :, 2]) == [0, 25, 128, 254, 255, 255]


def test_ui_render_frames_sweep(tmp_path):
    """Multi-frame parameter sweep: frame k doubles fft_width (one PNG
    per simulated fft+ click); the sweep stops when the GUI would."""
    from PIL import Image

    from quadrs_tpu.viz.waterfall import ui_render_frames

    g = ToneGen([100, -300], 4000, 0.5)
    p = UiParams(width=64, height=48, fft_width=4, stretch=1, stride=3)
    paths = ui_render_frames(g, 3, tmp_path / "sweep", params=p)
    assert [pp.name for pp in paths] == ["sweep000.png", "sweep001.png", "sweep002.png"]
    # frame k equals a single render at fft_width * 2**k
    for k, pp in enumerate(paths):
        frame = np.asarray(Image.open(pp))
        pk = UiParams(width=64, height=48, fft_width=4 << k, stretch=1, stride=3)
        want, _, _ = ui_render(g, pk)
        assert np.array_equal(frame, want)
    # an over-long sweep stops where fft_width would exceed the window
    paths = ui_render_frames(g, 99, tmp_path / "cap", params=p)
    assert len(paths) == 4  # 4, 8, 16, 32 < width 64


def test_ui_render_frames_bad_first_frame_raises(tmp_path):
    """A refused frame 0 must raise like the single render, not silently
    write nothing and succeed."""
    from quadrs_tpu.viz.waterfall import ui_render_frames

    g = ToneGen([100], 4000, 0.5)
    p = UiParams(width=32, height=48, fft_width=64)  # fft wider than window
    with pytest.raises(ValueError):
        ui_render_frames(g, 3, tmp_path / "bad", params=p)


def test_eui_render_frames_scroll(tmp_path):
    """Multi-frame scroll: frame k advances the visible slice by its own
    span, stopping at the right slider stop."""
    from PIL import Image

    from quadrs_tpu import sinks
    from quadrs_tpu.viz.waterfall import eui_render_frames

    g = ToneGen([500, -1200], 48_000, 1.0)
    path = sinks.do_write(g, False, str(tmp_path / "scroll"))
    p = EuiParams(start_pct=10.0, end_pct=40.0, fft_width=32, rows=64)
    paths = eui_render_frames(path, 5, tmp_path / "fr", params=p)
    # 10-40, 40-70; 70-100 would hit end_sample == len, which the
    # reference's take_fft asserts against (ffts.rs:36)
    assert len(paths) == 2
    from quadrs_tpu.sources import SampleSource

    src = SampleSource.from_file(path)
    for k, pp in enumerate(paths):
        frame = np.asarray(Image.open(pp))
        pk = EuiParams(10.0 + 30.0 * k, 40.0 + 30.0 * k, 32, 64)
        assert np.array_equal(frame, eui_render(src, pk))


@pytest.mark.slow
def test_ui_render_geometry_matches_sequential_oracle():
    """Pixel-for-pixel check of the render loop geometry (column fill,
    row-band wrap, vertical stretch, y-flip, separator columns) against
    a literal transcription of src/ui/mod.rs:294-412."""
    import numpy as np

    from quadrs_tpu.viz.waterfall import UiParams, _hsv_to_rgb_u8, ui_render

    g = ToneGen([40, -90], 1000, 2.0)  # 2000 samples
    p = UiParams(width=40, height=60, fft_width=8, stretch=3, stride=4)
    img, _, _ = ui_render(g, p)

    # sequential oracle
    w, h = p.width, p.height
    target = np.zeros((h, w, 3), dtype=np.uint8)
    row_height = p.stretch * p.fft_width + 16
    sample_pos, ox, row, scan_pos = 0, 0, 0, 0
    avail = g.length - p.fft_width
    while sample_pos < avail:
        oy = row * row_height
        if oy > h:
            break
        win, _ = g.read_at(sample_pos, p.fft_width)
        spec = np.fft.fft(np.asarray(win).astype(np.complex128))
        spec = np.concatenate([spec[p.fft_width // 2 :], spec[: p.fft_width // 2]])
        norms = np.abs(spec).astype(np.float32)
        for o, v in enumerate(norms):
            rgb = _hsv_to_rgb_u8(np.array([v / 2.29], dtype=np.float64))[0]
            if scan_pos == 0:
                rgb = np.zeros(3, dtype=np.uint8)
            for off in range(p.stretch):
                y = oy + o * p.stretch + off
                if y >= h:
                    continue
                target[h - y - 1, ox] = rgb
        ox += 1
        if ox >= w:
            ox = 0
            row += 1
        scan_pos += 1
        if scan_pos >= p.stride:
            scan_pos = 0
        sample_pos += 1

    mismatched = int((img != target).any(axis=2).sum())
    assert mismatched == 0, f"{mismatched} pixels differ"
