import numpy as np

from quadrs_tpu.formats import FileFormat, decode_plane
from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel


def _reference(raw, cfg):
    re = decode_plane(raw[:, 0, :], cfg.fmt, xp=np).astype(np.float64)
    im = decode_plane(raw[:, 1, :], cfg.fmt, xp=np).astype(np.float64)
    x = re + 1j * im
    n_windows = (x.shape[1] - cfg.fft_width) // cfg.stride + 1
    out = np.empty((x.shape[0], n_windows, cfg.fft_width), dtype=np.float32)
    for s in range(x.shape[0]):
        for wi in range(n_windows):
            win = x[s, wi * cfg.stride : wi * cfg.stride + cfg.fft_width]
            spec = np.fft.fft(win)
            half = cfg.fft_width // 2
            spec = np.concatenate([spec[half:], spec[:half]])
            out[s, wi] = np.abs(spec)
    return out


def test_waterfall_matches_reference():
    cfg = WaterfallConfig(n_streams=3, fft_width=128, stride=64)
    model = WaterfallModel(cfg)
    raw = model.synth_raw(1024, seed=7)[: cfg.n_streams]
    got = np.asarray(model.jit_step()(raw))
    want = _reference(raw, cfg)
    assert got.shape == want.shape == (3, 15, 128)
    np.testing.assert_allclose(got, want, atol=2e-4 * want.max())


def test_waterfall_search_finds_tone():
    cfg = WaterfallConfig(n_streams=2, fft_width=256, stride=256, fmt=FileFormat.COMPLEX_FLOAT32)
    model = WaterfallModel(cfg)
    n = 2048
    t = np.arange(n)
    tone_bin = 40  # cycles per 256 samples -> shifted bin 128+40
    x = np.exp(2j * np.pi * tone_bin * t / 256).astype(np.complex64)
    raw = np.stack([np.stack([x.real, x.imag]), np.stack([x.real * 0.5, x.imag * 0.5])])
    peaks, mags = model.search(raw.astype(np.float32))
    assert np.all(np.asarray(peaks) == 128 + tone_bin)
    assert np.asarray(mags).min() > 100


def test_waterfall_blackman_harris():
    cfg = WaterfallConfig(n_streams=1, fft_width=64, stride=32, windowing="blackman-harris")
    model = WaterfallModel(cfg)
    raw = model.synth_raw(640, seed=1)[:1]
    got = np.asarray(model.jit_step()(raw))
    assert got.shape == (1, (640 - 64) // 32 + 1, 64)
    assert np.isfinite(got).all()
