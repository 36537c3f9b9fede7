import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
from quadrs_tpu.ops.frontend_pallas import (
    FrontendSpec,
    fused_frontend,
    supported,
    tile_bases,
)

INTERPRET = jax.default_backend() != "tpu"


def _spec(cfg):
    return FrontendSpec(
        fmt=cfg.fmt,
        sample_rate=cfg.sample_rate,
        shift_freq=cfg.shift_freq,
        decimate=cfg.decimate,
        taps_bytes=PipelineModel(cfg).taps.tobytes(),
    )


@pytest.mark.parametrize(
    "fmt", [FileFormat.COMPLEX_FLOAT32, FileFormat.COMPLEX_INT8, FileFormat.COMPLEX_INT16]
)
def test_fused_frontend_matches_xla_chain(fmt):
    cfg = PipelineConfig(
        sample_rate=1_000_000,
        shift_freq=12_500,
        lp_freq=50_000,
        decimate=32,
        taps=400,
        fft_width=64,
        fmt=fmt,
    )
    model = PipelineModel(cfg)
    spec = _spec(cfg)

    n_out = 3000  # not a multiple of the tile size: exercises padding
    n_in = n_out * cfg.decimate + cfg.taps
    raw = model.synth_raw(n_in, seed=5)

    # XLA reference: decode -> mix -> fir (stream semantics)
    from quadrs_tpu.ops.fir import fir_decimate
    from util import from_device_complex

    def ref(r, t):
        xx = model._mix_stream(model._decode(r), t)
        return fir_decimate(xx[None], model.taps, cfg.decimate, n_out)[0]

    want = from_device_complex(jax.jit(ref)(raw, np.float32(0.0)))

    shifted = raw[:, cfg.taps // 2 :]
    theta = tile_bases(spec, cfg.taps // 2, -(-n_out // 2048))
    got = np.asarray(
        jax.jit(
            lambda p, t: fused_frontend(p, t, spec, n_out, interpret=INTERPRET)
        )(shifted, theta)
    )
    got_c = got[0] + 1j * got[1]
    scale = np.abs(want).max()
    np.testing.assert_allclose(got_c, want, atol=3e-5 * max(scale, 1e-3))


def test_fused_frontend_phase_matches_at_offset():
    """Tile base angles must keep the NCO coherent with the stream's
    absolute indexing when the chunk starts mid-stream."""
    cfg = PipelineConfig(
        sample_rate=1_000_000,
        shift_freq=12_500,
        lp_freq=50_000,
        decimate=32,
        taps=400,
        fft_width=64,
        fmt=FileFormat.COMPLEX_FLOAT32,
    )
    model = PipelineModel(cfg)
    spec = _spec(cfg)
    n_out = 2048
    n_in = n_out * cfg.decimate + cfg.taps
    global_off = 777_777  # arbitrary absolute start
    raw = model.synth_raw(n_in, seed=9)

    from quadrs_tpu.ops.fir import fir_decimate
    from util import from_device_complex

    def ref(r, t):
        xx = model._mix_stream(model._decode(r), t)
        return fir_decimate(xx[None], model.taps, cfg.decimate, n_out)[0]

    want = from_device_complex(
        jax.jit(ref)(raw, model.theta0(np.array([global_off]))[0])
    )

    shifted = raw[:, cfg.taps // 2 :]
    theta = tile_bases(spec, global_off + cfg.taps // 2, 1)
    got = np.asarray(
        jax.jit(lambda p, t: fused_frontend(p, t, spec, n_out, interpret=INTERPRET))(
            shifted, theta
        )
    )
    got_c = got[0] + 1j * got[1]
    scale = np.abs(want).max()
    np.testing.assert_allclose(got_c, want, atol=5e-5 * max(scale, 1e-3))


def test_supported_decimations():
    assert supported(32) and supported(8) and supported(64)
    # v1 (banded): 128 exceeds the VMEM budget; non-divisors rejected
    assert not supported(128) and not supported(24) and not supported(3)
    # v2 (transposed): any decimate to 64 — the polyphase axis is on
    # sublanes, so nothing requires d | 128
    from quadrs_tpu.ops.frontend_pallas import supported_t

    assert supported_t(3) and supported_t(5) and supported_t(12) and supported_t(64)
    assert not supported_t(0) and not supported_t(65)


@pytest.mark.parametrize(
    "fmt,decimate,taps",
    [
        (FileFormat.COMPLEX_INT8, 3, 40),        # non-dividing decimate
        (FileFormat.COMPLEX_UINT8, 5, 77),       # odd taps, odd decimate
        (FileFormat.COMPLEX_INT16, 12, 200),
        (FileFormat.COMPLEX_INT8, 8, 400),       # CLI default -decimate 8, power 200
        (FileFormat.COMPLEX_FLOAT32, 32, 4000),  # power=2000: m_sub=125 multi-group
    ],
)
@pytest.mark.slow
def test_widened_envelope_matches_stream(fmt, decimate, taps):
    """Round-3 envelope: non-dividing decimates and long filters (up to
    128 subfilters, group-accumulated) through the transposed kernel
    must equal the XLA step_stream, including a masked ragged tail."""
    cfg = PipelineConfig(
        sample_rate=1_000_000,
        shift_freq=12_500,
        lp_freq=50_000,
        decimate=decimate,
        taps=taps,
        fft_width=64,
        fmt=fmt,
    )
    model = PipelineModel(cfg)
    assert model.pallas_supported()
    n = decimate * 64 * 5 + taps + 29
    raw = model.synth_raw(n, seed=17)
    theta0 = model.theta0(np.asarray([0]))[0]
    want = np.asarray(
        model.jit_step_stream(jnp.asarray(raw), jnp.float32(theta0), np.int32(n))
    )
    got = np.asarray(
        model.jit_step_stream_pallas(
            jnp.asarray(raw), jnp.asarray(model.stream_bases(0, n))
        )
    )
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, atol=5e-5 * scale)
    # ragged tail: pad raw with zero bytes, mask in the decoded domain
    pad = np.pad(raw, ((0, 0), (0, 3 * decimate * 64)))
    want2 = np.asarray(
        model.jit_step_stream(jnp.asarray(pad), jnp.float32(theta0), np.int32(n))
    )
    got2 = np.asarray(
        model.jit_step_stream_pallas(
            jnp.asarray(pad),
            jnp.asarray(model.stream_bases(0, pad.shape[1])),
            n_valid=n,
        )
    )
    np.testing.assert_allclose(got2, want2, atol=5e-5 * scale)


@pytest.mark.parametrize(
    "fmt", [FileFormat.COMPLEX_FLOAT32, FileFormat.COMPLEX_INT8, FileFormat.COMPLEX_INT16]
)
def test_fused_frontend_t_matches_v1(fmt):
    from quadrs_tpu.ops.frontend_pallas import fused_frontend_t, tile_bases_t

    cfg = PipelineConfig(
        sample_rate=1_000_000,
        shift_freq=12_500,
        lp_freq=50_000,
        decimate=32,
        taps=400,
        fft_width=64,
        fmt=fmt,
    )
    model = PipelineModel(cfg)
    spec = _spec(cfg)
    n_out = 3000
    n_in = n_out * cfg.decimate + cfg.taps
    raw = model.synth_raw(n_in, seed=13)
    shifted = raw[:, cfg.taps // 2 :]
    theta = tile_bases(spec, cfg.taps // 2, -(-n_out // 2048))
    theta_t = tile_bases_t(spec, cfg.taps // 2, n_out)

    a = np.asarray(
        jax.jit(lambda p, t: fused_frontend(p, t, spec, n_out, interpret=INTERPRET))(
            shifted, theta
        )
    )
    b = np.asarray(
        jax.jit(lambda p, t: fused_frontend_t(p, t, spec, n_out, interpret=INTERPRET))(
            shifted, theta_t
        )
    )
    scale = max(np.abs(a).max(), 1e-3)
    np.testing.assert_allclose(b, a, atol=2e-5 * scale)


@pytest.mark.parametrize(
    "fmt,width,decimate,taps",
    [
        (FileFormat.COMPLEX_INT8, 64, 32, 400),   # the headline chain
        (FileFormat.COMPLEX_UINT8, 128, 16, 100),
        (FileFormat.COMPLEX_FLOAT32, 32, 8, 64),
        (FileFormat.COMPLEX_INT16, 8, 12, 60),    # non-dividing decimate
    ],
)
def test_in_kernel_stft_epilogue(fmt, width, decimate, taps):
    """step_stream_pallas with the STFT folded into the kernel (the
    decimated stream never reaches HBM) equals the unfused path and the
    XLA chain — fftshift included — and handles masked tails."""
    from quadrs_tpu.ops.frontend_pallas import stft_fusable

    assert stft_fusable(width)
    assert not stft_fusable(48) and not stft_fusable(256)
    cfg = PipelineConfig(
        sample_rate=1_000_000,
        shift_freq=12_345,
        lp_freq=50_000,
        decimate=decimate,
        taps=taps,
        fft_width=width,
        fmt=fmt,
    )
    model = PipelineModel(cfg)
    n = decimate * width * 9 + taps + 13
    raw = model.synth_raw(n, seed=3)
    bases = model.stream_bases(0, n)
    plain = np.asarray(model.jit_step_stream_pallas(raw, bases, fuse_stft=False))
    fused = np.asarray(model.jit_step_stream_pallas(raw, bases, fuse_stft=True))
    scale = max(plain.max(), 1e-6)
    np.testing.assert_allclose(fused, plain, atol=3e-6 * scale)
    xla = np.asarray(
        model.jit_step_stream(raw, model.theta0(np.asarray([0]))[0], np.int32(n))
    )
    np.testing.assert_allclose(fused, xla, atol=2e-5 * scale)
    # masked tail (zero-padded raw bytes past n_valid)
    nv = n - 777
    a = np.asarray(model.jit_step_stream_pallas(raw, bases, n_valid=nv, fuse_stft=True))
    b = np.asarray(model.jit_step_stream_pallas(raw, bases, n_valid=nv, fuse_stft=False))
    np.testing.assert_allclose(a, b, atol=3e-6 * scale)
