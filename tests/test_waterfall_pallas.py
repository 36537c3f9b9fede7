"""Fused waterfall kernel (decode -> window -> four-step DFT -> norms)
vs the XLA chain.  Runs interpreted on the CPU rig; `QUADRS_TEST_TPU=1`
compiles it through Mosaic on the attached chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel
from quadrs_tpu.ops.waterfall_pallas import WaterfallSpec, fused_waterfall, supported


@pytest.mark.parametrize(
    "width,fmt,windowing",
    [
        (1024, FileFormat.COMPLEX_INT8, "rectangular"),
        (1024, FileFormat.COMPLEX_INT8, "blackman-harris"),
        (256, FileFormat.COMPLEX_UINT8, "rectangular"),
        (512, FileFormat.COMPLEX_INT16, "blackman-harris"),
        (2048, FileFormat.COMPLEX_FLOAT32, "rectangular"),
        # b=32 routes the tiled case through the strided machinery (the
        # tiled kernel OOMs scoped VMEM at b=32, see _tiled_via_strided)
        (4096, FileFormat.COMPLEX_INT8, "blackman-harris"),
        # b=64: the widest supported width, same routing
        (8192, FileFormat.COMPLEX_INT8, "rectangular"),
    ],
)
@pytest.mark.slow
def test_fused_waterfall_matches_xla(width, fmt, windowing):
    cfg = WaterfallConfig(
        n_streams=3 if width < 4096 else 2, fft_width=width, stride=width, fmt=fmt,
        windowing=windowing, frontend="xla",
    )
    model = WaterfallModel(cfg)
    nw = 5 if width < 4096 else 3
    raw = model.synth_raw(nw * width + 17, seed=2)  # partial tail dropped
    want = np.asarray(model.jit_step()(jnp.asarray(raw)))

    spec = WaterfallSpec(fmt=fmt, width=width, windowing=windowing)
    got = np.asarray(
        jax.jit(
            lambda p: fused_waterfall(
                p, spec, nw, interpret=jax.default_backend() != "tpu"
            )
        )(jnp.asarray(raw))
    )
    assert got.shape == want.shape == (cfg.n_streams, nw, width)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5 * want.max())


def test_fused_waterfall_window_tile_padding():
    """Window counts that don't fill a 128-window tile (and ones that
    span several tiles) both drop the padding exactly."""
    cfg = WaterfallConfig(n_streams=2, fft_width=256, stride=256, frontend="xla")
    model = WaterfallModel(cfg)
    for nw in (1, 127, 128, 200):
        raw = model.synth_raw(nw * 256, seed=3)
        want = np.asarray(model.jit_step()(jnp.asarray(raw)))
        spec = WaterfallSpec(fmt=cfg.fmt, width=256)
        got = np.asarray(
            jax.jit(
                lambda p, nw=nw: fused_waterfall(
                    p, spec, nw, interpret=jax.default_backend() != "tpu"
                )
            )(jnp.asarray(raw))
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5 * want.max())


def test_model_frontend_selection():
    assert WaterfallModel(WaterfallConfig()).pallas_supported()
    assert WaterfallModel(WaterfallConfig(stride=512)).pallas_supported()
    # widths that aren't 128*b stay on the XLA path
    assert not WaterfallModel(WaterfallConfig(fft_width=96, stride=96)).pallas_supported()
    assert supported(8192) and not supported(128 * 65)
    with pytest.raises(ValueError):
        fused_waterfall(
            jnp.zeros((1, 2, 96), jnp.int8),
            WaterfallSpec(fmt=FileFormat.COMPLEX_INT8, width=96),
            1,
        )


@pytest.mark.parametrize("stride", [128, 256, 769, 1024, 1536])
def test_fused_waterfall_strided(stride):
    """Overlapped (stride < width) and skipping (stride > width)
    spectrograms through the kernel match the XLA chain.  Overlapped
    128-multiple strides take the in-kernel class-row assembly (each
    sample read once); 769 and the skipping strides exercise the XLA
    pre-arranged path."""
    cfg = WaterfallConfig(
        n_streams=2, fft_width=1024, stride=stride, frontend="xla",
        windowing="blackman-harris",
    )
    model = WaterfallModel(cfg)
    n = 6 * 1024 + 11
    nw = (n - 1024) // stride + 1
    raw = model.synth_raw(n, seed=6)
    want = np.asarray(model.jit_step()(jnp.asarray(raw)))
    spec = WaterfallSpec(fmt=cfg.fmt, width=1024, windowing=cfg.windowing)
    got = np.asarray(
        jax.jit(
            lambda p: fused_waterfall(
                p, spec, nw, stride=stride,
                interpret=jax.default_backend() != "tpu",
            )
        )(jnp.asarray(raw))
    )
    assert got.shape == want.shape == (2, nw, 1024)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5 * want.max())


@pytest.mark.parametrize(
    "fmt",
    [FileFormat.COMPLEX_UINT8, FileFormat.COMPLEX_INT16, FileFormat.COMPLEX_FLOAT32],
)
def test_strided_inkernel_formats(fmt):
    """The in-kernel strided assembly decodes every format correctly
    (cu8/cs16 offsets included) and routes only for overlapped
    128-multiple strides — skipping strides stay pre-arranged, where
    reading only the windows beats staging whole stride cells."""
    from quadrs_tpu.ops.waterfall_pallas import _strided_supported

    assert _strided_supported(512, 128) and _strided_supported(512, 384)
    assert not _strided_supported(512, 769)
    assert not _strided_supported(512, 1152)  # skipping: pre-arranged
    assert not _strided_supported(512, 512)  # handled by the free reshape
    cfg = WaterfallConfig(
        n_streams=2, fft_width=512, stride=128, fmt=fmt, frontend="xla"
    )
    model = WaterfallModel(cfg)
    n = 4 * 512 + 99
    nw = (n - 512) // 128 + 1
    raw = model.synth_raw(n, seed=13)
    want = np.asarray(model.jit_step()(jnp.asarray(raw)))
    spec = WaterfallSpec(fmt=fmt, width=512, windowing="rectangular")
    got = np.asarray(
        jax.jit(
            lambda p: fused_waterfall(
                p, spec, nw, stride=128, interpret=jax.default_backend() != "tpu"
            )
        )(jnp.asarray(raw))
    )
    assert got.shape == want.shape == (2, nw, 512)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5 * want.max())


def test_model_step_pallas_equals_xla():
    """The model's frontend='pallas' (interpreted off-TPU) equals its
    XLA step, peak search included."""
    xla = WaterfallModel(WaterfallConfig(n_streams=2, frontend="xla"))
    pal = WaterfallModel(WaterfallConfig(n_streams=2, frontend="pallas"))
    raw = xla.synth_raw(3 * 1024, seed=4)
    a = np.asarray(xla.jit_step()(jnp.asarray(raw)))
    b = np.asarray(pal.jit_step()(jnp.asarray(raw)))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5 * a.max())
    ia, ma = xla.search(jnp.asarray(raw))
    ib, mb = pal.search(jnp.asarray(raw))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), rtol=2e-5)


@pytest.mark.parametrize("frontend", ["xla", "pallas"])
def test_sharded_waterfall_matches_single_device(frontend):
    """(stream, time)-sharded bank equals the single-device step — no
    halo: windows tile shard boundaries exactly."""
    from quadrs_tpu.parallel.sharding import make_mesh, make_sharded_waterfall_step, shard_chunk

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(n_time=4, n_stream=2)
    cfg = WaterfallConfig(n_streams=2, fft_width=256, stride=256, frontend=frontend)
    model = WaterfallModel(cfg)
    n_local = 3 * 256
    raw = model.synth_raw(4 * n_local, seed=5)  # (2, 2, 4*n_local)
    want = np.asarray(model.jit_step()(jnp.asarray(raw)))

    step = make_sharded_waterfall_step(model, mesh)
    out = np.asarray(step(shard_chunk(raw, mesh)))
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5 * want.max())


@pytest.mark.parametrize(
    "stride,frontend", [(128, "xla"), (128, "pallas"), (384, "xla"), (384, "pallas")]
)
def test_sharded_waterfall_strided(stride, frontend):
    """Overlapped strides shard with an ICI halo of width-stride samples
    (true continuation fed to the last shard); skipping strides shard
    zero-halo.  Both must equal the single-device step over the same
    span."""
    from quadrs_tpu.parallel.sharding import (
        make_mesh,
        make_sharded_waterfall_step,
        replicate_tail,
        shard_chunk,
        waterfall_halo,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(n_time=4, n_stream=2)
    cfg = WaterfallConfig(n_streams=2, fft_width=256, stride=stride, frontend=frontend)
    model = WaterfallModel(cfg)
    halo = waterfall_halo(cfg)
    n_local = 3 * stride
    n = 4 * n_local
    full = model.synth_raw(n + halo, seed=15)  # (2, 2, n + halo)
    raw, tail = full[:, :, :n], full[:, :, n:]

    # single-device reference over the same extended span, then keep
    # the n // stride windows the sharded step emits
    want = np.asarray(model.jit_step()(jnp.asarray(full)))[:, : n // stride]

    step = make_sharded_waterfall_step(model, mesh)
    if halo:
        out = np.asarray(step(shard_chunk(raw, mesh), replicate_tail(tail, mesh)))
    else:
        out = np.asarray(step(shard_chunk(raw, mesh)))
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5 * want.max())


def test_sharded_waterfall_rejects_ragged_shards():
    from quadrs_tpu.parallel.sharding import make_mesh, make_sharded_waterfall_step, shard_chunk

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    model = WaterfallModel(WaterfallConfig(n_streams=2, fft_width=1024, stride=1024))
    step = make_sharded_waterfall_step(model, make_mesh(n_time=4, n_stream=2))
    bad = model.synth_raw(4 * (1024 + 512), seed=3)  # shards not whole strides
    with pytest.raises(ValueError, match="stride"):
        step(shard_chunk(bad, make_mesh(n_time=4, n_stream=2)))


@pytest.mark.parametrize(
    "width,stride,fmt",
    [
        (1024, 1024, FileFormat.COMPLEX_INT8),
        (256, 128, FileFormat.COMPLEX_INT16),
        (512, 512, FileFormat.COMPLEX_FLOAT32),
        (1024, 256, FileFormat.COMPLEX_INT8),  # strided in-kernel search
        (256, 384, FileFormat.COMPLEX_UINT8),  # skipping stride: pre-arranged
        (512, 257, FileFormat.COMPLEX_INT8),  # non-128-multiple: pre-arranged
    ],
)
def test_fused_waterfall_search(width, stride, fmt):
    """In-kernel peak search equals argmax/max over the shifted norms,
    tie-break included."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_search

    cfg = WaterfallConfig(
        n_streams=3, fft_width=width, stride=stride, fmt=fmt, frontend="xla"
    )
    xm = WaterfallModel(cfg)
    n = 5 * width + 13
    raw = xm.synth_raw(n, seed=11)
    nw = (n - width) // stride + 1
    norms = np.asarray(xm.jit_step()(jnp.asarray(raw)))
    spec = WaterfallSpec(fmt=fmt, width=width)
    gi, gm = jax.jit(
        lambda p: fused_waterfall_search(
            p, spec, nw, stride=stride, interpret=jax.default_backend() != "tpu"
        )
    )(jnp.asarray(raw))
    # the kernel and the XLA chain are different DFT factorizations, so
    # near-tied bins may legitimately pick different peaks: accept an
    # index mismatch only where the two bins' magnitudes agree to f32
    # rounding
    gi, gm = np.asarray(gi), np.asarray(gm)
    want_i = np.argmax(norms, axis=-1)
    picked = np.take_along_axis(norms, gi[..., None], axis=-1)[..., 0]
    top = np.max(norms, axis=-1)
    same = gi == want_i
    near_tie = np.abs(picked - top) <= 2e-5 * np.maximum(top, 1e-9)
    assert np.all(same | near_tie)
    np.testing.assert_allclose(gm, top, rtol=2e-5)


def test_fused_waterfall_search_ties():
    """All-zero windows: every bin ties at 0 and argmax must be bin 0,
    like jnp.argmax."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_search

    raw = np.zeros((1, 2, 512), np.int8)
    spec = WaterfallSpec(fmt=FileFormat.COMPLEX_INT8, width=256)
    gi, gm = jax.jit(
        lambda p: fused_waterfall_search(
            p, spec, 2, interpret=jax.default_backend() != "tpu"
        )
    )(jnp.asarray(raw))
    assert np.all(np.asarray(gi) == 0) and np.all(np.asarray(gm) == 0)


@pytest.mark.slow
def test_fused_waterfall_fuzz():
    """Random (width, stride, format, windowing, stream count) configs:
    kernel vs XLA chain."""
    rng = np.random.default_rng(31)
    for case in range(6):
        b = int(rng.choice([2, 3, 4, 8, 16]))
        width = 128 * b
        stride = int(rng.choice([width, width // 2, width + 64, 3 * width // 4]))
        fmt = rng.choice(list(FileFormat))
        windowing = str(rng.choice(["rectangular", "blackman-harris"]))
        n_streams = int(rng.integers(1, 5))
        cfg = WaterfallConfig(
            n_streams=n_streams, fft_width=width, stride=stride,
            fmt=fmt, windowing=windowing, frontend="xla",
        )
        model = WaterfallModel(cfg)
        n = int(rng.integers(width, 4 * width + 200))
        nw = (n - width) // stride + 1
        raw = model.synth_raw(n, seed=40 + case)
        want = np.asarray(model.jit_step()(jnp.asarray(raw)))
        spec = WaterfallSpec(fmt=fmt, width=width, windowing=windowing)
        got = np.asarray(
            jax.jit(
                lambda p, spec=spec, nw=nw, stride=stride: fused_waterfall(
                    p, spec, nw, stride=stride,
                    interpret=jax.default_backend() != "tpu",
                )
            )(jnp.asarray(raw))
        )
        np.testing.assert_allclose(
            got, want, rtol=3e-5, atol=3e-5 * max(want.max(), 1e-6),
            err_msg=f"case {case}: w={width} s={stride} fmt={fmt} win={windowing}",
        )


@pytest.mark.slow
def test_wide_width_fuzz():
    """Randomized sweep of WIDE widths (b > 16, where every stride class
    reroutes through the strided machinery because the classic kernel's
    resident tables exceed scoped VMEM): tiled, overlapped-aligned,
    non-aligned and skipping strides, small window counts (adaptive
    window tiles), norms + search vs the XLA chain."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_search

    rng = np.random.default_rng(0x51DE)
    for case in range(3):
        b = int(rng.choice([18, 24, 32, 48, 64]))
        width = 128 * b
        stride = int(
            rng.choice([width, width // 2, 3 * width // 4, width // 4 + 1, width + 300])
        )
        fmt = FileFormat(rng.choice([f.value for f in FileFormat]))
        cfg = WaterfallConfig(
            n_streams=2, fft_width=width, stride=stride, fmt=fmt, frontend="xla"
        )
        model = WaterfallModel(cfg)
        n = width + int(rng.integers(0, 3)) * stride + int(rng.integers(0, 99))
        nw = (n - width) // stride + 1
        label = f"case {case}: w={width} s={stride} fmt={fmt} nw={nw}"
        raw = model.synth_raw(n, seed=70 + case)
        want = np.asarray(model.jit_step()(jnp.asarray(raw)))
        spec = WaterfallSpec(fmt=fmt, width=width)
        interp = jax.default_backend() != "tpu"
        got = np.asarray(
            jax.jit(
                lambda p, nw=nw, stride=stride, spec=spec: fused_waterfall(
                    p, spec, nw, stride=stride, interpret=interp
                )
            )(jnp.asarray(raw))
        )
        np.testing.assert_allclose(
            got, want, rtol=3e-5, atol=3e-5 * max(want.max(), 1e-6), err_msg=label
        )
        gi, gv = (
            np.asarray(a)
            for a in jax.jit(
                lambda p, nw=nw, stride=stride, spec=spec: fused_waterfall_search(
                    p, spec, nw, stride=stride, interpret=interp
                )
            )(jnp.asarray(raw))
        )
        top = np.max(want, axis=-1)
        picked = np.take_along_axis(want, gi[..., None], axis=-1)[..., 0]
        ok = (gi == np.argmax(want, axis=-1)) | (
            np.abs(picked - top) <= 3e-5 * np.maximum(top, 1e-9)
        )
        assert np.all(ok), label
        np.testing.assert_allclose(gv, top, rtol=3e-5, err_msg=label)


@pytest.mark.slow
def test_strided_inkernel_fuzz():
    """Randomized sweep of the in-kernel strided path (norms + search)
    across width/stride/format/length draws, vs the XLA chain."""
    rng = np.random.default_rng(0xA11A)
    for _ in range(6):
        width = int(rng.choice([256, 512, 1024]))
        s_r = int(rng.integers(1, width // 128))  # overlapped: in-kernel route
        stride = 128 * s_r
        fmt = FileFormat(rng.choice([f.value for f in FileFormat]))
        n = width + int(rng.integers(0, 5)) * stride + int(rng.integers(0, 200))
        nw = (n - width) // stride + 1
        label = f"w={width} s={stride} fmt={fmt} n={n} nw={nw}"
        cfg = WaterfallConfig(
            n_streams=2, fft_width=width, stride=stride, fmt=fmt, frontend="xla"
        )
        model = WaterfallModel(cfg)
        raw = model.synth_raw(n, seed=int(rng.integers(1 << 30)))
        want = np.asarray(model.jit_step()(jnp.asarray(raw)))
        spec = WaterfallSpec(fmt=fmt, width=width, windowing="rectangular")
        interp = jax.default_backend() != "tpu"
        got = np.asarray(
            jax.jit(
                lambda p: fused_waterfall(p, spec, nw, stride=stride, interpret=interp)
            )(jnp.asarray(raw))
        )
        np.testing.assert_allclose(
            got, want, rtol=2e-5, atol=2e-5 * want.max(), err_msg=label
        )
        from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_search

        gi, gv = (
            np.asarray(a)
            for a in jax.jit(
                lambda p: fused_waterfall_search(
                    p, spec, nw, stride=stride, interpret=interp
                )
            )(jnp.asarray(raw))
        )
        wi = np.argmax(want, axis=-1)
        picked = np.take_along_axis(want, gi[..., None], axis=-1)[..., 0]
        top = np.max(want, axis=-1)
        ok = (gi == wi) | (np.abs(picked - top) <= 2e-5 * np.maximum(top, 1e-9))
        assert np.all(ok), label
        np.testing.assert_allclose(gv, top, rtol=2e-5, err_msg=label)


def test_unknown_frontend_rejected():
    model = WaterfallModel(WaterfallConfig(frontend="palas"))
    with pytest.raises(ValueError, match="unknown frontend"):
        model.jit_step()(jnp.zeros((1, 2, 1024), jnp.int8))


@pytest.mark.parametrize(
    "width,stride,windowing,fmt",
    [
        (2048, 512, "rectangular", FileFormat.COMPLEX_INT8),
        (4096, 2048, "blackman-harris", FileFormat.COMPLEX_INT16),
    ],
)
@pytest.mark.slow
def test_strided_factorized_stage_a(width, stride, windowing, fmt):
    """Wide widths (b >= 16) run the two-factor stage-A q-DFT (b1*b2
    split, measured 931 -> 1754 Msps at 4096-pt 4x overlap on v5e);
    norms and search must still match the XLA chain."""
    from quadrs_tpu.ops.waterfall_pallas import _factor_b, fused_waterfall_search

    assert _factor_b(width // 128) is not None
    cfg = WaterfallConfig(
        n_streams=2, fft_width=width, stride=stride, fmt=fmt,
        windowing=windowing, frontend="xla",
    )
    model = WaterfallModel(cfg)
    n = 3 * width + 57
    nw = (n - width) // stride + 1
    raw = model.synth_raw(n, seed=7)
    want = np.asarray(model.jit_step()(jnp.asarray(raw)))
    spec = WaterfallSpec(fmt=fmt, width=width, windowing=windowing)
    interp = jax.default_backend() != "tpu"
    got = np.asarray(
        jax.jit(
            lambda p: fused_waterfall(p, spec, nw, stride=stride, interpret=interp)
        )(jnp.asarray(raw))
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5 * want.max())
    gi, gv = (
        np.asarray(a)
        for a in jax.jit(
            lambda p: fused_waterfall_search(p, spec, nw, stride=stride, interpret=interp)
        )(jnp.asarray(raw))
    )
    wi = np.argmax(want, -1)
    top = want.max(-1)
    picked = np.take_along_axis(want, gi[..., None], -1)[..., 0]
    assert np.all((gi == wi) | (np.abs(picked - top) <= 2e-5 * np.maximum(top, 1e-9)))
    np.testing.assert_allclose(gv, top, rtol=2e-5)


@pytest.mark.parametrize(
    "width,stride,fmt",
    [
        (1024, 96, FileFormat.COMPLEX_INT8),     # g=32, P=4
        (512, 64, FileFormat.COMPLEX_INT16),     # g=64, P=2
        (1024, 192, FileFormat.COMPLEX_FLOAT32),  # g=64, P=2, classes strided
        (1024, 48, FileFormat.COMPLEX_INT8),     # g=16, P=8 (deep overlap)
        (1024, 24, FileFormat.COMPLEX_UINT8),    # g=8, P=16
        (1024, 12, FileFormat.COMPLEX_INT16),    # g=4, P=32
    ],
)
@pytest.mark.slow
def test_subaligned_stride_classes(width, stride, fmt):
    """Non-128-multiple strides (any gcd within the overlap band)
    route the SEARCH through the class-interleave wrapper: P
    lane-offset classes, each an exact 128-multiple strided problem
    over byte-plane slices.
    Norms measured slower through it (see _subaligned_supported), so
    only the wrapper itself is checked for norms correctness."""
    from quadrs_tpu.ops.waterfall_pallas import (
        _fused_waterfall_subaligned,
        _subaligned_supported,
        fused_waterfall_search,
    )

    assert _subaligned_supported(width, stride)
    assert _subaligned_supported(1024, 3)  # g=1, P=128: in band, routes
    assert not _subaligned_supported(1024, 288)  # P*stride > width
    assert not _subaligned_supported(1024, 257)  # odd: 2*128*257 > width
    assert not _subaligned_supported(1024, 224)  # 2*P*stride > width
    assert not _subaligned_supported(1024, 56)  # g=8 but 2*16*56 > width
    cfg = WaterfallConfig(
        n_streams=2, fft_width=width, stride=stride, fmt=fmt, frontend="xla"
    )
    model = WaterfallModel(cfg)
    n = 4 * width + 77
    nw = (n - width) // stride + 1
    raw = model.synth_raw(n, seed=9)
    want = np.asarray(model.jit_step()(jnp.asarray(raw)))
    spec = WaterfallSpec(fmt=fmt, width=width, windowing="rectangular")
    interp = jax.default_backend() != "tpu"
    got = np.asarray(
        jax.jit(
            lambda p: _fused_waterfall_subaligned(p, spec, nw, stride, interp)
        )(jnp.asarray(raw))
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5 * want.max())
    gi, gv = (
        np.asarray(a)
        for a in jax.jit(
            lambda p: fused_waterfall_search(p, spec, nw, stride=stride, interpret=interp)
        )(jnp.asarray(raw))
    )
    wi = np.argmax(want, -1)
    top = want.max(-1)
    picked = np.take_along_axis(want, gi[..., None], -1)[..., 0]
    assert np.all((gi == wi) | (np.abs(picked - top) <= 2e-5 * np.maximum(top, 1e-9)))
    np.testing.assert_allclose(gv, top, rtol=2e-5)


@pytest.mark.slow
def test_subaligned_fewer_windows_than_classes():
    """Regression: n_windows < P left some classes empty (nw_c = 0),
    which crashed the subaligned route with a ZeroDivisionError while
    picking a window tile for a zero-window kernel.  Empty classes now
    emit zeros (their interleave slots are dropped) and the results
    still match the XLA chain."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_search

    width, stride = 1024, 96  # P = 4
    for nw in (1, 2, 3):
        cfg = WaterfallConfig(
            n_streams=2, fft_width=width, stride=stride,
            fmt=FileFormat.COMPLEX_INT8, frontend="xla",
        )
        model = WaterfallModel(cfg)
        n = width + (nw - 1) * stride
        raw = model.synth_raw(n, seed=60 + nw)
        want = np.asarray(model.jit_step()(jnp.asarray(raw)))
        spec = WaterfallSpec(fmt=cfg.fmt, width=width, windowing="rectangular")
        interp = jax.default_backend() != "tpu"
        gi, gv = (
            np.asarray(a)
            for a in jax.jit(
                lambda p, nw=nw: fused_waterfall_search(
                    p, spec, nw, stride=stride, interpret=interp
                )
            )(jnp.asarray(raw))
        )
        assert gi.shape == gv.shape == (2, nw), nw
        wi = np.argmax(want, -1)
        top = want.max(-1)
        picked = np.take_along_axis(want, gi[..., None], -1)[..., 0]
        ok = (gi == wi) | (np.abs(picked - top) <= 2e-5 * np.maximum(top, 1e-9))
        assert np.all(ok), nw
        np.testing.assert_allclose(gv, top, rtol=2e-5, err_msg=f"nw={nw}")


@pytest.mark.slow
def test_sharded_waterfall_wide_factorized():
    """The (stream, time)-sharded bank composed with the factorized
    wide-width kernel (b=16, overlapped stride -> ICI window halo with
    true-tail feed) equals the single-device step."""
    from quadrs_tpu.parallel.sharding import (
        make_mesh,
        make_sharded_waterfall_step,
        replicate_tail,
        shard_chunk,
        waterfall_halo,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(n_time=4, n_stream=1)
    cfg = WaterfallConfig(
        n_streams=1, fft_width=2048, stride=1024, frontend="pallas",
        windowing="blackman-harris",
    )
    model = WaterfallModel(cfg)
    halo = waterfall_halo(cfg)
    n = 4 * 2 * 1024  # two stride cells per shard
    full = model.synth_raw(n + halo, seed=21)
    raw, tail = full[:, :, :n], full[:, :, n:]
    want = np.asarray(model.jit_step()(jnp.asarray(full)))[:, : n // cfg.stride]
    step = make_sharded_waterfall_step(model, mesh)
    out = np.asarray(step(shard_chunk(raw, mesh), replicate_tail(tail, mesh)))
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, rtol=3e-5, atol=3e-5 * want.max())


@pytest.mark.slow
def test_wide_width_nontiled_strides_route_correctly():
    """Regression: a wide width (b > 16, where the TILED case routes via
    the strided machinery) with a NON-tiled stride must not be mistaken
    for the tiled case — skipping and non-aligned strides still produce
    stride-faithful windows."""
    width = 4096
    for stride in (5000, 1000):  # skipping; non-128-multiple overlap
        cfg = WaterfallConfig(
            n_streams=1, fft_width=width, stride=stride,
            fmt=FileFormat.COMPLEX_INT8, frontend="xla",
        )
        model = WaterfallModel(cfg)
        n = 2 * width + stride + 3
        nw = (n - width) // stride + 1
        raw = model.synth_raw(n, seed=33)
        want = np.asarray(model.jit_step()(jnp.asarray(raw)))
        spec = WaterfallSpec(fmt=cfg.fmt, width=width)
        got = np.asarray(
            jax.jit(
                lambda p, nw=nw, stride=stride: fused_waterfall(
                    p, spec, nw, stride=stride,
                    interpret=jax.default_backend() != "tpu",
                )
            )(jnp.asarray(raw))
        )
        assert got.shape == want.shape == (1, nw, width)
        np.testing.assert_allclose(
            got, want, rtol=2e-5, atol=2e-5 * want.max(), err_msg=f"stride={stride}"
        )
        # the search routing has the same wide-width constraint (the
        # tiled kernel cannot compile at b=32): peak indices/magnitudes
        # must match the XLA argmax through the rerouted path too
        from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_search

        gi, gm = jax.jit(
            lambda p, nw=nw, stride=stride: fused_waterfall_search(
                p, spec, nw, stride=stride,
                interpret=jax.default_backend() != "tpu",
            )
        )(jnp.asarray(raw))
        gi, gm = np.asarray(gi), np.asarray(gm)
        top = np.max(want, axis=-1)
        picked = np.take_along_axis(want, gi[..., None], axis=-1)[..., 0]
        same = gi == np.argmax(want, axis=-1)
        near_tie = np.abs(picked - top) <= 2e-5 * np.maximum(top, 1e-9)
        assert np.all(same | near_tie), stride
        np.testing.assert_allclose(gm, top, rtol=2e-5, err_msg=f"stride={stride}")


@pytest.mark.parametrize(
    "width,stride,nws",
    [
        # deep overlap, s_r=1 (halo reaches q//s_r = b-1 = 7 rows)
        (1024, 128, (3, 33, 64, 130)),
        # tiled-via-strided wide width, s_r=b=32, no halo
        (4096, 4096, (5, 32)),
    ],
)
@pytest.mark.slow
def test_strided_small_window_tiles(width, stride, nws):
    """Adaptive window tiles (_pick_win_tile): chunks with fewer than
    128 windows/stream shrink the tile to a 32-multiple instead of
    padding to 128 — norms and search both stay exact across the tile
    sizes (32/64/128 and the multi-tile case)."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_search

    cfg = WaterfallConfig(
        n_streams=2, fft_width=width, stride=stride, frontend="xla",
        windowing="blackman-harris",
    )
    model = WaterfallModel(cfg)
    spec = WaterfallSpec(fmt=cfg.fmt, width=width, windowing=cfg.windowing)
    interp = jax.default_backend() != "tpu"
    for nw in nws:
        n = width + (nw - 1) * stride + 7
        raw = model.synth_raw(n, seed=40 + nw)
        want = np.asarray(model.jit_step()(jnp.asarray(raw)))
        got = np.asarray(
            jax.jit(
                lambda p, nw=nw: fused_waterfall(
                    p, spec, nw, stride=stride, interpret=interp
                )
            )(jnp.asarray(raw))
        )
        assert got.shape == want.shape == (2, nw, width), nw
        np.testing.assert_allclose(
            got, want, rtol=3e-5, atol=3e-5 * want.max(), err_msg=f"nw={nw}"
        )
        gi, gm = jax.jit(
            lambda p, nw=nw: fused_waterfall_search(
                p, spec, nw, stride=stride, interpret=interp
            )
        )(jnp.asarray(raw))
        gi, gm = np.asarray(gi), np.asarray(gm)
        top = np.max(want, axis=-1)
        picked = np.take_along_axis(want, gi[..., None], axis=-1)[..., 0]
        same = gi == np.argmax(want, axis=-1)
        near_tie = np.abs(picked - top) <= 3e-5 * np.maximum(top, 1e-9)
        assert np.all(same | near_tie), nw
        np.testing.assert_allclose(gm, top, rtol=3e-5, err_msg=f"nw={nw}")


# ---------------------------------------------------------------------------
# In-kernel band survey (fused_waterfall_scan)


@pytest.mark.parametrize(
    "width,stride,fmt,windowing",
    [
        (256, 256, FileFormat.COMPLEX_INT8, "rectangular"),       # tiled, small b
        (1024, 1024, FileFormat.COMPLEX_INT8, "blackman-harris"), # tiled b=8
        (1024, 256, FileFormat.COMPLEX_UINT8, "rectangular"),     # overlapped in-kernel
        (512, 640, FileFormat.COMPLEX_FLOAT32, "rectangular"),    # skipping: pre-arranged
        (512, 320, FileFormat.COMPLEX_INT16, "rectangular"),      # non-128 overlap: pre-arranged
        (1024, 96, FileFormat.COMPLEX_INT8, "rectangular"),       # subaligned: class-split scan
        (1024, 48, FileFormat.COMPLEX_UINT8, "blackman-harris"),  # subaligned P=8
        (4096, 1024, FileFormat.COMPLEX_INT8, "rectangular"),     # wide b=32, 4x overlap
    ],
)
@pytest.mark.slow
def test_fused_waterfall_scan_matches_xla(width, stride, fmt, windowing):
    """(sum, max, above) per bin from the in-kernel survey == the XLA
    norms reduced in numpy; threshold chosen mid-gap so the f32 count
    cannot straddle a boundary between the two paths."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_scan

    cfg = WaterfallConfig(
        n_streams=2, fft_width=width, stride=stride, fmt=fmt,
        windowing=windowing, frontend="xla",
    )
    model = WaterfallModel(cfg)
    nw = 7 if width < 4096 else 3
    n = (nw - 1) * stride + width + 13
    raw = model.synth_raw(n, seed=4)
    norms = np.asarray(model.jit_step()(jnp.asarray(raw)))  # (S, nw, width)
    assert norms.shape[1] == nw
    # mid-gap threshold near the median: immune to cross-path f32 noise
    flat = np.unique(np.sort(norms.ravel()))
    k = len(flat) // 2
    gaps = np.diff(flat[max(0, k - 200) : k + 200])
    j = int(np.argmax(gaps)) + max(0, k - 200)
    thr = float((flat[j] + flat[j + 1]) / 2)

    spec = WaterfallSpec(fmt=fmt, width=width, windowing=windowing)
    ssum, smax, sabove = jax.jit(
        lambda p, t: fused_waterfall_scan(
            p, spec, nw, t, stride=stride, interpret=jax.default_backend() != "tpu"
        )
    )(jnp.asarray(raw), jnp.float32(thr))
    want_sum = norms.astype(np.float64).sum(axis=1)
    # per-value kernel-vs-XLA f32 noise (the norms tests' 2e-5 * max)
    # accumulates across the nw summed windows
    np.testing.assert_allclose(
        np.asarray(ssum), want_sum, rtol=3e-5, atol=nw * 2e-5 * norms.max()
    )
    np.testing.assert_allclose(
        np.asarray(smax), norms.max(axis=1), rtol=2e-5, atol=2e-5 * norms.max()
    )
    # counts: exact except where a norm sits within cross-path f32 noise
    # of the threshold — bound with the noise band instead
    noise = 2e-5 * norms.max()
    lo = (norms > thr + noise).sum(axis=1)
    hi = (norms > thr - noise).sum(axis=1)
    got_above = np.asarray(sabove).astype(np.int64)
    assert np.all(got_above >= lo) and np.all(got_above <= hi)


@pytest.mark.slow
def test_fused_waterfall_scan_tile_boundaries():
    """Window counts around the 128-window tile boundary mask the
    padding correctly (sum/max/above see only real windows)."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_scan

    cfg = WaterfallConfig(n_streams=1, fft_width=256, stride=256, frontend="xla")
    model = WaterfallModel(cfg)
    spec = WaterfallSpec(fmt=cfg.fmt, width=256)
    for nw in (1, 31, 32, 127, 128, 129, 300):
        raw = model.synth_raw(nw * 256 + 64, seed=nw)
        norms = np.asarray(model.jit_step()(jnp.asarray(raw)))[:, :nw]
        ssum, smax, sabove = jax.jit(
            lambda p, nw=nw: fused_waterfall_scan(
                p, spec, nw, jnp.float32(8.0),
                interpret=jax.default_backend() != "tpu",
            )
        )(jnp.asarray(raw))
        np.testing.assert_allclose(
            np.asarray(ssum), norms.astype(np.float64).sum(axis=1), rtol=3e-5,
            err_msg=f"nw={nw}",
        )
        np.testing.assert_allclose(
            np.asarray(smax), norms.max(axis=1), rtol=2e-5,
            atol=2e-5 * norms.max(), err_msg=f"nw={nw}",
        )
        got_above = np.asarray(sabove).astype(np.int64)
        want_above = (norms > 8.0).sum(axis=1)
        assert np.abs(got_above - want_above).max() <= max(
            1, int(0.002 * nw)
        ), f"nw={nw}"


def test_model_jit_scan_pallas_matches_xla():
    """WaterfallModel(frontend='pallas').jit_scan == the XLA model's,
    for a threshold away from any norm."""
    xla = WaterfallModel(
        WaterfallConfig(n_streams=2, fft_width=512, stride=128, frontend="xla")
    )
    pal = WaterfallModel(
        WaterfallConfig(n_streams=2, fft_width=512, stride=128, frontend="pallas")
    )
    raw = xla.synth_raw(4096, seed=11)
    norms = np.asarray(xla.jit_step()(jnp.asarray(raw)))
    flat = np.unique(np.sort(norms.ravel()))
    k = len(flat) // 2
    thr = float((flat[k] + flat[k + 1]) / 2)
    a = [np.asarray(x) for x in xla.jit_scan()(jnp.asarray(raw), jnp.float32(thr))]
    b = [np.asarray(x) for x in pal.jit_scan()(jnp.asarray(raw), jnp.float32(thr))]
    np.testing.assert_allclose(b[0], a[0], rtol=3e-5)
    np.testing.assert_allclose(b[1], a[1], rtol=2e-5, atol=2e-5 * a[1].max())
    # counts may differ where a norm sits within f32 noise of thr
    assert np.abs(b[2].astype(np.int64) - a[2].astype(np.int64)).max() <= 2


@pytest.mark.slow
def test_fused_waterfall_scan_fuzz():
    """Random (width, stride, format, windowing) configs through the
    in-kernel survey — every routing class (tiled s_r=b, overlapped
    in-kernel, subaligned class-split, pre-arranged) vs the XLA chain
    reduced in f64."""
    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_scan

    rng = np.random.default_rng(0x5CAB)
    for case in range(6):
        b = int(rng.choice([2, 4, 8, 16]))
        width = 128 * b
        stride = int(
            rng.choice(
                [width, width // 2, width + 64, 3 * width // 4, width // 8,
                 max(32, width // 16) + (16 if case % 2 else 0)]
            )
        )
        fmt = rng.choice(list(FileFormat))
        windowing = str(rng.choice(["rectangular", "blackman-harris"]))
        n_streams = int(rng.integers(1, 4))
        cfg = WaterfallConfig(
            n_streams=n_streams, fft_width=width, stride=stride,
            fmt=fmt, windowing=windowing, frontend="xla",
        )
        model = WaterfallModel(cfg)
        n = int(rng.integers(width + stride, 3 * width + 4 * stride))
        nw = (n - width) // stride + 1
        raw = model.synth_raw(n, seed=90 + case)
        norms = np.asarray(model.jit_step()(jnp.asarray(raw)))
        thr = float(np.median(norms))
        ssum, smax, sabove = jax.jit(
            lambda p, spec=WaterfallSpec(fmt=fmt, width=width, windowing=windowing),
            nw=nw, stride=stride: fused_waterfall_scan(
                p, spec, nw, jnp.float32(thr), stride=stride,
                interpret=jax.default_backend() != "tpu",
            )
        )(jnp.asarray(raw))
        tag = f"case {case}: w={width} s={stride} fmt={fmt} win={windowing} nw={nw}"
        np.testing.assert_allclose(
            np.asarray(ssum), norms.astype(np.float64).sum(axis=1),
            rtol=3e-5, atol=nw * 3e-5 * max(norms.max(), 1e-6), err_msg=tag,
        )
        np.testing.assert_allclose(
            np.asarray(smax), norms.max(axis=1),
            rtol=3e-5, atol=3e-5 * max(norms.max(), 1e-6), err_msg=tag,
        )
        noise = 3e-5 * max(norms.max(), 1e-6)
        lo = (norms > thr + noise).sum(axis=1)
        hi = (norms > thr - noise).sum(axis=1)
        got = np.asarray(sabove).astype(np.int64)
        assert np.all(got >= lo) and np.all(got <= hi), tag


def test_scan_kernel_tpu_aot_lowering():
    """The scan kernel AOT-lowers for the TPU platform on the CPU rig
    (jax.export runs the full Mosaic serialization pipeline without
    hardware) — catches structural kernel regressions between on-chip
    runs.  Final XLA/Mosaic compilation still needs the chip."""
    from jax import export

    from quadrs_tpu.ops.waterfall_pallas import fused_waterfall_scan

    for width, stride, fmt in (
        (1024, 1024, FileFormat.COMPLEX_INT8),  # tiled
        (1024, 256, FileFormat.COMPLEX_INT16),  # overlapped in-kernel
    ):
        spec = WaterfallSpec(fmt=fmt, width=width)
        nw = 150
        n = (nw - 1) * stride + width

        def f(p, t, spec=spec, nw=nw, stride=stride):
            return fused_waterfall_scan(
                p, spec, nw, t, stride=stride, interpret=False
            )

        exp = export.export(jax.jit(f), platforms=["tpu"])(
            jax.ShapeDtypeStruct((2, 2, n), np.dtype(fmt.raw_dtype)),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
        assert len(exp.mlir_module()) > 0
