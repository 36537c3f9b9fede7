"""Pallas TPU kernel: fused decode -> NCO mix -> decimating FIR.

The front half of the flagship pipeline in one VMEM round-trip: each
grid step DMAs a tile of raw capture planes (native dtype — int8/int16
transfer 4-8x fewer HBM bytes than f32), decodes, rotates by the exact
NCO phase, and runs the decimating FIR as a banded matmul on the MXU,
writing only the decimated output back to HBM.  The XLA version of the
same chain materializes the decoded+mixed stream (3 HBM round trips);
this kernel does one read of the narrow input and one write of the
~D-times-smaller output.

Angle exactness matches the rest of the framework: the host reduces
``(f * offset) mod sr`` in integer arithmetic per tile (``base``) and
per in-tile index (``delta`` tables), so f32 trig stays accurate at any
absolute stream offset.

Layout notes (v5e):
* planes are processed as (rows, 128) f32 tiles — lane-aligned, no
  stride-2 anywhere;
* the FIR is ``lhs (R_out, span) @ W (span, 128)``: 128 decimated
  outputs per lhs row, where ``W[p, l] = h[p - l*D]``.  ``lhs`` rows
  overlap by ``taps - D`` samples and are assembled in VMEM from row
  slices (SRAM-cheap), so HBM never sees the overlap;
* requires ``decimate`` to divide 128 (<= 64 for VMEM) and at most 32
  polyphase subfilters; other configs fall back to the XLA path.  The
  (d, N) native-dtype blocks are legal at any d because the block's
  sublane dim equals the array dim (hardware-verified compiled for
  cs8/cs16 at d=8, cu8 at d=16, cf32 at d=4, cs8 at d=64).

Status (v5e, 4M-sample chunks, exact to ~1e-6 vs the XLA chain):

* v1 (:func:`fused_frontend`, banded-matmul FIR): ~3.2 ms — the in-VMEM
  lhs assembly (stack + sublane/lane-merging reshape) dominates.
* v2.1 (:func:`fused_frontend_t`, polyphase-transposed layout, 8K-output
  tiles, roll-based diagonal reduction): cs8 full chain 0.2-1.3 ms vs
  the XLA chain's 1.8-2.4 ms (~2x) — the fused kernel reads the narrow
  int8 input once where XLA materializes f32 intermediates.
* v2.2 (format-dependent tile size, :func:`_tout_t`): cf32 goes from
  parity to a clear win — 3276 Msps vs the 2157 Msps XLA chain (1.5x)
  at 4K-output tiles (the f32 input's 4x VMEM footprint is what made
  8K tiles regress; 16K+ tiles exceed VMEM and fail to compile).
  Input streaming is nowhere near the bound — 24 GB/s of HBM read at
  the cf32 rate vs ~819 GB/s available — so the automatic block
  pipelining Mosaic applies to grid inputs (double-buffered HBM->VMEM
  DMA per BlockSpec) already hides transfer entirely; an explicit
  in-kernel DMA pipeline would add nothing (the kernel is VPU/MXU
  bound: trig mix + polyphase matmul + diagonal reduction).
* v2.3 (host-precomputed cos/sin delta tables): the per-element
  cos/sin of the mix dominated the VPU time; rotating resident
  cos/sin(delta) tables by the tile base via the angle-addition
  identity (two *scalar* transcendentals + 4 mul/2 add per element)
  removes it.  Dependency-chained measurement (every step's phase
  input consumes the previous output, so the lazily-materializing
  tunneled runtime can't skip steps): cs8 4021 -> 5576, cf32 2945 ->
  3468, cs16 -> 4776 Msps best-of-3 (v2.2 -> v2.3).  Accuracy is
  unchanged (<=2e-6 vs the XLA chain on hardware) — the tables are
  f64-evaluated on the host, better than device trig per element.

``PipelineModel.step_stream_pallas`` / ``StreamRunner(frontend=...)``
select it; ``auto`` uses it for every supported format on TPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from quadrs_tpu.formats import FileFormat
from quadrs_tpu.ops.nco import ExactNCO

# outputs per grid step: 16 lhs rows x 128 lanes
_ROUT = 16
_TOUT = _ROUT * 128


def _decode_ref(x, fmt: FileFormat):
    # single source of truth for the bit-exact decode formulas
    from quadrs_tpu.formats import decode_plane

    if fmt is FileFormat.COMPLEX_UINT8:
        # Mosaic has no direct uint8 -> f32 cast; widening through int32
        # is exact (values <= 255) so the decode formula is unchanged
        x = x.astype(jnp.int32)
    return decode_plane(x, fmt, xp=jnp)


@dataclass(frozen=True)
class FrontendSpec:
    fmt: FileFormat
    sample_rate: int
    shift_freq: int
    decimate: int
    taps_bytes: bytes  # f32 taps, hashable for caching

    @property
    def taps(self) -> np.ndarray:
        return np.frombuffer(self.taps_bytes, dtype=np.float32)


def supported(decimate: int) -> bool:
    """v1 (banded) kernel support: decimate must divide 128 so lhs rows
    land on row boundaries."""
    return decimate in (1, 2, 4, 8, 16, 32, 64)


def supported_t(decimate: int) -> bool:
    """Transposed (v2) kernel support: the polyphase axis lives on
    sublanes, so ANY decimate works (the (d, N) block's sublane dim
    equals the array dim — hardware-verified compiled at d=3,5,6,12);
    >64 only bounds VMEM at the 8K tile."""
    return 1 <= decimate <= 64


@functools.lru_cache(maxsize=8)
def _plan(spec: FrontendSpec):
    """Static planning: shapes, weight matrix, angle tables."""
    d = spec.decimate
    taps = spec.taps
    size = len(taps)

    l_in = _TOUT * d  # raw samples consumed per tile
    r_in = l_in // 128  # main-block rows
    span = 127 * d + size
    span_p = -(-span // 128) * 128
    # at least 32 rows so every dtype's min-tile constraint is met
    halo_p = -(-max(span_p - 128 * d, 32 * 128) // 128) * 128
    r_halo = halo_p // 128

    from quadrs_tpu.ops.fir import _banded_weights

    w = _banded_weights(spec.taps_bytes, d)
    assert w.shape[0] == span_p

    nco = ExactNCO(spec.shift_freq, spec.sample_rate)
    delta_main = nco.angles(np.arange(l_in, dtype=np.int64)).reshape(r_in, 128)
    delta_halo = nco.angles(l_in + np.arange(halo_p, dtype=np.int64)).reshape(
        r_halo, 128
    )
    return l_in, r_in, span_p, halo_p, r_halo, w, delta_main, delta_halo


def _kernel(spec: FrontendSpec, r_in, r_halo, span_p):
    from jax.experimental import pallas as pl  # noqa: F401

    n_parts = -(-span_p // 128)  # row-slices per lhs row assembly

    def kernel(
        base_ref,
        vmain_ref,
        vhalo_ref,
        re_ref,
        im_ref,
        hre_ref,
        him_ref,
        dmain_ref,
        dhalo_ref,
        w_ref,
        ore_ref,
        oim_ref,
    ):
        t = pl.program_id(0)
        base = base_ref[t]
        theta_m = base + dmain_ref[:]
        theta_h = base + dhalo_ref[:]
        cm, sm = jnp.cos(theta_m), jnp.sin(theta_m)
        ch, sh = jnp.cos(theta_h), jnp.sin(theta_h)

        # zero-padding must happen in the *decoded* domain: for cu8/cs16
        # a zero byte decodes to a large negative value, so raw padding
        # past the valid extent is masked out here.
        def masked_decode(ref, valid, rows):
            lin = (
                jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
            )
            x = _decode_ref(ref[:], spec.fmt)
            return jnp.where(lin < valid, x, jnp.float32(0.0))

        vm = vmain_ref[t]
        vh = vhalo_ref[t]
        re_m = masked_decode(re_ref, vm, r_in)
        im_m = masked_decode(im_ref, vm, r_in)
        re_h = masked_decode(hre_ref, vh, r_halo)
        im_h = masked_decode(him_ref, vh, r_halo)

        xre = jnp.concatenate([re_m * cm - im_m * sm, re_h * ch - im_h * sh], axis=0)
        xim = jnp.concatenate([re_m * sm + im_m * cm, re_h * sh + im_h * ch], axis=0)

        d_rows = spec.decimate  # rows between consecutive lhs rows (128*d/128)
        lhs_re = jnp.stack(
            [xre[ro * d_rows : ro * d_rows + n_parts] for ro in range(_ROUT)]
        ).reshape(_ROUT, n_parts * 128)[:, :span_p]
        lhs_im = jnp.stack(
            [xim[ro * d_rows : ro * d_rows + n_parts] for ro in range(_ROUT)]
        ).reshape(_ROUT, n_parts * 128)[:, :span_p]

        w = w_ref[:]
        p_hi = jax.lax.Precision.HIGHEST
        ore_ref[:] = jnp.dot(lhs_re, w, precision=p_hi, preferred_element_type=jnp.float32)
        oim_ref[:] = jnp.dot(lhs_im, w, precision=p_hi, preferred_element_type=jnp.float32)

    return kernel


def fused_frontend(
    planes: jax.Array,
    start_offset_theta: np.ndarray | jax.Array,
    spec: FrontendSpec,
    n_out: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused frontend over a contiguous chunk.

    ``planes``: (2, n) native-dtype component planes, already advanced
    past the FIR group delay (caller slices ``taps//2``).  ``theta``
    argument: per-tile base angles, shape (tiles,) f32 (host-exact, see
    :func:`tile_bases`).  Returns (2, n_out) f32 decimated planes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = spec.decimate
    if not supported(d):
        raise ValueError(f"pallas frontend requires decimate | 128, got {d}")
    l_in, r_in, span_p, halo_p, r_halo, w, delta_main, delta_halo = _plan(spec)

    tiles = -(-n_out // _TOUT)
    need = tiles * l_in + halo_p
    n_valid = planes.shape[1]
    if planes.shape[1] < need:
        planes = jnp.pad(planes, ((0, 0), (0, need - planes.shape[1])))
    t_idx = np.arange(tiles, dtype=np.int64)
    vmain = np.clip(n_valid - t_idx * l_in, 0, l_in).astype(np.int32)
    vhalo = np.clip(n_valid - (t_idx + 1) * l_in, 0, halo_p).astype(np.int32)

    main = planes[:, : tiles * l_in].reshape(2, tiles * r_in, 128)
    # halo for tile t = the first halo_p samples after its block
    halo = jax.vmap(
        lambda p: _halo_rows(p, tiles, l_in, halo_p)
    )(planes)  # (2, tiles*r_halo, 128)

    base = jnp.asarray(start_offset_theta, dtype=jnp.float32).reshape(tiles)

    kernel = _kernel(spec, r_in, r_halo, span_p)
    out_shape = [
        jax.ShapeDtypeStruct((tiles * _ROUT, 128), jnp.float32),
        jax.ShapeDtypeStruct((tiles * _ROUT, 128), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # base, vmain, vhalo
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((r_in, 128), lambda t, *_: (t, 0)),
            pl.BlockSpec((r_in, 128), lambda t, *_: (t, 0)),
            pl.BlockSpec((r_halo, 128), lambda t, *_: (t, 0)),
            pl.BlockSpec((r_halo, 128), lambda t, *_: (t, 0)),
            pl.BlockSpec((r_in, 128), lambda t, *_: (0, 0)),
            pl.BlockSpec((r_halo, 128), lambda t, *_: (0, 0)),
            pl.BlockSpec((span_p, 128), lambda t, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_ROUT, 128), lambda t, *_: (t, 0)),
            pl.BlockSpec((_ROUT, 128), lambda t, *_: (t, 0)),
        ],
    )
    ore, oim = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        base,
        jnp.asarray(vmain),
        jnp.asarray(vhalo),
        main[0],
        main[1],
        halo[0],
        halo[1],
        jnp.asarray(delta_main),
        jnp.asarray(delta_halo),
        jnp.asarray(w),
    )
    return jnp.stack([ore.reshape(-1)[:n_out], oim.reshape(-1)[:n_out]])


def _halo_rows(p: jnp.ndarray, tiles: int, l_in: int, halo_p: int) -> jnp.ndarray:
    """(n,) -> (tiles*halo_rows, 128): for each tile, the halo_p samples
    following its block, via slice-stack (no gather)."""
    r_halo = halo_p // 128
    k = -(-halo_p // l_in)
    need = (tiles + k) * l_in
    if p.shape[0] < need:
        p = jnp.pad(p, (0, need - p.shape[0]))
    rows = p[: (tiles + k) * l_in].reshape(tiles + k, l_in)
    parts = [rows[1 + i : 1 + i + tiles] for i in range(k)]
    stacked = jnp.concatenate(parts, axis=1)[:, :halo_p]  # (tiles, halo_p)
    return stacked.reshape(tiles * r_halo, 128)


# ---------------------------------------------------------------------------
# v2: polyphase-transposed layout.
#
# The input is pre-transposed (in XLA, ~0.13 ms per 4M int8 samples) to
# (D, T): row d holds x'[t*D + d] across lanes.  Everything then runs in
# its natural layout with NO in-kernel relayouts:
#   * decode+mix: elementwise on (D, T_tile) with a (D, T_tile) angle
#     table (exact, host-built);
#   * FIR: C2 = Hp (M, D) @ X (D, T_tile+128) — one MXU matmul whose
#     contraction is the polyphase axis;
#   * outputs: y[i] = sum_m C2[m, i+m] — static lane slices + adds,
#     assembled directly in the (16, 128) output tile layout.
# The column-aligned halo (next M-1 decimated positions) comes from the
# *same* input array via a second BlockSpec, so nothing is duplicated in
# HBM.
# ---------------------------------------------------------------------------


def _tout_t(spec: FrontendSpec) -> int:
    """Outputs per grid step for the transposed kernel: bigger tiles
    amortize per-tile fixed costs (Mosaic op dispatch, iotas, matmul
    setup), but the f32 input's 4x VMEM footprint favors smaller tiles.
    Measured on v5e (4M-sample chunks, dec 32, 400 taps):
    cf32 2907/3276/3002 Msps at 2K/4K/8K; cs8 4277/4937 at 4K/8K;
    cs16 3787/4953 at 4K/8K; 16K+ tiles fail to compile (VMEM).

    Long filters scale the tile down: the group-accumulated diagonal
    reduction keeps live subfilter products O(32), but each group's
    (32, tout+128) product plus the roll temporaries still grow with
    tout (m_sub=50 at tout 8192 measured 19.4M scoped vs the 16M
    limit)."""
    base = 4096 if spec.fmt is FileFormat.COMPLEX_FLOAT32 else 8192
    m_sub = -(-len(spec.taps) // spec.decimate)
    if m_sub > 64:
        base //= 4
    elif m_sub > 32:
        base //= 2
    return max(1024, base)


@functools.lru_cache(maxsize=8)
def _plan_t(spec: FrontendSpec):
    d = spec.decimate
    taps = spec.taps
    size = len(taps)
    m_sub = -(-size // d)  # polyphase subfilters
    if m_sub > 128:
        raise ValueError("filter too long for the transposed frontend")
    m_pad = max(8, -(-m_sub // 8) * 8)
    hp = np.zeros((m_pad, d), dtype=np.float32)
    flat = np.zeros(m_sub * d, dtype=np.float32)
    flat[:size] = taps
    hp[:m_sub] = flat.reshape(m_sub, d)

    nco = ExactNCO(spec.shift_freq, spec.sample_rate)

    def table(col0: int, cols: int) -> np.ndarray:
        c = col0 + np.arange(cols, dtype=np.int64)[None, :]
        dd = np.arange(d, dtype=np.int64)[:, None]
        return nco.angles(c * d + dd)

    tout = _tout_t(spec)
    # v2.3: ship cos/sin of the delta tables instead of the angles —
    # the kernel rotates them by the per-tile base with the angle
    # addition identity (4 mul + 2 add per element), replacing the two
    # per-element transcendentals that dominated the VPU time.  The
    # tables are f64-evaluated on the host, so per-element accuracy is
    # *better* than device trig.
    def cs(delta: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return (
            np.cos(delta.astype(np.float64)).astype(np.float32),
            np.sin(delta.astype(np.float64)).astype(np.float32),
        )

    cdm, sdm = cs(table(0, tout))
    cdh, sdh = cs(table(tout, 128))
    return m_sub, m_pad, hp, cdm, sdm, cdh, sdh


@functools.lru_cache(maxsize=8)
def _plan_stft(fft_width: int):
    """Resident (128, 128) block-diagonal DFT matrix for the in-kernel
    STFT epilogue: 128/W copies of F_W on the diagonal, with the
    fftshift folded into the column order.  A (R, 128) tile of decimated
    samples holds 128/W windows per row, so the whole STFT-and-shift is
    ONE 128-contraction MXU matmul per plane: Y[r, w*W + k] =
    sum_n y[r, w*W + n] * F[n, (k + W/2) % W]."""
    w = fft_width
    per = 128 // w
    n = np.arange(w)
    f = np.exp(-2j * np.pi * np.outer(n, n) / w)
    f = f[:, (n + w // 2) % w]  # fftshifted bin order
    big = np.zeros((128, 128), dtype=np.complex128)
    for i in range(per):
        big[i * w : (i + 1) * w, i * w : (i + 1) * w] = f
    return big.real.astype(np.float32), big.imag.astype(np.float32)


def stft_fusable(fft_width: int) -> bool:
    """The in-kernel STFT epilogue handles widths dividing 128 (the
    block-diagonal DFT packs whole windows into 128-lane rows)."""
    return fft_width >= 2 and 128 % fft_width == 0


def _kernel_t(spec: FrontendSpec, m_sub: int, stft_width: int | None = None):
    from jax.experimental import pallas as pl

    d = spec.decimate
    tout = _tout_t(spec)

    def kernel(
        base_ref,
        valid_ref,
        re_ref,
        im_ref,
        hre_ref,
        him_ref,
        cdm_ref,
        sdm_ref,
        cdh_ref,
        sdh_ref,
        hp_ref,
        *rest,
    ):
        if stft_width is None:
            ore_ref, oim_ref = rest
        else:
            fr_ref, fi_ref, onorm_ref = rest
        t = pl.program_id(0)
        base = base_ref[t]
        v = valid_ref[t]

        # cs8/cf32 decode a zero raw byte to exactly 0.0, so zero-padded
        # tails already contribute nothing to the FIR and the
        # decoded-domain mask (iota + compare + select over the whole
        # tile) is pure overhead; cu8/cs16 decode zero bytes to a large
        # negative rail and need it.
        needs_mask = spec.fmt in (FileFormat.COMPLEX_UINT8, FileFormat.COMPLEX_INT16)

        def masked_decode(main_ref, halo_ref, col0_valid):
            x = jnp.concatenate(
                [_decode_ref(main_ref[:], spec.fmt), _decode_ref(halo_ref[:], spec.fmt)],
                axis=1,
            )
            if not needs_mask:
                return x
            cols = tout + 128

            def apply_mask(x):
                lin = (
                    jax.lax.broadcasted_iota(jnp.int32, (d, cols), 1) * d
                    + jax.lax.broadcasted_iota(jnp.int32, (d, cols), 0)
                )
                return jnp.where(lin < col0_valid, x, jnp.float32(0.0))

            # only the stream's final tile is ever partial; every other
            # tile skips the mask's ~5 full-tile passes at one scalar test
            return jax.lax.cond(
                col0_valid >= jnp.int32(cols * d), lambda x: x, apply_mask, x
            )

        xr = masked_decode(re_ref, hre_ref, v)
        xi = masked_decode(im_ref, him_ref, v)
        # rotate the resident cos/sin(delta) tables by the tile base:
        # two scalar transcendentals instead of two per element
        cb, sb = jnp.cos(base), jnp.sin(base)
        cd = jnp.concatenate([cdm_ref[:], cdh_ref[:]], axis=1)
        sd = jnp.concatenate([sdm_ref[:], sdh_ref[:]], axis=1)
        c = cd * cb - sd * sb
        s = sd * cb + cd * sb
        mre = xr * c - xi * s
        mim = xr * s + xi * c

        hp = hp_ref[:]
        p_hi = jax.lax.Precision.HIGHEST
        # subfilters in groups of <=32: each group is one thin MXU matmul
        # whose (g, tout+128) product is rolled/summed into the output
        # before the next group materializes — peak VMEM stays O(group),
        # lifting the filter-length cap from 32 to 128 subfilters
        # (power=2000 at d=32 has m_sub=125)
        g_rows = min(32, hp.shape[0])

        def diag_rows(c2, g0):
            # y[i] = sum_m c2[m-g0, i+m]: align each subfilter row with
            # a roll, then one sublane reduction — O(g) vector ops
            rows = []
            for m in range(g0, min(g0 + g_rows, m_sub)):
                row = c2[m - g0 : m - g0 + 1]
                # roll(x, 0) emits a zero-width slice Mosaic rejects
                rows.append(jnp.roll(row, -m, axis=1) if m else row)
            z = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
            return jnp.sum(z, axis=0, keepdims=True)[:, :tout]  # (1, tout)

        accr = None
        acci = None
        for g0 in range(0, m_sub, g_rows):
            hg = hp[g0 : g0 + g_rows]
            c2r = jnp.dot(hg, mre, precision=p_hi, preferred_element_type=jnp.float32)
            c2i = jnp.dot(hg, mim, precision=p_hi, preferred_element_type=jnp.float32)
            pr = diag_rows(c2r, g0)
            pi = diag_rows(c2i, g0)
            accr = pr if accr is None else accr + pr
            acci = pi if acci is None else acci + pi

        if stft_width is None:
            ore_ref[0] = accr
            oim_ref[0] = acci
            return
        # in-kernel STFT epilogue: relayout the (1, tout) decimated
        # stream to (tout/128, 128) rows, then the block-diagonal DFT
        # (fftshift pre-folded in its columns) is one MXU matmul pair
        # and only the f32 norms ever reach HBM
        rows = tout // 128
        yr = accr.reshape(rows, 128)
        yi = acci.reshape(rows, 128)
        fr, fi = fr_ref[:], fi_ref[:]
        zr = jnp.dot(yr, fr, precision=p_hi, preferred_element_type=jnp.float32) - jnp.dot(
            yi, fi, precision=p_hi, preferred_element_type=jnp.float32
        )
        zi = jnp.dot(yr, fi, precision=p_hi, preferred_element_type=jnp.float32) + jnp.dot(
            yi, fr, precision=p_hi, preferred_element_type=jnp.float32
        )
        onorm_ref[0] = jnp.sqrt(zr * zr + zi * zi)

    return kernel


def fused_frontend_t(
    planes: jax.Array,
    start_offset_theta: np.ndarray | jax.Array,
    spec: FrontendSpec,
    n_out: int,
    *,
    n_valid: int | None = None,
    stft_width: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transposed-layout fused frontend (see module notes).  Same
    contract as :func:`fused_frontend`; ~2x the XLA chain for integer
    formats on v5e (parity for cf32).  ``n_valid``: real samples in
    ``planes`` when the caller has already zero-padded raw bytes — the
    kernel masks past it in the decoded domain.

    ``stft_width``: fold the chain's STFT epilogue into the kernel (see
    :func:`_plan_stft`; requires ``stft_fusable``) — returns
    (n_out // stft_width, stft_width) fftshifted f32 norms instead of
    the (2, n_out) decimated planes, and the decimated stream never
    reaches HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = spec.decimate
    if not supported_t(d):
        raise ValueError(f"transposed pallas frontend requires 1 <= decimate <= 64, got {d}")
    if stft_width is not None and not stft_fusable(stft_width):
        raise ValueError(f"in-kernel STFT requires a width dividing 128, got {stft_width}")
    m_sub, m_pad, hp, cdm, sdm, cdh, sdh = _plan_t(spec)
    tout = _tout_t(spec)

    tiles = -(-n_out // tout)
    l_in = tout * d
    cols_needed = tiles * tout + 128
    if n_valid is None:
        n_valid = planes.shape[1]
    need = cols_needed * d
    if planes.shape[1] < need:
        planes = jnp.pad(planes, ((0, 0), (0, need - planes.shape[1])))
    xt = jnp.transpose(
        planes[:, : cols_needed * d].reshape(2, cols_needed, d), (0, 2, 1)
    )  # (2, d, cols)

    base = jnp.asarray(start_offset_theta, dtype=jnp.float32).reshape(tiles)
    t_idx = np.arange(tiles, dtype=np.int64)
    valid = np.clip(n_valid - t_idx * l_in, 0, l_in + 128 * d).astype(np.int32)

    blocks_per_tile = tout // 128
    in_specs = [
        pl.BlockSpec((d, tout), lambda t, *_: (0, t)),
        pl.BlockSpec((d, tout), lambda t, *_: (0, t)),
        pl.BlockSpec((d, 128), lambda t, *_: (0, (t + 1) * blocks_per_tile)),
        pl.BlockSpec((d, 128), lambda t, *_: (0, (t + 1) * blocks_per_tile)),
        pl.BlockSpec((d, tout), lambda t, *_: (0, 0)),
        pl.BlockSpec((d, tout), lambda t, *_: (0, 0)),
        pl.BlockSpec((d, 128), lambda t, *_: (0, 0)),
        pl.BlockSpec((d, 128), lambda t, *_: (0, 0)),
        pl.BlockSpec((m_pad, d), lambda t, *_: (0, 0)),
    ]
    if stft_width is not None:
        in_specs += [pl.BlockSpec((128, 128), lambda t, *_: (0, 0))] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # base, valid
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=(
            [
                pl.BlockSpec((1, 1, tout), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, tout), lambda t, *_: (t, 0, 0)),
            ]
            if stft_width is None
            else pl.BlockSpec((1, tout // 128, 128), lambda t, *_: (t, 0, 0))
        ),
    )
    inputs = [
        base,
        jnp.asarray(valid),
        xt[0],
        xt[1],
        xt[0],
        xt[1],
        jnp.asarray(cdm),
        jnp.asarray(sdm),
        jnp.asarray(cdh),
        jnp.asarray(sdh),
        jnp.asarray(hp),
    ]
    if stft_width is None:
        ore, oim = pl.pallas_call(
            _kernel_t(spec, m_sub),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((tiles, 1, tout), jnp.float32)] * 2,
            interpret=interpret,
        )(*inputs)
        return jnp.stack([ore.reshape(-1)[:n_out], oim.reshape(-1)[:n_out]])

    fr, fi = _plan_stft(stft_width)
    norms = pl.pallas_call(
        _kernel_t(spec, m_sub, stft_width=stft_width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles, tout // 128, 128), jnp.float32),
        interpret=interpret,
    )(*inputs, jnp.asarray(fr), jnp.asarray(fi))
    return norms.reshape(-1)[:n_out].reshape(n_out // stft_width, stft_width)


def tile_bases(spec: FrontendSpec, global_start: int, tiles: int) -> np.ndarray:
    """Host-exact per-tile NCO base angles (v1 tile size)."""
    l_in = _TOUT * spec.decimate
    offs = global_start + np.arange(tiles, dtype=np.int64) * l_in
    return ExactNCO(spec.shift_freq, spec.sample_rate).angles(offs)


def tile_bases_t(spec: FrontendSpec, global_start: int, n_out: int) -> np.ndarray:
    """Host-exact per-tile NCO base angles for :func:`fused_frontend_t`
    (its larger, format-dependent tile size); sized from ``n_out``."""
    tout = _tout_t(spec)
    l_in = tout * spec.decimate
    tiles = -(-n_out // tout)
    offs = global_start + np.arange(tiles, dtype=np.int64) * l_in
    return ExactNCO(spec.shift_freq, spec.sample_rate).angles(offs)
