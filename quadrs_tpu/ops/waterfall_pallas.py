"""Pallas TPU kernel: fused decode -> window -> wide DFT -> magnitudes.

The waterfall bank's hot loop (``models/waterfall.py``, BASELINE config
5) in one VMEM round-trip per tile of 128 windows: the XLA chain moves
~50 bytes/sample through HBM (decoded complex, two DFT-stage
intermediates, magnitudes), this kernel reads the native-dtype planes
once (1 byte/sample/plane for cs8) and writes only the f32 norms.

The DFT is the same four-step split as :func:`ops.stft.four_step_fft_planes`,
factor-locked to the hardware layout (``width = 128 * b``):

* **Stage 1** — split sample index ``n = b*p + q``: a width-128 DFT over
  ``p`` is ONE ``(128, 128) @ (128, b*128)`` MXU matmul per plane pair,
  because the XLA-side pre-arrangement puts ``p`` on sublanes and
  ``(q, window)`` on lanes.  Full 128-deep contraction: the systolic
  array at its natural shape.
* **Twiddle** — ``W_N^{qr}``: a resident f32 plane table in the same
  ``(r, q*128+w)`` layout (window-broadcast baked in).
* **Stage 2** — the width-``b`` DFT over ``q`` unrolls to ``b^2``
  scalar-constant FMAs over 128-lane-aligned slices (VPU work, ~``b``
  ops/sample).
* **Output** — stage-2 results land as ``(s, r)`` pages whose flat
  order IS the natural bin order ``k = r + 128*s``; the XLA epilogue
  does one fused transpose-to-(window, bin) + fftshift pass over the
  4-byte norms.

Windowing (Blackman-Harris) is a resident elementwise table in the
stage-1 layout.  No NCO here — the waterfall bank has no mixer.

Grid tiles are 128 windows; window counts pad up to a tile and the
epilogue drops the padding.  Conformance: matches ``stft_norms`` (the
XLA path) to ~1e-6 relative; pinned by ``tests/test_waterfall_pallas.py``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from quadrs_tpu.formats import FileFormat

_WIN_TILE = 128  # windows per grid step


@dataclass(frozen=True)
class WaterfallSpec:
    fmt: FileFormat
    width: int
    windowing: str = "rectangular"


def supported(width: int) -> bool:
    """width = 128*b with 2 <= b <= 32 (256..4096): stage 1 is a full
    128-contraction matmul and stage 2's unroll stays tiny."""
    return width % 128 == 0 and 2 <= width // 128 <= 32


def _lane_broadcast(m: np.ndarray) -> np.ndarray:
    """(128, b) table -> (128, b*_WIN_TILE): repeat each q column across
    the tile's windows (the kernel's (r, q*128 + w) layout)."""
    b = m.shape[1]
    return np.repeat(m[:, :, None], _WIN_TILE, axis=2).reshape(128, b * _WIN_TILE)


@functools.lru_cache(maxsize=8)
def _plan(spec: WaterfallSpec):
    """Resident tables in kernel layout (f32 planes, f64-evaluated)."""
    width = spec.width
    b = width // 128
    p = np.arange(128)
    # stage-1 DFT matrix F128[p, r] = W_128^{pr}
    f1 = np.exp(-2j * np.pi * np.outer(p, p) / 128.0)
    # twiddle W_N^{qr} in the (r, q*128 + w) layout, broadcast over w
    q = np.arange(b)
    tw = _lane_broadcast(np.exp(-2j * np.pi * np.outer(p, q) / float(width)))
    # stage-2 scalars F_b[q, s] = W_b^{qs}
    f2 = np.exp(-2j * np.pi * np.outer(q, q) / float(b))
    # window table w[n], n = b*p + q, in the (p, q*128 + w) layout
    win = None
    if spec.windowing in ("blackman-harris", "blackmanharris"):
        from quadrs_tpu.ops.stft import blackman_harris_window

        wn = blackman_harris_window(width).astype(np.float64)
        win = _lane_broadcast(wn.reshape(128, b)).astype(np.float32)

    to32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return to32(f1), to32(tw), f2, win


def _kernel(spec: WaterfallSpec, search: bool = False):
    from quadrs_tpu.ops.frontend_pallas import _decode_ref

    width = spec.width
    b = width // 128
    _, _, f2, _ = _plan(spec)

    def kernel(re_ref, im_ref, f1r_ref, f1i_ref, twr_ref, twi_ref, *rest):
        if spec.windowing in ("blackman-harris", "blackmanharris"):
            win_ref, *out_refs = rest
        else:
            win_ref = None
            out_refs = list(rest)

        xr = _decode_ref(re_ref[:], spec.fmt)
        xi = _decode_ref(im_ref[:], spec.fmt)
        if win_ref is not None:
            w = win_ref[:]
            xr = xr * w
            xi = xi * w

        p_hi = jax.lax.Precision.HIGHEST
        f1r, f1i = f1r_ref[:], f1i_ref[:]
        # stage 1: Z[r, (q,w)] = sum_p F128[p,r] * x[p, (q,w)] — F128 is
        # symmetric, so contracting its first axis needs no transpose
        zr = jnp.dot(f1r, xr, precision=p_hi, preferred_element_type=jnp.float32) - jnp.dot(
            f1i, xi, precision=p_hi, preferred_element_type=jnp.float32
        )
        zi = jnp.dot(f1r, xi, precision=p_hi, preferred_element_type=jnp.float32) + jnp.dot(
            f1i, xr, precision=p_hi, preferred_element_type=jnp.float32
        )
        # twiddle (resident table, window-broadcast baked in)
        twr, twi = twr_ref[:], twi_ref[:]
        zr, zi = zr * twr - zi * twi, zr * twi + zi * twr

        best_val = None
        best_j = None
        # stage 2: X[s][r, w] = sum_q F_b[q, s] * Z'[r, (q, w)] — b^2
        # scalar-constant FMAs over 128-aligned lane slices, then the
        # magnitude; pages land in natural bin order k = r + 128*s
        for s in range(b):
            accr = None
            acci = None
            for qq in range(b):
                cr = float(f2[qq, s].real)
                ci = float(f2[qq, s].imag)
                zrq = zr[:, qq * _WIN_TILE : (qq + 1) * _WIN_TILE]
                ziq = zi[:, qq * _WIN_TILE : (qq + 1) * _WIN_TILE]
                tr = cr * zrq - ci * ziq
                ti = cr * ziq + ci * zrq
                accr = tr if accr is None else accr + tr
                acci = ti if acci is None else acci + ti
            mag = jnp.sqrt(accr * accr + acci * acci)
            if not search:
                out_refs[0][0, s] = mag
                continue
            # peak search without writing norms: per page, the max and —
            # matching XLA argmax-over-shifted-norms tie order exactly —
            # the smallest fftshifted bin index holding it (int32 math:
            # Mosaic's iota only exists for integer types)
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (128, _WIN_TILE), 0)
            j_page = jnp.remainder(r_iota + (128 * s + width // 2), width)
            m_s = jnp.max(mag, axis=0, keepdims=True)  # (1, W)
            j_s = jnp.min(
                jnp.where(mag == m_s, j_page, width), axis=0, keepdims=True
            )
            if best_val is None:
                best_val, best_j = m_s, j_s
            else:
                upd = m_s > best_val
                tie = m_s == best_val
                best_j = jnp.where(
                    upd, j_s, jnp.where(tie, jnp.minimum(best_j, j_s), best_j)
                )
                best_val = jnp.maximum(best_val, m_s)
        if search:
            out_refs[0][0] = best_val
            # NaN magnitudes make every `mag == m_s` comparison false and
            # would leak the out-of-range sentinel `width`; clamp so the
            # returned bin is always indexable (the magnitude output still
            # carries the NaN for the caller to notice)
            out_refs[1][0] = jnp.minimum(best_j, width - 1)

    return kernel


def fused_waterfall(
    planes: jax.Array,
    spec: WaterfallSpec,
    n_windows: int,
    *,
    stride: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(S, 2, n) native planes -> (S, n_windows, width) f32 fftshifted
    norms via the fused kernel.  ``stride`` defaults to ``width``
    (the bank's non-overlap tiling, a free reshape); other strides —
    overlapped or skipping — build the window matrix from native-dtype
    row slices in XLA (never a gather) and run the same kernel, paying
    only the width/stride input inflation.  Trailing samples that don't
    fill a window are dropped."""
    inputs, in_specs, groups, total_w = _prearranged(planes, spec, n_windows, stride)
    from jax.experimental import pallas as pl

    width = spec.width
    b = width // 128
    s_streams = planes.shape[0]
    out = pl.pallas_call(
        _kernel(spec),
        grid=(groups,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b, 128, _WIN_TILE), lambda t: (t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((groups, b, 128, _WIN_TILE), jnp.float32),
        interpret=interpret,
    )(*inputs)

    # epilogue: (G, s, r, w) -> (window, k); flat (s, r) IS k = r + 128*s,
    # then one transpose to window-major and the fftshift half-swap
    from quadrs_tpu.ops.stft import fftshift

    norms = out.reshape(groups, width, _WIN_TILE)
    norms = jnp.transpose(norms, (0, 2, 1)).reshape(groups * _WIN_TILE, width)
    norms = fftshift(norms[:total_w])
    return norms.reshape(s_streams, n_windows, width)


def fused_waterfall_search(
    planes: jax.Array,
    spec: WaterfallSpec,
    n_windows: int,
    *,
    stride: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Peak search without materializing the spectrogram: per (stream,
    window) the fftshifted argmax bin and its magnitude, reduced inside
    the kernel — the f32 norms (the dominant HBM write of the norms
    kernel) never leave VMEM.  Ties resolve to the lowest shifted bin,
    exactly like ``jnp.argmax`` over the shifted norms."""
    inputs, in_specs, groups, total_w = _prearranged(planes, spec, n_windows, stride)
    from jax.experimental import pallas as pl

    s_streams = planes.shape[0]
    val, j = pl.pallas_call(
        _kernel(spec, search=True),
        grid=(groups,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, 1, _WIN_TILE), lambda t: (t, 0, 0))] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((groups, 1, _WIN_TILE), jnp.float32),
            jax.ShapeDtypeStruct((groups, 1, _WIN_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)
    val = val.reshape(groups * _WIN_TILE)[:total_w].reshape(s_streams, n_windows)
    idx = j.reshape(groups * _WIN_TILE)[:total_w].reshape(s_streams, n_windows)
    return idx, val


def _prearranged(planes, spec: WaterfallSpec, n_windows: int, stride: int | None):
    """Shared XLA-side input staging: window matrix -> the kernel's
    (p on sublanes, (group, q, window) on lanes) 2D layout, plus the
    resident tables and their BlockSpecs."""
    from jax.experimental import pallas as pl

    width = spec.width
    if not supported(width):
        raise ValueError(f"fused waterfall requires width = 128*b (b in 2..32), got {width}")
    if stride is None:
        stride = width
    if stride <= 0:
        raise ValueError("stride must be positive")
    b = width // 128
    s_streams = planes.shape[0]
    (f1r, f1i), (twr, twi), _, win = _plan(spec)

    total_w = s_streams * n_windows
    groups = -(-total_w // _WIN_TILE)
    pad_w = groups * _WIN_TILE - total_w

    # pre-arrangement: (S, 2, n) -> (2, windows, width) -> 2D lanes
    if stride == width:
        x = planes[:, :, : n_windows * width].reshape(s_streams, 2, n_windows, width)
        x = jnp.transpose(x, (1, 0, 2, 3)).reshape(2, total_w, width)
    else:
        from quadrs_tpu.ops.fir import _overlapped_frames

        flat = planes.reshape(s_streams * 2, planes.shape[-1])
        frames = _overlapped_frames(flat, stride, width, n_windows)
        frames = frames.reshape(s_streams, 2, n_windows, width)
        x = jnp.transpose(frames, (1, 0, 2, 3)).reshape(2, total_w, width)
    if pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_w), (0, 0)))
    # n = b*p + q: window-major -> [g, w, p, q] -> (p, g, q, w)
    x = x.reshape(2, groups, _WIN_TILE, 128, b)
    x = jnp.transpose(x, (0, 3, 1, 4, 2)).reshape(2, 128, groups * b * _WIN_TILE)

    inputs = [x[0], x[1], jnp.asarray(f1r), jnp.asarray(f1i), jnp.asarray(twr), jnp.asarray(twi)]
    in_specs = [
        pl.BlockSpec((128, b * _WIN_TILE), lambda t: (0, t)),
        pl.BlockSpec((128, b * _WIN_TILE), lambda t: (0, t)),
        pl.BlockSpec((128, 128), lambda t: (0, 0)),
        pl.BlockSpec((128, 128), lambda t: (0, 0)),
        pl.BlockSpec((128, b * _WIN_TILE), lambda t: (0, 0)),
        pl.BlockSpec((128, b * _WIN_TILE), lambda t: (0, 0)),
    ]
    if win is not None:
        inputs.append(jnp.asarray(win))
        in_specs.append(pl.BlockSpec((128, b * _WIN_TILE), lambda t: (0, 0)))
    return inputs, in_specs, groups, total_w
