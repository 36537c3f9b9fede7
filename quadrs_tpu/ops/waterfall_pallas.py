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

Strided windows (stride != width): overlapped 128-multiple strides
assemble the window matrix IN KERNEL from contiguous class-row slices
(see the strided section below) — measured 3155 Msps of input at 4x
overlap on v5e vs 1923 for the round-2 XLA pre-arrangement — and the
peak search runs the same in-kernel layout (lane reductions per page;
4930 Msps input at 4x overlap).  Non-128-multiple and skipping strides
keep the pre-arranged path for both (skipping strides read only the
windows there — strictly less HBM traffic than staging whole stride
cells).
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
    """width = 128*b with 2 <= b <= 64 (256..8192).  Up to b=16 the
    classic tiled kernel runs (stage 1 a full 128-contraction matmul,
    stage 2 a tiny unroll); past that every stride rides the strided
    machinery with the factorized q-DFT stage A (see
    :func:`_tiled_via_strided`), whose per-class blocks keep scoped
    VMEM bounded where the classic kernel's resident tables blow it."""
    return width % 128 == 0 and 2 <= width // 128 <= 64


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


def _qdft_pages(parts, b: int, fac: tuple[int, int]):
    """Two-factor b-point DFT over q: yields ``(s, accr, acci)`` with
    ``acc[s] = sum_q W_b^{q s} * parts[q]`` for ``parts`` a list of
    (re, im) lane-slice pairs.  q = q1*b2 + q2, s = s1 + b1*s2 (see
    :func:`_factor_b`): step 1 is a b1-point DFT per (q2, s1), step 2 a
    b2-point DFT per page whose scalar coefficients fold in the
    inter-stage twiddle W_b^{q2 s1} for free — b*(b1+b2) FMA slices
    instead of b^2.  All coefficients are Python-float loop constants.
    Shared by the tiled kernel's stage 2 and the strided kernel's
    stage A (which post-multiplies its per-page lane twiddle)."""
    b1, b2 = fac
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(b1), np.arange(b1)) / b1)
    for s1 in range(b1):
        g = []
        for q2 in range(b2):
            gr = None
            gi = None
            for q1 in range(b1):
                cr = float(w1[q1, s1].real)
                ci = float(w1[q1, s1].imag)
                vr, vi = parts[q1 * b2 + q2]
                tr = cr * vr - ci * vi
                ti = cr * vi + ci * vr
                gr = tr if gr is None else gr + tr
                gi = ti if gi is None else gi + ti
            g.append((gr, gi))
        for s2 in range(b2):
            s = s1 + b1 * s2
            accr = None
            acci = None
            for q2 in range(b2):
                c = np.exp(-2j * np.pi * (q2 * s2 / b2 + q2 * s1 / b))
                cr, ci = float(c.real), float(c.imag)
                gr, gi = g[q2]
                tr = cr * gr - ci * gi
                ti = cr * gi + ci * gr
                accr = tr if accr is None else accr + tr
                acci = ti if acci is None else acci + ti
            yield s, accr, acci


def _kernel(spec: WaterfallSpec, search: bool = False):
    from quadrs_tpu.ops.frontend_pallas import _decode_ref

    width = spec.width
    b = width // 128
    fac = _factor_b(b)
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

        zs = [
            (
                zr[:, qq * _WIN_TILE : (qq + 1) * _WIN_TILE],
                zi[:, qq * _WIN_TILE : (qq + 1) * _WIN_TILE],
            )
            for qq in range(b)
        ]

        def pages_direct():
            # stage 2: X[s][r, w] = sum_q F_b[q, s] * Z'[r, (q, w)] —
            # b^2 scalar-constant FMAs over 128-aligned lane slices;
            # pages land in natural bin order k = r + 128*s
            for s in range(b):
                accr = None
                acci = None
                for qq in range(b):
                    cr = float(f2[qq, s].real)
                    ci = float(f2[qq, s].imag)
                    zrq, ziq = zs[qq]
                    tr = cr * zrq - ci * ziq
                    ti = cr * ziq + ci * zrq
                    accr = tr if accr is None else accr + tr
                    acci = ti if acci is None else acci + ti
                yield s, accr, acci

        # two-factor stage 2 for wide widths: the shared q-DFT generator
        # (all coefficient families are scalar loop constants)
        best_val = None
        best_j = None
        for s, accr, acci in _qdft_pages(zs, b, fac) if fac is not None else pages_direct():
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
    (the bank's non-overlap tiling, a free reshape); OVERLAPPED strides
    that are a multiple of 128 assemble the windows IN KERNEL from
    contiguous class-row slices (each input sample read and decoded
    once, no width/stride inflation; see the strided section above);
    remaining strides — skipping strides included, where reading only
    the windows is strictly less HBM traffic — build the window matrix
    from native-dtype row slices in XLA (never a gather).  At wide
    widths (b > 16) that matrix feeds the strided machinery as a tiled
    problem instead of the classic kernel, whose resident tables exceed
    scoped VMEM (measured: does not compile at b=32).  Trailing samples
    that don't fill a window are dropped."""
    if stride is not None and stride != spec.width and _strided_supported(spec.width, stride):
        # (the subaligned class-interleave route was measured a LOSS for
        # norms — see _subaligned_supported — so norms never take it)
        return _fused_waterfall_strided(planes, spec, n_windows, stride, interpret)
    if _tiled_via_strided(spec.width):
        # wide widths (b > 16): the tiled kernel's resident tables blow
        # scoped VMEM (18.6-22.1M > 16M on v5e, does not compile), so
        # EVERY remaining stride rides the strided machinery — non-tiled
        # strides first pre-arrange windows into contiguous native
        # planes (same row-slice construction as the classic path)
        if stride is not None and stride != spec.width:
            planes = _contiguous_windows(planes, spec.width, stride, n_windows)
        return _fused_waterfall_strided(
            planes, spec, n_windows, spec.width, interpret
        )
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
    exactly like ``jnp.argmax`` over the shifted norms.  Overlapped
    128-multiple strides run the in-kernel window assembly (lane
    reductions per page); others pre-arrange in XLA like the norms
    path."""
    if stride is not None and stride != spec.width:
        if _strided_supported(spec.width, stride):
            return _fused_waterfall_strided(
                planes, spec, n_windows, stride, interpret, search=True
            )
        if _subaligned_supported(spec.width, stride):
            return _fused_waterfall_subaligned(
                planes, spec, n_windows, stride, interpret, search=True
            )
    if _tiled_via_strided(spec.width):
        # see the norms path: wide widths cannot run the tiled kernel
        # (scoped VMEM), so non-tiled strides pre-arrange + ride strided
        if stride is not None and stride != spec.width:
            planes = _contiguous_windows(planes, spec.width, stride, n_windows)
        return _fused_waterfall_strided(
            planes, spec, n_windows, spec.width, interpret, search=True
        )
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


def fused_waterfall_scan(
    planes: jax.Array,
    spec: WaterfallSpec,
    n_windows: int,
    threshold: jax.Array,
    *,
    stride: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Band-survey reduction without materializing the spectrogram: per
    (stream, fftshifted bin) the sum and max of the window norms plus
    the count of windows above ``threshold`` (a traced f32 scalar,
    passed via scalar prefetch — one compile serves every occupancy
    level), each an (S, width) f32 array.

    The reduction runs over the window axis INSIDE the kernel: each
    page's (windows, 128-bin) magnitudes fold into a per-stream stat
    block that is revisited across the tile grid axis, so the f32 norms
    — the dominant HBM write of the norms path, and the read the XLA
    reduction pays on top — never leave VMEM.  Every width rides the
    strided machinery (the tiled case is ``s_r = b``, zero overlap, the
    same specialization :func:`_tiled_via_strided` uses); overlapped
    128-multiple strides assemble windows in kernel.  Non-128-multiple
    strides in the subaligned band (2*P*stride <= width) split into the
    P lane-offset classes like the search route — and where the norms
    variant died on the f32 output interleave, scan stats MERGE across
    classes for free (sum adds, max maximums, counts add), so the whole
    band stays in kernel.  Remaining strides pre-arrange contiguous
    windows first like the norms path."""
    width = spec.width
    if stride is None:
        stride = width
    if stride != width and not _strided_supported(width, stride):
        if _subaligned_supported(width, stride):
            return _scan_subaligned(
                planes, spec, n_windows, stride, threshold, interpret
            )
        planes = _contiguous_windows(planes, width, stride, n_windows)
        stride = width
    return _fused_waterfall_strided(
        planes, spec, n_windows, stride, interpret, scan_thr=threshold
    )


def _scan_subaligned(
    planes, spec: WaterfallSpec, n_windows: int, stride: int, threshold, interpret
):
    """Class-split band survey (see :func:`_subaligned_supported`):
    windows w ≡ c (mod P) form an exactly-128-multiple strided problem
    per class; the per-class (sum, max, above) merge elementwise."""
    g = int(np.gcd(stride, 128))
    p_cls = 128 // g
    stride_c = p_cls * stride
    tot = None
    for c in range(p_cls):
        nw_c = max(0, -(-(n_windows - c) // p_cls))
        if nw_c == 0:
            continue
        part = fused_waterfall_scan(
            planes[:, :, c * stride :],
            spec,
            nw_c,
            threshold,
            stride=stride_c,
            interpret=interpret,
        )
        if tot is None:
            tot = list(part)
        else:
            tot[0] = tot[0] + part[0]
            tot[1] = jnp.maximum(tot[1], part[1])
            tot[2] = tot[2] + part[2]
    assert tot is not None  # n_windows >= 1 always reaches class 0
    return tot[0], tot[1], tot[2]


# ---------------------------------------------------------------------------
# Strided (overlapped/skipping) windows, assembled IN KERNEL.
#
# The pre-arranged path below pays width/stride input inflation plus u8
# transposes in XLA (~2x at 4x overlap).  For stride = 128*s_r the
# window matrix never needs to exist: decompose the in-window index as
# n = 128*q + p (q on rows-of-128, p on lanes).  Window w's q-th row is
# stream row w*s_r + q, so after a row-level class split by residue mod
# s_r (one XLA row transpose, no inflation — rows stay 128-sample
# contiguous), a tile of 128 windows needs only CONTIGUOUS 128-row
# slices of each class, offset by q // s_r:
#
#   X_w[s' + b*r] = sum_p W_128^{pr} * sum_q T[q,s'][p] * class_{q%s_r}[w + q//s_r, p]
#   T[q,s'][p] = W_b^{q s'} * W_N^{p s'} * win[128*q + p]
#
# * stage A: b^2 resident-complex-lane-table FMAs over (128, 128)
#   slices — the W_N^{ps'} twiddle and the window function fold into
#   the tables for free;
# * stage B: one (128w, 128p) @ (128p, 128r) MXU matmul per s' (full
#   128-contraction, same total MACs as the tiled kernel's stage 1);
# * output pages (s', w, r) flatten to bins k = s' + b*r, one f32
#   epilogue transpose + fftshift like the tiled path.
#
# Each input sample is read and decoded ONCE regardless of overlap.
# ---------------------------------------------------------------------------

_HALO_ROWS = 32  # covers q//s_r <= 31 for any b <= 32; legal sublane tile


def _tiled_via_strided(width: int) -> bool:
    """Widths past b=16 run the TILED (stride == width) case through the
    strided machinery (s_r = b: one window row per class, zero overlap).
    The tiled kernel's resident tables + stage-1 intermediates scale
    with b and blow the 16 MB scoped-VMEM limit at b=32 (measured:
    22.13M on v5e — it does not compile), while the strided kernel's
    per-class blocks stay small and its stage A is the factorized
    q-DFT.  Measured at 4096-pt, 128 windows/stream chunks (full
    128-window tiles): **14.3 Gsps aggregate vs 8.9 for the XLA
    chain**; smaller chunks shrink the window tile instead of padding
    (see _pick_win_tile: 32 windows/stream runs 7.9 Gsps, not the 3.4
    a padded 128-tile paid).  b=16 keeps the tiled kernel (it compiles
    and measured 10.5 Gsps at 2048-pt)."""
    return supported(width) and width // 128 > 16


def _subaligned_supported(width: int, stride: int) -> bool:
    """Strides that aren't 128-multiples — any gcd, odd included —
    can route through the class-interleave wrapper:
    windows w ≡ c (mod P), P = 128/gcd(stride, 128), share the lane
    offset (c*stride) mod 128, so slicing the BYTE planes at c*stride
    (one cheap contiguous u8 XLA slice per class) makes each class an
    exactly-128-multiple strided problem of stride' = P*stride — the
    existing in-kernel assembly, unchanged.

    Measured on v5e (64 cs8 streams, same-session vs pre-arranged):
    the SEARCH wins decisively while the classes stay well-overlapped
    (1024-pt stride 96: 1128 vs 845; 2048-pt stride 160: 1275 vs 598
    Msps input) but loses once stride' approaches the width (1024-pt
    stride 224: 1901 vs 2129), so the route requires
    2*P*stride <= width.  Within that band the win holds at EVERY
    class count, the margin growing with overlap depth — stride 48
    (P=8): 586 vs 387; stride 24 (P=16): 283 vs 172; stride 12
    (P=32): 142 vs 58; stride 6 (P=64): 70 vs 28; stride 3 (P=128):
    35.4 vs 6.5 — and the feared P-call compile blowup never appears:
    the class program compiles no slower than the pre-arranged one at
    the same stride (13.3 vs 13.3 s at P=32, 21 vs 36 at P=64, 108 vs
    203 at P=128 — the pre-arranged path's giant window matrix costs
    XLA more than P small kernels cost Mosaic), so the band check is
    the ONLY gate.  The NORMS variant loses everywhere (639 vs 742 at
    stride 96; 1498 vs 2050 at 224; 497 vs 543 at 2048/160) — the P
    per-class kernels re-read ~the whole input and the f32 output
    interleave eats the rest — so only
    :func:`fused_waterfall_search` routes here (a recorded dead end
    for norms, see DESIGN.md)."""
    if not supported(width) or stride <= 0 or stride % 128 == 0:
        return False
    g = np.gcd(stride, 128)
    return 2 * (128 // g) * stride <= width


def _fused_waterfall_subaligned(
    planes: jax.Array,
    spec: WaterfallSpec,
    n_windows: int,
    stride: int,
    interpret: bool,
    search: bool = False,
):
    """See :func:`_subaligned_supported`.  Window w = c + P*j of the
    original problem is window j of class c; outputs interleave back
    with one f32 stack+reshape."""
    width = spec.width
    g = int(np.gcd(stride, 128))
    p_cls = 128 // g
    stride_c = p_cls * stride
    nw_max = -(-n_windows // p_cls)
    s_streams = planes.shape[0]

    outs = []
    for c in range(p_cls):
        nw_c = max(0, -(-(n_windows - c) // p_cls))
        if nw_c == 0:
            # class entirely past n_windows (n_windows < P): its slots
            # all land at interleave positions >= n_windows and are
            # dropped — emit zeros instead of tracing an empty kernel
            if search:
                outs.append(
                    (
                        jnp.zeros((s_streams, nw_max), jnp.int32),
                        jnp.zeros((s_streams, nw_max), jnp.float32),
                    )
                )
            else:
                outs.append(jnp.zeros((s_streams, nw_max, width), jnp.float32))
            continue
        sub = planes[:, :, c * stride :]
        if search:
            out_c = fused_waterfall_search(
                sub, spec, nw_c, stride=stride_c, interpret=interpret
            )
        else:
            out_c = (
                fused_waterfall(sub, spec, nw_c, stride=stride_c, interpret=interpret),
            )
        if nw_c < nw_max:  # ragged class: pad so the interleave is square
            out_c = tuple(
                jnp.pad(a, ((0, 0), (0, nw_max - nw_c)) + ((0, 0),) * (a.ndim - 2))
                for a in out_c
            )
        outs.append(out_c if search else out_c[0])

    def interleave(parts):
        # (S, j, ...) per class -> (S, j, P, ...) -> (S, nw, ...)
        x = jnp.stack(parts, axis=2)
        return x.reshape(s_streams, nw_max * p_cls, *x.shape[3:])[:, :n_windows]

    if search:
        return interleave([o[0] for o in outs]), interleave([o[1] for o in outs])
    return interleave(outs)


def _strided_supported(width: int, stride: int) -> bool:
    """In-kernel assembly pays off only for OVERLAPPED strides: its
    BlockSpecs stage whole stride cells, so for skipping strides
    (stride > width) HBM traffic would inflate by ~stride/width — and
    VMEM blocks grow with s_r — while the pre-arranged path reads only
    the windows (deflating).  Overlapped 128-multiples are where the
    no-inflation win applies (measured 1923 -> 3155 Msps at 4x)."""
    return supported(width) and stride % 128 == 0 and 0 < stride < width


def _factor_b(b: int) -> tuple[int, int] | None:
    """Balanced two-factor split ``b = b1*b2`` for stage A's q-DFT.

    Stage A is a b-point DFT over q per (window, p) element — b^2
    resident-table FMA slices per tile, which dominates wide widths
    (4096-pt: 1024 slices, measured 966 Msps at 4x overlap).  Splitting
    q = q1*b2 + q2, s' = s1 + b1*s2 turns it into two sub-stages of
    b*b1 + b*b2 slices with the inter-stage twiddle W_b^{q2 s1} folded
    into the second stage's scalar coefficients for free (all three
    factors are loop constants).  Applied for factorable b >= 16, where
    the ~b/(b1+b2) work reduction clears the bookkeeping overhead (the
    window and W_N^{ps'} factors move out of the big table into b lane
    rows); below that the one-table path is already cheap."""
    if b < 16:
        return None
    best = None
    for b2 in range(2, int(b**0.5) + 1):
        if b % b2 == 0:
            best = (b // b2, b2)  # most balanced split, b1 >= b2
    return best


@functools.lru_cache(maxsize=8)
def _plan_strided_fac(spec: WaterfallSpec):
    """Resident tables for the FACTORIZED strided stage A: the stage-B
    F128 matrix, the per-page lane twiddle V[s'][p] = W_N^{p s'}, and
    the per-q window rows U[q][p] = win[128q + p] (None when
    rectangular).  The q-DFT coefficients themselves are scalar loop
    constants baked into the unrolled kernel, not tables."""
    width = spec.width
    b = width // 128
    p = np.arange(128)
    f1 = np.exp(-2j * np.pi * np.outer(p, p) / 128.0)
    v = np.exp(-2j * np.pi * np.outer(np.arange(b), p) / float(width))
    win = None
    if spec.windowing in ("blackman-harris", "blackmanharris"):
        from quadrs_tpu.ops.stft import blackman_harris_window

        win = (
            blackman_harris_window(width)
            .astype(np.float64)
            .reshape(b, 128)
            .astype(np.float32)
        )
    to32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return to32(f1), to32(v), win


@functools.lru_cache(maxsize=8)
def _plan_strided(spec: WaterfallSpec):
    """Resident tables for the in-kernel strided path: T[q*b+s', p]
    (complex, f64-evaluated) and the stage-B F128 matrix."""
    width = spec.width
    b = width // 128
    p = np.arange(128)
    f1 = np.exp(-2j * np.pi * np.outer(p, p) / 128.0)
    win = np.ones(width, dtype=np.float64)
    if spec.windowing in ("blackman-harris", "blackmanharris"):
        from quadrs_tpu.ops.stft import blackman_harris_window

        win = blackman_harris_window(width).astype(np.float64)
    t = np.empty((b * b, 128), dtype=np.complex128)
    for q in range(b):
        for s in range(b):
            # W_b^{qs} * W_N^{ps} * win[128q + p]
            t[q * b + s] = (
                np.exp(-2j * np.pi * ((q * s) / float(b) + p * s / float(width)))
                * win[128 * q : 128 * (q + 1)]
            )
    to32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return to32(f1), to32(t)


def _uses_halo(width: int, s_r: int) -> bool:
    """A window's q-th row sits ``q // s_r`` rows past its tile's class
    block; when s_r >= b that offset is always 0 and the halo blocks
    (and their decode+concat transients — ~5 MB of scoped VMEM at b=32,
    the difference between compiling and OOM for the tiled-via-strided
    route) are dropped entirely."""
    return (width // 128 - 1) // s_r > 0


def _pick_win_tile(n_windows: int) -> int:
    """Windows-per-tile for the strided kernel.  Tiles pad PER STREAM,
    so a chunk with few windows/stream pays the padding pro rata; below
    128 windows shrink the tile to the window count rounded up to 32
    (the sublane-tile granularity of the 8-bit input blocks, and the
    halo block height); past 128 windows the full tile amortizes grid
    machinery best.  Measured on v5e (64 cs8 streams, vs a forced
    128-window tile): 4096-pt tiled nw=32 norms 3391 -> 7929 Msps,
    search 4347 -> 11924; nw=64 6889 -> 10978; nw=96 9036 -> 13098;
    1024-pt stride-256 nw=48 1818 -> 3175, nw=96 3428 -> 4207."""
    if n_windows >= _WIN_TILE:
        return _WIN_TILE
    return max(32, -(-n_windows // 32) * 32)


def _kernel_strided(
    spec: WaterfallSpec,
    s_r: int,
    search: bool = False,
    wt: int = _WIN_TILE,
    scan: bool = False,
    n_windows: int = 0,
):
    from jax.experimental import pallas as pl

    from quadrs_tpu.ops.frontend_pallas import _decode_ref

    width = spec.width
    b = width // 128
    fac = _factor_b(b)
    halo = _uses_halo(width, s_r)

    def kernel(*refs):
        if scan:
            # threshold rides scalar prefetch (SMEM): one compile serves
            # every occupancy level
            thr_ref, re_ref, im_ref, *rest = refs
        else:
            re_ref, im_ref, *rest = refs
        if halo:
            hre_ref, him_ref, *rest = rest
        if fac is None:
            tr_ref, ti_ref, f1r_ref, f1i_ref, *out_refs = rest
        elif spec.windowing in ("blackman-harris", "blackmanharris"):
            vr_ref, vi_ref, win_ref, f1r_ref, f1i_ref, *out_refs = rest
        else:
            win_ref = None
            vr_ref, vi_ref, f1r_ref, f1i_ref, *out_refs = rest
        p_hi = jax.lax.Precision.HIGHEST
        # decode each class block once: (s_r, 128 [+ _HALO_ROWS], 128) f32
        if halo:
            xr = [
                jnp.concatenate(
                    [_decode_ref(re_ref[0, c], spec.fmt), _decode_ref(hre_ref[0, c], spec.fmt)],
                    axis=0,
                )
                for c in range(s_r)
            ]
            xi = [
                jnp.concatenate(
                    [_decode_ref(im_ref[0, c], spec.fmt), _decode_ref(him_ref[0, c], spec.fmt)],
                    axis=0,
                )
                for c in range(s_r)
            ]
        else:
            xr = [_decode_ref(re_ref[0, c], spec.fmt) for c in range(s_r)]
            xi = [_decode_ref(im_ref[0, c], spec.fmt) for c in range(s_r)]
        f1r, f1i = f1r_ref[:], f1i_ref[:]
        # hoist the sublane-offset window slices out of the s' loop:
        # each (class, offset) pair is sliced once, not once per s'
        # (misaligned sublane slices cost rotate work on the VPU)
        ys = [
            (xr[q % s_r][q // s_r : q // s_r + wt], xi[q % s_r][q // s_r : q // s_r + wt])
            for q in range(b)
        ]

        def pages_direct():
            # per-page stage A: b resident-table FMAs per page (b^2
            # total).  (Stacking the b pages on sublanes into a single
            # (b*128, 128) @ (128, 128) stage-B matmul was A/B'd on
            # hardware and measured a wash — loop 3244/3202 vs batched
            # 3095/3242 Msps — Mosaic already pipelines the per-page
            # matmuls, so the simpler loop stays.)
            tr, ti = tr_ref[:], ti_ref[:]
            for s in range(b):
                ar = None
                ai = None
                for q in range(b):
                    vr, vi = ys[q]
                    cr = tr[q * b + s : q * b + s + 1]  # (1, 128) lane row
                    ci = ti[q * b + s : q * b + s + 1]
                    wr = vr * cr - vi * ci
                    wi = vr * ci + vi * cr
                    ar = wr if ar is None else ar + wr
                    ai = wi if ai is None else ai + wi
                yield s, ar, ai

        def pages_factored():
            # two-factor stage A: the shared q-DFT generator (the window
            # moves into per-q lane rows up front, the W_N^{p s'} lane
            # twiddle applies per page after)
            vr_t, vi_t = vr_ref[:], vi_ref[:]
            ys_w = ys
            if win_ref is not None:
                wtab = win_ref[:]
                ys_w = [
                    (vr * wtab[q : q + 1], vi * wtab[q : q + 1])
                    for q, (vr, vi) in enumerate(ys)
                ]
            for s, ar, ai in _qdft_pages(ys_w, b, fac):
                pr = vr_t[s : s + 1]
                pi = vi_t[s : s + 1]
                yield s, ar * pr - ai * pi, ar * pi + ai * pr

        if scan:
            t_idx = pl.program_id(1)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (wt, 128), 0)
            # mask the last tile's padding windows (they read real
            # leftover/halo rows and would otherwise pollute the stats)
            valid = (t_idx * wt + row_i) < n_windows
            thr = thr_ref[0]

        best_val = None
        best_j = None
        for s, ar, ai in pages_factored() if fac is not None else pages_direct():
            # stage B: (128w, 128p) @ (128p, 128r); F128 symmetric
            zr = jnp.dot(ar, f1r, precision=p_hi, preferred_element_type=jnp.float32) - jnp.dot(
                ai, f1i, precision=p_hi, preferred_element_type=jnp.float32
            )
            zi = jnp.dot(ar, f1i, precision=p_hi, preferred_element_type=jnp.float32) + jnp.dot(
                ai, f1r, precision=p_hi, preferred_element_type=jnp.float32
            )
            mag = jnp.sqrt(zr * zr + zi * zi)
            if scan:
                # band survey: reduce this page over its window sublanes
                # and accumulate into the per-stream output block, which
                # is revisited across the tile grid axis (norms never
                # leave VMEM).  Counts are f32 — exact to 2^24 windows
                # per chunk, far past any staged chunk.  A (1, 128) lane
                # row is not a legal tile, so rows broadcast to 8
                # sublanes like the search outputs.
                m0 = jnp.where(valid, mag, 0.0)
                srow = jnp.broadcast_to(jnp.sum(m0, axis=0, keepdims=True), (8, 128))
                mrow = jnp.broadcast_to(jnp.max(m0, axis=0, keepdims=True), (8, 128))
                arow = jnp.broadcast_to(
                    jnp.sum(
                        jnp.where(valid & (mag > thr), 1.0, 0.0),
                        axis=0,
                        keepdims=True,
                    ),
                    (8, 128),
                )

                @pl.when(t_idx == 0)
                def _(s=s, srow=srow, mrow=mrow, arow=arow):
                    out_refs[0][0, s] = srow
                    out_refs[1][0, s] = mrow
                    out_refs[2][0, s] = arow

                @pl.when(t_idx > 0)
                def _(s=s, srow=srow, mrow=mrow, arow=arow):
                    out_refs[0][0, s] = out_refs[0][0, s] + srow
                    out_refs[1][0, s] = jnp.maximum(out_refs[1][0, s], mrow)
                    out_refs[2][0, s] = out_refs[2][0, s] + arow

                continue
            if not search:
                out_refs[0][0, 0, s] = mag
                continue
            # per page (windows on SUBLANES, bins on lanes): the lane
            # max and — matching XLA argmax-over-shifted-norms tie
            # order — the smallest fftshifted bin index holding it
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (wt, 128), 1)
            j_page = jnp.remainder(b * r_iota + (s + width // 2), width)
            m_s = jnp.max(mag, axis=1, keepdims=True)  # (W, 1)
            j_s = jnp.min(jnp.where(mag == m_s, j_page, width), axis=1, keepdims=True)
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
            # outputs are (W, 128) blocks with the per-window scalar
            # broadcast across lanes (a (W, 1) lane write is not a legal
            # tile); the epilogue reads lane 0.  (A packed variant —
            # 128 consecutive tiles sharing one revisited output block,
            # each owning lane t % 128 — was A/B'd on hardware and
            # measured a wash: 4815/4950 broadcast vs 4657/5146 packed
            # Msps; the kernel is not HBM-bound, so the 128x write
            # saving buys nothing and the simpler broadcast stays.)
            out_refs[0][0, 0] = jnp.broadcast_to(best_val, (wt, 128))
            # NaN clamp: see the tiled search kernel
            out_refs[1][0, 0] = jnp.broadcast_to(
                jnp.minimum(best_j, width - 1), (wt, 128)
            )

    return kernel


def _fused_waterfall_strided(
    planes: jax.Array,
    spec: WaterfallSpec,
    n_windows: int,
    stride: int,
    interpret: bool,
    search: bool = False,
    scan_thr: jax.Array | None = None,
):
    from jax.experimental import pallas as pl

    width = spec.width
    b = width // 128
    s_r = stride // 128
    s_streams = planes.shape[0]
    fac = _factor_b(b)
    if fac is None:
        # one resident (b^2, 128) complex table T[q*b+s'] of lane rows
        (f1r, f1i), (tr, ti) = _plan_strided(spec)
        tables = [jnp.asarray(tr), jnp.asarray(ti)]
        table_rows = [b * b, b * b]
    else:
        # factorized stage A: the page twiddle V and (windowed) the
        # per-q window rows; the DFT coefficients are baked-in scalars
        (f1r, f1i), (vr, vi), win = _plan_strided_fac(spec)
        tables = [jnp.asarray(vr), jnp.asarray(vi)]
        table_rows = [b, b]
        if win is not None:
            tables.append(jnp.asarray(win))
            table_rows.append(b)

    wt = _pick_win_tile(n_windows)
    tiles = -(-n_windows // wt)
    j_rows = tiles * wt + _HALO_ROWS  # per-class rows incl. halo pad
    need = j_rows * s_r * 128
    n = planes.shape[-1]
    x = planes if n >= need else jnp.pad(planes, ((0, 0), (0, 0), (0, need - n)))
    # class split: rows of 128 -> [j, c, p] -> class-major (no inflation)
    x = x[:, :, :need].reshape(s_streams, 2, j_rows, s_r, 128)
    x = jnp.transpose(x, (1, 0, 3, 2, 4))  # (2, S, s_r, J, 128)

    hb = _HALO_ROWS
    halo = _uses_halo(width, s_r)
    # index maps take *_ so the same specs serve the scan variant's
    # PrefetchScalarGridSpec (which appends the scalar refs)
    in_specs = [
        pl.BlockSpec((1, s_r, wt, 128), lambda si, t, *_: (si, 0, t, 0)),
        pl.BlockSpec((1, s_r, wt, 128), lambda si, t, *_: (si, 0, t, 0)),
        *(
            [
                pl.BlockSpec(
                    (1, s_r, hb, 128), lambda si, t, *_: (si, 0, (t + 1) * (wt // hb), 0)
                )
            ]
            * 2
            if halo
            else []
        ),
        *[
            pl.BlockSpec((rows, 128), lambda si, t, *_: (0, 0))
            for rows in table_rows
        ],
        pl.BlockSpec((128, 128), lambda si, t, *_: (0, 0)),
        pl.BlockSpec((128, 128), lambda si, t, *_: (0, 0)),
    ]
    if search:
        out_specs = [
            pl.BlockSpec((1, 1, wt, 128), lambda si, t: (si, t, 0, 0))
        ] * 2
        out_shape = [
            jax.ShapeDtypeStruct((s_streams, tiles, wt, 128), jnp.float32),
            jax.ShapeDtypeStruct((s_streams, tiles, wt, 128), jnp.int32),
        ]
    else:
        out_specs = pl.BlockSpec((1, 1, b, wt, 128), lambda si, t: (si, t, 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct(
            (s_streams, tiles, b, wt, 128), jnp.float32
        )
    kwargs = {}
    if s_r >= 16 and not interpret:
        # the b=32 tiled-via-strided case needs ~19-22 MB of scoped VMEM
        # (decoded class set + double-buffered blocks); v5e has 128 MB —
        # raise the compiler's 16 MB default cap for the wide shapes
        from jax.experimental.pallas import tpu as pltpu

        params = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
        kwargs["compiler_params"] = params(vmem_limit_bytes=64 * 1024 * 1024)
    operands = (
        x[0],
        x[1],
        *((x[0], x[1]) if halo else ()),
        *tables,
        jnp.asarray(f1r),
        jnp.asarray(f1i),
    )
    if scan_thr is not None:
        # band survey: per-stream (b, 8, 128) stat blocks revisited
        # across the tile grid axis; threshold via scalar prefetch
        from jax.experimental.pallas import tpu as pltpu

        out_specs = [
            pl.BlockSpec((1, b, 8, 128), lambda si, t, *_: (si, 0, 0, 0))
        ] * 3
        out_shape = [
            jax.ShapeDtypeStruct((s_streams, b, 8, 128), jnp.float32)
        ] * 3
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(s_streams, tiles),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        ssum, smax, sabove = pl.pallas_call(
            _kernel_strided(
                spec, s_r, wt=wt, scan=True, n_windows=n_windows
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            **kwargs,
        )(jnp.asarray(scan_thr, jnp.float32).reshape(1), *operands)

        from quadrs_tpu.ops.stft import fftshift

        def to_bins(o):
            # pages carry bin k = s' + b*r: (S, s', lane r) -> k order
            o = jnp.transpose(o[:, :, 0, :], (0, 2, 1)).reshape(s_streams, width)
            return fftshift(o)

        return to_bins(ssum), to_bins(smax), to_bins(sabove)
    out = pl.pallas_call(
        _kernel_strided(spec, s_r, search=search, wt=wt),
        grid=(s_streams, tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*operands)

    if search:
        val, j = out
        val = val[..., 0].reshape(s_streams, tiles * wt)[:, :n_windows]
        idx = j[..., 0].reshape(s_streams, tiles * wt)[:, :n_windows]
        return idx, val

    # pages (s', w, r) -> (w, k) with k = s' + b*r: transpose to
    # (w, r, s') then flatten, one f32 pass like the tiled epilogue
    from quadrs_tpu.ops.stft import fftshift

    norms = jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(
        s_streams, tiles * wt, width
    )[:, :n_windows]
    return fftshift(norms.reshape(s_streams * n_windows, width)).reshape(
        s_streams, n_windows, width
    )


def _contiguous_windows(planes, width: int, stride: int, n_windows: int) -> jnp.ndarray:
    """(S, 2, n) native planes at an arbitrary window ``stride`` ->
    (S, 2, n_windows*width) planes whose windows are CONTIGUOUS, so the
    result is the tiled (stride == width) problem.  Same no-gather
    row-slice construction as the classic pre-arranged path (overlap
    inflates reads by width/stride; skipping strides read less), kept in
    the native dtype so the kernel still does the decode."""
    s_streams = planes.shape[0]
    from quadrs_tpu.ops.fir import _overlapped_frames

    flat = planes.reshape(s_streams * 2, planes.shape[-1])
    frames = _overlapped_frames(flat, stride, width, n_windows)
    return frames.reshape(s_streams, 2, n_windows * width)


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
