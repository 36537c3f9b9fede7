"""Short-time FFT kernels: batched DFT, fftshift, window functions.

The reference runs rustfft's forward transform (standard unnormalized
DFT, negative exponent) per strided window (``src/fft.rs:25-32``,
``src/ffts.rs:25``) and displays fftshifted magnitudes
(``src/fft.rs:48-52``).

On TPU, small-width FFTs over large batches are fastest as a dense DFT
matmul on the MXU (a width-W DFT is a ``(B, W) @ (W, W)`` complex
matmul; for the widths sparkfft uses, 4..1024, the systolic array beats
a butterfly network).  Larger widths fall back to XLA's native FFT.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

TAU = 2.0 * math.pi

# Widths up to this run as an MXU matmul; beyond it, XLA FFT.
_DFT_MATMUL_MAX_WIDTH = 1024


@functools.lru_cache(maxsize=32)
def _dft_matrix_np(width: int) -> np.ndarray:
    k = np.arange(width, dtype=np.float64)
    w = np.exp(-2j * np.pi * np.outer(k, k) / width)
    return w.astype(np.complex64)


def dft_matrix(width: int) -> np.ndarray:
    """The ``W x W`` forward DFT matrix (complex64, computed in f64)."""
    return _dft_matrix_np(width)


def batched_fft(x: jnp.ndarray, *, impl: str = "auto") -> jnp.ndarray:
    """Forward DFT along the last axis of a complex64 batch."""
    width = x.shape[-1]
    if impl == "auto":
        impl = "matmul" if width <= _DFT_MATMUL_MAX_WIDTH else "xla"

    if impl == "xla":
        return jnp.fft.fft(x).astype(jnp.complex64)

    if impl == "matmul":
        f = _dft_matrix_np(width)
        fr = jnp.asarray(f.real)
        fi = jnp.asarray(f.imag)
        xr, xi = x.real, x.imag
        p = jax.lax.Precision.HIGHEST
        # X = x @ F^T, F symmetric so F^T == F.
        re = jnp.matmul(xr, fr, precision=p) - jnp.matmul(xi, fi, precision=p)
        im = jnp.matmul(xr, fi, precision=p) + jnp.matmul(xi, fr, precision=p)
        return (re + 1j * im).astype(jnp.complex64)

    raise ValueError(f"unknown fft impl: {impl}")


def fftshift(x: jnp.ndarray) -> jnp.ndarray:
    """Swap halves along the last axis (``src/fft.rs:48-52`` semantics)."""
    half = x.shape[-1] // 2
    return jnp.concatenate([x[..., half:], x[..., :half]], axis=-1)


def stft_norms(
    x: jnp.ndarray,
    *,
    window: np.ndarray | None = None,
    shift: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Magnitudes of the DFT of each row: the sparkfft/take_fft hot path.

    ``x``: (B, W) complex64 windows.  Returns (B, W) f32 norms,
    fftshifted unless ``shift=False``.

    The magnitude is ``sqrt(re² + im²)`` computed on real planes — on
    v5e this is ~1.6x the whole non-decimating chain vs ``jnp.abs`` of
    a materialized complex spectrum (XLA's complex abs lowers to the
    overflow-safe hypot).  The plain form matches hypot to 1 ulp for
    spectra below ~1e18, far above any real capture; the reference's
    ``Complex::norm`` is hypot, and the glyph-exactness suites pass
    either way.
    """
    if window is not None:
        x = x * jnp.asarray(np.asarray(window, dtype=np.float32))
    width = x.shape[-1]
    if impl == "auto":
        impl = "matmul" if width <= _DFT_MATMUL_MAX_WIDTH else "xla"

    if impl == "matmul":
        f = _dft_matrix_np(width)
        fr = jnp.asarray(f.real)
        fi = jnp.asarray(f.imag)
        xr, xi = x.real, x.imag
        p = jax.lax.Precision.HIGHEST
        rr = jnp.matmul(xr, fr, precision=p) - jnp.matmul(xi, fi, precision=p)
        ri = jnp.matmul(xr, fi, precision=p) + jnp.matmul(xi, fr, precision=p)
    else:
        spec = jnp.fft.fft(x)
        rr, ri = jnp.real(spec), jnp.imag(spec)
    if shift:
        rr, ri = fftshift(rr), fftshift(ri)
    return jnp.sqrt(rr * rr + ri * ri).astype(jnp.float32)


def blackman_harris_window(n: int) -> np.ndarray:
    """4-term Blackman-Harris window, f32 (``src/ffts.rs:110-119``)."""
    i = np.arange(n, dtype=np.float32)
    x = np.float32(TAU) * i / np.float32(n - 1)
    return (
        np.float32(0.35875)
        - np.float32(0.48829) * np.cos(x)
        + np.float32(0.14128) * np.cos(np.float32(2.0) * x)
        - np.float32(0.01168) * np.cos(np.float32(3.0) * x)
    ).astype(np.float32)
