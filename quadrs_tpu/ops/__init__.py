from quadrs_tpu.ops.fir import lowpass_taps, fir_decimate
from quadrs_tpu.ops.stft import stft_norms, blackman_harris_window, dft_matrix

__all__ = [
    "lowpass_taps",
    "fir_decimate",
    "stft_norms",
    "blackman_harris_window",
    "dft_matrix",
]
