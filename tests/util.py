"""Test helpers for tunneled-TPU quirks."""

import jax
import jax.numpy as jnp
import numpy as np


def to_device_complex(x: np.ndarray) -> jax.Array:
    """Move a host complex array to the device via f32 planes
    (complex host<->device transfers are unimplemented on axon)."""
    x = np.asarray(x, dtype=np.complex64)
    return jax.lax.complex(
        jnp.asarray(np.ascontiguousarray(x.real)),
        jnp.asarray(np.ascontiguousarray(x.imag)),
    )


def from_device_complex(a: jax.Array) -> np.ndarray:
    """Fetch a device complex array as numpy via f32 planes."""
    re = np.asarray(jnp.real(a))
    im = np.asarray(jnp.imag(a))
    out = np.empty(re.shape, dtype=np.complex64)
    out.real = re
    out.imag = im
    return out


def on_tpu() -> bool:
    return jax.devices()[0].platform != "cpu"
