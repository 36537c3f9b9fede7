"""Multi-chip execution: time-sharded streaming with ICI halo exchange.

The reference is strictly single-threaded; the TPU-native counterpart
scales the sample stream across a device mesh.  The time axis is
sharded: each chip holds a contiguous slice of the capture, exchanges a
``taps``-sample halo with its right neighbor over ICI (``ppermute``),
and runs the fused decode -> mix -> FIR -> STFT step on its slice.  A
second optional mesh axis shards independent streams (the batched
waterfall / channelizer case), giving dp x sp-style 2-D parallelism.

NCO phase coherence across shards costs nothing: each shard's start
phase is planned exactly on the host (integer reduction mod the sample
rate), so there is no sequential carry between chips — the whole chain
stays embarrassingly parallel except for the halo.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quadrs_tpu.models.receiver import PipelineModel


def make_mesh(n_time: int, n_stream: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if len(devices) < n_time * n_stream:
        raise ValueError(
            f"need {n_time * n_stream} devices, have {len(devices)}"
        )
    grid = devices[: n_time * n_stream].reshape(n_stream, n_time)
    return Mesh(grid, ("stream", "time"))


def make_sharded_stream_step(model: PipelineModel, mesh: Mesh, frontend: str = "xla"):
    """Build the jitted multi-chip streaming step.

    Takes ``raw`` of shape (S, 2, n_local*T) native-dtype planes with
    the time axis sharded (``P('stream', None, 'time')``) and per-shard
    phases ``theta0`` of shape (S, T) sharded ``P('stream', 'time')``;
    returns (S, windows, fft_width) f32 spectrogram rows with the window
    axis sharded over 'time'.

    ``frontend='pallas'`` runs each shard's local compute through the
    fused Pallas frontend (per-shard tile bases are ``theta0 +`` a
    constant exact-angle table, so phase coherence costs one f32 add).

    The last time-shard's halo wraps circularly; its final
    ``ceil((taps + ceil(taps/2)) / (decimate*width))`` windows are
    computed from wrapped data and should be dropped by the caller (the
    host executor does).
    """
    cfg = model.cfg
    # a shard's last FIR output y[i] reads x[i*D + ceil(taps/2) .. +
    # taps-1]; beyond the local n_local samples that needs
    # ceil(taps/2) + taps - D neighbors' samples
    half_up = cfg.taps - cfg.taps // 2
    halo_samps = max(cfg.taps, cfg.taps + half_up - cfg.decimate)
    if cfg.taps // (2 * cfg.decimate) >= cfg.fft_width:
        raise ValueError("fft window shorter than the FIR group delay span")
    n_time = mesh.shape["time"]

    def local_step(raw_local, theta0_local):
        # raw_local: (S_l, 2, n_local) planes; theta0_local: (S_l, 1)
        perm = [(i, (i - 1) % n_time) for i in range(n_time)]
        head = raw_local[:, :, :halo_samps]
        halo = jax.lax.ppermute(head, "time", perm)
        block = jnp.concatenate([raw_local, halo], axis=2)
        if frontend == "pallas":
            n_chunk = block.shape[2]
            # shard-local tile bases relative to the shard start
            deltas = jnp.asarray(model.stream_bases(0, n_chunk))
            bases = theta0_local[:, 0:1] + deltas[None, :]
            return jax.vmap(model.step_stream_pallas)(block, bases)
        return jax.vmap(model.step_stream)(block, theta0_local[:, 0])

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("stream", None, "time"), P("stream", "time")),
        out_specs=P("stream", "time", None),
        # pallas_call doesn't annotate varying-mesh-axes metadata yet;
        # keep the check for the pure-XLA path
        check_vma=(frontend != "pallas"),
    )
    return jax.jit(step)


def plan_shard_phases(model: PipelineModel, n_local: int, n_time: int, n_stream: int = 1):
    """Host-side exact phases for each (stream, time-shard) start offset."""
    offs = np.arange(n_time, dtype=np.int64) * n_local
    theta = model.theta0(offs)
    return np.broadcast_to(theta[None, :], (n_stream, n_time)).copy()


def shard_chunk(raw: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a host array onto the mesh: plane chunks (S, 2, C) shard as
    (stream, -, time); 2-D arrays like the phase table as (stream, time)."""
    spec = P("stream", None, "time") if raw.ndim == 3 else P("stream", "time")
    return jax.device_put(raw, NamedSharding(mesh, spec))
