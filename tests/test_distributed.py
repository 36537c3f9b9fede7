"""Multi-host execution: jax.distributed processes joined over a global
mesh, the sharded streaming step spanning them, with the halo ppermute
crossing process boundaries (SURVEY §5 "Distributed communication
backend").

The harness is the driver artifact itself — ``__graft_entry__`` spawns
the workers and each verifies its addressable output shards against a
locally computed single-device reference through BOTH frontends (see
``_dryrun_check(global_arrays=True)``).  The mesh is pure time-sharding,
so shard ``n_local-1`` (last device of process 0) receives its halo from
shard ``n_local`` (first device of process 1): a pass proves the
exchange crossed the process boundary (Gloo transport on this CPU rig).
"""

import importlib.util
import pathlib

import pytest


def _graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry_dist", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("n_devices,n_processes", [(4, 2), (6, 3), (16, 4)])
def test_multiprocess_sharded_step(n_devices, n_processes):
    """(16, 4) is the wide-soak configuration: a 16-device mesh split 4
    devices per process — the overlapped-waterfall halo, the stream halo
    and the mid-capture sharded resume all cross process boundaries."""
    _graft().dryrun_multichip(n_devices, n_processes=n_processes)
