"""Device meshes and sharding helpers.

TPU-native replacement for the reference's parallelism repertoire
(SURVEY.md 2: torch.nn.DataParallel at detect.py:95-96 and a CPU process
pool at detect_cpu.py:103-187). The model is ~138 K params, so weights are
replicated to every chip and the batch is sharded over a 1-D "data" axis
riding ICI; a 2-D dp x tp mesh is provided for the training step, where the
gate dimension (512) is tensor-sharded.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first N) LOCAL devices: axis "data".

    Local, not global: under a multi-host jax.distributed runtime each host
    classifies its own chunk shard on its own chips (the chunk round-robin
    in runtime/ is the cross-host data parallelism; only summary counters
    cross DCN)."""
    devices = jax.local_devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} local device(s) are visible"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def make_dp_tp_mesh(num_devices: int | None = None, tp: int = 2) -> Mesh:
    """2-D (dp, tp) mesh over LOCAL devices (see make_data_mesh); tp falls
    back to 1 if it does not divide the count."""
    devices = jax.local_devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} local device(s) are visible"
            )
        devices = devices[:num_devices]
    n = len(devices)
    if n % tp != 0:
        tp = 1
    return Mesh(np.asarray(devices).reshape(n // tp, tp), ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the given mesh axis."""
    return NamedSharding(mesh, P(axis))
