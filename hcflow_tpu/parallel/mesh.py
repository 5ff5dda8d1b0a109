"""Device mesh + sharding utilities: the TPU-native replacement for DDP/NCCL.

The reference's parallelism is single-strategy data parallelism via
DistributedDataParallel over NCCL (SURVEY.md section 2.7; dist_util.py:10-58).  Here the
same capability is a 1-D (or 2-D) ``jax.sharding.Mesh``:

- batch axis sharded over 'data' (ICI); XLA inserts the gradient all-reduce,
- optional 'spatial' axis sharding image H for huge-image inference — the convnet
  analogue of context/sequence parallelism (XLA SPMD handles conv halo exchange),
- multi-host: ``jax.distributed.initialize()`` + per-host data sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if mesh_shape is not None:
        arr = np.array(devices[:n]).reshape(tuple(mesh_shape))
    elif len(axis_names) == 1:
        arr = np.array(devices[:n])
    else:
        # 2-D mesh: fill 'data' major, 'spatial' minor (spatial stays intra-host/ICI)
        spatial = 2 if n % 2 == 0 else 1
        arr = np.array(devices[:n]).reshape(n // spatial, spatial)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded over the 'data' axis; replicated otherwise."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch over 'data', image height over 'spatial' (huge-image inference)."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def init_distributed() -> tuple[int, int]:
    """Multi-host (DCN) init; returns (process_index, process_count).

    Rendezvous from JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES / JAX_PROCESS_ID
    when the launcher provides them — auto-detected on managed clusters), the
    analogue of the reference's torchrun/SLURM env rendezvous (dist_util.py:21-58).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if addr:
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0
