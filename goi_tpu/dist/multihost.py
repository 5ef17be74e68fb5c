"""Multi-host (multi-process) wiring: jax.distributed + global meshes.

The reference is single-process/single-GPU (SURVEY.md §2.3); scaling
past one host is new TPU-native capability. A multi-host run is N
identical processes (one per host), each seeing only its local chips;
`jax.distributed.initialize` stitches them into one global device list,
and the SAME mesh/shard_map code from goi_tpu.dist then spans hosts —
XLA routes the collectives over ICI within a slice and DCN across
slices.

Launch pattern (one command per host):

  GOI_COORD=host0:8476 GOI_NUM_PROCS=2 GOI_PROC_ID=<0|1> \\
      python train.py ...   # call init_multihost() first

Verified by tests/test_multihost.py: two local CPU processes, 4 virtual
devices each, form one 8-device mesh and produce bitwise-identical
sharded render/training results to the single-process run.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_ids=None) -> bool:
    """Initialize jax.distributed from args or GOI_COORD / GOI_NUM_PROCS
    / GOI_PROC_ID env vars (falling back to JAX's own auto-detection on
    TPU pods, where initialize() needs no arguments). Returns True if a
    multi-process runtime was initialized, False for single-process."""
    coord = coordinator_address or os.environ.get("GOI_COORD")
    nproc = num_processes if num_processes is not None else \
        int(os.environ.get("GOI_NUM_PROCS", "0") or 0)
    pid = process_id if process_id is not None else \
        int(os.environ.get("GOI_PROC_ID", "-1"))
    if coord is None and nproc == 0:
        try:  # TPU pod slice: env provides everything
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc,
        process_id=pid, local_device_ids=local_device_ids)
    return True


def make_global_mesh(n_data: int = 1,
                     n_model: Optional[int] = None) -> Mesh:
    """('data', 'model') mesh over ALL processes' devices, laid out so
    the 'model' axis stays within a host where possible (its all-gather
    / reduce-scatter traffic is the heavy one -> keep it on ICI; 'data'
    only all-reduces gradients once per step -> it can ride DCN)."""
    devices = jax.devices()
    n_model = n_model or (len(devices) // n_data)
    assert n_data * n_model <= len(devices)
    dev = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev, ("data", "model"))


def replicate_to_global(x, mesh: Mesh):
    """Host-replicated array -> global replicated jax.Array on `mesh`
    (every process must pass the same values)."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(x))


def shard_rows_global(x, mesh: Mesh, axis: str = "model"):
    """Host-replicated (N, ...) array -> globally row-sharded
    jax.Array. Every process passes the FULL array; each device keeps
    only its rows."""
    x = np.asarray(x)
    sharding = NamedSharding(
        mesh, P(axis, *([None] * (x.ndim - 1))))
    n_shards = mesh.shape[axis]
    assert x.shape[0] % n_shards == 0, (x.shape, n_shards)
    arrays = []
    for d in sharding.addressable_devices:
        idx = sharding.addressable_devices_indices_map(x.shape)[d]
        arrays.append(jax.device_put(x[idx], d))
    return jax.make_array_from_single_device_arrays(
        x.shape, sharding, arrays)


def shard_scene_global(scene, mesh: Mesh):
    """Multi-host version of dist.mesh.shard_scene: every process holds
    the full host-side scene; each device receives only its Gaussian
    rows."""
    arrays = {}
    for name in (*type(scene).PARAM_FIELDS, "valid"):
        arrays[name] = shard_rows_global(getattr(scene, name), mesh)
    return scene.replace(**arrays)


def local_camera_indices(num_cameras: int) -> list:
    """Round-robin camera split across processes: each host loads only
    its own images/feature maps (per-host data loading; the reference
    loads everything into one process, ref:scene/dataset_readers.py)."""
    return list(range(jax.process_index(), num_cameras,
                      jax.process_count()))
