"""Device mesh construction and sharding rules.

The reference is single-GPU (SURVEY.md §2.3); distribution is new,
TPU-native capability:

- axis 'data'  : camera batch data-parallelism (DP)
- axis 'model' : Gaussian-primitive parameter sharding (TP analog) —
  each device owns a contiguous slice of the (capacity-padded) Gaussian
  arrays; XLA/GSPMD inserts all-gathers for the render and
  reduce-scatters for parameter gradients over ICI.

Multi-host: `jax.distributed.initialize()` then the same mesh spans all
processes (DCN between hosts handled by XLA).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from goi_tpu.core.scene import GaussianScene


def make_mesh(n_data: int = 1, n_model: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_model = n_model or (len(devices) // n_data)
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def scene_sharding(mesh: Mesh) -> GaussianScene:
    """Per-leaf NamedSharding: every per-Gaussian array sharded on its
    leading (N) axis over 'model', replicated over 'data'."""
    row = NamedSharding(mesh, P("model"))
    return GaussianScene(
        xyz=row, features_dc=row, features_rest=row, semantics=row,
        scaling=row, rotation=row, opacity=row, valid=row,
        active_sh_degree=0, max_sh_degree=0)


def shard_scene(scene: GaussianScene, mesh: Mesh) -> GaussianScene:
    """Place a (host or single-device) scene onto the mesh. Capacity must
    be divisible by the 'model' axis size; pad_capacity first if not."""
    n_model = mesh.shape["model"]
    cap = scene.capacity
    assert cap % n_model == 0, (
        f"capacity {cap} not divisible by model axis {n_model}; "
        f"pad the scene (GaussianScene capacity padding) first")
    sh = scene_sharding(mesh)
    arrays = {
        f.name: jax.device_put(getattr(scene, f.name),
                               getattr(sh, f.name))
        for f in type(scene).__dataclass_fields__.values()
        if f.name not in ("active_sh_degree", "max_sh_degree")
    }
    return scene.replace(**arrays)
