"""Training checkpoint save/restore.

Role of the reference's full-checkpoint mechanism (gaussians.capture()
-> chkpnt<N>.pth, restore incl. optimizer state; ref:train.py:71-73,
200-202, scene/gaussian_model.py:54-88). Internally uses Orbax for the
pytree payload (the TPU-native checkpoint stack); the PLY remains the
interchange format for model weights (goi_tpu/core/ply.py).

States (DistillState / RGBTrainState / any registered dataclass pytree)
round-trip as (arrays via orbax) + (treedef/static metadata via pickle).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, TypeVar

import jax
import numpy as np

T = TypeVar("T")


def save_checkpoint(path: str, state: Any) -> str:
    """Write a checkpoint directory at `path` (created/overwritten)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    leaves, treedef = jax.tree.flatten(state)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "arrays"),
              [np.asarray(leaf) for leaf in leaves], force=True)
    with open(os.path.join(path, "treedef.pkl"), "wb") as f:
        pickle.dump(treedef, f)
    return path


def load_checkpoint(path: str) -> Any:
    """Restore the exact pytree saved by save_checkpoint."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "treedef.pkl"), "rb") as f:
        treedef = pickle.load(f)
    ckpt = ocp.PyTreeCheckpointer()
    leaves = ckpt.restore(os.path.join(path, "arrays"))
    return jax.tree.unflatten(
        treedef, [jnp.asarray(x) for x in leaves])
