"""GOI-TPU: a TPU-native open-vocabulary 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Quyans/GOI-Hyperplane (3DGS + distilled semantic field + optimizable
semantic-space hyperplane), built TPU-first:

- the differentiable rasterizer is a tile-binned, depth-sorted alpha
  blender expressed as XLA ops + Pallas kernels with deterministic
  segment-sum gradients (no atomics),
- model state is a pytree (`GaussianScene`) optimized with optax,
- multi-chip scaling uses `jax.sharding.Mesh` + shard_map with XLA
  collectives over ICI (camera data-parallel + Gaussian model-parallel).

Reference behavior citations throughout the source point into the
upstream CUDA/torch implementation as `ref:<file>:<lines>`.
"""

__version__ = "0.1.0"

from goi_tpu.core.scene import GaussianScene  # noqa: F401
from goi_tpu.core.camera import Camera  # noqa: F401
