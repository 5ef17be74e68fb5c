"""Gaussian scene state as a JAX pytree.

TPU-first equivalent of the reference parameter store
(ref:scene/gaussian_model.py:33-127): raw (pre-activation) parameters live
in one flat struct so the whole scene can be jit-ed, sharded with
`jax.sharding`, and optimized with optax. Because XLA requires static
shapes, the scene carries a fixed capacity `N` plus a boolean validity
mask; densify/clone/split/prune write into spare capacity and flip mask
bits instead of reallocating (host-side compaction happens between jit
steps).

Activations match the reference exactly:
  scaling  = exp(_scaling)                (ref:scene/gaussian_model.py:22)
  opacity  = sigmoid(_opacity)            (ref:scene/gaussian_model.py:27)
  rotation = l2-normalize(_rotation)      (ref:scene/gaussian_model.py:30)
  features = concat(dc, rest) SH coeffs   (ref:scene/gaussian_model.py:103-106)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianScene:
    """All per-Gaussian parameters, pre-activation, shape-leading N.

    xyz:           (N, 3)  world positions
    features_dc:   (N, 1, 3)  SH DC coefficients
    features_rest: (N, (deg+1)^2 - 1, 3)  higher-order SH coefficients
    semantics:     (N, S)  low-dim semantic features (S = sem_dim, def. 10)
    scaling:       (N, 3)  log-scales
    rotation:      (N, 4)  unnormalized quaternions (w, x, y, z)
    opacity:       (N, 1)  opacity logits
    valid:         (N,)    capacity mask; invalid rows never rasterize
    """

    xyz: jax.Array
    features_dc: jax.Array
    features_rest: jax.Array
    semantics: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array
    valid: jax.Array

    # ---- static (aux) metadata ----
    active_sh_degree: int = dataclasses.field(default=0, metadata=dict(static=True))
    max_sh_degree: int = dataclasses.field(default=3, metadata=dict(static=True))

    # trainable leaves, in reference param-group order
    # (ref:scene/gaussian_model.py:168-176)
    PARAM_FIELDS = ("xyz", "features_dc", "features_rest", "semantics",
                    "opacity", "scaling", "rotation")

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def params(self) -> dict:
        """Trainable float leaves as a dict (for grads/optax); excludes
        the bool validity mask and static metadata."""
        return {k: getattr(self, k) for k in self.PARAM_FIELDS}

    def with_params(self, p: dict) -> "GaussianScene":
        return dataclasses.replace(self, **p)

    @property
    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @property
    def sem_dim(self) -> int:
        return self.semantics.shape[-1]

    # ---- activations (match reference semantics) ----
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self) -> jax.Array:
        # clamp the SQUARED norm: for |q| ~ 1e-30 the square underflows
        # to 0 in fp32 and sqrt's VJP at 0 is inf -> NaN gradients
        n2 = jnp.sum(self.rotation * self.rotation, axis=-1,
                     keepdims=True)
        return self.rotation / jnp.sqrt(jnp.maximum(n2, 1e-24))

    def get_features(self) -> jax.Array:
        """(N, (deg+1)^2, 3) stacked SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_semantics(self, masks: Optional[jax.Array] = None) -> jax.Array:
        """Semantic features, optionally gated by a per-Gaussian mask
        (ref:scene/gaussian_model.py:108-123 set_semantic_masks)."""
        if masks is None:
            return self.semantics
        return self.semantics * masks[:, None]

    def get_covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """(N, 6) upper-triangular world covariance, packed
        (xx, xy, xz, yy, yz, zz) — matches CUDA cov3D packing
        (ref:cuda_rasterizer/forward.cu:118-152)."""
        return build_cov3d(
            self.get_scaling() * scaling_modifier, self.get_rotation()
        )

    def one_up_sh_degree(self) -> "GaussianScene":
        if self.active_sh_degree < self.max_sh_degree:
            return dataclasses.replace(
                self, active_sh_degree=self.active_sh_degree + 1
            )
        return self

    def replace(self, **kw) -> "GaussianScene":
        return dataclasses.replace(self, **kw)

    # ---- construction ----
    @staticmethod
    def create(
        xyz: np.ndarray,
        colors: Optional[np.ndarray] = None,
        *,
        sh_degree: int = 3,
        sem_dim: int = 10,
        scales: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        dtype=jnp.float32,
    ) -> "GaussianScene":
        """Initialize from a point cloud, mirroring create_from_pcd
        (ref:scene/gaussian_model.py:133-161): colors -> SH DC via RGB2SH,
        isotropic log-scales from mean 3-NN distance (caller supplies
        `scales` as sqrt(mean dist^2); default 0.01), identity quats,
        opacity logit of 0.1."""
        from goi_tpu.core.sh import rgb_to_sh

        n = xyz.shape[0]
        cap = capacity or n
        assert cap >= n
        n_rest = (sh_degree + 1) ** 2 - 1

        def pad(a, fill=0.0):
            if a.shape[0] == cap:
                return a
            pad_width = [(0, cap - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, pad_width, constant_values=fill)

        xyz = np.asarray(xyz, np.float32)
        if colors is None:
            colors = np.zeros_like(xyz) + 0.5
        f_dc = rgb_to_sh(np.asarray(colors, np.float32))[:, None, :]
        f_rest = np.zeros((n, n_rest, 3), np.float32)
        sems = np.zeros((n, sem_dim), np.float32)
        if scales is None:
            scales = np.full((n,), 0.01, np.float32)
        log_scales = np.log(np.asarray(scales, np.float32))[:, None].repeat(3, 1)
        rots = np.zeros((n, 4), np.float32)
        rots[:, 0] = 1.0
        opa = np.full((n, 1), float(np.log(0.1 / 0.9)), np.float32)
        valid = np.zeros((cap,), bool)
        valid[:n] = True

        return GaussianScene(
            xyz=jnp.asarray(pad(xyz), dtype),
            features_dc=jnp.asarray(pad(f_dc), dtype),
            features_rest=jnp.asarray(pad(f_rest), dtype),
            semantics=jnp.asarray(pad(sems), dtype),
            scaling=jnp.asarray(pad(log_scales, fill=-10.0), dtype),
            rotation=jnp.asarray(pad(rots), dtype),
            opacity=jnp.asarray(pad(opa, fill=-20.0), dtype),
            valid=jnp.asarray(valid),
            active_sh_degree=0,
            max_sh_degree=sh_degree,
        )


def build_rotation_matrix(q: jax.Array) -> jax.Array:
    """Quaternion (w,x,y,z) -> (…,3,3) rotation matrix.

    Same formula as the CUDA kernel (ref:cuda_rasterizer/forward.cu:134-138)
    and utils/general_utils.py:build_rotation. Expects normalized quats.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """World covariance Sigma = R diag(s^2) R^T, packed upper-triangular
    (xx, xy, xz, yy, yz, zz) as in ref:cuda_rasterizer/forward.cu:140-152."""
    R = build_rotation_matrix(quats)  # (..., 3, 3)
    # Sigma = (R * s^2) @ R^T, with s broadcast over columns of R.
    RS = R * (scales[..., None, :] ** 2)
    sigma = jnp.einsum("...ik,...jk->...ij", RS, R)
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )
