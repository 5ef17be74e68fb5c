"""Camera model and projective math.

Conventions: we store matrices in standard math form (column-vector
convention, `p' = M @ [p;1]`). The reference stores the *transposes*
(row-vector convention) and its CUDA kernels index the transposed
buffers so the math is identical (ref:scene/cameras.py:45-48,
cuda_rasterizer/auxiliary.h:58-77).

- `world_view`: world -> camera (W2C) 4x4, from getWorld2View2
  (ref:utils/graphics_utils.py:38-49).
- `projection`: the reference's perspective matrix
  (ref:utils/graphics_utils.py:51-71). NOTE it maps view z to
  z' = zfar*(z - znear)/(zfar - znear) with w' = z, not standard GL.
- `full_proj = projection @ world_view`.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def get_world2view(R: np.ndarray, t: np.ndarray,
                   translate=np.zeros(3), scale: float = 1.0) -> np.ndarray:
    """W2C from COLMAP-style (R, t) with optional recentring/rescaling of
    the camera center (ref:utils/graphics_utils.py:38-49). `R` is the
    cam-to-world rotation (COLMAP qvec convention: its transpose rows fill
    W2C), `t` the W2C translation."""
    Rt = np.zeros((4, 4), np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    center = (c2w[:3, 3] + translate) * scale
    c2w[:3, 3] = center
    return np.float32(np.linalg.inv(c2w))


def get_projection_matrix(znear: float, zfar: float,
                          fovx: float, fovy: float) -> np.ndarray:
    """Perspective matrix matching ref:utils/graphics_utils.py:51-71."""
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Device-side camera: everything the rasterizer needs, as arrays so a
    batch of cameras can be vmapped / sharded. Image payloads (gt image,
    semantic feature maps) are kept separately by the data pipeline."""

    world_view: jax.Array      # (4, 4) W2C
    full_proj: jax.Array       # (4, 4) projection @ W2C
    camera_center: jax.Array   # (3,)
    tan_fovx: jax.Array        # scalar
    tan_fovy: jax.Array        # scalar
    width: int = dataclasses.field(default=0, metadata=dict(static=True))
    height: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)

    @staticmethod
    def from_Rt(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int, znear: float = 0.01,
                zfar: float = 100.0, translate=np.zeros(3),
                scale: float = 1.0) -> "Camera":
        """Build from COLMAP-style extrinsics, matching ref:scene/cameras.py:39-48."""
        w2c = get_world2view(R, t, translate, scale)
        proj = get_projection_matrix(znear, zfar, fovx, fovy)
        full = proj @ w2c
        center = np.linalg.inv(w2c)[:3, 3]
        return Camera(
            world_view=jnp.asarray(w2c),
            full_proj=jnp.asarray(full),
            camera_center=jnp.asarray(np.float32(center)),
            tan_fovx=jnp.float32(math.tan(fovx * 0.5)),
            tan_fovy=jnp.float32(math.tan(fovy * 0.5)),
            width=int(width),
            height=int(height),
        )

    @staticmethod
    def look_at(eye, target, up, fovx: float, fovy: float,
                width: int, height: int) -> "Camera":
        """Convenience constructor for tests/synthetic scenes."""
        eye = np.asarray(eye, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        # W2C rows: camera x=right, y=down, z=forward (COLMAP convention).
        Rw2c = np.stack([right, down, fwd], axis=0)
        t = -Rw2c @ eye
        # from_Rt expects R = (W2C rot)^T.
        return Camera.from_Rt(Rw2c.T, t, fovx, fovy, width, height)


def ndc2pix(v, size):
    """NDC [-1,1] -> continuous pixel coordinate
    (ref:cuda_rasterizer/auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(xyz: jax.Array, cam: Camera):
    """Project world points. Returns (p_proj ndc (N,3), p_view (N,3)).

    Matches transformPoint4x4 + w-division with the reference's 1e-7
    epsilon (ref:cuda_rasterizer/forward.cu:197-200) and
    transformPoint4x3 for the view transform."""
    ones = jnp.ones_like(xyz[..., :1])
    hom = jnp.concatenate([xyz, ones], axis=-1)
    p_clip = hom @ cam.full_proj.T
    p_w = 1.0 / (p_clip[..., 3:4] + 1e-7)
    p_proj = p_clip[..., :3] * p_w
    p_view = hom @ cam.world_view[:3].T
    return p_proj, p_view
