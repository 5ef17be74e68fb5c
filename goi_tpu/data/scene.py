"""Scene orchestration: dataset + Gaussian state + checkpoint layout.

Role of ref:scene/__init__.py:11-83 and the directory convention
`model_path/point_cloud/iteration_<N>/` with max-iteration search
(ref:utils/system_utils.py:26-28). Artifacts keep the reference's
formats: point_cloud.ply (bit-compatible, incl. sem_*), semantic
decoder + LUT alongside it.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from goi_tpu.configs.params import ModelParams
from goi_tpu.core.camera import Camera, get_world2view
from goi_tpu.core.ply import load_gaussians_ply, save_gaussians_ply
from goi_tpu.core.scene import GaussianScene
from goi_tpu.data.dataset import build_cameras
from goi_tpu.data.readers import SceneInfo, load_scene_info


def search_max_iteration(folder: str) -> Optional[int]:
    """(ref:utils/system_utils.py:26-28)."""
    if not os.path.isdir(folder):
        return None
    its = [int(d.split("_")[-1]) for d in os.listdir(folder)
           if d.startswith("iteration_")]
    return max(its) if its else None


class Scene:
    """Loads dataset + Gaussians; owns the checkpoint directory."""

    def __init__(self, params: ModelParams,
                 load_iteration: Optional[int] = None,
                 capacity: Optional[int] = None,
                 load_sem: bool = True):
        self.params = params
        self.model_path = params.model_path
        self.info: SceneInfo = load_scene_info(
            params.source_path, images=params.images,
            eval_split=params.eval,
            white_background=params.white_background, load_sem=load_sem)
        self.train_cameras: List[Camera] = build_cameras(
            self.info.train_cameras, params.resolution)
        self.test_cameras: List[Camera] = build_cameras(
            self.info.test_cameras, params.resolution)
        self.cameras_extent = self.info.nerf_normalization["radius"]

        self.loaded_iter = None
        if load_iteration is not None:
            self.loaded_iter = (
                search_max_iteration(
                    os.path.join(self.model_path, "point_cloud"))
                if load_iteration == -1 else load_iteration)

        if self.loaded_iter is not None:
            ply = os.path.join(self.model_path, "point_cloud",
                               f"iteration_{self.loaded_iter}",
                               "point_cloud.ply")
            self.gaussians = load_gaussians_ply(
                ply, sh_degree=params.sh_degree, sem_dim=params.sem_dim,
                capacity=capacity)
        else:
            self.gaussians = self._create_from_pcd(capacity)
            self._export_inputs()

    def _create_from_pcd(self, capacity: Optional[int]) -> GaussianScene:
        """create_from_pcd with the reference's 4x subsample and mean
        3-NN scale init (ref:scene/gaussian_model.py:133-161)."""
        from goi_tpu.knn.knn import init_scales_from_points

        pcd = self.info.point_cloud
        if pcd is None:
            raise FileNotFoundError(
                f"no input point cloud for {self.params.source_path}")
        pts = np.asarray(pcd["points"])[::4]
        cols = np.asarray(pcd["colors"])[::4]
        # reference computes knn distances on the UNsubsampled cloud
        scales = init_scales_from_points(
            np.asarray(pcd["points"]))[::4]
        return GaussianScene.create(
            pts, cols, sh_degree=self.params.sh_degree,
            sem_dim=self.params.sem_dim, scales=scales,
            capacity=capacity)

    def _export_inputs(self):
        """input.ply + cameras.json export (ref:scene/__init__.py:41-53)."""
        if not self.model_path:
            return
        os.makedirs(self.model_path, exist_ok=True)
        cams = []
        for i, c in enumerate(self.info.train_cameras):
            w2c = get_world2view(c.R, c.T)
            c2w = np.linalg.inv(w2c)
            cams.append({
                "id": i, "img_name": c.image_name,
                "width": c.width, "height": c.height,
                "position": c2w[:3, 3].tolist(),
                "rotation": c2w[:3, :3].tolist(),
                "fx": float(c.width / (2 * np.tan(c.fovx / 2))),
                "fy": float(c.height / (2 * np.tan(c.fovy / 2))),
            })
        with open(os.path.join(self.model_path, "cameras.json"),
                  "w") as f:
            json.dump(cams, f)

    def save(self, iteration: int, decoder=None, lut=None) -> str:
        """PLY + decoder + LUT triplet (ref:train.py:184-189)."""
        out_dir = os.path.join(self.model_path, "point_cloud",
                               f"iteration_{iteration}")
        os.makedirs(out_dir, exist_ok=True)
        save_gaussians_ply(os.path.join(out_dir, "point_cloud.ply"),
                           self.gaussians)
        if decoder is not None:
            decoder.save(os.path.join(out_dir, "semantic_MLP.pt"))
        if lut is not None:
            np.save(os.path.join(out_dir, "LUT.npy"), np.asarray(lut))
        return out_dir

    @staticmethod
    def load_semantics(out_dir: str):
        """Load the (decoder, LUT) pair saved by `save`."""
        from goi_tpu.semantic.codebook import SemanticDecoder
        import jax.numpy as jnp

        decoder = SemanticDecoder.load(
            os.path.join(out_dir, "semantic_MLP.pt"))
        lut = jnp.asarray(np.load(os.path.join(out_dir, "LUT.npy")))
        return decoder, lut
