"""Camera/image/feature loading utilities.

Equivalent of ref:utils/camera_utils.py:28-79 (resolution policy,
>1.6k auto-downscale warning) and the per-camera feature loading of
ref:scene/dataset_readers.py:98-102. Feature maps are stored either as
torch .pt files (the reference's offline APE extraction, README:66-74)
or as .npy; torch (CPU) is only imported when a .pt is actually read.
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional, Tuple

import numpy as np

from goi_tpu.core.camera import Camera
from goi_tpu.data.readers import CameraInfo

_WARNED = [False]


def resolve_resolution(width: int, height: int, resolution: int = -1
                       ) -> Tuple[int, int]:
    """Reference resolution policy (ref:utils/camera_utils.py:31-60):
    resolution > 0 divides; -1 auto-downscales so width <= 1600."""
    if resolution in (1, 2, 4, 8):
        scale = resolution
    elif resolution == -1:
        if width > 1600:
            if not _WARNED[0]:
                warnings.warn(
                    "Encountered quite large input images (>1.6K "
                    "pixels width), rescaling to 1.6K. If this is not "
                    "desired, please explicitly specify '--resolution/-r'"
                    " as 1")
                _WARNED[0] = True
            scale = width / 1600
        else:
            scale = 1
    else:
        scale = resolution
    return round(width / scale), round(height / scale)


def build_cameras(infos: List[CameraInfo], resolution: int = -1
                  ) -> List[Camera]:
    return [
        Camera.from_Rt(
            c.R, c.T, c.fovx, c.fovy,
            *resolve_resolution(c.width, c.height, resolution))
        for c in infos
    ]


def load_image(info: CameraInfo, resolution: int = -1) -> np.ndarray:
    """(3, H, W) float32 in [0,1], resized per the resolution policy."""
    from PIL import Image
    w, h = resolve_resolution(info.width, info.height, resolution)
    with Image.open(info.image_path) as im:
        im = im.convert("RGB").resize((w, h), Image.LANCZOS)
        arr = np.asarray(im, np.float32) / 255.0
    return np.clip(arr.transpose(2, 0, 1), 0.0, 1.0)


def load_feature_map(path: str) -> Optional[np.ndarray]:
    """Load an offline-extracted (C, H, W) feature map (.pt or .npy)."""
    if path is None or not os.path.exists(path):
        npy = path and (os.path.splitext(path)[0] + ".npy")
        if npy and os.path.exists(npy):
            return np.asarray(np.load(npy), np.float32)
        return None
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)
    import torch  # CPU-only torch, used purely as a .pt deserializer

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t.float().numpy(), np.float32)
