from goi_tpu.data.readers import (SceneInfo, CameraInfo, load_scene_info,
                                  get_nerfpp_norm)
from goi_tpu.data.dataset import build_cameras, load_feature_map

__all__ = ["SceneInfo", "CameraInfo", "load_scene_info",
           "get_nerfpp_norm", "build_cameras", "load_feature_map"]
