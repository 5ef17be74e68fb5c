from goi_tpu.utils.image import (turbo_colormap, clip_color, apply_mask,
                                 compute_mask_ratio, calculate_iou,
                                 write_video)
from goi_tpu.utils.pose import interpolate_poses, slerp

__all__ = ["turbo_colormap", "clip_color", "apply_mask",
           "compute_mask_ratio", "calculate_iou", "write_video",
           "interpolate_poses", "slerp"]
