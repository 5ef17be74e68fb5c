from goi_tpu.core.scene import GaussianScene
from goi_tpu.core.camera import Camera

__all__ = ["GaussianScene", "Camera"]
