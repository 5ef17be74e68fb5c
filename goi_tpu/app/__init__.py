from goi_tpu.app.orbit import OrbitCamera
from goi_tpu.app.session import QuerySession

__all__ = ["OrbitCamera", "QuerySession"]
