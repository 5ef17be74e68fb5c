from goi_tpu.viewer.server import NetworkGUI

__all__ = ["NetworkGUI"]
