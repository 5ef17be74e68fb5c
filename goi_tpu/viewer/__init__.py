from goi_tpu.viewer.server import NetworkGUI
from goi_tpu.viewer.web import WebViewer
from goi_tpu.viewer.app import QueryWebApp

__all__ = ["NetworkGUI", "WebViewer", "QueryWebApp"]
