from goi_tpu.guidance.sds import DiffusionBackend, InpaintSDS

__all__ = ["DiffusionBackend", "InpaintSDS"]
