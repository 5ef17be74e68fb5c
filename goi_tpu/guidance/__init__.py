from goi_tpu.guidance.sds import (DiffusionBackend, InpaintSDS, PlainSDS,
                                   VSD, CDS, dilate_mask)

__all__ = ["DiffusionBackend", "InpaintSDS", "PlainSDS", "VSD", "CDS",
           "dilate_mask"]
