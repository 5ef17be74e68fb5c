from goi_tpu.guidance.sds import (DiffusionBackend, InpaintSDS,
                                   LODSInpaintSDS, PlainSDS, VSD, CDS,
                                   Zero123Backend, Zero123SDS,
                                   dilate_mask)
from goi_tpu.guidance.samplers import SDXLInpaint, inpaint_sample

__all__ = ["DiffusionBackend", "InpaintSDS", "LODSInpaintSDS",
           "PlainSDS", "VSD", "CDS", "Zero123Backend", "Zero123SDS",
           "SDXLInpaint", "inpaint_sample", "dilate_mask"]
