from goi_tpu.raster.render import render, trace, RasterConfig

__all__ = ["render", "trace", "RasterConfig"]
