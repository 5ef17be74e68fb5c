from goi_tpu.configs.params import (ModelParams, PipelineParams,
                                    add_params, extract_params,
                                    load_saved_params, save_params)
from goi_tpu.train.optim import OptimConfig

__all__ = ["ModelParams", "PipelineParams", "OptimConfig", "add_params",
           "extract_params", "load_saved_params", "save_params"]
