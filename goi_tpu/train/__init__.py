from goi_tpu.train.optim import (OptimConfig, make_scene_optimizer,
                                 expon_lr_schedule)

__all__ = ["OptimConfig", "make_scene_optimizer", "expon_lr_schedule"]
