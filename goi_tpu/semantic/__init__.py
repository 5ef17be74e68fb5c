from goi_tpu.semantic.codebook import SemanticDecoder, kmeans, init_codebook
from goi_tpu.semantic.losses import distillation_loss

__all__ = ["SemanticDecoder", "kmeans", "init_codebook",
           "distillation_loss"]
