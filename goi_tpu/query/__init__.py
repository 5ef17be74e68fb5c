from goi_tpu.query.similarity import (decode_semantic_features,
                                      ape_similarity, clip_relevancy)
from goi_tpu.query.osh import OSHState, osh_init, osh_finetune, osh_predict

__all__ = ["decode_semantic_features", "ape_similarity", "clip_relevancy",
           "OSHState", "osh_init", "osh_finetune", "osh_predict"]
