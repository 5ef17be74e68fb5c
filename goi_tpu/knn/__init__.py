from goi_tpu.knn.knn import mean_knn_dist2

__all__ = ["mean_knn_dist2"]
