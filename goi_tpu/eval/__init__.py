from goi_tpu.eval.metrics import psnr, ssim, l1_loss, l2_loss, iou_metrics

__all__ = ["psnr", "ssim", "l1_loss", "l2_loss", "iou_metrics"]
