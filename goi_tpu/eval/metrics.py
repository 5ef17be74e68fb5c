"""Image-quality and segmentation metrics.

Matches the reference definitions:
  l1/l2/ssim      ref:utils/loss_utils.py:17-63
  psnr            ref:utils/image_utils.py:22-24
  IoU / mPA / mP  ref:utils/image_utils.py (calculate_iou) and
                  ref:eval_seg.py:8-28
SSIM uses the same 11x11 Gaussian window (sigma 1.5) and constants
(C1=0.01^2, C2=0.03^2) as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(img1, img2):
    """Per-image PSNR, images in [0,1], layout (C,H,W) or batched
    (ref:utils/image_utils.py:22-24)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    xs = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(img1, img2, window_size: int = 11):
    """Structural similarity with per-channel 2D Gaussian filtering,
    equivalent to ref:utils/loss_utils.py:25-63. Inputs (C,H,W)."""
    w = _gaussian_window(window_size)
    c = img1.shape[0]
    kernel = jnp.tile(w[None, None], (c, 1, 1, 1))  # (C,1,K,K)
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[None], kernel, window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c)[0]

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)
         / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)))
    return jnp.mean(m)


def iou_metrics(pred: jax.Array, gt: jax.Array):
    """Binary-mask metrics of eval_seg (ref:eval_seg.py:8-28,52-57):
    IoU plus two-class means of per-class pixel accuracy (mPA) and
    precision (mP). Inputs boolean arrays."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    inter = jnp.sum(pred & gt)
    union = jnp.sum(pred | gt)
    iou = inter / jnp.maximum(union, 1)

    tp = inter.astype(jnp.float32)
    tn = jnp.sum(~pred & ~gt).astype(jnp.float32)
    n_gt1 = jnp.sum(gt).astype(jnp.float32)
    n_gt0 = jnp.sum(~gt).astype(jnp.float32)
    n_pr1 = jnp.sum(pred).astype(jnp.float32)
    n_pr0 = jnp.sum(~pred).astype(jnp.float32)
    acc1 = jnp.where(n_gt1 > 0, tp / jnp.maximum(n_gt1, 1), 0.0)
    acc0 = jnp.where(n_gt0 > 0, tn / jnp.maximum(n_gt0, 1), 0.0)
    mpa = (acc1 + acc0) / 2
    # precision follows torch semantics: 0/0 -> nan propagates into the
    # mean exactly as in the reference (ref:eval_seg.py:21-28)
    prec1 = tp / n_pr1
    prec0 = tn / n_pr0
    mp = (prec1 + prec0) / 2
    return {"iou": iou, "mpa": mpa, "mp": mp}
