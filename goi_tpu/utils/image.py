"""Image/mask helpers and heat overlays.

Equivalent of ref:utils/image_utils.py: apply_mask/compute_mask_ratio/
calculate_iou (:27-60,100+), the turbo-colormap heat overlay `clip_color`
(:149-178) and the image-sequence video writer (:121-140).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _turbo_table() -> np.ndarray:
    """256-entry turbo colormap (matplotlib 'turbo'); computed from the
    published polynomial fit so matplotlib isn't a hard dependency."""
    try:
        import matplotlib
        return np.asarray(matplotlib.colormaps.get_cmap("turbo").colors,
                          np.float32)
    except Exception:
        # Google turbo polynomial approximation
        x = np.linspace(0.0, 1.0, 256)
        r = (0.13572138 + 4.61539260 * x - 42.66032258 * x ** 2
             + 132.13108234 * x ** 3 - 152.94239396 * x ** 4
             + 59.28637943 * x ** 5)
        g = (0.09140261 + 2.19418839 * x + 4.84296658 * x ** 2
             - 14.18503333 * x ** 3 + 4.27729857 * x ** 4
             + 2.82956604 * x ** 5)
        b = (0.10667330 + 12.64194608 * x - 60.58204836 * x ** 2
             + 110.36276771 * x ** 3 - 89.90310912 * x ** 4
             + 27.34824973 * x ** 5)
        return np.clip(np.stack([r, g, b], -1), 0, 1).astype(np.float32)


TURBO = _turbo_table()


def turbo_colormap(value):
    """[0,1] values -> RGB via the turbo LUT (ref:image_utils.py cmap)."""
    v = jnp.asarray(value)
    idx = (v * (TURBO.shape[0] - 1)).astype(jnp.int32)
    return jnp.asarray(TURBO)[jnp.clip(idx, 0, TURBO.shape[0] - 1)]


def clip_color(cos_sim, bg_mask, height: int, width: int,
               thresh: float = 0.7, res_finetuned: bool = False,
               coloring: bool = False):
    """Similarity -> (heat overlay, alpha) exactly as the GUI renders it
    (ref:utils/image_utils.py:149-178). cos_sim/bg_mask are flat
    (H*W,) arrays; bg_mask True marks background pixels."""
    cos_sim = jnp.asarray(cos_sim)
    bg_mask = jnp.asarray(bg_mask)
    if res_finetuned:
        rel = jnp.clip(cos_sim + 0.2, 0.1, 0.9)
    else:
        rel = jnp.clip((cos_sim - thresh - 0.05)
                       / (cos_sim.max() - thresh), 0.0, 1.0)

    if coloring:
        heat = turbo_colormap(rel)
        heat = jnp.where(bg_mask[:, None], 1.0, heat)
        masked_hi = np.asarray(
            jnp.clip(heat.reshape(height, width, 3), 0, 1))
    else:
        masked_hi = 1

    if not coloring or res_finetuned:
        alpha = jnp.where(bg_mask, 1.0, 0.0)
        alpha = np.asarray(alpha.reshape(height, width, 1))
    else:
        alpha = 1
    return masked_hi, alpha


def apply_mask(a_shape_like, mask):
    """Broadcast a leading-dim mask to an array's shape
    (ref:image_utils.py:27-34)."""
    mask = jnp.asarray(mask)
    a = jnp.asarray(a_shape_like)
    if mask.ndim == 1:
        mask = mask.reshape(-1, *((1,) * (a.ndim - 1)))
    return jnp.broadcast_to(mask, a.shape)


def compute_mask_ratio(refer_mask, mask) -> float:
    """|refer & mask| / |refer| (ref:image_utils.py:36-49)."""
    refer = np.asarray(refer_mask, bool)
    if not refer.any():
        return 0
    inter = np.logical_and(refer, np.asarray(mask, bool))
    return float(np.count_nonzero(inter) / np.count_nonzero(refer))


def calculate_iou(label, pred) -> float:
    label = np.asarray(label, bool)
    pred = np.asarray(pred, bool)
    union = np.count_nonzero(label | pred)
    if union == 0:
        return 0.0
    return float(np.count_nonzero(label & pred) / union)


def write_video(frames, path: str, fps: int = 10) -> str:
    """Write (H, W, 3) uint8 frames (or image paths) to an mp4
    (ref:image_utils.py:121-140). Uses cv2 when available, else
    imageio; returns the output path."""
    if isinstance(frames[0], str):
        import cv2
        frames = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                  for p in frames]
    frames = [np.asarray(f) for f in frames]
    if frames[0].dtype != np.uint8:
        frames = [np.clip(f * 255, 0, 255).astype(np.uint8)
                  for f in frames]
    try:
        import cv2
        h, w = frames[0].shape[:2]
        out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                              fps, (w, h))
        for f in frames:
            out.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        out.release()
    except Exception:
        import imageio
        imageio.mimwrite(path, frames, fps=fps)
    return path


# ScanNet NYU40 label palette (ref:utils/general_utils.py:199-223)
NYU40_COLORS = np.array([
    (0, 0, 0), (174, 199, 232), (152, 223, 138), (31, 119, 180),
    (255, 187, 120), (188, 189, 34), (140, 86, 75), (255, 152, 150),
    (214, 39, 40), (197, 176, 213), (148, 103, 189), (196, 156, 148),
    (23, 190, 207), (178, 76, 76), (247, 182, 210), (66, 188, 102),
    (219, 219, 141), (140, 57, 197), (202, 185, 52), (51, 176, 203),
    (200, 54, 131), (92, 193, 61), (78, 71, 183), (172, 114, 82),
    (255, 127, 14), (91, 163, 138), (153, 98, 156), (140, 153, 101),
    (158, 218, 229), (100, 125, 154), (178, 127, 135), (120, 185, 128),
    (146, 111, 194), (44, 160, 44), (112, 128, 144), (96, 207, 209),
    (227, 119, 194), (213, 92, 176), (94, 106, 211), (82, 84, 163),
    (100, 85, 144)], np.uint8)


def nyu40_colorize(labels: np.ndarray) -> np.ndarray:
    """(H, W) int labels in [0, 40] -> (H, W, 3) uint8 colors."""
    lab = np.clip(np.asarray(labels, np.int64), 0,
                  len(NYU40_COLORS) - 1)
    return NYU40_COLORS[lab]


def save_image(img, path: str) -> None:
    """(3,H,W) or (H,W,3) float [0,1] -> PNG."""
    from PIL import Image
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] in (1, 3):
        arr = arr.transpose(1, 2, 0)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(
        np.clip(arr * 255, 0, 255).astype(np.uint8)).save(path)
