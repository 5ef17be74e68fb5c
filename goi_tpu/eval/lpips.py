"""LPIPS perceptual metric (AlexNet backbone) in JAX.

Role of ref:lpipsPyTorch/ (self-contained LPIPS). The backbone weights
are pretrained artifacts the reference downloads via torchvision; this
environment has no network egress, so the full forward is implemented
here and weights load from a local npz:

  GOI_LPIPS_WEIGHTS=/path/to/lpips_alex.npz   (or ./models/lpips_alex.npz)

Export once from any machine with torch+lpips installed:

  import lpips, numpy as np
  m = lpips.LPIPS(net='alex')
  blob = {}
  for i, layer in enumerate(m.net.slice_modules if hasattr(m.net, 'slice_modules') else []):
      ...
  # or simply: np.savez('lpips_alex.npz', **{k: v.detach().numpy()
  #                     for k, v in m.state_dict().items()})

`lpips_or_none` returns None when weights are unavailable so callers
(metrics.py) can degrade gracefully.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, pad), maxpool flags
_ALEX_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}  # maxpool after convs 0 and 1 (before next slice)

# ImageNet-ish scaling used by LPIPS
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def normalize_lpips_state(raw: Dict[str, np.ndarray]
                          ) -> Dict[str, np.ndarray]:
    """Accept the REAL `lpips` package state_dict layout and map it to
    the canonical keys used here.

    lpips.LPIPS(net='alex').state_dict() keys:
      net.slice{k}.{orig_idx}.weight/.bias   (Sequential keeps the
          torchvision feature indices: 0, 3, 6, 8, 10)
      lin{i}.model.1.weight                  (model.0 without dropout)
    Canonical: net.slice{k}.conv.weight/.bias and lin{i}.model.1.weight.
    """
    out = {}
    for k, v in raw.items():
        v = np.asarray(v, np.float32)
        parts = k.split(".")
        if parts[0] == "net" and parts[1].startswith("slice") \
                and parts[2].isdigit():
            out[f"net.{parts[1]}.conv.{parts[3]}"] = v
        elif parts[0].startswith("lin") and parts[1] == "model":
            out[f"{parts[0]}.model.1.{parts[3]}"] = v
        else:
            out[k] = v
    return out


@lru_cache(maxsize=1)
def _load_weights() -> Optional[Dict[str, np.ndarray]]:
    path = os.environ.get("GOI_LPIPS_WEIGHTS", "models/lpips_alex.npz")
    if not os.path.exists(path):
        return None
    return normalize_lpips_state(dict(np.load(path)))


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + jnp.asarray(b)[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        "VALID")


def _alex_features(x, weights):
    """Returns the 5 relu feature maps used by LPIPS."""
    feats = []
    for i in range(5):
        w = weights[f"net.slice{i + 1}.conv.weight"]
        b = weights[f"net.slice{i + 1}.conv.bias"]
        stride = _ALEX_CONVS[i][2]
        pad = _ALEX_CONVS[i][3]
        x = jax.nn.relu(_conv(x, w, b, stride, pad))
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def lpips(img1: jax.Array, img2: jax.Array,
          weights: Optional[Dict[str, np.ndarray]] = None) -> jax.Array:
    """LPIPS distance between (3,H,W) images in [0,1]."""
    weights = weights if weights is not None else _load_weights()
    if weights is None:
        raise FileNotFoundError(
            "LPIPS backbone weights not found; set GOI_LPIPS_WEIGHTS "
            "(see goi_tpu/eval/lpips.py docstring)")

    def norm_input(x):
        x = x * 2.0 - 1.0
        return ((x - jnp.asarray(_SHIFT)[:, None, None])
                / jnp.asarray(_SCALE)[:, None, None])[None]

    f1 = _alex_features(norm_input(img1), weights)
    f2 = _alex_features(norm_input(img2), weights)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.maximum(
            jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.maximum(
            jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
        total = total + jnp.mean(
            jnp.sum(d * jnp.asarray(lin)[:, :, 0, 0][0][None, :, None,
                                                        None],
                    axis=1))
    return total


def lpips_or_none(img1, img2) -> Optional[jax.Array]:
    if _load_weights() is None:
        return None
    return lpips(img1, img2)
