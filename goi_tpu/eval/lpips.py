"""LPIPS perceptual metric (AlexNet + VGG16 backbones) in JAX.

Role of ref:lpipsPyTorch/ (self-contained LPIPS; the reference's
novel-view protocol scores with net_type='vgg', ref:metrics.py:63).
The backbone weights are pretrained artifacts the reference downloads
via torchvision; this environment has no network egress, so the full
forward is implemented here and weights load from a local npz:

  GOI_LPIPS_WEIGHTS=/path/to/lpips_alex.npz  (or ./models/lpips_alex.npz)
  GOI_LPIPS_VGG_WEIGHTS=/path/to/lpips_vgg.npz (or ./models/lpips_vgg.npz)

Export once from any machine with torch + the `lpips` package:

  import lpips, numpy as np
  m = lpips.LPIPS(net='vgg')    # or net='alex'
  np.savez('lpips_vgg.npz', **{k: v.detach().numpy()
                               for k, v in m.state_dict().items()})

Protocol notes (deliberate, to match the reference bit-for-bit):
- net='vgg' reproduces ref:lpipsPyTorch/modules/networks.py:86-96
  exactly: z_score is applied DIRECTLY to the [0,1] input (the
  reference never rescales to [-1,1] — unlike the official richzhang
  lpips with normalize=True), and channel unit-normalization divides by
  (norm + 1e-10) (ref:lpipsPyTorch/modules/utils.py:6-8).
- net='alex' keeps the official lpips-package convention ([0,1] ->
  [-1,1] rescale, clamped norm) used since round 2.

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

# VGG16 feature slices (ref:lpipsPyTorch/modules/networks.py:86-96
# target layers relu1_2/2_2/3_3/4_3/5_3): torchvision indices of the
# convs in each lpips-package slice (net.slice{k}.{idx}.weight)
_VGG_SLICES = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21],
               [24, 26, 28]]
_VGG_CHANNELS = [64, 128, 256, 512, 512]

# ImageNet-ish scaling used by LPIPS
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def normalize_lpips_state(raw: Dict[str, np.ndarray], net: str = "alex"
                          ) -> Dict[str, np.ndarray]:
    """Accept the REAL `lpips` package state_dict layout and map it to
    the canonical keys used here.

    lpips.LPIPS(net=...).state_dict() keys:
      net.slice{k}.{orig_idx}.weight/.bias   (Sequential keeps the
          torchvision feature indices: alex 0,3,6,8,10;
          vgg 0,2,5,7,10,12,14,17,19,21,24,26,28)
      lin{i}.model.1.weight                  (model.0 without dropout)
    Canonical: net.slice{k}.conv{j}.weight/.bias (j = conv position
    within the slice; alex slices have one conv so j == 0) and
    lin{i}.model.1.weight.
    """
    idx_to_j = {}
    if net == "vgg":
        for k, idxs in enumerate(_VGG_SLICES):
            for j, idx in enumerate(idxs):
                idx_to_j[(k + 1, idx)] = j
    out = {}
    for k, v in raw.items():
        v = np.asarray(v, np.float32)
        parts = k.split(".")
        if parts[0] == "net" and parts[1].startswith("slice") \
                and parts[2].isdigit():
            sl = int(parts[1][5:])
            j = idx_to_j.get((sl, int(parts[2])), 0)
            out[f"net.{parts[1]}.conv{j}.{parts[3]}"] = v
        elif parts[0].startswith("lin") and parts[1] == "model":
            out[f"{parts[0]}.model.1.{parts[3]}"] = v
        else:
            out[k] = v
    return out


@lru_cache(maxsize=2)
def _load_weights(net: str = "alex") -> Optional[Dict[str, np.ndarray]]:
    if net == "vgg":
        path = os.environ.get("GOI_LPIPS_VGG_WEIGHTS",
                              "models/lpips_vgg.npz")
    else:
        path = os.environ.get("GOI_LPIPS_WEIGHTS",
                              "models/lpips_alex.npz")
    if not os.path.exists(path):
        return None
    return normalize_lpips_state(dict(np.load(path)), net)


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + jnp.asarray(b)[None, :, None, None]


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        "VALID")


def _alex_features(x, weights):
    """Returns the 5 relu feature maps used by LPIPS."""
    feats = []
    for i in range(5):
        w = weights[f"net.slice{i + 1}.conv0.weight"]
        b = weights[f"net.slice{i + 1}.conv0.bias"]
        stride = _ALEX_CONVS[i][2]
        pad = _ALEX_CONVS[i][3]
        x = jax.nn.relu(_conv(x, w, b, stride, pad))
        feats.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return feats


def _vgg_features(x, weights):
    """The 5 relu1_2/2_2/3_3/4_3/5_3 maps (torchvision vgg16.features
    structure: 3x3 stride-1 pad-1 convs, 2x2/2 maxpool between
    slices)."""
    feats = []
    for k, idxs in enumerate(_VGG_SLICES):
        if k > 0:
            x = _maxpool(x, 2, 2)
        for j in range(len(idxs)):
            w = weights[f"net.slice{k + 1}.conv{j}.weight"]
            b = weights[f"net.slice{k + 1}.conv{j}.bias"]
            x = jax.nn.relu(_conv(x, w, b, 1, 1))
        feats.append(x)
    return feats


def lpips(img1: jax.Array, img2: jax.Array,
          weights: Optional[Dict[str, np.ndarray]] = None,
          net: str = "alex") -> jax.Array:
    """LPIPS distance between (3,H,W) images in [0,1].

    net='vgg' follows the reference lpipsPyTorch protocol exactly
    (no [-1,1] rescale, eps-added norms — see module docstring);
    net='alex' follows the official lpips package."""
    weights = weights if weights is not None else _load_weights(net)
    if weights is None:
        raise FileNotFoundError(
            f"LPIPS {net} backbone weights not found; set "
            f"{'GOI_LPIPS_VGG_WEIGHTS' if net == 'vgg' else 'GOI_LPIPS_WEIGHTS'}"
            f" (see goi_tpu/eval/lpips.py docstring)")

    def norm_input(x):
        if net != "vgg":
            # official lpips convention: inputs in [-1,1]
            x = x * 2.0 - 1.0
        # z_score (ref:lpipsPyTorch/modules/networks.py:50-51 applies
        # this directly to the [0,1] input for every backbone)
        return ((x - jnp.asarray(_SHIFT)[:, None, None])
                / jnp.asarray(_SCALE)[:, None, None])[None]

    feat_fn = _vgg_features if net == "vgg" else _alex_features
    f1 = feat_fn(norm_input(img1), weights)
    f2 = feat_fn(norm_input(img2), weights)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        if net == "vgg":
            # ref:lpipsPyTorch/modules/utils.py:6-8
            a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        else:
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


def lpips_or_none(img1, img2, net: str = "vgg") -> Optional[jax.Array]:
    """Protocol default is vgg (ref:metrics.py:63); falls back to alex
    when only alex weights are present (callers report which)."""
    if _load_weights(net) is not None:
        return lpips(img1, img2, net=net)
    return None
