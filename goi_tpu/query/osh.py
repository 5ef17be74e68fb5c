"""Optimizable Semantic-space Hyperplane (OSH).

A linear SVM over the 256-dim codebook feature space, initialized from
the text embedding and fine-tuned with hinge loss against a 2D RES mask
(ref:networks.py:12-67, gui/main.py:1673-1763). The whole fine-tune loop
is one jit-ed lax.while_loop — thousands of tiny SGD steps without host
round-trips (the reference launches one CUDA graph per step).

Reference quirks preserved:
  - bias init: 2 - inverse_sigmoid(0.86)          (ref:networks.py:18)
  - inputs scaled by 1/0.3438                     (ref:networks.py:59)
  - stop at IoU >= 0.9 or 8000 epochs             (ref:gui/main.py:1707-1763)
  - SGD lr = 0.01                                 (ref:networks.py:13,20)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

INPUT_SCALE = 1.0 / 0.3438


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OSHState:
    weight: jax.Array  # (C,)
    bias: jax.Array    # ()


def osh_init(text_feat: jax.Array, set_bias: float = 0.86) -> OSHState:
    """Weight <- text embedding (ref:gui/main.py:1678-1680), bias <-
    2 - log(b/(1-b)) (ref:networks.py:18)."""
    b = jnp.asarray(set_bias)
    return OSHState(weight=jnp.asarray(text_feat, jnp.float32),
                    bias=2.0 - jnp.log(b / (1.0 - b)))


def osh_predict(state: OSHState, feats: jax.Array) -> jax.Array:
    """Raw decision value; positive = inside the query set
    (ref:networks.py:58-59)."""
    return (feats * INPUT_SCALE) @ state.weight + state.bias


def hinge_loss(outputs: jax.Array, labels01: jax.Array) -> jax.Array:
    """mean(clamp(1 - out * (2y-1), min=0)) (ref:networks.py:62-67)."""
    y = 2.0 * labels01 - 1.0
    return jnp.mean(jnp.maximum(1.0 - outputs * y, 0.0))


def _iou(pred: jax.Array, gt: jax.Array) -> jax.Array:
    inter = jnp.sum(pred & gt)
    union = jnp.sum(pred | gt)
    return inter / jnp.maximum(union, 1)


@partial(jax.jit, static_argnames=("max_epochs",))
def osh_finetune(
    state: OSHState,
    feats: jax.Array,     # (pixels, C) decoded codebook features
    mask: jax.Array,      # (pixels,) {0,1} RES supervision
    *,
    lr: float = 0.01,
    iou_target: float = 0.9,
    max_epochs: int = 8000,
) -> Tuple[OSHState, jax.Array, jax.Array]:
    """Full-batch SGD on hinge loss until IoU target or epoch budget
    (ref:gui/main.py:1707-1763). Returns (state, iou, epochs_run)."""
    mask = mask.astype(jnp.float32)
    gt = mask > 0

    def loss_fn(params):
        out = osh_predict(params, feats)
        return hinge_loss(out, mask)

    grad_fn = jax.grad(loss_fn)

    def cond(carry):
        st, iou, epoch = carry
        return (iou < iou_target) & (epoch < max_epochs)

    def body(carry):
        st, _, epoch = carry
        g = grad_fn(st)
        st = OSHState(weight=st.weight - lr * g.weight,
                      bias=st.bias - lr * g.bias)
        iou = _iou(osh_predict(st, feats) > 0, gt)
        return st, iou, epoch + 1

    iou0 = _iou(osh_predict(state, feats) > 0, gt)
    state, iou, epochs = jax.lax.while_loop(
        cond, body, (state, iou0, jnp.int32(0)))
    return state, iou, epochs
