"""Shared torch-state-dict NN primitives for the frozen-tower re-hosts.

Every tower module (bert/swin/grounding/sam/sd_jax) consumes flat
``{"prefix.weight": array, ...}`` state dicts, so the primitives take
``(params, name, x)`` and build the key. eps is REQUIRED on the norms:
each architecture pins its own (1e-12 BERT, 1e-5 Swin/DINO/SD, 1e-6
SAM) and a silent default hid that drift when these lived as six
per-module copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gelu(x):
    """erf-form GELU (torch.nn.functional.gelu default)."""
    return 0.5 * x * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))


def linear(p, name, x):
    """torch nn.Linear on the trailing dim; bias optional."""
    w = p[f"{name}.weight"]
    # explicit key test + [] (not .get): callers wrap params in
    # dict subclasses that instrument __getitem__ (coverage recorders)
    b = p[f"{name}.bias"] if f"{name}.bias" in p else None
    y = x @ w.T
    return y if b is None else y + b


def layer_norm(p, name, x, *, eps):
    """torch nn.LayerNorm over the trailing dim."""
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * p[f"{name}.weight"] \
        + p[f"{name}.bias"]


def group_norm(p, name, x, *, groups, eps=1e-5):
    """torch nn.GroupNorm on NCHW."""
    n, c, h, w = x.shape
    g = min(groups, c)
    xg = x.reshape(n, g, c // g, h, w)
    m = jnp.mean(xg, (2, 3, 4), keepdims=True)
    v = jnp.var(xg, (2, 3, 4), keepdims=True)
    xg = (xg - m) / jnp.sqrt(v + eps)
    return xg.reshape(n, c, h, w) * p[f"{name}.weight"][None, :, None,
                                                        None] \
        + p[f"{name}.bias"][None, :, None, None]
