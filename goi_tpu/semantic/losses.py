"""Semantic distillation loss (the 4-term GOI objective).

Faithful re-expression of ref:train.py:142-167:

  sem_label = softmax(MLP(rendered 10-dim feature))          (pixels, K)
  gtl       = L2-normalized ground-truth APE features        (pixels, C)
  sim       = gtl @ normalize(LUT)^T                         (pixels, K)
  label     = one-hot-ish argmax mask of sim (detached)
  lab  = 50 * MSE(sem_label, label)
  sl   = 1 - mean(max_k sim)
  sl1  = mean entropy of softmax(sim * t), t = 1 (<1000 iters) else 2
  recc = 1 - mean cos(LUT[argmax sem_label], gtl)
  total = lab + sl + 0.3*sl1 + recc

All matmuls are MXU-shaped (pixels x K x C); everything is jit-able.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from goi_tpu.semantic.codebook import SemanticDecoder


def distillation_loss(
    decoder: SemanticDecoder,
    lut: jax.Array,             # (K, C) codebook
    sem_feature: jax.Array,     # (pixels, S) rendered semantic features
    gt_features: jax.Array,     # (pixels, C) APE features (unnormalized)
    anneal_t: jax.Array,        # scalar: 1.0 before iter 1000, else 2.0
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    logits = decoder(sem_feature)
    sem_label = jax.nn.softmax(logits, axis=-1)

    # eps guards: all-zero feature rows (e.g. padded/background pixels)
    # would NaN the whole loss through 0/0 (the reference divides
    # unguarded, ref:train.py:148-149 — robustness deviation)
    gtl = gt_features / jnp.maximum(
        jnp.linalg.norm(gt_features, axis=1, keepdims=True), 1e-8)
    lut_n = lut / jnp.maximum(
        jnp.linalg.norm(lut, axis=1, keepdims=True), 1e-8)
    sim = gtl @ lut_n.T                                    # (pixels, K)

    sim_val = jnp.max(sim, axis=1, keepdims=True)
    label = jax.lax.stop_gradient((sim == sim_val).astype(jnp.float32))
    lab = jnp.mean((sem_label - label) ** 2) * 50.0
    sl = 1.0 - jnp.mean(sim_val)

    pick = lut[jnp.argmax(sem_label, axis=-1)]             # (pixels, C)
    cos = jnp.sum(pick * gtl, axis=-1) / (
        jnp.linalg.norm(pick, axis=-1) * jnp.linalg.norm(gtl, axis=-1)
        + 1e-12)
    recc = 1.0 - jnp.mean(cos)

    anneal = sim * anneal_t
    b = jax.nn.softmax(anneal, axis=1) * jax.nn.log_softmax(anneal, axis=1)
    sl1 = -jnp.mean(jnp.sum(b, axis=-1))

    total = lab + sl + 0.3 * sl1 + recc
    return total, {"lab": lab, "sl": sl, "sl1": sl1, "recc": recc,
                   "total": total}
