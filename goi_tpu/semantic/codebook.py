"""Trainable Feature Clustering Codebook.

The reference distills 256-dim APE/CLIP feature maps into a 10-dim
per-Gaussian semantic field through (a) a K=300-row lookup table of
256-dim prototypes and (b) a small MLP decoding the rendered 10-dim
feature into a 300-way code distribution
(ref:scene/semantic_model.py:13-63, train.py:63-67).

TPU design: the decoder is a plain pytree of (W, b) pairs (matmul on the
MXU); k-means init is a jit-ed matmul loop (cosine assignment, mean
update with segment sums) mirroring train.py:36-56.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SemanticDecoder:
    """MLP mapping rendered semantic features -> codebook logits.

    Matches SemanticModel (ref:scene/semantic_model.py:13-50): Linear
    layers with ReLU between, identity (or L2-norm) at the end. The GOI
    default is a single 10->300 layer with bias
    (ref:train.py:64)."""

    weights: List[jax.Array]
    biases: List[jax.Array]
    norm_output: bool = dataclasses.field(default=False,
                                          metadata=dict(static=True))

    def __call__(self, x: jax.Array) -> jax.Array:
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            x = x @ w.T
            if b is not None:
                x = x + b
            if i < len(self.weights) - 1:
                x = jax.nn.relu(x)
        if self.norm_output:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x

    @staticmethod
    def create(key, dim_in=10, dim_hidden=128, dim_out=300, num_layer=1,
               use_bias=True, norm=False) -> "SemanticDecoder":
        ws, bs = [], []
        for i in range(num_layer):
            d_in = dim_in if i == 0 else dim_hidden
            d_out = dim_out if i == num_layer - 1 else dim_hidden
            key, sub = jax.random.split(key)
            # xavier uniform, matching torch.nn.init.xavier_uniform_
            bound = float(np.sqrt(6.0 / (d_in + d_out)))
            ws.append(jax.random.uniform(sub, (d_out, d_in),
                                         minval=-bound, maxval=bound))
            bs.append(jnp.zeros((d_out,)) if use_bias else None)
        return SemanticDecoder(weights=ws, biases=bs, norm_output=norm)

    # -- self-describing checkpoint (role of SemanticModel.save/load,
    #    ref:scene/semantic_model.py:52-63) --
    def save(self, path: str) -> None:
        blob = {
            "args": {
                "dim_in": self.weights[0].shape[1],
                "dim_out": self.weights[-1].shape[0],
                "num_layer": len(self.weights),
                "use_bias": self.biases[0] is not None,
                "norm": self.norm_output,
            },
            "weights": [np.asarray(w) for w in self.weights],
            "biases": [None if b is None else np.asarray(b)
                       for b in self.biases],
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    @staticmethod
    def load(path: str) -> "SemanticDecoder":
        with open(path, "rb") as f:
            blob = pickle.load(f)
        return SemanticDecoder(
            weights=[jnp.asarray(w) for w in blob["weights"]],
            biases=[None if b is None else jnp.asarray(b)
                    for b in blob["biases"]],
            norm_output=blob["args"]["norm"],
        )


def kmeans(key, x: jax.Array, ncluster: int, niter: int = 10) -> jax.Array:
    """Cosine k-means on the unit sphere (ref:train.py:36-56): normalize
    points, init from a random permutation, assign by max dot product,
    recompute means, re-init dead clusters from random points."""
    n = x.shape[0]
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-8)
    key, sub = jax.random.split(key)
    # tile the permutation when n < ncluster (degenerate inputs)
    pick = lambda s: x[jax.random.permutation(s, n)[
        jnp.arange(ncluster) % n]]
    centers = pick(sub)

    def body(carry, sub):
        centers = carry
        centers = centers / jnp.maximum(
            jnp.linalg.norm(centers, axis=1, keepdims=True), 1e-8)
        assign = jnp.argmax(x @ centers.T, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=ncluster)
        cnt = jax.ops.segment_sum(jnp.ones((n,)), assign,
                                  num_segments=ncluster)
        new_centers = sums / cnt[:, None]
        dead = cnt == 0
        # replace dead clusters with random data points
        repl = pick(sub)
        new_centers = jnp.where(dead[:, None], repl, new_centers)
        return new_centers, None

    subs = jax.random.split(key, niter)
    centers, _ = jax.lax.scan(body, centers, subs)
    return centers


def init_codebook(key, feature_maps: Sequence[np.ndarray], tab_len: int = 300,
                  per_image_clusters: int = 80, stride: int = 8,
                  max_points_per_image: int = 65536) -> jax.Array:
    """Two-level codebook init (ref:train.py:79-87): per-image k-means(80)
    over the (subsampled) pixel features of every `stride`-th camera, then
    k-means(tab_len) over the concatenated per-image centers.

    feature_maps: iterable of (C, H, W) or (HW, C) arrays (host)."""
    partials = []
    maps = feature_maps[::stride]
    for i, fm in enumerate(maps):
        fm = np.asarray(fm, np.float32)
        if fm.ndim == 3:
            fm = fm.reshape(fm.shape[0], -1).T  # (HW, C)
        fm = np.unique(fm, axis=0)
        if fm.shape[0] > max_points_per_image:
            idx = np.random.default_rng(i).choice(
                fm.shape[0], max_points_per_image, replace=False)
            fm = fm[idx]
        key, sub = jax.random.split(key)
        k = min(per_image_clusters, fm.shape[0])
        partials.append(np.asarray(kmeans(sub, jnp.asarray(fm), k)))
    tot = jnp.asarray(np.concatenate(partials, 0))
    key, sub = jax.random.split(key)
    return kmeans(sub, tot, tab_len)
