"""VisionLanguageAlign: 1024-dim language space -> 256-dim image space.

JAX port of the tiny learned aligner (ref:ext/vision_language_align.py:
8-122). The big text towers stay offline (see similarity.py); only this
projection and the logit head are needed in-loop. Weights are loaded
from a torch state_dict-style npz/pickle exported offline.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VisionLanguageAlign:
    """Parameters (ref:ext/vision_language_align.py:17-23)."""

    w_text: jax.Array      # (embed_dim, embed_dim_language) e.g. (256, 1024)
    b_text: jax.Array      # (embed_dim,)
    log_scale: jax.Array   # (1,)
    bias_lang: jax.Array   # (embed_dim_language,)
    bias0: jax.Array       # (1,)

    @staticmethod
    def create(embed_dim=256, embed_dim_language=1024, prior_prob=0.01,
               log_scale=0.0, seed=0) -> "VisionLanguageAlign":
        rng = np.random.default_rng(seed)
        bound = 1.0 / math.sqrt(embed_dim_language)
        return VisionLanguageAlign(
            w_text=jnp.asarray(rng.uniform(
                -bound, bound, (embed_dim, embed_dim_language))
                .astype(np.float32)),
            b_text=jnp.zeros((embed_dim,)),
            log_scale=jnp.full((1,), float(log_scale)),
            bias_lang=jnp.zeros((embed_dim_language,)),
            bias0=jnp.full((1,), -float(math.log((1 - prior_prob)
                                                 / prior_prob))),
        )

    @staticmethod
    def from_state_dict(sd) -> "VisionLanguageAlign":
        """Accepts the torch state_dict of the reference module (as numpy
        arrays): dot_product_projection_text.{weight,bias}, log_scale,
        bias_lang, bias0."""
        g = lambda k: jnp.asarray(np.asarray(sd[k], np.float32))
        return VisionLanguageAlign(
            w_text=g("dot_product_projection_text.weight"),
            b_text=g("dot_product_projection_text.bias"),
            log_scale=g("log_scale").reshape(1),
            bias_lang=g("bias_lang"),
            bias0=g("bias0").reshape(1),
        )

    def text_embedding_align(self, lang_embedding: jax.Array):
        """(L, 1024) language embedding -> ((L, 256) aligned tokens,
        (L,) text bias) (ref:ext/vision_language_align.py:82-93)."""
        e = lang_embedding / jnp.maximum(
            jnp.linalg.norm(lang_embedding, axis=-1, keepdims=True), 1e-12)
        tokens = (e / 2.0) @ self.w_text.T + self.b_text
        bias = e @ self.bias_lang + self.bias0
        return tokens, bias

    def logit_manual_bias(self, x: jax.Array, text_tokens: jax.Array,
                          manual_bias: float = 2.0) -> jax.Array:
        """Pixel-vs-text logit with the GUI's fixed manual bias
        (ref:ext/vision_language_align.py:109-122)."""
        logit = (x @ text_tokens.T) / jnp.exp(self.log_scale)
        logit = jnp.clip(logit, -50000.0, 50000.0)
        return logit + manual_bias

    def logit(self, x: jax.Array, text_tokens: jax.Array,
              text_bias: jax.Array) -> jax.Array:
        """(ref:ext/vision_language_align.py:95-107)."""
        logit = (x @ text_tokens.T) / jnp.exp(self.log_scale) + text_bias
        return jnp.clip(logit, -50000.0, 50000.0)
