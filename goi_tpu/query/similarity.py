"""Open-vocabulary similarity measures.

The decode path (ref:gui/main.py:363-385): rendered 10-dim semantic map
-> decoder MLP -> softmax * 10 -> argmax code -> LUT row -> L2 normalize
-> similarity against a text embedding -> threshold.

Text towers (EVA02-CLIP-bigE / ViT-B-32) are large frozen torch models;
as in the reference's own preprocessing strategy (APE features are
precomputed offline, ref:README.md:66-74), text embeddings enter this
module as plain arrays — precomputed offline or served by any encoder.
The tiny VisionLanguageAlign projection (1024 -> 256 with learned bias
and log-scale, ref:ext/vision_language_align.py:82-122) is ported in
goi_tpu/query/align.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from goi_tpu.semantic.codebook import SemanticDecoder


def decode_semantic_features(decoder: SemanticDecoder, lut: jax.Array,
                             sem_map: jax.Array) -> jax.Array:
    """(pixels, S) rendered features -> (pixels, C) normalized codebook
    features (ref:gui/main.py:365-371: MLP -> softmax*10 -> argmax ->
    LUT gather -> L2 normalize)."""
    logits = decoder(sem_map)
    probs = jax.nn.softmax(logits * 1.0, axis=-1) * 10.0
    code = jnp.argmax(probs, axis=-1)
    feat = lut[code]
    return feat / jnp.maximum(
        jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)


def ape_similarity(pixel_feats: jax.Array, text_tokens: jax.Array,
                   *, log_scale: jax.Array | float = 0.0,
                   manual_bias: float = 2.0) -> jax.Array:
    """Sigmoid dot-product relevancy of ApeSimMeasure
    (ref:gui/main.py:113-117 -> ext/vision_language_align.py:109-122):
    sim = sigmoid(<pixel, text>/exp(log_scale) + 2). `text_tokens` is the
    aligned (C,) embedding from VisionLanguageAlign.text_embedding_align.
    Threshold at 0.86 in the GUI (ref:gui/main.py:378-380)."""
    logits = pixel_feats @ text_tokens / jnp.exp(jnp.asarray(log_scale))
    logits = jnp.clip(logits, -50000.0, 50000.0) + manual_bias
    return jax.nn.sigmoid(logits)


def clip_relevancy(pixel_feats: jax.Array, text_feat: jax.Array,
                   canon_feats: jax.Array, temperature: float = 10.0
                   ) -> jax.Array:
    """LERF-style canonical-phrase relevancy of ClipSimMeasure
    (ref:gui/main.py:50-81): softmax over [query, canonicals] similarity,
    min over canonicals of the pairwise softmax prob of the query."""
    pf = pixel_feats / jnp.maximum(
        jnp.linalg.norm(pixel_feats, axis=-1, keepdims=True), 1e-12)
    tq = text_feat / jnp.maximum(jnp.linalg.norm(text_feat), 1e-12)
    tc = canon_feats / jnp.maximum(
        jnp.linalg.norm(canon_feats, axis=-1, keepdims=True), 1e-12)
    s_q = pf @ tq * temperature                        # (pixels,)
    s_c = pf @ tc.T * temperature                      # (pixels, M)
    # pairwise softmax of query vs each canonical
    pair = jnp.exp(s_q)[:, None] / (jnp.exp(s_q)[:, None] + jnp.exp(s_c))
    return jnp.min(pair, axis=-1)
