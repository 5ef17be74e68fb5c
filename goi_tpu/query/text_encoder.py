"""Text-embedding providers for open-vocabulary queries.

The reference embeds prompts with a frozen EVA02-CLIP-bigE-14-plus text
tower plus the learned aligner (ref:ext/clip_wrapper_eva02.py:8-148,
gui/main.py:105-111). Those weights are multi-GB external artifacts this
environment cannot download, so — exactly like the reference's own
offline APE feature extraction (README:66-74) — text embeddings are
produced offline and served from a store; the tiny aligner runs in JAX
(goi_tpu/query/align.py).

Providers:
  PrecomputedTextEncoder  prompt -> embedding from an .npz file
  JaxCLIPTextEncoder      live in-loop JAX text transformer with
                          pluggable converted weights
                          (goi_tpu/query/clip_text.py) — arbitrary
                          prompts with no offline step
  TorchEVA02TextEncoder   live tower via torch-CPU, if the user supplies
                          the checkpoint + the eva02 CLIP library
"""

from __future__ import annotations

import os
from typing import Dict, Protocol

import numpy as np


class TextEncoder(Protocol):
    def encode(self, prompt: str) -> np.ndarray:
        """Returns the language embedding (1024,) BEFORE alignment."""
        ...


class PrecomputedTextEncoder:
    """Embeddings exported offline:
    np.savez('prompts.npz', **{prompt: embedding (1024,)})."""

    def __init__(self, path: str):
        self.store: Dict[str, np.ndarray] = dict(np.load(path))

    def encode(self, prompt: str) -> np.ndarray:
        if prompt not in self.store:
            raise KeyError(
                f"prompt {prompt!r} not in the precomputed store; "
                f"available: {sorted(self.store)[:10]}...")
        return np.asarray(self.store[prompt], np.float32)

    def available(self):
        return sorted(self.store)


class TorchEVA02TextEncoder:
    """Runs the reference's text tower when its artifacts are present
    (models/model_language.pth + an importable eva02 CLIP package).
    Import deferred; raises a clear error otherwise."""

    def __init__(self, checkpoint: str = "models/model_language.pth",
                 clip_model: str = "EVA02-CLIP-bigE-14-plus"):
        if not os.path.exists(checkpoint):
            raise FileNotFoundError(
                f"{checkpoint} not found — export the EVA02 text tower "
                "offline or use PrecomputedTextEncoder")
        import torch  # CPU inference

        from eva02_clip import create_model_and_transforms  # type: ignore

        model, _, _ = create_model_and_transforms(clip_model)
        state = torch.load(checkpoint, map_location="cpu")
        model.load_state_dict(state, strict=False)
        model.eval()
        self.model = model
        self.torch = torch

    def encode(self, prompt: str) -> np.ndarray:
        import numpy as np
        with self.torch.no_grad():
            tokens = self.model.tokenizer([prompt])  # type: ignore
            feat = self.model.encode_text(tokens)
        return np.asarray(feat[0].float().numpy(), np.float32)


def encode_and_align(encoder: TextEncoder, align, prompt: str):
    """Full text path of the GUI (ref:gui/main.py:105-111): tower ->
    VisionLanguageAlign.text_embedding_align -> aligned 256-d tokens."""
    import jax.numpy as jnp

    emb = jnp.asarray(encoder.encode(prompt))[None]  # (1, 1024)
    tokens, bias = align.text_embedding_align(emb)
    return tokens[0], bias[0]
