"""RES (referring expression segmentation) mask providers.

The reference's RES pipeline runs GroundingDINO + SAM + CLIP re-ranking
(ref:guidance/res_model.py:144-410) — three frozen multi-GB torch
models. As with text embeddings, masks are produced offline or by an
external service; OSH fine-tuning (the part this framework owns) only
needs the resulting binary mask (ref:gui/main.py:1673-1763).

Providers:
  FileRESProvider     masks from <dir>/<prompt>/<image_name>.png
  CommandRESProvider  shells out to a user command that writes a mask
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import Optional, Protocol

import numpy as np


class RESProvider(Protocol):
    def predict_mask(self, image: np.ndarray, prompt: str,
                     image_name: str = "") -> Optional[np.ndarray]:
        """image (H, W, 3) float [0,1] -> binary mask (H, W) or None."""
        ...


def _resize_mask(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image
    im = Image.fromarray((mask > 0).astype(np.uint8) * 255)
    return np.asarray(im.resize((w, h), Image.BILINEAR)) > 127


class FileRESProvider:
    """Precomputed masks laid out <root>/<prompt>/<image_name>.png
    (the same directory protocol eval_seg.py scores)."""

    def __init__(self, root: str):
        self.root = root

    def predict_mask(self, image, prompt, image_name=""):
        path = os.path.join(self.root, prompt, image_name + ".png")
        if not os.path.exists(path):
            return None
        from PIL import Image
        m = np.asarray(Image.open(path).convert("L"))
        return _resize_mask(m, image.shape[0], image.shape[1])


class CommandRESProvider:
    """Runs `cmd <image.png> <prompt> <out_mask.png>` (e.g. a wrapper
    around an external GroundingDINO+SAM service)."""

    def __init__(self, cmd: str):
        self.cmd = cmd

    def predict_mask(self, image, prompt, image_name=""):
        from PIL import Image
        with tempfile.TemporaryDirectory() as td:
            ip = os.path.join(td, "in.png")
            op = os.path.join(td, "out.png")
            Image.fromarray(
                np.clip(image * 255, 0, 255).astype(np.uint8)).save(ip)
            r = subprocess.run([*self.cmd.split(), ip, prompt, op])
            if r.returncode != 0 or not os.path.exists(op):
                return None
            m = np.asarray(Image.open(op).convert("L"))
        return _resize_mask(m, image.shape[0], image.shape[1])
