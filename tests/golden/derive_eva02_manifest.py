"""Derive the EVA02-CLIP-bigE-14-plus TEXT-tower checkpoint manifest
(state-dict names + shapes) from the reference's vendored architecture
(ref:ext/eva02_clip/transformer.py:642-737 TextTransformer built with
ref:model_configs/EVA02-CLIP-bigE-14-plus.json text_cfg, embed_dim
1024). The official EVA02_CLIP_E_psz14_plus_s9B.pt checkpoint stores
exactly these entries under the 'text.' prefix (CustomCLIP,
ref:ext/eva02_clip/model.py:270-283; forced by force_custom_clip=True,
ref:ext/clip_wrapper_eva02.py:17-19).

Run: python tests/golden/derive_eva02_manifest.py
Writes eva02_text_bigE_manifest.json next to this file. The meta device
keeps the 354M-param model unmaterialized.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from test_clip_text_fullmodel import BIGE, _vendored_transformer  # noqa: E402


def main():
    tref = _vendored_transformer()
    with torch.device("meta"):
        model = tref.TextTransformer(
            context_length=BIGE.context_length,
            vocab_size=BIGE.vocab_size, width=BIGE.width,
            heads=BIGE.heads, layers=BIGE.layers,
            output_dim=BIGE.embed_dim, act_layer=nn.GELU,
            norm_layer=tref.LayerNorm, xattn=False, attn_mask=True)
    manifest = {"text." + k: list(v.shape)
                for k, v in model.state_dict().items()}
    out = os.path.join(os.path.dirname(__file__),
                       "eva02_text_bigE_manifest.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    n_params = sum(
        int(torch.tensor(v).prod()) for v in manifest.values())
    print(f"wrote {out}: {len(manifest)} entries, {n_params/1e6:.1f}M "
          f"params")


if __name__ == "__main__":
    main()
