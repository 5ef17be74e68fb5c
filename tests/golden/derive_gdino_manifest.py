"""Derive the official groundingdino_swint_ogc.pth checkpoint manifest
(state-dict names + shapes) from the reference's VENDORED GroundingDINO
architecture at the full SwinT-OGC geometry (Swin-T backbone, BERT-base,
6+6 deformable transformer layers, 900 queries — the model
ref:guidance/res_model.py:72-87 downloads and loads).

Builds the same module tree test_grounding.test_grounding_full_vs_torch
load-targets, on the meta device (no 170M-param materialization), and
writes gdino_swint_manifest.json next to this file.

Usage: PYTHONPATH=/root/repo python tests/golden/derive_gdino_manifest.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402


def build_vendored_gdino_full():
    from tests.test_grounding import _ref
    import transformers as hf

    from goi_tpu.query.grounding import GDINO_SWINT

    cfg = GDINO_SWINT
    sw = _ref("backbone.swin_transformer")
    tr = _ref("transformer")
    ut = _ref("utils")

    # swin on CPU (its init calls torch.linspace(...).item(), which meta
    # tensors reject; 28M params is fine to materialize)
    backbone = sw.SwinTransformer(
        embed_dim=cfg.swin.embed_dim, depths=list(cfg.swin.depths),
        num_heads=list(cfg.swin.num_heads),
        window_size=cfg.swin.window, drop_path_rate=0.0, ape=False,
        patch_norm=True, out_indices=cfg.swin.out_indices,
        frozen_stages=-1)
    with torch.device("meta"):
        bert = hf.BertModel(hf.BertConfig(
            vocab_size=cfg.bert.vocab_size, hidden_size=cfg.bert.hidden,
            num_hidden_layers=cfg.bert.layers,
            num_attention_heads=cfg.bert.heads,
            intermediate_size=cfg.bert.intermediate,
            max_position_embeddings=cfg.bert.max_position,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0))
        transformer = tr.Transformer(
            d_model=cfg.d_model, nhead=cfg.heads,
            num_queries=cfg.num_queries,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.ffn, dropout=0.0, activation="relu",
            return_intermediate_dec=True, query_dim=4, num_patterns=0,
            num_feature_levels=cfg.levels, enc_n_points=cfg.n_points,
            dec_n_points=cfg.n_points, learnable_tgt_init=True,
            two_stage_type="standard", embed_init_tgt=True,
            use_text_enhancer=True, use_fusion_layer=True,
            use_checkpoint=False, use_transformer_ckpt=False,
            use_text_cross_attention=True, text_dropout=0.0,
            fusion_dropout=0.0, fusion_droppath=0.0)
        bbox = nn.ModuleList(
            [ut.MLP(cfg.d_model, cfg.d_model, 4, 3)
             for _ in range(cfg.dec_layers)])
        transformer.decoder.bbox_embed = bbox
        transformer.enc_out_bbox_embed = ut.MLP(
            cfg.d_model, cfg.d_model, 4, 3)
        transformer.enc_out_class_embed = ut.ContrastiveEmbed(
            max_text_len=cfg.max_text_len)
        chans = [cfg.swin.num_features[i] for i in cfg.swin.out_indices]

        class RefGD(nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = nn.ModuleList([backbone])
                self.bert = bert
                self.feat_map = nn.Linear(cfg.bert.hidden, cfg.d_model)
                projs = [nn.Sequential(
                    nn.Conv2d(c, cfg.d_model, 1),
                    nn.GroupNorm(32, cfg.d_model)) for c in chans]
                projs.append(nn.Sequential(
                    nn.Conv2d(chans[-1], cfg.d_model, 3, 2, 1),
                    nn.GroupNorm(32, cfg.d_model)))
                self.input_proj = nn.ModuleList(projs)
                self.transformer = transformer
                self.bbox_embed = bbox

        return RefGD()


def main():
    model = build_vendored_gdino_full()
    manifest = {k: list(v.shape) for k, v in model.state_dict().items()}
    out = os.path.join(os.path.dirname(__file__),
                       "gdino_swint_manifest.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    n = sum(int(torch.tensor(v).prod()) for v in manifest.values())
    print(f"wrote {out}: {len(manifest)} entries, {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
