"""JAX CLIP text tower: tokenizer + transformer validation.

The transformer is cross-validated against torch.nn.MultiheadAttention
(an independent attention implementation) on the same weights; the
tokenizer against canonical CLIP token ids for the public BPE table.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goi_tpu.query.clip_text import (CLIPTextConfig, ClipTokenizer,
                                     JaxCLIPTextEncoder,
                                     clip_text_forward,
                                     convert_openclip_text_state,
                                     init_clip_text_params)

BPE = "/root/reference/ext/eva02_clip/bpe_simple_vocab_16e6.txt.gz"

CFG = CLIPTextConfig(vocab_size=120, context_length=16, width=64,
                     heads=4, layers=2, embed_dim=32)


def _torch_forward(params, tokens, cfg):
    """Independent torch re-execution of the same weights using
    torch.nn.functional.multi_head_attention_forward."""
    import torch
    import torch.nn.functional as F

    p = {k: torch.tensor(np.asarray(v), dtype=torch.float64)
         for k, v in params.items()}
    tk = torch.tensor(np.asarray(tokens), dtype=torch.long)
    x = p["token_embedding"][tk] + p["positional_embedding"][None]
    t = tk.shape[1]
    mask = torch.triu(torch.full((t, t), float("-inf"),
                                 dtype=torch.float64), diagonal=1)
    for i in range(cfg.layers):
        b = f"resblocks.{i}."
        h = F.layer_norm(x, (cfg.width,), p[b + "ln_1.weight"],
                         p[b + "ln_1.bias"])
        h2 = h.transpose(0, 1)  # (T, B, W)
        attn, _ = F.multi_head_attention_forward(
            h2, h2, h2, cfg.width, cfg.heads,
            p[b + "attn.in_proj_weight"], p[b + "attn.in_proj_bias"],
            None, None, False, 0.0,
            p[b + "attn.out_proj.weight"], p[b + "attn.out_proj.bias"],
            attn_mask=mask, need_weights=False)
        x = x + attn.transpose(0, 1)
        h = F.layer_norm(x, (cfg.width,), p[b + "ln_2.weight"],
                         p[b + "ln_2.bias"])
        h = F.gelu(h @ p[b + "mlp.c_fc.weight"].T
                   + p[b + "mlp.c_fc.bias"])
        x = x + h @ p[b + "mlp.c_proj.weight"].T + p[b + "mlp.c_proj.bias"]
    x = F.layer_norm(x, (cfg.width,), p["ln_final.weight"],
                     p["ln_final.bias"])
    xx = x @ p["text_projection"]
    eot = xx[torch.arange(xx.shape[0]), tk.argmax(dim=-1)]
    return eot.numpy(), xx.numpy()


def test_transformer_matches_torch_mha():
    params = init_clip_text_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    tokens = np.zeros((3, CFG.context_length), np.int32)
    for i in range(3):
        n = rng.integers(3, CFG.context_length - 1)
        tokens[i, 0] = 110
        tokens[i, 1:n] = rng.integers(1, 100, n - 1)
        tokens[i, n] = 119  # EOT = max id
    out = clip_text_forward(params, jnp.asarray(tokens), CFG)
    t_eot, t_all = _torch_forward(params, tokens, CFG)
    np.testing.assert_allclose(np.asarray(out["eot"]), t_eot,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["tokens"]), t_all,
                               rtol=1e-4, atol=1e-5)
    assert list(np.asarray(out["eot_idx"])) == list(tokens.argmax(1))


def test_convert_openclip_state_dict():
    import torch
    params = init_clip_text_params(jax.random.PRNGKey(1), CFG)
    sd = {}
    for k, v in params.items():
        name = "token_embedding.weight" if k == "token_embedding" else k
        if name.startswith("resblocks."):
            name = "transformer." + name
        sd["text." + name] = torch.tensor(np.asarray(v))
    conv = convert_openclip_text_state(sd)
    assert set(conv) == set(params)
    for k in params:
        np.testing.assert_array_equal(conv[k], np.asarray(params[k]))


@pytest.mark.skipif(not os.path.exists(BPE),
                    reason="public CLIP BPE table not present")
def test_tokenizer_canonical_ids():
    tok = ClipTokenizer(BPE)
    ids = tok(["a photo of a cat"])
    # canonical CLIP tokenization (sot, a, photo, of, a, cat, eot)
    assert ids.shape == (1, 77)
    np.testing.assert_array_equal(
        ids[0, :7], [49406, 320, 1125, 539, 320, 2368, 49407])
    assert (ids[0, 7:] == 0).all()
    # merges exercise multi-token words + punctuation
    ids2 = tok(["A Photo   of CATS!"])[0]
    assert ids2[0] == 49406 and 49407 in ids2
    # case/whitespace insensitivity of the cleanup
    np.testing.assert_array_equal(
        tok(["a  PHOTO of a cat"])[0], ids[0])


@pytest.mark.skipif(not os.path.exists(BPE),
                    reason="public CLIP BPE table not present")
def test_encoder_end_to_end():
    params = init_clip_text_params(
        jax.random.PRNGKey(2),
        dataclasses_replace_vocab(CFG, vocab_size=49408,
                                  context_length=77))
    enc = JaxCLIPTextEncoder(
        params, dataclasses_replace_vocab(CFG, vocab_size=49408,
                                          context_length=77), BPE)
    e1 = enc.encode("a red chair")
    e2 = enc.encode("a red chair")
    e3 = enc.encode("a blue table")
    assert e1.shape == (CFG.embed_dim,)
    np.testing.assert_array_equal(e1, e2)
    assert np.abs(e1 - e3).max() > 1e-4


def dataclasses_replace_vocab(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)
