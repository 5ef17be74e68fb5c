"""FULL-MODEL parity of the JAX CLIP text tower vs the reference's
vendored EVA02-CLIP `TextTransformer` (ref:ext/eva02_clip/transformer.py:
642-737 — the exact torch code the reference runs, instantiated on
random weights), plus the official-checkpoint shape contract for
EVA02-CLIP-bigE-14-plus (ref:ext/eva02_clip/model_configs/
EVA02-CLIP-bigE-14-plus.json text_cfg; the reference loads the official
EVA02_CLIP_E_psz14_plus_s9B.pt through this architecture,
ref:ext/clip_wrapper_eva02.py:17-19).

This closes the VERDICT round-2 gap: the primitive-level MHA test
(test_clip_text.py) could not catch a misread of LN placement or
EOT-pooling; comparing whole-model outputs on identical weights can —
the same discipline as test_grounding.py's GroundingDINO parity.
"""

import importlib
import importlib.machinery
import json
import os
import sys
import types

import jax
import numpy as np
import pytest

from goi_tpu.query.clip_text import (CLIPTextConfig, clip_text_forward,
                                     convert_openclip_text_state,
                                     init_clip_text_params)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

EVA = "/root/reference/ext/eva02_clip"
MANIFEST = os.path.join(os.path.dirname(__file__), "golden",
                        "eva02_text_bigE_manifest.json")

# EVA02-CLIP-bigE-14-plus text_cfg (ref:model_configs/
# EVA02-CLIP-bigE-14-plus.json) + embed_dim 1024
BIGE = CLIPTextConfig(vocab_size=49408, context_length=77, width=1280,
                      heads=20, layers=32, embed_dim=1024)


def _mod(name, path=None):
    m = types.ModuleType(name)
    if path is not None:
        m.__path__ = [path] if path else []
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def _stub_deps():
    """timm/torchvision stubs so the vendored transformer.py imports
    without its heavy (absent) dependency chain — the same trick as
    test_grounding._stub_ref_packages, kept superset-compatible."""
    if "timm" not in sys.modules:
        def trunc_normal_(t, std=1.0, **kw):
            with torch.no_grad():
                t.normal_(0, std)
            return t

        _mod("timm", "")
        tl = _mod("timm.models", "")
        tl = _mod("timm.models.layers")
        tl.trunc_normal_ = trunc_normal_
        tl.DropPath = nn.Identity
        tl.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    else:
        sys.modules.setdefault(
            "timm.models.layers",
            sys.modules.get("timm.models.layers") or sys.modules["timm"])
    if "torchvision" not in sys.modules:
        tv = _mod("torchvision", "")
        ops = _mod("torchvision.ops", "")
        tv.ops = ops
    # vendored utils.py: from torchvision.ops.misc import FrozenBatchNorm2d
    if "torchvision.ops.misc" not in sys.modules:
        misc = _mod("torchvision.ops.misc")
        misc.FrozenBatchNorm2d = nn.Identity
        sys.modules["torchvision.ops"].misc = misc


def _vendored_transformer():
    """Import ONLY ext/eva02_clip/transformer.py (plus its rope/utils
    relative imports) as a package, skipping the heavy factory
    __init__."""
    _stub_deps()
    if "eva02_clip_ref" not in sys.modules:
        _mod("eva02_clip_ref", EVA)
    try:
        return importlib.import_module("eva02_clip_ref.transformer")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"vendored eva02_clip not importable: {e}")


TINY = CLIPTextConfig(vocab_size=120, context_length=16, width=64,
                      heads=4, layers=2, embed_dim=32)


def _tiny_tokens(rng, cfg, batch=3):
    tokens = np.zeros((batch, cfg.context_length), np.int32)
    for i in range(batch):
        n = int(rng.integers(3, cfg.context_length - 1))
        tokens[i, 0] = cfg.vocab_size - 10          # SOT-like
        tokens[i, 1:n] = rng.integers(1, cfg.vocab_size - 20, n - 1)
        tokens[i, n] = cfg.vocab_size - 1           # EOT = max id
    return tokens


def _build_vendored(tref, cfg, seed=0):
    torch.manual_seed(seed)
    return tref.TextTransformer(
        context_length=cfg.context_length, vocab_size=cfg.vocab_size,
        width=cfg.width, heads=cfg.heads, layers=cfg.layers,
        output_dim=cfg.embed_dim, act_layer=nn.GELU,
        norm_layer=tref.LayerNorm, xattn=False, attn_mask=True).eval()


def test_fullmodel_parity_vs_vendored_text_transformer():
    """End-to-end embedding equality: vendored torch TextTransformer
    (random weights) vs clip_text_forward on the converted state dict —
    eot pooling, all-token projections, and the causal mask all at
    once."""
    tref = _vendored_transformer()
    model = _build_vendored(tref, TINY)
    tokens = _tiny_tokens(np.random.default_rng(0), TINY)
    with torch.no_grad():
        t_eot = model(torch.tensor(tokens, dtype=torch.long)).numpy()
        hid = model(torch.tensor(tokens, dtype=torch.long),
                    return_all_features=True)
        # the wrapper's last_hidden_state: every token through the
        # projection (ref:ext/clip_wrapper_eva02.py:139-141)
        t_all = (hid @ model.text_projection).numpy()

    params = convert_openclip_text_state(model.state_dict())
    out = clip_text_forward(
        {k: np.asarray(v) for k, v in params.items()},
        np.asarray(tokens), TINY)
    np.testing.assert_allclose(np.asarray(out["eot"]), t_eot,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["tokens"]), t_all,
                               rtol=2e-4, atol=2e-5)


def test_fullmodel_parity_bigE_shaped_single_layer():
    """Same parity at the real bigE LAYER GEOMETRY (width 1280, heads
    20, embed 1024) with layers=2 so head-splitting order is exercised
    at the production head count without a 350M-param test model."""
    tref = _vendored_transformer()
    import dataclasses
    cfg = dataclasses.replace(BIGE, layers=2, vocab_size=512,
                              context_length=20)
    model = _build_vendored(tref, cfg, seed=1)
    tokens = _tiny_tokens(np.random.default_rng(1), cfg, batch=2)
    with torch.no_grad():
        t_eot = model(torch.tensor(tokens, dtype=torch.long)).numpy()
    params = convert_openclip_text_state(model.state_dict())
    out = clip_text_forward(
        {k: np.asarray(v) for k, v in params.items()},
        np.asarray(tokens), cfg)
    np.testing.assert_allclose(np.asarray(out["eot"]), t_eot,
                               rtol=2e-4, atol=2e-5)


def test_bigE_official_checkpoint_shape_contract():
    """The committed names+shapes manifest of the official
    EVA02-CLIP-bigE-14-plus TEXT tower (generated from the vendored
    architecture by tests/golden/derive_eva02_manifest.py; the official
    EVA02_CLIP_E_psz14_plus_s9B.pt state dict carries exactly these
    'text.'-prefixed entries) must convert 1:1 onto the JAX param
    layout — loading the real weights is a tested contract."""
    with open(MANIFEST) as f:
        manifest = json.load(f)
    # converter maps every manifest entry onto a JAX param name
    fake_sd = {k: np.zeros(v, np.float32) for k, v in manifest.items()}
    conv = convert_openclip_text_state(fake_sd)
    expect = jax.eval_shape(
        lambda: init_clip_text_params(jax.random.PRNGKey(0), BIGE))
    assert set(conv) == set(expect), (
        sorted(set(conv) ^ set(expect))[:10])
    for k, v in expect.items():
        assert tuple(conv[k].shape) == tuple(v.shape), (
            k, conv[k].shape, v.shape)


def test_manifest_matches_vendored_architecture():
    """Regenerate the manifest from the vendored architecture (meta
    device — no 350M-param materialization) and diff against the
    committed file, so the contract can never silently rot."""
    tref = _vendored_transformer()
    with torch.device("meta"):
        try:
            model = tref.TextTransformer(
                context_length=BIGE.context_length,
                vocab_size=BIGE.vocab_size, width=BIGE.width,
                heads=BIGE.heads, layers=BIGE.layers,
                output_dim=BIGE.embed_dim, act_layer=nn.GELU,
                norm_layer=tref.LayerNorm, xattn=False, attn_mask=True)
        except (NotImplementedError, RuntimeError) as e:
            pytest.skip(f"meta-device init unsupported here: {e}")
    fresh = {"text." + k: list(v.shape)
             for k, v in model.state_dict().items()}
    with open(MANIFEST) as f:
        committed = json.load(f)
    assert fresh == committed
