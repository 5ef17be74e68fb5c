"""In-loop CLIP-style text tower in pure JAX (+ BPE tokenizer).

Restores true open-vocabulary querying (VERDICT round-2 item 4): the
reference embeds arbitrary prompts live with a frozen EVA02-CLIP text
transformer (ref:ext/clip_wrapper_eva02.py:50-148,
ref:ext/eva02_clip/model.py:250-262: token_embedding + positional
embedding -> causal-masked pre-LN transformer -> ln_final -> projection
taken at the EOT token = argmax of token ids). Weights are multi-GB
external artifacts (no egress here), so — LPIPS-style — the tower is a
faithful JAX re-implementation with PLUGGABLE weights: convert any
open_clip-format text checkpoint with `convert_openclip_text_state` and
load the resulting .npz. Architecture (width/heads/layers) comes from a
config, e.g. EVA02-CLIP-bigE-14-plus text_cfg: width 1280, heads 20,
layers 32, context 77, vocab 49408, embed_dim 1024.

The BPE tokenizer implements the public CLIP byte-pair-encoding
algorithm; the merge table (`bpe_simple_vocab_16e6.txt.gz`, standard
public CLIP asset) is likewise supplied by the user at runtime.
"""

from __future__ import annotations

import dataclasses
import gzip
import html
import re
from functools import lru_cache
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# BPE tokenizer (CLIP SimpleTokenizer algorithm)
# ---------------------------------------------------------------------------

@lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable-unicode map (public GPT-2/CLIP BPE
    preliminary)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class ClipTokenizer:
    """CLIP BPE tokenizer. `bpe_path` points at the standard public
    bpe_simple_vocab_16e6.txt.gz merge table (user-supplied asset)."""

    SOT = "<|startoftext|>"
    EOT = "<|endoftext|>"

    def __init__(self, bpe_path: str, context_length: int = 77):
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in
                  lines[1: 49152 - 256 - 2 + 1] if m]
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [self.SOT, self.EOT]
        self.encoder: Dict[str, int] = {t: i for i, t in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {self.SOT: self.SOT, self.EOT: self.EOT}
        try:
            import regex
            self.pat = regex.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|"""
                r"""'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
                regex.IGNORECASE)
            self._findall = self.pat.findall
        except ImportError:  # ascii fallback, fine for english prompts
            pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|"""
                r"""'ll|'d|[a-z]+|[0-9]|[^\sa-z0-9]+""", re.IGNORECASE)
            self._findall = pat.findall

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(
                p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text).strip().lower()
        ids: List[int] = []
        for tok in self._findall(text):
            tok = "".join(self.byte_encoder[b]
                          for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def __call__(self, texts, context_length: Optional[int] = None
                 ) -> np.ndarray:
        """List of prompts -> (B, context) int32 token matrix with
        SOT/EOT and zero padding (matches open_clip tokenize; EOT is the
        max id so argmax finds it, ref:eva02_clip/model.py:261)."""
        if isinstance(texts, str):
            texts = [texts]
        ctx = context_length or self.context_length
        out = np.zeros((len(texts), ctx), np.int32)
        sot, eot = self.encoder[self.SOT], self.encoder[self.EOT]
        for i, t in enumerate(texts):
            ids = [sot] + self.encode(t)[: ctx - 2] + [eot]
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# Text transformer
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    quick_gelu: bool = False


def init_clip_text_params(key, cfg: CLIPTextConfig,
                          scale: float = 0.02) -> dict:
    """Random init with the layout produced by
    convert_openclip_text_state (for tests / training-from-scratch)."""
    ks = iter(jax.random.split(key, 6 + 16 * cfg.layers))
    w = cfg.width

    def rnd(shape, s=scale):
        return jax.random.normal(next(ks), shape, jnp.float32) * s

    p = {
        "token_embedding": rnd((cfg.vocab_size, w)),
        "positional_embedding": rnd((cfg.context_length, w), 0.01),
        "ln_final.weight": jnp.ones(w), "ln_final.bias": jnp.zeros(w),
        "text_projection": rnd((w, cfg.embed_dim), w ** -0.5),
    }
    for i in range(cfg.layers):
        b = f"resblocks.{i}."
        p[b + "ln_1.weight"] = jnp.ones(w)
        p[b + "ln_1.bias"] = jnp.zeros(w)
        p[b + "ln_2.weight"] = jnp.ones(w)
        p[b + "ln_2.bias"] = jnp.zeros(w)
        p[b + "attn.in_proj_weight"] = rnd((3 * w, w), w ** -0.5)
        p[b + "attn.in_proj_bias"] = jnp.zeros(3 * w)
        p[b + "attn.out_proj.weight"] = rnd((w, w), w ** -0.5)
        p[b + "attn.out_proj.bias"] = jnp.zeros(w)
        p[b + "mlp.c_fc.weight"] = rnd((4 * w, w), w ** -0.5)
        p[b + "mlp.c_fc.bias"] = jnp.zeros(4 * w)
        p[b + "mlp.c_proj.weight"] = rnd((w, 4 * w), w ** -0.5)
        p[b + "mlp.c_proj.bias"] = jnp.zeros(w)
    return p


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _attn(x, p, prefix, heads, mask):
    b, t, w = x.shape
    qkv = x @ p[prefix + "attn.in_proj_weight"].T \
        + p[prefix + "attn.in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = w // heads

    def split(a):
        return a.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    logits = (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5) + mask
    out = jax.nn.softmax(logits, axis=-1) @ v
    out = out.transpose(0, 2, 1, 3).reshape(b, t, w)
    return out @ p[prefix + "attn.out_proj.weight"].T \
        + p[prefix + "attn.out_proj.bias"]


def clip_text_forward(params: dict, tokens: jax.Array,
                      cfg: CLIPTextConfig) -> dict:
    """tokens (B, context) int32 -> dict(eot (B, embed_dim),
    tokens (B, context, embed_dim)) — the wrapper's
    last_hidden_state_eot / last_hidden_state
    (ref:ext/clip_wrapper_eva02.py:129-148)."""
    x = params["token_embedding"][tokens]           # (B, T, W)
    x = x + params["positional_embedding"][None]
    t = tokens.shape[1]
    causal = jnp.where(
        jnp.arange(t)[None, :] > jnp.arange(t)[:, None], -jnp.inf, 0.0)

    gelu = (lambda v: v * jax.nn.sigmoid(1.702 * v)) if cfg.quick_gelu \
        else (lambda v: jax.nn.gelu(v, approximate=False))  # erf form,
    # matching torch.nn.functional.gelu / open_clip default
    for i in range(cfg.layers):
        pre = f"resblocks.{i}."
        h = _ln(x, params[pre + "ln_1.weight"], params[pre + "ln_1.bias"])
        x = x + _attn(h, params, pre, cfg.heads, causal)
        h = _ln(x, params[pre + "ln_2.weight"], params[pre + "ln_2.bias"])
        h = h @ params[pre + "mlp.c_fc.weight"].T \
            + params[pre + "mlp.c_fc.bias"]
        h = gelu(h)
        x = x + (h @ params[pre + "mlp.c_proj.weight"].T
                 + params[pre + "mlp.c_proj.bias"])

    x = _ln(x, params["ln_final.weight"], params["ln_final.bias"])
    proj = params["text_projection"]
    all_tokens = x @ proj
    eot_idx = jnp.argmax(tokens, axis=-1)
    eot = jnp.take_along_axis(
        all_tokens, eot_idx[:, None, None].repeat(
            all_tokens.shape[-1], -1), axis=1)[:, 0]
    return {"eot": eot, "tokens": all_tokens, "eot_idx": eot_idx}


def convert_openclip_text_state(state_dict) -> dict:
    """torch open_clip text-tower state_dict -> flat numpy params with
    this module's names. Accepts both bare ('transformer.resblocks...')
    and wrapped ('text.transformer.resblocks...') prefixes; run offline
    once and np.savez the result."""
    out = {}
    for k, v in state_dict.items():
        k = k[5:] if k.startswith("text.") else k
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        if k in ("token_embedding.weight",):
            k = "token_embedding"
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                         else v, np.float32)
        out[k] = arr
    return out


class JaxCLIPTextEncoder:
    """TextEncoder-protocol provider: live prompt -> (embed_dim,)
    embedding, fully in JAX (role of ref:ext/clip_wrapper_eva02.py
    encode_text)."""

    def __init__(self, params: dict, cfg: CLIPTextConfig,
                 bpe_path: str):
        self.cfg = cfg
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.tokenizer = ClipTokenizer(bpe_path, cfg.context_length)
        self._fwd = jax.jit(
            lambda p, t: clip_text_forward(p, t, cfg)["eot"])

    @staticmethod
    def from_npz(path: str, cfg: CLIPTextConfig, bpe_path: str
                 ) -> "JaxCLIPTextEncoder":
        return JaxCLIPTextEncoder(dict(np.load(path)), cfg, bpe_path)

    def encode(self, prompt: str) -> np.ndarray:
        toks = jnp.asarray(self.tokenizer([prompt]))
        return np.asarray(self._fwd(self.params, toks)[0], np.float32)

    def encode_batch(self, prompts: List[str]) -> np.ndarray:
        toks = jnp.asarray(self.tokenizer(prompts))
        return np.asarray(self._fwd(self.params, toks), np.float32)
