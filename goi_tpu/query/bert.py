"""BERT text encoder in pure JAX + WordPiece tokenizer.

The language tower of the RES detector (GroundingDINO conditions on a
frozen bert-base-uncased; ref:ext/GroundingDINO/groundingdino/models/
GroundingDINO/bertwarper.py and groundingdino.py:107-115). Weights are
pluggable: params is a FLAT dict keyed by the HF state_dict names under
the ``bert.`` prefix (``bert.encoder.layer.0.attention.self.query.
weight`` ...), exactly as they appear inside the released
groundingdino checkpoint.

Also re-hosts the bertwarper preprocessing:
``special_token_masks`` reproduces
generate_masks_with_special_tokens_and_transfer_map
(ref:bertwarper.py:224-273): each sub-sentence between special tokens
([CLS]/[SEP]/./?) only self-attends, and position ids restart at every
special token. Computed host-side in numpy (token layout is data, not
compute), consumed by the jitted encoder as an additive mask.

The WordPiece tokenizer implements the public BERT algorithm (basic
tokenizer: lowercase + accent strip + punctuation split; greedy
longest-match-first wordpiece with ``##`` continuations). The vocab
file ships with any BERT checkpoint; ``make_test_vocab`` builds a tiny
one for weight-free tests.
"""

from __future__ import annotations

import dataclasses
import unicodedata
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2


BERT_BASE = BertConfig()
BERT_TINY_TEST = BertConfig(vocab_size=64, hidden=16, layers=2, heads=2,
                            intermediate=32, max_position=64)


# ---------------------------------------------------------------------------
# WordPiece tokenizer
# ---------------------------------------------------------------------------

def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
            or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _basic_tokenize(text: str) -> List[str]:
    text = text.lower()
    text = unicodedata.normalize("NFD", text)
    text = "".join(c for c in text if unicodedata.category(c) != "Mn")
    out: List[str] = []
    buf = ""
    for ch in text:
        if ch.isspace():
            if buf:
                out.append(buf)
            buf = ""
        elif _is_punct(ch):
            if buf:
                out.append(buf)
            buf = ""
            out.append(ch)
        else:
            buf += ch
    if buf:
        out.append(buf)
    return out


class BertTokenizer:
    """WordPiece tokenizer over a vocab.txt (one token per line)."""

    def __init__(self, vocab: Dict[str, int] | str):
        if isinstance(vocab, str):
            with open(vocab, encoding="utf-8") as f:
                vocab = {line.rstrip("\n"): i
                         for i, line in enumerate(f) if line.rstrip("\n")}
        self.vocab = dict(vocab)
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        self.cls_id = self.vocab["[CLS]"]
        self.sep_id = self.vocab["[SEP]"]
        self.unk_id = self.vocab["[UNK]"]
        self.pad_id = self.vocab.get("[PAD]", 0)

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > 100:   # HF BERT max_input_chars_per_word
            return [self.unk_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str) -> List[int]:
        """[CLS] wordpieces [SEP] (matches HF tokenizer(text))."""
        ids = [self.cls_id]
        for w in _basic_tokenize(text):
            ids.extend(self._wordpiece(w))
        ids.append(self.sep_id)
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        toks = [self.ids_to_tokens.get(int(i), "[UNK]") for i in ids]
        out = ""
        for t in toks:
            if t.startswith("##"):
                out += t[2:]
            else:
                out += (" " if out else "") + t
        return out

    def special_ids(self) -> List[int]:
        """[CLS], [SEP], ., ? — the GroundingDINO sub-sentence splitters
        (ref:groundingdino.py:119)."""
        return [self.vocab[t] for t in ("[CLS]", "[SEP]", ".", "?")
                if t in self.vocab]


def make_test_vocab(words: Sequence[str]) -> Dict[str, int]:
    base = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", ","]
    toks = list(base)
    for w in words:
        if w not in toks:
            toks.append(w)
    return {t: i for i, t in enumerate(toks)}


# ---------------------------------------------------------------------------
# bertwarper sub-sentence masks
# ---------------------------------------------------------------------------

def special_token_masks(input_ids: np.ndarray,
                        special_ids: Sequence[int]):
    """(bs, L) token ids -> (attn (bs, L, L) bool, position_ids
    (bs, L) int32, cate_to_token (bs lists of (n_cat, L) bool)).
    Exact re-host of
    generate_masks_with_special_tokens_and_transfer_map
    (ref:bertwarper.py:224-273)."""
    input_ids = np.asarray(input_ids)
    bs, n = input_ids.shape
    special = np.isin(input_ids, np.asarray(list(special_ids)))
    attn = np.eye(n, dtype=bool)[None].repeat(bs, 0)
    pos = np.zeros((bs, n), np.int32)
    cate: List[List[np.ndarray]] = [[] for _ in range(bs)]
    prev = 0
    for row, col in np.argwhere(special):
        if col == 0 or col == n - 1:
            pos[row, col] = 0
        else:
            attn[row, prev + 1:col + 1, prev + 1:col + 1] = True
            pos[row, prev + 1:col + 1] = np.arange(col - prev)
            m = np.zeros(n, bool)
            m[prev + 1:col] = True
            cate[row].append(m)
        prev = col
    cate_np = [np.stack(c, 0) if c else np.zeros((0, n), bool)
               for c in cate]
    return attn, pos, cate_np


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

from goi_tpu.query._nn import gelu as _gelu, linear as _linear
from goi_tpu.query._nn import layer_norm as _layer_norm


def _ln(p, name, x, eps=1e-12):   # BERT eps (HF config default)
    return _layer_norm(p, name, x, eps=eps)


def bert_forward(p: dict, cfg: BertConfig, input_ids: jax.Array,
                 attn_mask: jax.Array, position_ids: jax.Array,
                 token_type_ids: jax.Array | None = None,
                 prefix: str = "bert") -> jax.Array:
    """input_ids (bs, L) int32; attn_mask (bs, L, L) bool (True =
    attend, the bertwarper sub-sentence mask); position_ids (bs, L).
    Returns last_hidden_state (bs, L, hidden)."""
    pre = f"{prefix}.embeddings"
    x = p[f"{pre}.word_embeddings.weight"][input_ids]
    x = x + p[f"{pre}.position_embeddings.weight"][position_ids]
    tt = token_type_ids if token_type_ids is not None \
        else jnp.zeros_like(input_ids)
    x = x + p[f"{pre}.token_type_embeddings.weight"][tt]
    x = _ln(p, f"{pre}.LayerNorm", x)

    bias = jnp.where(attn_mask[:, None], 0.0, -1e9)  # (bs, 1, L, L)
    hd = cfg.hidden // cfg.heads
    for i in range(cfg.layers):
        lyr = f"{prefix}.encoder.layer.{i}"
        q = _linear(p, f"{lyr}.attention.self.query", x)
        k = _linear(p, f"{lyr}.attention.self.key", x)
        v = _linear(p, f"{lyr}.attention.self.value", x)

        def split(a):
            return a.reshape(a.shape[0], -1, cfg.heads, hd) \
                .transpose(0, 2, 1, 3)

        a = split(q) @ split(k).transpose(0, 1, 3, 2) / np.sqrt(hd)
        a = jax.nn.softmax(a + bias, -1)
        o = (a @ split(v)).transpose(0, 2, 1, 3) \
            .reshape(x.shape[0], -1, cfg.hidden)
        x = _ln(p, f"{lyr}.attention.output.LayerNorm",
                x + _linear(p, f"{lyr}.attention.output.dense", o))
        h = _gelu(_linear(p, f"{lyr}.intermediate.dense", x))
        x = _ln(p, f"{lyr}.output.LayerNorm",
                x + _linear(p, f"{lyr}.output.dense", h))
    return x


def bert_param_shapes(cfg: BertConfig, prefix: str = "bert") -> dict:
    s = {}
    h = cfg.hidden
    pre = f"{prefix}.embeddings"
    s[f"{pre}.word_embeddings.weight"] = (cfg.vocab_size, h)
    s[f"{pre}.position_embeddings.weight"] = (cfg.max_position, h)
    s[f"{pre}.token_type_embeddings.weight"] = (cfg.type_vocab, h)
    s[f"{pre}.LayerNorm.weight"] = (h,)
    s[f"{pre}.LayerNorm.bias"] = (h,)
    for i in range(cfg.layers):
        lyr = f"{prefix}.encoder.layer.{i}"
        for nm in ("attention.self.query", "attention.self.key",
                   "attention.self.value", "attention.output.dense"):
            s[f"{lyr}.{nm}.weight"] = (h, h)
            s[f"{lyr}.{nm}.bias"] = (h,)
        s[f"{lyr}.attention.output.LayerNorm.weight"] = (h,)
        s[f"{lyr}.attention.output.LayerNorm.bias"] = (h,)
        s[f"{lyr}.intermediate.dense.weight"] = (cfg.intermediate, h)
        s[f"{lyr}.intermediate.dense.bias"] = (cfg.intermediate,)
        s[f"{lyr}.output.dense.weight"] = (h, cfg.intermediate)
        s[f"{lyr}.output.dense.bias"] = (h,)
        s[f"{lyr}.output.LayerNorm.weight"] = (h,)
        s[f"{lyr}.output.LayerNorm.bias"] = (h,)
    s[f"{prefix}.pooler.dense.weight"] = (h, h)
    s[f"{prefix}.pooler.dense.bias"] = (h,)
    return s
