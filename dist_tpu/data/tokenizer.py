"""CLIP BPE tokenizer (reference dataset/utils/simple_tokenizer.py:64-179).

Fresh implementation of the standard CLIP byte-pair-encoding scheme:
byte->unicode table, lowercasing + whitespace cleanup, BPE merges from the
public ``bpe_simple_vocab_16e6.txt.gz`` vocabulary, ``<|startoftext|>`` /
``<|endoftext|>`` framing, 77-token context with truncation.

The vocab file is located via (in order) the ``DIST_TPU_BPE_PATH`` env var,
``<repo>/assets/``, and known local installs. If none is found, a
deterministic hash fallback keeps synthetic pipelines running (flagged in
logs — real label-text classification requires the true vocab).
"""

import functools
import gzip
import html
import os

import numpy as np
import regex as re

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)

CONTEXT_LENGTH = 77

_VOCAB_CANDIDATES = [
    os.environ.get("DIST_TPU_BPE_PATH", ""),
    # bundled copy of OpenAI CLIP's public BPE vocabulary
    os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                 "bpe_simple_vocab_16e6.txt.gz"),
]


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte -> printable-unicode map (standard GPT-2/CLIP table)."""
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


def _clean(text):
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.strip().lower()


class SimpleTokenizer:
    def __init__(self, bpe_path):
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        self.byte_encoder = bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE)

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (word[i] == first and i < len(word) - 1
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

    def encode(self, text):
        bpe_tokens = []
        for token in re.findall(self.pat, _clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens


class _HashFallbackTokenizer:
    """Deterministic stand-in when no BPE vocab is available.

    Uses crc32, NOT Python's builtin ``hash`` — str hashes are salted per
    process (PYTHONHASHSEED), which would give every run/host different
    token ids and silently diverge multi-host text features."""

    sot = 49406
    eot = 49407

    def encode(self, text):
        import zlib
        return [(zlib.crc32(w.encode("utf-8")) % 49000) + 300
                for w in _clean(text).split()][:40]


@functools.lru_cache()
def _default_tokenizer():
    for cand in _VOCAB_CANDIDATES:
        if cand and os.path.exists(cand):
            logger.info("CLIP BPE vocab: %s", cand)
            return SimpleTokenizer(cand)
    logger.warning("No CLIP BPE vocab found; using hash fallback tokenizer "
                   "(set DIST_TPU_BPE_PATH for real label-text runs)")
    return _HashFallbackTokenizer()


def tokenize(texts, context_length=CONTEXT_LENGTH):
    """texts -> int32 (N, context_length), sot/eot framed, truncated."""
    if isinstance(texts, str):
        texts = [texts]
    tok = _default_tokenizer()
    if isinstance(tok, SimpleTokenizer):
        sot = tok.encoder["<|startoftext|>"]
        eot = tok.encoder["<|endoftext|>"]
    else:
        sot, eot = tok.sot, tok.eot
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = [sot] + tok.encode(text)[:context_length - 2] + [eot]
        out[i, :len(tokens)] = tokens
    return out
