"""Self-contained CLIP BPE tokenizer.

The reference uses transformers' CLIPTokenizer pair from the SDXL repo
(train_unziplora.py:1240-1254). This implementation needs only the
vocab.json + merges.txt files (no transformers import on the serving
path); SDXL usage: tokenizer 1 pads with its EOS id, tokenizer 2 pads
with 0.
"""
from __future__ import annotations

import functools
import gzip
import html
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte->unicode mapping."""
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


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _whitespace_clean(text: str) -> str:
    import re
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """Byte-level BPE with '</w>' word terminals (CLIP flavor)."""

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 *, bos_token: str = "<|startoftext|>",
                 eos_token: str = "<|endoftext|>",
                 pad_token_id: Optional[int] = None,
                 model_max_length: int = 77):
        import regex
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.bos_token_id = vocab[bos_token]
        self.eos_token_id = vocab[eos_token]
        self.pad_token_id = (pad_token_id if pad_token_id is not None
                             else self.eos_token_id)
        self.model_max_length = model_max_length
        self.cache = {bos_token: bos_token, eos_token: eos_token}
        self.pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE)
        self._init_native()

    def _init_native(self):
        """Optional C++ BPE merge loop (native/tokenizer.cpp)."""
        self._native = None
        try:
            import ctypes
            import subprocess
            base = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), "native")
            so = os.path.join(base, "build", "libvst_tokenizer.so")
            if not os.path.exists(so):
                subprocess.run(["make", "-C", base], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            lib.tok_create.restype = ctypes.c_void_p
            lib.tok_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.tok_bpe.restype = ctypes.c_int
            lib.tok_bpe.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_int]
            vocab_blob = "\n".join(f"{t}\t{i}"
                                   for t, i in self.encoder.items())
            merges_blob = "\n".join(
                f"{a} {b}" for (a, b), _ in
                sorted(self.bpe_ranks.items(), key=lambda kv: kv[1]))
            self._native = (lib, lib.tok_create(
                vocab_blob.encode("utf-8"), merges_blob.encode("utf-8")))
        except Exception:
            self._native = None

    def _bpe_ids_native(self, token: str):
        import ctypes
        lib, handle = self._native
        out = (ctypes.c_int * (len(token) + 2))()
        n = lib.tok_bpe(handle, token.encode("utf-8"), out, len(out))
        if n < 0:
            raise KeyError(token)
        return list(out[:n])

    @classmethod
    def from_dir(cls, path: str, **kw) -> "CLIPTokenizer":
        with open(os.path.join(path, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(os.path.join(path, "merges.txt"), encoding="utf-8") as f:
            for line in f.read().split("\n"):
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        return cls(vocab, merges, **kw)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
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

    def _tokenize(self, text: str) -> List[int]:
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        ids: List[int] = []
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            if self._native is not None:
                ids.extend(self._bpe_ids_native(token))
            else:
                ids.extend(self.encoder[t]
                           for t in self.bpe(token).split(" "))
        return ids

    def __call__(self, texts, *, max_length: Optional[int] = None,
                 padding: str = "max_length",
                 truncation: bool = True) -> np.ndarray:
        """texts: str or list -> (B, max_length) int32 ids with BOS/EOS
        and padding, matching transformers' CLIPTokenizer output."""
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        rows = []
        for text in texts:
            ids = self._tokenize(text)
            if truncation:
                ids = ids[: max_length - 2]
            rows.append([self.bos_token_id] + ids + [self.eos_token_id])
        longest = max(len(r) for r in rows)
        if padding == "longest" or padding is False or padding == "do_not_pad":
            # truncation=False with an over-long prompt: transformers
            # returns the long sequence rather than erroring
            width = longest
        else:
            width = max_length
            if longest > max_length:
                # transformers leaves only the over-long row long;
                # widening the whole batch would silently change every
                # row's width (and CLIP position embeddings cap at 77)
                raise ValueError(
                    f"sequence of length {longest} exceeds max_length="
                    f"{max_length} with truncation=False and "
                    f"padding='max_length'; pass truncation=True or "
                    f"padding='longest'")
        out = np.full((len(rows), width), self.pad_token_id, np.int32)
        for i, row in enumerate(rows):
            out[i, : len(row)] = row
        return out

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids
                       if int(i) in self.decoder)
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")
