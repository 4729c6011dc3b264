"""Byte-level BPE tokenizer loader — exact token-id parity with the
reference's committed HF tokenizer files.

The reference featurizes SQL text with a committed Qwen2-class tokenizer
(``models/RF/Model/tokenizer/{vocab.json,merges.txt,added_tokens.json}``,
consumed by ``sql_encoder.py:21-41`` via ``AutoTokenizer``;
``tokenizer_config.json`` pins ``tokenizer_class: Qwen2Tokenizer``).  That
class is the standard GPT-2-style byte-level BPE (public algorithm:
Sennrich et al. 2016; Radford et al. 2019 byte mapping; the Qwen2
pre-tokenization split pattern is published in the ``transformers``
source).  This module re-implements it in pure Python over the committed
JSON/text files — no ``transformers``/``torch`` dependency, no network —
so featurization consumes the SAME token-id sequences the reference's
encoder produces:

* NFC-normalize (Qwen2 normalizes before splitting);
* split off added/special tokens verbatim (longest-first alternation);
* pre-tokenize with the Qwen2 split regex (contractions / letter runs /
  single digits / punctuation / newline runs / trailing-space lookahead);
* map each pre-token's UTF-8 bytes through the GPT-2 byte↔unicode table;
* greedily merge the lowest-ranked adjacent pair until none remains
  (``merges.txt`` order IS the rank);
* look the merged symbols up in ``vocab.json``.

Byte-level coverage means every input has an encoding (all 256 mapped
bytes are in the vocab) — no UNK path, and ``decode(encode(x)) ==
NFC(x)`` exactly; both laws plus an independent replay-in-rank-order BPE
implementation are pinned in ``tests/test_ml.py``.

Scale: the tokenizer is a ~5 MB immutable table loaded once per process
and closure-captured into Arrow-batched pandas UDFs — executors pay one
deserialization each, the hot loop is per-batch Python exactly like the
reference's HF encoder, and no shuffle is introduced.
"""

from __future__ import annotations

import json
import os
import unicodedata
from functools import lru_cache

# The Qwen2 pre-tokenization pattern (published in transformers'
# tokenization_qwen2.py). Requires the `regex` module for \p classes.
_PRETOKENIZE_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)"
    r"|[^\r\n\p{L}\p{N}]?\p{L}+"
    r"|\p{N}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*"
    r"|\s*[\r\n]+"
    r"|\s+(?!\S)"
    r"|\s+"
)


@lru_cache(maxsize=1)
def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2 reversible byte→printable-unicode map (Radford et al. 2019):
    printable latin-1 bytes map to themselves, the rest shift to 256+."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class ByteLevelBPETokenizer:
    """Greedy byte-level BPE over committed vocab.json + merges.txt."""

    def __init__(self, tokenizer_dir: str) -> None:
        with open(os.path.join(tokenizer_dir, "vocab.json"), encoding="utf-8") as f:
            self.vocab: dict[str, int] = json.load(f)
        self.ranks: dict[tuple[str, str], int] = {}
        with open(os.path.join(tokenizer_dir, "merges.txt"), encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split(" ")
                self.ranks[(a, b)] = len(self.ranks)
        self.added: dict[str, int] = {}
        added_path = os.path.join(tokenizer_dir, "added_tokens.json")
        if os.path.exists(added_path):
            with open(added_path, encoding="utf-8") as f:
                self.added = json.load(f)
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self.id_to_token.update({i: t for t, i in self.added.items()})

        import regex

        self._pat = regex.compile(_PRETOKENIZE_PATTERN)
        if self.added:
            # longest-first so overlapping specials resolve like HF's trie
            alts = sorted(self.added, key=len, reverse=True)
            self._added_pat = regex.compile(
                "(" + "|".join(regex.escape(t) for t in alts) + ")"
            )
        else:
            self._added_pat = None
        self._bpe_cache: dict[str, tuple[str, ...]] = {}

    # -- core BPE -----------------------------------------------------
    def _bpe(self, token: str) -> tuple[str, ...]:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word: tuple[str, ...] = tuple(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 60))
            if best not in self.ranks:
                break
            a, b = best
            merged: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        if len(self._bpe_cache) < 65536:
            self._bpe_cache[token] = word
        return word

    # -- public API ---------------------------------------------------
    def encode(self, text: str) -> list[int]:
        """Text → token ids, bit-equal to Qwen2Tokenizer(text).input_ids
        (no BOS/EOS added: the config pins add_bos_token=false and the
        reference encoder calls the bare tokenizer)."""
        text = unicodedata.normalize("NFC", text)
        ids: list[int] = []
        segments = (
            self._added_pat.split(text) if self._added_pat is not None else [text]
        )
        for seg in segments:
            if not seg:
                continue
            if seg in self.added:
                ids.append(self.added[seg])
                continue
            for pretoken in self._pat.findall(seg):
                mapped = "".join(
                    self.byte_encoder[b] for b in pretoken.encode("utf-8")
                )
                ids.extend(self.vocab[sym] for sym in self._bpe(mapped))
        return ids

    def decode(self, ids: list[int]) -> str:
        out: list[str] = []
        buf: list[int] = []
        for i in ids:
            tok = self.id_to_token[i]
            if tok in self.added:
                if buf:
                    out.append(bytes(buf).decode("utf-8", errors="replace"))
                    buf = []
                out.append(tok)
            else:
                buf.extend(self.byte_decoder[c] for c in tok)
        if buf:
            out.append(bytes(buf).decode("utf-8", errors="replace"))
        return "".join(out)

    def __len__(self) -> int:
        return len(self.vocab) + len(self.added)


@lru_cache(maxsize=2)
def load_tokenizer(tokenizer_dir: str) -> ByteLevelBPETokenizer:
    """Process-cached loader (the table is immutable; executors and the
    driver each deserialize the files once)."""
    return ByteLevelBPETokenizer(tokenizer_dir)


# The reference's committed tokenizer, when its checkout is present.
REFERENCE_TOKENIZER_DIR = "/root/reference/models/RF/Model/tokenizer"
