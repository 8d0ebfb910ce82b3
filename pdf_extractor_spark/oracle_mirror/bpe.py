"""Oracle-side mirror of the BPE encoder.

Implements the tokenizer SPEC from pdf_extractor_spark/core/bpe.py
(checked-in ranked merges table; ``[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+``
pretokens; per pretoken repeatedly merge ALL occurrences of the
smallest-ranked adjacent pair in one left-to-right pass; document tokens
= per-pretoken lists concatenated; checksum = md5 of
``"\\x1f"``-joined tokens) — with independent code, importing nothing
from the engine side.  tests/test_bpe.py pins equality of the two
encoders; scripts/gen_expected.py uses THIS one to serialize
expected/bpe_encode.parquet, so a bug in either implementation turns the
bpe_encode hash gate red instead of self-certifying.

The merges table itself is a shared ARTIFACT (like the expected parquet
and the seed-42 corpus), not shared code: both sides parse the same
checked-in bytes.
"""

from __future__ import annotations

import hashlib
import re

_MIRROR_PRETOKEN_PAT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def mirror_load_merges(path: str) -> list[tuple[str, str]]:
    out = []
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            raw = raw.rstrip("\n")
            if raw == "" or raw[0] == "#":
                continue
            cols = raw.split("\t")
            out.append((cols[0], cols[1]))
    return out


def _merge_pass(syms: tuple[str, ...], left: str,
                right: str) -> tuple[str, ...]:
    """One left-to-right all-occurrences pass of a single merge rule."""
    out: list[str] = []
    k = 0
    while k < len(syms):
        if (k + 1 < len(syms) and syms[k] == left
                and syms[k + 1] == right):
            out.append(left + right)
            k += 2
        else:
            out.append(syms[k])
            k += 1
    return tuple(out)


def mirror_encode_word(word: str,
                       merges: list[tuple[str, str]]) -> tuple[str, ...]:
    rank_of = {}
    for idx, pair in enumerate(merges):
        rank_of[pair] = idx
    syms: tuple[str, ...] = tuple(word)
    while True:
        present = [
            rank_of[p]
            for p in zip(syms, syms[1:])
            if p in rank_of
        ]
        if not present:
            return syms
        left, right = merges[min(present)]
        syms = _merge_pass(syms, left, right)


def mirror_encode(text: str | None,
                  merges: list[tuple[str, str]]) -> list[str]:
    if text is None:
        return []
    toks: list[str] = []
    for word in re.findall(_MIRROR_PRETOKEN_PAT, text):
        toks.extend(mirror_encode_word(word, merges))
    return toks


def mirror_checksum(tokens: list[str]) -> str:
    joined = "\x1f".join(tokens)
    return hashlib.md5(joined.encode("utf-8")).hexdigest()
