"""Deterministic byte-pair-encoding tokenizer (engine side).

Token counts drive every downstream mixture/packing decision
(``pack_sequences``, ``source_mix_sample``, ``job/curate.py``'s audit
budget), and the regex token class they previously used diverges from a
real learned tokenizer on exactly the text quality gates select for
(VERDICT r3 §missing-2).  This module is the real thing: a trained
merges table applied with the standard BPE greedy-merge algorithm,
specified so tightly that an independently written implementation
reproduces it exactly — the oracle side
(pdf_extractor_spark/oracle_mirror/bpe.py) restates the same spec with
separate code, and tests/test_bpe.py pins their equality, so a bug in
either implementation turns the bpe_encode hash gate red instead of
self-certifying.

THE SPEC (every step is part of the cross-implementation contract):

1. MERGES TABLE — checked-in DATA at ``core/bpe_merges.txt`` (UTF-8, one
   merge per line as ``left<TAB>right``, ``#``-prefixed lines ignored),
   trained ONCE offline by ``scripts/train_bpe.py`` on the deterministic
   union corpus (seed-42 transcripts, n_convs=40, turn order + sf0.01
   documents ascending doc_id): greedy highest-pair-frequency merges,
   ties broken to the lexicographically smallest (left, right) pair,
   stopping at 512 merges or when the best pair occurs < 2 times.  The
   table is an artifact like the expected parquet — both encoders
   consume the same bytes; neither retrains at query time.  rank(pair) =
   its 0-based line index; ranks are unique by construction.
2. PRETOKENIZE — ``re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+",
   text)``; whitespace is a separator and never part of any token; NULL
   text encodes to the empty token list.
3. ENCODE (per pretoken) — symbols start as the pretoken's characters.
   Repeat: among adjacent symbol pairs present in the ranks table,
   select the one with the SMALLEST rank; replace ALL its occurrences in
   one left-to-right pass (after merging at position i the scan resumes
   after the merged pair, so ``aaa`` under merge (a,a) → ``[aa, a]``);
   stop when no adjacent pair is in the table.  With a trained table a
   newly created pair always ranks above the pair just applied, but the
   all-occurrences pass is the contract regardless, so arbitrary
   (test-injected) tables agree too.
4. OUTPUT — a document's tokens are the per-pretoken symbol lists
   concatenated in text order.  ``n_tokens`` = len(tokens);
   ``token_checksum`` = md5 hexdigest of ``"\\x1f".join(tokens)`` (so the
   empty document checksums to md5(b"")).

Scale shape: the merges table is ~5 KB — it rides to executors inside
the task closure (the package zip ships only ``.py`` files, so the
artifact itself cannot be imported worker-side), which is the
broadcast-small-dim pattern; encode is a narrow Arrow-batched map with
NO shuffle, and a per-encoder memo keyed by pretoken makes the hot cost
O(distinct pretokens) per task under the Zipfian repetition real text
has, not O(total tokens).
"""

from __future__ import annotations

import hashlib
import re

_PRETOKEN = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+")

MERGES_PATH = __file__[: -len("bpe.py")] + "bpe_merges.txt"

# one memo per distinct merges table per process — bounded; encode
# results are pure functions of (pretoken, table) so caching is inert
_MEMO_CAP = 1 << 17


def load_merges(path: str = MERGES_PATH) -> list[tuple[str, str]]:
    """Read the checked-in merges artifact (spec step 1)."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            left, right = line.split("\t")
            merges.append((left, right))
    return merges


def make_encoder(merges: list[tuple[str, str]]):
    """Build ``encode(text) -> list[str]`` over a fixed merges table.

    The ranks dict and the pretoken memo live in the closure, so one
    encoder per task reuses work across its whole Arrow batch stream.
    """
    ranks = {pair: rank for rank, pair in enumerate(merges)}
    memo: dict[str, tuple[str, ...]] = {}

    def _encode_pretoken(word: str) -> tuple[str, ...]:
        hit = memo.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) > 1:
            best_rank = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            a, b = merges[best_rank]
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        result = tuple(syms)
        if len(memo) < _MEMO_CAP:
            memo[word] = result
        return result

    def encode(text: str | None) -> list[str]:
        if text is None:
            return []
        tokens: list[str] = []
        for word in _PRETOKEN.findall(text):
            tokens.extend(_encode_pretoken(word))
        return tokens

    return encode


def token_checksum(tokens: list[str]) -> str:
    """Spec step 4's content hash (md5 of US-separated tokens)."""
    return hashlib.md5("\x1f".join(tokens).encode("utf-8")).hexdigest()
