"""Train the checked-in BPE merges table (core/bpe_merges.txt).

Offline, deterministic, run ONCE (re-run only on an intentional spec
change, then regenerate expected/bpe_encode.parquet):

    python scripts/train_bpe.py

Training corpus (fixed by the spec in core/bpe.py step 1): the seed-42
transcript corpus (n_convs=40, generation order — the flagship
extraction text: LaTeX, math, markup) unioned with the sf0.01 documents
table ascending doc_id (the training-data-ops text).  Greedy BPE:
repeatedly merge the highest-frequency adjacent symbol pair across the
pretoken vocabulary (pair counts weighted by pretoken frequency), ties
to the lexicographically smallest (left, right) pair, stopping at
``N_MERGES`` or when the best pair occurs fewer than 2 times.

Determinism: Counter iteration order never matters because selection is
by (−count, pair) min; pretoken frequency is order-independent; the
corpus inputs are seed-fixed / doc_id-ordered.  tests/test_bpe.py
re-runs this training in-process and pins byte-equality with the
checked-in artifact.

Like scripts/gen_expected.py, this imports NOTHING from
pdf_extractor_spark.job / .queries (the AST gate in
tests/test_gen_expected.py extends to this file): the engine consumes
the artifact; it never influences how the artifact is made.
"""

from __future__ import annotations

import collections
import os
import re
import sys

import duckdb

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pdf_extractor_spark.gen.transcripts import generate_transcripts

N_MERGES = 512
MIN_PAIR_COUNT = 2
_PRETOKEN_PAT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"
SF01_DOCS = "/root/testdata/sf0.01/documents.parquet"
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_extractor_spark", "core", "bpe_merges.txt",
)


def corpus_texts() -> list[str]:
    texts = [
        t for t in generate_transcripts(n_convs=40, seed=42)["text"]
        if t
    ]
    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF01_DOCS}') "
        "WHERE text IS NOT NULL ORDER BY doc_id"
    ).fetchall()
    texts.extend(t for (t,) in rows)
    return texts


def train_merges(texts: list[str],
                 n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    pre = re.compile(_PRETOKEN_PAT)
    freq: collections.Counter[str] = collections.Counter()
    for t in texts:
        freq.update(pre.findall(t))
    words: dict[str, list[str]] = {w: list(w) for w in freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter[tuple[str, str]] = collections.Counter()
        for w, syms in words.items():
            f = freq[w]
            for pair in zip(syms, syms[1:]):
                pairs[pair] += f
        if not pairs:
            break
        best, count = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if count < MIN_PAIR_COUNT:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            i, out, n = 0, [], len(syms)
            while i < n:
                if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def render(merges: list[tuple[str, str]]) -> str:
    lines = [
        "# BPE merges — trained by scripts/train_bpe.py (spec:",
        "# pdf_extractor_spark/core/bpe.py step 1).  DATA artifact;",
        "# rank = 0-based position among non-comment lines.",
    ]
    lines.extend(f"{a}\t{b}" for a, b in merges)
    return "\n".join(lines) + "\n"


def main() -> None:
    merges = train_merges(corpus_texts())
    with open(OUT_PATH, "w", encoding="utf-8") as fh:
        fh.write(render(merges))
    print(f"wrote {len(merges)} merges to {OUT_PATH}")


if __name__ == "__main__":
    main()
