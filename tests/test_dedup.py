"""Dedup operator edge cases not covered by the oracle-parity sweep.

The sf corpora have a minimum of ~10 tokens per doc, so shingling bugs on
short documents never surface there — pin them here with a tiny in-memory
corpus (0/1/2/K-1/K tokens).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import (
    _SHINGLE_K,
    _jaccard_pairs,
    _minhash_pairs,
    _shingles,
)


def _mini_corpus(spark):
    rows = [
        (1, ""),                              # 0 tokens
        (2, "one"),                           # 1 token
        (3, "two words"),                     # K-1 tokens
        (4, "exactly three words"),           # K tokens → 1 shingle
        (5, "a b c d e f g h"),               # normal doc
        (6, "a b c d e f g h"),               # exact dup of 5
        (7, "b c d e f g h"),                 # near dup of 5
        (8, "   "),                           # whitespace only
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shingles_short_docs_no_crash(spark):
    sh = _shingles(_mini_corpus(spark))
    rows = sh.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    # docs below K tokens yield zero shingles (not a crash, not junk)
    assert 1 not in by_doc and 2 not in by_doc and 3 not in by_doc
    assert 8 not in by_doc
    assert by_doc[4] == {"exactly three words"}
    assert len(by_doc[5]) == 8 - (_SHINGLE_K - 1)


def test_minhash_lsh_runs_with_short_docs(spark):
    pairs = _minhash_pairs(_mini_corpus(spark)).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (5, 6) in got  # exact dup must be caught


def test_jaccard_runs_with_short_docs(spark):
    pairs = _jaccard_pairs(_mini_corpus(spark)).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert got.get((5, 6)) == 1.0
