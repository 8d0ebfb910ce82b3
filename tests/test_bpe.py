"""BPE tokenizer: engine↔mirror equality, trainer determinism, artifact
sync, spec corner cases, and the Spark query's plan/parity.

The two encoders (pdf_extractor_spark/core/bpe.py,
pdf_extractor_spark/oracle_mirror/bpe.py) implement one spec with
separate code; the merges table is shared DATA.  Equality here is what
makes expected/bpe_encode.parquet a real oracle rather than an echo."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

from pdf_extractor_spark.core.bpe import (
    MERGES_PATH,
    load_merges,
    make_encoder,
    token_checksum,
)
from pdf_extractor_spark.oracle_mirror.bpe import (
    mirror_checksum,
    mirror_encode,
    mirror_load_merges,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

ADVERSARIAL = [
    None,
    "",
    " \t\n ",
    "a",
    "aaa bbbb aaaa",                     # overlapping-merge shape
    "hashjoin hashjoin HASHJOIN",        # case sensitivity
    "x1y2z3 12345 ...!!!...",            # digit/punct runs
    "\\frac{1}{2} + \\sqrt{\\alpha}",    # LaTeX
    "héllo wörld — ünïcode ≤ ∑",         # non-ASCII chars (unseen OK)
    "the the the the the the",           # heavy repetition (memo path)
    "a" * 500,                            # one long pretoken
    "<table><tr><td>1</td></tr></table>",
]


def test_engine_equals_mirror_on_adversarial_strings():
    merges = load_merges()
    assert merges == mirror_load_merges(MERGES_PATH)
    enc = make_encoder(merges)
    for text in ADVERSARIAL:
        got = enc(text)
        want = mirror_encode(text, merges)
        assert got == want, (text, got, want)
        assert token_checksum(got) == mirror_checksum(want)


def test_engine_equals_mirror_on_corpus():
    import duckdb

    merges = load_merges()
    enc = make_encoder(merges)
    rows = duckdb.sql(
        "SELECT text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') ORDER BY md5(text)"
    ).fetchall()
    for (text,) in rows:
        assert enc(text) == mirror_encode(text, merges)


def test_all_occurrences_single_pass_semantics():
    """Spec step 3's merge pass is all-occurrences left-to-right with
    resume-after-merge — pinned on an INJECTED table so the contract
    holds beyond trained-table inputs (where new pairs always rank
    later) for both implementations."""
    merges = [("a", "a"), ("b", "aa")]
    enc = make_encoder(merges)
    # left-to-right: "aaa" -> [aa, a], never [a, aa]
    assert enc("aaa") == ["aa", "a"]
    assert mirror_encode("aaa", merges) == ["aa", "a"]
    # rank order beats positional order: (a,a) fires before (b,aa)
    assert enc("baaa") == ["baa", "a"]
    assert mirror_encode("baaa", merges) == ["baa", "a"]
    # merges never cross pretoken (whitespace) boundaries
    assert enc("a a") == ["a", "a"]


def test_checksum_spec():
    assert token_checksum([]) == hashlib.md5(b"").hexdigest()
    assert token_checksum(["ab", "c"]) == hashlib.md5(
        "ab\x1fc".encode()
    ).hexdigest()


def test_trainer_is_deterministic_and_artifact_in_sync():
    """Re-running the training recipe on its fixed corpus must reproduce
    the checked-in merges byte-for-byte — the artifact is derived state,
    like expected/*.parquet (regenerate via scripts/train_bpe.py on an
    intentional spec change)."""
    import train_bpe as TB

    texts = TB.corpus_texts()
    first = TB.train_merges(texts)
    assert first == TB.train_merges(texts)  # rerun-stable
    with open(MERGES_PATH, encoding="utf-8") as fh:
        on_disk = fh.read()
    assert TB.render(first) == on_disk, (
        "merges artifact drift — rerun scripts/train_bpe.py (and then "
        "scripts/gen_expected.py)"
    )


def test_trainer_tie_break_and_stop():
    import train_bpe as TB

    # "ab" and "ba" pairs tie at 2 in "abab abab" cut to force a tie:
    # corpus "abab" has (a,b)x2, (b,a)x1 → (a,b) wins on count; with
    # "ab ba ab ba" both pairs count 2 → lexicographic min (a,b) first
    merges = TB.train_merges(["ab ba ab ba"], n_merges=1)
    assert merges == [("a", "b")]
    # best-count < 2 stops training (all pretokens distinct)
    assert TB.train_merges(["ab cd ef"], n_merges=10) == []


def test_bpe_encode_query_plan_and_pruning(spark):
    """Arrow-only Python (no BatchEvalPython) and a two-column scan —
    the wide documents columns must not reach the Python stage."""
    from pdf_extractor_spark.queries import QUERIES

    df = QUERIES["bpe_encode"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "lang" not in plan.split("ReadSchema")[1][:200], plan


def test_curate_audit_uses_real_bpe(spark, tmp_path):
    """job/curate.py's budget column equals the mirror encode count."""
    from pdf_extractor_spark.queries.textops import bpe_token_udf

    merges = load_merges()
    docs = spark.createDataFrame(
        [(1, "please extract \\frac{1}{2} now"), (2, None)],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_token_udf(merges)("text").alias("n")
        ).collect()
    }
    assert got[1] == len(
        mirror_encode("please extract \\frac{1}{2} now", merges)
    )
    assert got[2] == 0


@pytest.mark.parametrize("sf", ["sf0.001"])
def test_memo_cap_does_not_change_results(sf):
    """Encoding with a zero-capacity memo must match the memoized path
    (the cache is an inert optimization)."""
    import pdf_extractor_spark.core.bpe as B

    merges = load_merges()
    cap = B._MEMO_CAP
    try:
        B._MEMO_CAP = 0
        cold = B.make_encoder(merges)
        warm = make_encoder(merges)
        for text in ADVERSARIAL:
            assert cold(text) == warm(text)
    finally:
        B._MEMO_CAP = cap
