"""JVM reference detection must agree with the Python core detector on
every span of a broad generated corpus plus adversarial literals."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_extractor_spark.core.refs import detect_ref
from pdf_extractor_spark.job.extract import _detect_ref_col

ADVERSARIAL = [
    ("", ""),
    ("no refs here", "plain text"),
    ("Using the result of 2.7 we proceed.", "done"),
    ("see problem 3.14a for details", ""),
    ("", "from 1.2 then problem 3.4 later"),
    ("problem 9.9 first", "using 1.1 second"),
    ("USING EXERCISE 4.5", "BY 6.7b"),
    ("use 1.2", "nothing"),          # 'use' is not a cue word
    ("fromage 1.2", "x"),            # cue must be a word... (python: 'from' inside?)
    ("version 10.13 of the doc", "see part 2.1"),
    ("as in 8.01c", ""),
    ("x" * 5000 + " by 3.3", ""),
    # Unicode boundaries: Python \s/\d/\b are Unicode-aware; JVM side
    # must carry (?U) or these fork (ADVICE r1)
    ("see problem\u00a02.3", ""),        # NBSP after cue word
    ("using exercise\u20094.2", ""),     # thin space
    ("problem \u0664.\u0665 is cited", ""),  # Arabic-Indic digits
    ("from \u09e7.\u09e8 onward", ""),  # Bengali digits
    ("by 3.4\u00e9xtra", ""),            # \\b before accented letter
    ("problem\u30004.4", ""),            # ideographic space
]


def test_jvm_detect_matches_python_core(spark):
    from pdf_extractor_spark.job.extract import run_extract  # noqa: F401
    from pdf_extractor_spark.queries.extraction import transcripts_df
    from pdf_extractor_spark.job import extract as X

    # all stitched spans of a 60-conversation corpus
    tdf = transcripts_df(spark, n_convs=60, seed=99)
    parsed = tdf.select("conv_id", "turn_idx", "text").mapInPandas(
        X.parse_batches, X.PARSED_SCHEMA
    )
    spans = X._merge_block_edges(
        X._link_and_stitch_blocks(parsed, X.DEFAULT_BLOCK_SIZE),
        X.DEFAULT_BLOCK_SIZE,
    )
    rows = spans.select(
        "question_latex", "answer_latex",
        _detect_ref_col(F.col("question_latex"), F.col("answer_latex"))
        .alias("jvm_ref"),
    ).collect()
    assert len(rows) > 100
    for r in rows:
        expected = detect_ref(r.question_latex or "", r.answer_latex or "")
        assert r.jvm_ref == expected, (
            f"JVM={r.jvm_ref!r} py={expected!r} for "
            f"q={r.question_latex[:80]!r} a={r.answer_latex[:80]!r}"
        )


def test_jvm_detect_adversarial_literals(spark):
    df = spark.createDataFrame(
        ADVERSARIAL, schema=T.StructType([
            T.StructField("q", T.StringType()),
            T.StructField("a", T.StringType()),
        ])
    )
    rows = df.select(
        "q", "a", _detect_ref_col(F.col("q"), F.col("a")).alias("jvm_ref")
    ).collect()
    for r in rows:
        assert r.jvm_ref == detect_ref(r.q, r.a), (r.q, r.a, r.jvm_ref)


def test_jvm_strip_prefix_unicode_parity(spark):
    from pdf_extractor_spark.core.normalize import strip_solution_prefix
    from pdf_extractor_spark.job.extract import _strip_prefix_col

    cases = [
        "Solution. foo",
        " Solution. foo",           # NBSP lead (ADVICE r1 repro)
        " \\textbf{Solution.} bar",
        "  Solution.   spaced   ",
        "answer only",
        "trailing ws 　",
        "  ",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    rows = df.select("t", _strip_prefix_col(F.col("t")).alias("s")).collect()
    for r in rows:
        assert r.s == strip_solution_prefix(r.t), (r.t, r.s)
