"""Evaluation-stage tests (≙ reference evaluator semantics, SURVEY §3.2)."""

from __future__ import annotations

from pdf_extractor_spark.job.evaluate import evaluate_spans, evaluation_summary
from pdf_extractor_spark.job.extract import run_extract
from pdf_extractor_spark.queries.extraction import transcripts_df


def test_evaluate_rows_and_invariants(spark):
    spans = run_extract(transcripts_df(spark, n_convs=12, seed=21))
    qa = evaluate_spans(spans)
    rows = qa.collect()
    assert len(rows) == spans.count()

    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.had_reference, []).append(r)
    # referenced spans carry a similarity score; unreferenced are null
    assert all(r.answer_similarity is not None for r in by_flag.get(True, []))
    assert all(r.answer_similarity is None for r in by_flag.get(False, []))
    # resolution appends, never rewrites → prefix preserved everywhere
    assert all(r.answer_preserved for r in rows)
    # similarity strictly < 1 when a context block was actually appended
    for r in by_flag.get(True, []):
        if "[Context " in r.text:
            assert r.answer_similarity < 1.0
    assert {r.review_priority for r in rows} <= {
        "none", "low", "medium", "high"
    }


def test_evaluation_summary_consistent(spark):
    spans = run_extract(transcripts_df(spark, n_convs=10, seed=22))
    qa = evaluate_spans(spans)
    s = evaluation_summary(qa).collect()[0]
    assert s.total_qas == qa.count()
    assert s.passed + s.failed == s.total_qas
    assert 0.0 <= s.pass_rate <= 1.0
    assert s.high_priority_reviews <= s.needs_review or s.needs_review == 0
