"""Similarity-search quality: the IVF ANN scale path must stay close to
the exact brute-force scan (top-2-of-16 cells probed → recall well above
the 2/16 corpus fraction it reads)."""

from __future__ import annotations

from pdf_extractor_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ann_ivf_recall_vs_exact(spark):
    exact = {
        (r.q_id, r.n_id) for r in QUERIES["cosine_topk"](spark, SF).collect()
    }
    approx = {
        (r.q_id, r.n_id) for r in QUERIES["ann_ivf"](spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall@5 {recall} too low"


def test_ann_scores_match_exact_where_overlapping(spark):
    exact = {
        (r.q_id, r.n_id): r.score
        for r in QUERIES["cosine_topk"](spark, SF).collect()
    }
    for r in QUERIES["ann_ivf"](spark, SF).collect():
        if (r.q_id, r.n_id) in exact:
            assert abs(exact[(r.q_id, r.n_id)] - r.score) < 1e-9
