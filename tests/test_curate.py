"""End-to-end corpus curation: gate ordering, dedup routing, store
growth across runs, and the audit token budget."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_extractor_spark.job.curate import curate
from pdf_extractor_spark.job.dedup_store import create_store

GOOD = ("the quick brown fox jumps over the lazy dog and then runs "
        "far away into the quiet green forest before the evening rain "
        "begins to fall on the old wooden bridge near the river bank "
        "where the children often play during the long summer days "
        "with their friends and the family dog under the warm sun")
GOOD2 = ("a different long and well formed english document that talks "
         "about the weather and the mountains and the many rivers that "
         "flow from them toward the sea while people watch from the "
         "shore and think about the long journey of the water from the "
         "high peaks to the deep ocean across the wide land")
NON_EN = " ".join(["zzq wqx vrk plm"] * 30)


@pytest.fixture()
def store(spark, tmp_path):
    name = f"cstore_{abs(hash(str(tmp_path))) % 10 ** 8}"
    create_store(
        str(tmp_path / "store"), name,
        spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string"),
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}_fp")
    spark.sql(f"DROP TABLE IF EXISTS {name}_bands")


def test_curate_routes_and_audits(spark, store, tmp_path):
    docs = spark.createDataFrame(
        [
            (10, GOOD2),                    # accepted
            (11, "too short"),              # low_quality
            (12, NON_EN),                   # wrong_lang
            (13, GOOD),                     # exact dup of store doc 1
            (14, GOOD.split(" ", 1)[1]),    # near dup of store doc 1
        ],
        "doc_id bigint, text string",
    )
    out = str(tmp_path / "out")
    summary = curate(spark, docs, store, out)

    assert summary["n_input"] == 5
    assert summary["n_accepted"] == 1
    assert summary["by_reason"] == {
        "accepted": 1, "low_quality": 1, "wrong_lang": 1,
        "exact_dup": 1, "near_dup": 1,
    }

    dec = {r.doc_id: (r.reason, r.matched)
           for r in spark.read.parquet(f"{out}/decisions").collect()}
    assert dec[10] == ("accepted", None)
    assert dec[11][0] == "low_quality"
    assert dec[12][0] == "wrong_lang"
    assert dec[13] == ("exact_dup", 1)
    assert dec[14] == ("near_dup", 1)

    acc = spark.read.parquet(f"{out}/accepted")
    assert [r.doc_id for r in acc.collect()] == [10]
    # the audit token budget equals the accepted docs' REAL BPE count —
    # recomputed here with the INDEPENDENT mirror encoder, so the job's
    # engine-side encode can't self-certify
    from pdf_extractor_spark.core.bpe import MERGES_PATH
    from pdf_extractor_spark.oracle_mirror.bpe import (
        mirror_encode,
        mirror_load_merges,
    )

    merges = mirror_load_merges(MERGES_PATH)
    want_tokens = sum(
        len(mirror_encode(r.text, merges)) for r in acc.collect()
    )
    assert summary["accepted_bpe_tokens"] == want_tokens

    # a second run: the doc accepted in run 1 is now in the store, so
    # its copy dedups against it — curation is cumulative across runs
    out2 = str(tmp_path / "out2")
    round2 = spark.createDataFrame(
        [(20, GOOD2)], "doc_id bigint, text string"
    )
    s2 = curate(spark, round2, store, out2)
    assert s2["by_reason"] == {"exact_dup": 1}
    dec2 = {r.doc_id: (r.reason, r.matched)
            for r in spark.read.parquet(f"{out2}/decisions").collect()}
    assert dec2[20] == ("exact_dup", 10)


def test_route_query_mirrors_job_decisions(spark, tmp_path):
    """The hash-gated curation_route query and the store-backed curate
    job agree wherever their scopes overlap: identical reasons for
    every SQL-expressible gate, and the job's extra store-LSH gate only
    ever converts a route-ACCEPTED doc into near_dup (never overrides a
    cheaper rejection)."""
    from pdf_extractor_spark.queries.textops import _curation_route

    rows = [
        (10, GOOD2),                   # accepted both sides
        (11, "too short"),             # low_quality both sides
        (12, NON_EN),                  # wrong_lang both sides
        (13, GOOD),                    # first survivor of the dup pair
        (14, GOOD),                    # exact_dup of 13 both sides
        (15, GOOD.split(" ", 1)[1]),   # near_dup (job) / accepted (route)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    docs.write.parquet(str(sf_dir / "documents.parquet"))
    route = {r.doc_id: (r.reason, r.matched_doc_id)
             for r in _curation_route(spark, str(sf_dir)).collect()}

    name = f"pstore_{abs(hash(str(tmp_path))) % 10 ** 8}"
    create_store(
        str(tmp_path / "store"), name,
        spark.createDataFrame([], "doc_id bigint, text string"),
    )
    try:
        curate(spark, docs, name, str(tmp_path / "out"))
        job = {r.doc_id: (r.reason, r.matched) for r in
               spark.read.parquet(str(tmp_path / "out/decisions"))
               .collect()}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_fp")
        spark.sql(f"DROP TABLE IF EXISTS {name}_bands")

    assert set(job) == set(route)
    for doc_id in job:
        if job[doc_id][0] == "near_dup":
            assert route[doc_id][0] == "accepted"
        else:
            assert job[doc_id] == route[doc_id], doc_id


def test_gate_order_attributes_cheapest_reason(spark, store, tmp_path):
    """A doc failing several gates reports the FIRST (cheapest) one —
    a short duplicate is low_quality, not exact_dup, and never even
    reaches the dedup join."""
    docs = spark.createDataFrame(
        [(30, "too short"), (31, "too short")],
        "doc_id bigint, text string",
    )
    summary = curate(spark, docs, store, str(tmp_path / "out"))
    assert summary["by_reason"] == {"low_quality": 2}


def test_run_id_namespaces_published_outputs(spark, tmp_path):
    """Repeated intakes with run_id accumulate under runs/<id>/ instead
    of clobbering the previous run's accepted/ — the store ingest stays
    cumulative either way."""
    import os

    from pdf_extractor_spark.job.dedup_store import create_store

    name = f"curate_runs_{abs(hash(str(tmp_path))) % 10 ** 8}"
    create_store(str(tmp_path / "store"), name,
                 spark.createDataFrame([], "doc_id bigint, text string"))
    out = str(tmp_path / "out")
    day1 = spark.createDataFrame(
        [(1, "the a of and is to in " * 30)], "doc_id bigint, text string"
    )
    day2 = spark.createDataFrame(
        [(2, "scan the key and a table of sort to merge in row " * 10)],
        "doc_id bigint, text string",
    )
    s1 = curate(spark, day1, name, out, run_id="d1")
    s2 = curate(spark, day2, name, out, run_id="d2")
    assert s1["n_accepted"] == 1 and s2["n_accepted"] == 1
    a1 = spark.read.parquet(os.path.join(out, "runs", "d1", "accepted"))
    a2 = spark.read.parquet(os.path.join(out, "runs", "d2", "accepted"))
    assert [r.doc_id for r in a1.collect()] == [1]
    assert [r.doc_id for r in a2.collect()] == [2]


def test_null_text_is_rejected_as_low_quality(spark, tmp_path):
    """NULL text must gate out as low_quality (quality_score 0), never
    be published to accepted/: least() ignores a NULL length, which
    previously scored a content-free doc exactly at the 0.5 gate."""
    from pdf_extractor_spark.job.dedup_store import create_store

    name = f"curate_null_{abs(hash(str(tmp_path))) % 10 ** 8}"
    create_store(str(tmp_path / "store"), name,
                 spark.createDataFrame([], "doc_id bigint, text string"))
    docs = spark.createDataFrame(
        [(1, None), (2, "the a of and is to in " * 30)],
        "doc_id bigint, text string",
    )
    summary = curate(spark, docs, name, str(tmp_path / "out"), lang="en")
    assert summary["by_reason"].get("low_quality") == 1
    assert summary["n_accepted"] == 1
