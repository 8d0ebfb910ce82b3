"""Streaming dedup over the persisted store: verdicts per arriving doc,
stream-ingested docs dedup later arrivals, and replay idempotency."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pdf_extractor_spark.job.dedup_store import create_store
from pdf_extractor_spark.streaming.dedup_stream import (
    read_decisions,
    stream_dedup,
)

T_STORE = "zero one two three four five six seven eight nine"
T_FRESH = "quick brown foxes jump over lazy dogs every single day"


@pytest.fixture()
def env(spark, tmp_path):
    name = f"sstore_{abs(hash(str(tmp_path))) % 10 ** 8}"
    initial = spark.createDataFrame(
        [(1, T_STORE)], "doc_id bigint, text string"
    )
    create_store(str(tmp_path / "store"), name, initial)
    paths = {
        "input": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
        "store_dir": str(tmp_path / "store"),
        "name": name,
    }
    os.makedirs(paths["input"])
    yield paths
    spark.sql(f"DROP TABLE IF EXISTS {name}_fp")
    spark.sql(f"DROP TABLE IF EXISTS {name}_bands")


def _arrive(spark, input_dir, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .coalesce(1).write.mode("append").parquet(input_dir)


def _run(spark, env):
    q = stream_dedup(
        spark, env["input"], env["store_dir"], env["name"],
        env["out"], env["ckpt"],
    )
    q.awaitTermination(120)


def test_stream_dedup_verdicts_and_cross_batch(spark, env):
    # wave 1: an exact copy of a store doc + a fresh doc
    _arrive(spark, env["input"], [(10, T_STORE), (11, T_FRESH)])
    _run(spark, env)
    d1 = {r.doc_id: (r.verdict, r.matched)
          for r in read_decisions(spark, env["out"]).collect()}
    assert d1[10] == ("exact_dup", 1)
    assert d1[11] == ("clean", None)

    # wave 2: a copy of the doc the STREAM ingested in wave 1, plus a
    # near-copy of it (first word dropped) — both must be caught via
    # the store, proving stream-accepted docs dedup later arrivals
    _arrive(spark, env["input"], [
        (20, T_FRESH),
        (21, T_FRESH.split(" ", 1)[1]),
        (22, "completely different content with no relation at all zz"),
    ])
    _run(spark, env)
    d2 = {r.doc_id: (r.verdict, r.matched)
          for r in read_decisions(spark, env["out"]).collect()}
    assert d2[20] == ("exact_dup", 11)
    assert d2[21] == ("near_dup", 11)
    assert d2[22] == ("clean", None)


def test_stream_dedup_replay_is_idempotent(spark, env):
    _arrive(spark, env["input"], [(10, T_STORE), (11, T_FRESH)])
    _run(spark, env)
    before = sorted(
        tuple(r) for r in read_decisions(spark, env["out"]).collect()
    )
    n_fp = spark.table(f"{env['name']}_fp").count()

    # a re-run with the same checkpoint re-delivers nothing
    _run(spark, env)
    from pdf_extractor_spark.streaming.dedup_stream import process_batch

    batch = spark.createDataFrame(
        [(10, T_STORE), (11, T_FRESH)], "doc_id bigint, text string"
    )
    decided_dir = os.path.join(env["out"], "decisions", "batch=0")
    assert os.path.exists(os.path.join(decided_dir, "_SUCCESS"))
    # forced replay of the committed micro-batch (crash-after-commit
    # shape): the per-batch marker short-circuits it
    process_batch(env["name"], env["out"], batch, 0)
    # crash-BETWEEN-ingest-and-publish shape: marker gone, store already
    # holds the batch — re-derived verdicts must equal the lost ones and
    # the idempotent add_batch must add nothing
    os.remove(os.path.join(decided_dir, "_SUCCESS"))
    process_batch(env["name"], env["out"], batch, 0)
    after = sorted(
        tuple(r) for r in read_decisions(spark, env["out"]).collect()
    )
    assert after == before
    assert spark.table(f"{env['name']}_fp").count() == n_fp


def test_read_decisions_total_on_zero_batches(spark, tmp_path):
    """A stream that processed zero batches never created decisions/;
    reading it must yield an empty frame, not PATH_NOT_FOUND."""
    from pdf_extractor_spark.streaming.dedup_stream import read_decisions

    got = read_decisions(spark, str(tmp_path / "never-ran"))
    assert got.count() == 0
    assert set(got.columns) == {"doc_id", "verdict", "matched", "batch"}


def test_read_decisions_schema_agrees_empty_vs_nonempty(spark, env):
    """The empty-stream frame and the partition-discovered read must
    expose the SAME columns and types — a caller referencing the
    ``batch`` partition column must not break only on an empty stream."""
    from pdf_extractor_spark.streaming.dedup_stream import read_decisions

    empty = read_decisions(spark, env["out"] + "-never")
    _arrive(spark, env["input"], [(10, T_STORE)])
    _run(spark, env)
    nonempty = read_decisions(spark, env["out"])
    assert [(f.name, f.dataType) for f in empty.schema.fields] == \
        [(f.name, f.dataType) for f in nonempty.schema.fields]
    assert {r.batch for r in nonempty.collect()} == {0}
