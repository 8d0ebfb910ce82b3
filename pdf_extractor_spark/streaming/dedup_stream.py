"""Streaming deduplication: check→ingest each micro-batch against the
persisted dedup store.

The batch dedup queries answer "which pairs in this corpus are dups";
the production question for a streaming intake is "is THIS arriving
document a dup of anything accepted so far — including earlier in this
stream".  ``foreachBatch`` is the right Spark shape: the stream yields
each micro-batch as a plain DataFrame, and the body runs the exact
batch-mode ``check_batch`` / ``add_batch`` against the bucketed store
(job/dedup_store.py) — one semantics, two drivers, the same strategy
the extraction pipeline uses for its streaming/batch parity.

Per micro-batch:

1. ``check_batch`` flags exact dups and near-dup candidates (vs the
   store AND intra-batch);
2. clean docs are ingested into the store (``add_batch``) so the NEXT
   micro-batch — or a concurrent later file — dedups against them;
3. every doc is appended to ``decisions/`` with its verdict
   (clean / exact_dup / near_dup and the matched doc) — the audit
   trail a filtering pipeline consumes downstream.

Exactly-once: foreachBatch can be re-invoked with the same batch after
a crash.  ``check_batch`` is read-only; ``add_batch`` is idempotent for
replays (already-ingested fingerprints anti-join away, so a replayed
batch adds nothing); the decisions append is guarded by a per-batch-id
commit marker so a replay doesn't duplicate audit rows.

The store side of every check stays bucketed-no-shuffle, so sustained
stream throughput is O(arrival rate), independent of how large the
accepted corpus has grown — the property that makes streaming dedup
viable at 10¹²-doc scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pdf_extractor_spark.job.dedup_store import add_batch, check_batch

DOCS_SCHEMA = "doc_id bigint, text string"


def _decide(spark: SparkSession, store_name: str,
            batch: DataFrame) -> DataFrame:
    """(doc_id, verdict, matched) for every doc in ``batch``."""
    got = check_batch(spark, store_name, batch)
    exact = got["exact"].select(
        "doc_id",
        F.lit("exact_dup").alias("verdict"),
        F.col("dup_of").alias("matched"),
    )
    near = (
        got["near"]
        .groupBy("doc_id")
        .agg(F.min("near_of").alias("matched"))
        .select("doc_id", F.lit("near_dup").alias("verdict"), "matched")
    )
    flagged = exact.unionByName(near)
    clean = (
        batch.select(F.col("doc_id").cast("bigint").alias("doc_id"))
        .join(flagged.select("doc_id"), "doc_id", "anti")
        .select(
            "doc_id",
            F.lit("clean").alias("verdict"),
            F.lit(None).cast("bigint").alias("matched"),
        )
    )
    return flagged.unionByName(clean)


def process_batch(store_name: str, out_dir: str,
                  batch: DataFrame, batch_id: int) -> None:
    """The foreachBatch body: check → ingest clean docs → publish
    decisions.  Module-level so replay semantics are directly testable.
    """
    session = batch.sparkSession
    decided_dir = os.path.join(out_dir, "decisions", f"batch={batch_id}")
    marker = os.path.join(decided_dir, "_SUCCESS")
    if os.path.exists(marker):
        return  # committed batch replayed after a crash — done already
    decisions = _decide(session, store_name, batch) \
        .localCheckpoint(eager=True)
    clean_ids = decisions.filter(F.col("verdict") == "clean") \
        .select("doc_id")
    # ingest BEFORE publishing decisions: on a replay after a crash in
    # between, add_batch is a no-op (known fingerprints anti-join away)
    # and the decisions get re-derived — a just-ingested doc only
    # matches ITSELF in the store, which the identity filter excludes,
    # so re-derived verdicts equal the lost ones
    add_batch(session, store_name, batch.join(clean_ids, "doc_id", "semi"))
    decisions.write.mode("overwrite").parquet(decided_dir)


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    store_name: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Dedup a stream of document files against the persisted store."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_batch(store_name, out_dir, batch, batch_id)

    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    return (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_decisions(spark: SparkSession, out_dir: str) -> DataFrame:
    import glob

    base = os.path.join(out_dir, "decisions")
    # a stream that processed zero batches never created decisions/ —
    # an empty stream must read as zero decisions, not PATH_NOT_FOUND
    # (same totality rule as the empty IVF index and sink.batch_input).
    # The empty frame must carry the SAME schema as the non-empty read,
    # including the ``batch`` partition column (partition discovery
    # infers int; both branches pin bigint so a caller referencing
    # ``batch`` behaves identically on an empty stream).
    cols = ("doc_id", "verdict", "matched", "batch")
    if not glob.glob(os.path.join(base, "batch=*")):
        return spark.createDataFrame(
            [], "doc_id bigint, verdict string, matched bigint, batch bigint"
        )
    df = spark.read.option("basePath", base).parquet(
        os.path.join(base, "batch=*")
    )
    return df.select(
        *(F.col(c).cast("bigint") if c == "batch" else F.col(c)
          for c in cols)
    )
