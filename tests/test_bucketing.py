"""Bucketing kills the stitch shuffle (SCALE.md §1/§3 claim, verified).

When transcripts are written bucketed by conv_id, the stitch window's
required ClusteredDistribution(conv_id, blk) is already satisfied by the
storage layout (HashPartitioning(conv_id) ⊆ clustering keys), so the
plan contains NO shuffle exchange before the window — the engine's
biggest data movement disappears at the storage contract, which is the
mechanism that makes the 100 TB deployment feasible."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_extractor_spark.job import extract as X
from pdf_extractor_spark.queries.extraction import transcripts_df


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    tdf = transcripts_df(spark, n_convs=12, seed=31)
    (
        tdf.write.mode("overwrite")
        .bucketBy(8, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .option("path", str(wh / "transcripts_bucketed"))
        .saveAsTable("transcripts_bucketed")
    )
    yield "transcripts_bucketed"
    spark.sql("DROP TABLE IF EXISTS transcripts_bucketed")


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_window_over_bucketed_input_has_no_exchange(spark, bucketed_table):
    src = spark.table(bucketed_table)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    windowed = src.select(
        "conv_id", "turn_idx", F.lag("turn_idx").over(w).alias("prev")
    )
    plan = _plan(spark, windowed)
    assert "Window" in plan
    assert "Exchange (" not in plan, plan


def test_unbucketed_input_needs_exchange(spark):
    """Control: the same window over a plain parquet read shuffles."""
    tdf = transcripts_df(spark, n_convs=6, seed=31)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    windowed = tdf.select(
        "conv_id", "turn_idx", F.lag("turn_idx").over(w).alias("prev")
    )
    assert "Exchange (" in _plan(spark, windowed)


def test_extraction_equal_from_bucketed_and_plain(spark, bucketed_table):
    """Same rows either way — the storage contract changes the plan, not
    the answer."""
    plain = transcripts_df(spark, n_convs=12, seed=31)
    a = sorted(
        tuple(str(x) for x in r)
        for r in X.run_extract(spark.table(bucketed_table))
        .select("conv_id", "turn_idx", "span_id", "text").collect()
    )
    b = sorted(
        tuple(str(x) for x in r)
        for r in X.run_extract(plain)
        .select("conv_id", "turn_idx", "span_id", "text").collect()
    )
    assert a == b
