"""applyInPandasWithState: per-conversation progress must accumulate
across micro-batches and survive stream restarts (state via streaming
checkpoint)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_extractor_spark.queries.extraction import transcripts_df
from pdf_extractor_spark.streaming.stateful import stream_conversation_progress


def _latest_progress(spark, out_dir):
    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("batch_id"), F.desc("n_turns")
    )
    return {
        r.conv_id: r
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").collect()
    }


def test_stateful_progress_accumulates_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    all_df = transcripts_df(spark, n_convs=6, seed=17)
    first = all_df.filter("turn_idx < 5")
    second = all_df.filter("turn_idx >= 5")

    # batch 1 → stream drains → STOPS (restart boundary)
    first.write.mode("append").parquet(src)
    q = stream_conversation_progress(spark, src, out, ckpt)
    q.awaitTermination(120)

    # batch 2 arrives → fresh query instance recovers keyed state from
    # the checkpoint and continues accumulating
    second.write.mode("append").parquet(src)
    q = stream_conversation_progress(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = _latest_progress(spark, out)
    expected = {
        r.conv_id: r
        for r in all_df.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
            F.max("turn_idx").cast("long").alias("max_turn"),
        ).collect()
    }
    assert set(got) == set(expected)
    for conv_id, exp in expected.items():
        row = got[conv_id]
        assert row.n_turns == exp.n_turns, conv_id
        assert row.n_chars == exp.n_chars, conv_id
        assert row.max_turn == exp.max_turn, conv_id
        # every conversation opens with "Please extract chapter N
        # problems." and contains item ids → a last qid must exist
        assert row.last_question_id is not None
