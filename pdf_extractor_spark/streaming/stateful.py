"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference threads ``previous_page_context`` across its sequential page
loop (/root/reference/src/pipeline.py:221-243) and checkpoints progress
after every page (checkpoint.py:22-78).  In a streaming deployment that
carried state is exactly a keyed GroupState: this operator maintains
per-conversation progress (turn counts, char counts, highest turn seen,
last-known question id) across micro-batches, surviving restarts through
the streaming checkpoint.

Arrow-batched (pandas groups), no per-row Python, state bounded to one
small row per conversation.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pdf_extractor_spark.queries.extraction import TRANSCRIPTS_SCHEMA
from pdf_extractor_spark.shipping import ensure_workers

PROGRESS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("max_turn", T.LongType()),
    T.StructField("last_question_id", T.StringType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("max_turn", T.LongType()),
    T.StructField("last_question_id", T.StringType()),
])

_QID_RE = r"(\d+\.\d+)"


def _update_progress(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, n_chars, max_turn, last_qid = state.get
    else:
        n_turns, n_chars, max_turn, last_qid = 0, 0, -1, None

    for pdf in batches:
        n_turns += len(pdf)
        n_chars += int(pdf["text"].str.len().sum())
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            # last question id in turn order (≙ previous_page_context's
            # last_question_id, pipeline.py:227-243)
            ordered = pdf.sort_values("turn_idx")
            ids = ordered["text"].str.extract(_QID_RE, expand=False).dropna()
            if len(ids):
                last_qid = ids.iloc[-1]

    state.update((n_turns, n_chars, max_turn, last_qid))
    yield pd.DataFrame([{
        "conv_id": conv_id,
        "n_turns": n_turns,
        "n_chars": n_chars,
        "max_turn": max_turn,
        "last_question_id": last_qid,
    }])


def stream_conversation_progress(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    query_name: str = "conv_progress",
) -> StreamingQuery:
    """Updated progress rows append to ``output_dir`` parquet (with the
    micro-batch id, so the latest state per conversation is the row with
    the highest batch_id); the in-memory sink can't recover from a
    checkpoint, foreachBatch+parquet can — restart-survival is the point
    of keyed state."""
    ensure_workers(spark)
    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    progress = src.groupBy("conv_id").applyInPandasWithState(
        _update_progress,
        PROGRESS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    return (
        progress.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
