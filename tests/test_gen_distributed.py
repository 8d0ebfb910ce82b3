"""Distributed corpus generation must be byte-identical to the serial
generator (per-conversation seeding makes order irrelevant)."""

from __future__ import annotations

from pdf_extractor_spark.gen.distributed import generate_corpus_df
from pdf_extractor_spark.gen.transcripts import generate_transcripts


def test_distributed_generator_matches_serial(spark):
    dist = (
        generate_corpus_df(spark, 15, seed=42, skew_conv_turns=30)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ser = (
        generate_transcripts(15, seed=42, skew_conv_turns=30)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(dist.columns) == list(ser.columns) or set(dist.columns) == set(ser.columns)
    ser = ser[dist.columns]
    assert len(dist) == len(ser)
    for col in dist.columns:
        assert (dist[col] == ser[col]).all(), f"column {col} differs"
