"""Distributed synthetic-corpus generation.

The serial generator (gen/transcripts.py) seeds a per-conversation RNG
with (seed, conv index), so conversations are independent and the corpus
can be generated in parallel with identical bytes: fan the conv indices
out with ``spark.range`` and run the same ``_conv`` code inside Arrow
batches.  This is how a 10^12-turn test corpus would be materialized on a
cluster — no driver-side loop, no cross-task coupling.
"""

from __future__ import annotations

import random

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.gen.transcripts import _conv, generate_transcripts


def generate_corpus_df(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    skew_conv_turns: int = 0,
    partitions: int = 64,
) -> DataFrame:
    from pdf_extractor_spark.queries.extraction import TRANSCRIPTS_SCHEMA
    from pdf_extractor_spark.shipping import ensure_workers

    ensure_workers(spark)

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for k in pdf["id"]:
                k = int(k)
                rng = random.Random(seed * 1_000_003 + k)
                rows.extend(
                    _conv(rng, f"c{k:05d}", n_items=rng.randint(3, 8),
                          skew=False)
                )
            out = pd.DataFrame(rows)
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    df = (
        spark.range(n_convs)
        .repartition(partitions)
        .mapInPandas(gen, TRANSCRIPTS_SCHEMA)
    )
    if skew_conv_turns > 0:
        skew_pdf = generate_transcripts(
            n_convs=0, seed=seed, skew_conv_turns=skew_conv_turns
        )
        df = df.unionByName(
            spark.createDataFrame(skew_pdf, schema=TRANSCRIPTS_SCHEMA)
        )
    return df
