"""Temporal / dataset-assembly operators over ``events`` and ``documents``.

- asof_join — the classic time-series AS-OF join: each ``click`` event is
  matched to the latest ``view`` event of the same user at or before its
  timestamp.  Spark has no ASOF JOIN operator; a naive range join
  (``l.user_id = r.user_id AND r.ts <= l.ts`` + max-per-left) explodes to
  O(clicks × views-per-user) pairs before aggregating.  The scale-correct
  composition is the TAGGED-UNION + FORWARD-FILL shape: union both sides
  with a side tag, one window over (user_id) ordered by (ts, tag,
  event_id) with ``last_value(..., ignorenulls)`` carrying the most
  recent right-side row forward, then keep the left rows.  ONE shuffle
  keyed on user_id, each row touched once, no pair blowup at any
  views-per-user skew (AQE skew-join doesn't even engage — there is no
  join).  The oracle is DuckDB's native ASOF LEFT JOIN, i.e. the two
  engines compute the same semantics via entirely different algorithms.
  Right-side rows are first deduped to one per (user_id, ts) — max
  event_id wins — because ASOF's pick among equal timestamps is
  otherwise unspecified and the hash gate needs determinism.

- range_join — the interval-overlap (point-in-range) join: each ``click``
  is matched to every ``view`` whose validity window [ts, ts + 6h)
  contains it, per user.  Spark executes a non-equi join condition
  (``l.ts BETWEEN r.start AND r.end``) as BroadcastNestedLoopJoin — a
  full pairwise scan that cannot survive web scale.  The scale-correct
  composition is TIME-BIN BUCKETING: pick the bin width equal to the
  maximum interval length, explode each interval to the (at most 2)
  bins it overlaps, compute each point's single containing bin, and
  equi-join on (user_id, bin) before filtering exact containment.
  Candidate pairs are bounded by per-(user, bin) occupancy — no
  nested-loop operator, AQE handles hot bins like any other skewed
  equi-join, and every true pair is produced exactly once because the
  point lives in exactly one bin.  The bin arithmetic stays in exact
  BIGINT (``ts - ts % width``, never double division) so boundary
  timestamps can't flip under floating-point rounding.  The oracle is
  DuckDB's native inequality join — same semantics, no bucketing.

- stratified_split — deterministic train/val/test assignment (90/5/5)
  stratified by ``source``: bucket = md5("split|" + doc_id) mod 100, the
  same seedable engine-portable keyed-hash idiom as review_sample /
  source_mix_sample (textops.py), so membership is a pure function of
  doc_id — stable under any partitioning, any engine, any rerun, and
  adding documents never reshuffles existing assignments (the property
  a training pipeline needs for cache/embedding reuse across dataset
  versions).  Narrow pass; the per-(source, split) counts are a
  map-side-combining hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_extractor_spark.queries.base import Q, load

_LEFT_TYPE = "click"
_RIGHT_TYPE = "view"


def _asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))

    # tag 0 = right, 1 = left: at EQUAL timestamps every right row sorts
    # before every left row, so the fill implements the "at or before"
    # (<=) contract; among several rights at the SAME timestamp the
    # event_id order term makes the max-event_id row the one carried
    # forward — the equal-ts tie rule, expressed by ORDERING instead of a
    # pre-dedup aggregation (which would cost a second exchange on
    # (user_id, ts) before the window's user_id exchange)
    rights = ev.filter(F.col("event_type") == _RIGHT_TYPE).select(
        "user_id",
        ts_us.alias("ts_us"),
        F.lit(0).alias("tag"),
        "event_id",
        F.lit(None).cast("double").alias("value"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
        ts_us.alias("fill_ts_us"),
    )
    lefts = ev.filter(F.col("event_type") == _LEFT_TYPE).select(
        "user_id",
        ts_us.alias("ts_us"),
        F.lit(1).alias("tag"),
        "event_id",
        "value",
        F.lit(None).cast("bigint").alias("r_event_id"),
        F.lit(None).cast("double").alias("r_value"),
        F.lit(None).cast("bigint").alias("fill_ts_us"),
    )
    tagged = rights.unionByName(lefts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.select(
        "user_id", "ts_us", "tag", "event_id", "value",
        F.last("r_event_id", ignorenulls=True).over(w).alias("m_event_id"),
        F.last("r_value", ignorenulls=True).over(w).alias("m_value"),
        F.last("fill_ts_us", ignorenulls=True).over(w).alias("m_ts_us"),
    )
    return filled.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.col("m_event_id").alias("r_event_id"),
        F.col("m_value").alias("r_value"),
        (F.col("ts_us") - F.col("m_ts_us")).alias("lag_us"),
    )


_ASOF_SQL = f"""
WITH rights AS (
  SELECT user_id, ts,
         max(event_id) AS r_event_id,
         arg_max(value, event_id) AS r_value
  FROM events
  WHERE event_type = '{_RIGHT_TYPE}'
  GROUP BY user_id, ts
),
lefts AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = '{_LEFT_TYPE}'
)
SELECT l.event_id,
       l.user_id,
       epoch_us(l.ts) AS ts_us,
       l.value,
       r.r_event_id,
       r.r_value,
       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
FROM lefts l
ASOF LEFT JOIN rights r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# Interval length == bin width: every interval overlaps at most 2 bins,
# so the exploded right side is at most 2x its input and each candidate
# (point, interval) pair materializes exactly once (via the point's bin).
_IVL_US = 6 * 3600 * 1_000_000  # 6h view-validity window


def _range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))

    def bin_start(c):  # exact bigint floor-to-bin; no double division
        return c - c % F.lit(_IVL_US)

    views = ev.filter(F.col("event_type") == _RIGHT_TYPE).select(
        "user_id",
        F.col("event_id").alias("r_event_id"),
        ts_us.alias("start_us"),
        (ts_us + F.lit(_IVL_US)).alias("end_us"),
    )
    v_binned = views.select(
        "user_id", "r_event_id", "start_us", "end_us",
        F.explode(
            F.sequence(
                bin_start(F.col("start_us")),
                bin_start(F.col("end_us") - 1),  # end exclusive
                F.lit(_IVL_US),
            )
        ).alias("bin"),
    )
    clicks = ev.filter(F.col("event_type") == _LEFT_TYPE).select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        bin_start(ts_us).alias("bin"),
    )
    # LEFT equi-join: unmatched clicks survive with n_covering = 0, and
    # the containment predicate is applied as a conditional inside the
    # aggregate (count/min/max ignore the NULLs it produces) so no
    # second pass over the candidates is needed.
    cand = clicks.join(v_binned, ["user_id", "bin"], "left")
    hit = F.when(
        (F.col("ts_us") >= F.col("start_us"))
        & (F.col("ts_us") < F.col("end_us")),
        F.col("r_event_id"),
    )
    return cand.groupBy("event_id", "user_id", "ts_us").agg(
        F.count(hit).alias("n_covering"),
        F.min(hit).alias("first_view_id"),
        F.max(hit).alias("last_view_id"),
    )


_RANGE_SQL = f"""
WITH v AS (
  SELECT user_id, event_id AS r_event_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + {_IVL_US} AS end_us
  FROM events WHERE event_type = '{_RIGHT_TYPE}'
),
c AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = '{_LEFT_TYPE}'
)
SELECT c.event_id, c.user_id, c.ts_us,
       CAST(count(v.r_event_id) AS BIGINT) AS n_covering,
       min(v.r_event_id) AS first_view_id,
       max(v.r_event_id) AS last_view_id
FROM c LEFT JOIN v
  ON c.user_id = v.user_id
 AND c.ts_us >= v.start_us AND c.ts_us < v.end_us
GROUP BY c.event_id, c.user_id, c.ts_us
"""


_TRAIN_PCT = 90
_VAL_PCT = 95  # bucket < 95 and >= 90 → val; >= 95 → test


def _stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"),
                               F.col("doc_id").cast("string"))),
                1, 4,
            ),
            16, 10,
        ).cast("bigint") % 100
    )
    assigned = d.select(
        "doc_id",
        "source",
        F.when(bucket < _TRAIN_PCT, "train")
        .when(bucket < _VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    return assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT doc_id, source, n_chars,
         CASE
           WHEN CAST(('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 4))
                AS BIGINT) % 100 < {_TRAIN_PCT} THEN 'train'
           WHEN CAST(('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 4))
                AS BIGINT) % 100 < {_VAL_PCT} THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM assigned
GROUP BY source, split
"""


QUERIES: list[Q] = [
    Q("asof_join", _asof_join, _ASOF_SQL,
      "AS-OF join (latest view at-or-before each click, per user) as a "
      "tagged-union forward fill — one user_id shuffle, no range-join "
      "pair blowup; oracle is DuckDB's native ASOF LEFT JOIN"),
    Q("range_join", _range_join, _RANGE_SQL,
      "interval-overlap join (views covering each click, per user) via "
      "time-bin bucketing — equi-join on (user_id, bin), candidate "
      "pairs bounded by bin occupancy, no nested-loop join; oracle is "
      "DuckDB's native inequality join"),
    Q("stratified_split", _stratified_split, _SPLIT_SQL,
      "deterministic 90/5/5 train/val/test split stratified by source "
      "(md5-keyed, partition/engine/rerun-stable), per-stratum summary"),
]
