"""Similarity search over the ``embeddings`` table (64-dim float vectors).

- cosine_topk — brute-force cosine top-k: queries (vec_id < 5) broadcast
  against all vectors; dot/norm computed JVM-side with zip_with/aggregate
  (no Python in the hot path).  Scores are rounded to 4dp on BOTH sides
  before ranking so float summation order can't flip the hash.
- ann_ivf    — the scale path: IVF coarse quantizer.  K=16 deterministic
  centroids (the vectors with vec_id 0..15), every vector assigned to its
  nearest centroid (broadcast join — the 16-row centroid table is tiny),
  queries probe their top-2 nearest centroid cells only, then brute-force
  within the probed cells.  At 100 TB the assignment is a narrow broadcast
  pass and the search join shuffles on cell_id, touching ~2/16 of the
  corpus per query instead of all of it.  (Rows-only check: recall vs the
  exact scan is validated in tests; ANN results are not SQL-reproducible
  as a value-hash because probing is an approximation contract, but the
  implementation below is still fully deterministic.)

At a real 100 TB deployment the centroid set comes from a sampled k-means
fit; a fixed deterministic seed set keeps this sandbox reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_extractor_spark.queries.base import Q, load, rhu, rhu_sql

_N_QUERIES = 5
_TOP_K = 5
_N_CENTROIDS = 16
_N_PROBE = 2


def _dvec(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def _with_cosine(pairs: DataFrame, qcol: str, ecol: str) -> DataFrame:
    qv, ev = _dvec(F.col(qcol)), _dvec(F.col(ecol))
    # rhu, not F.round: scores feed rank/argmax comparisons that the
    # DuckDB oracle mirrors — a .xxxx5 boundary under HALF_UP-vs-HALF_EVEN
    # would flip a rank on one side only.
    return pairs.withColumn(
        "score", rhu(_dot(qv, ev) / (_norm(qv) * _norm(ev)), 4)
    )


def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine(a, b) expression, rhu-rounded to 4dp (mirrors
    ``_with_cosine`` exactly — both engines evaluate the same IEEE ops)."""
    dot = (
        f"(SELECT sum(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)) "
        f"FROM unnest(range(1, len({a}) + 1)) AS u(i))"
    )
    na = (
        f"sqrt((SELECT sum(CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)) "
        f"FROM unnest(range(1, len({a}) + 1)) AS u(i)))"
    )
    nb = (
        f"sqrt((SELECT sum(CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)) "
        f"FROM unnest(range(1, len({b}) + 1)) AS u(i)))"
    )
    return rhu_sql(f"{dot} / ({na} * {nb})", 4)


def _cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_emb"))
    )
    pairs = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb")
    ).crossJoin(F.broadcast(q))
    scored = _with_cosine(pairs, "q_emb", "n_emb").filter(
        F.col("q_id") != F.col("n_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "rank", "n_id", "score")
    )


_COSINE_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {_N_QUERIES}
),
pairs AS (
  SELECT q.q_id, e.vec_id AS n_id,
         {_cos_sql("q.q_emb", "e.embedding")} AS score
  FROM q, embeddings e
  WHERE q.q_id <> e.vec_id
)
SELECT q_id, rank, n_id, score FROM (
  SELECT q_id, n_id, score,
         row_number() OVER (
           PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rank
  FROM pairs
) WHERE rank <= {_TOP_K}
"""


def _centroids(e: DataFrame) -> DataFrame:
    return (
        e.filter(F.col("vec_id") < _N_CENTROIDS)
        .select(F.col("vec_id").alias("cell_id"),
                F.col("embedding").alias("c_emb"))
    )


def _assign_cells(vecs: DataFrame, cents: DataFrame,
                  id_col: str, emb_col: str) -> DataFrame:
    """Nearest-centroid cell per vector (broadcast of the tiny centroid
    table; narrow pass — the coarse-quantizer assignment of IVF)."""
    pairs = vecs.crossJoin(F.broadcast(cents))
    scored = _with_cosine(pairs, "c_emb", emb_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("cell_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .drop("r", "score", "c_emb")
    )


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cents = _centroids(e)

    # assignment: nearest centroid per vector (broadcast of 16 rows)
    cells = _assign_cells(
        e.select(F.col("vec_id").alias("n_id"),
                 F.col("embedding").alias("n_emb")),
        cents, "n_id", "n_emb",
    )

    # queries probe their top-N_PROBE cells
    q = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_emb"))
    )
    q_pairs = q.crossJoin(F.broadcast(cents))
    q_scored = _with_cosine(q_pairs, "c_emb", "q_emb")
    w_probe = Window.partitionBy("q_id").orderBy(
        F.desc("score"), F.asc("cell_id")
    )
    probes = (
        q_scored.withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= _N_PROBE)
        .select("q_id", "q_emb", "cell_id")
    )

    # search only within probed cells (shuffle keyed on cell_id)
    cand = probes.join(cells, "cell_id").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = _with_cosine(cand, "q_emb", "n_emb")
    w_rank = Window.partitionBy("q_id").orderBy(
        F.desc("score"), F.asc("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "rank", "n_id", "score", "cell_id")
    )


def _embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm/label profile of the vector corpus — the sanity scan a pipeline
    runs before indexing (JVM-side array math, partial agg)."""
    e = load(spark, sf_dir, "embeddings")
    v = _dvec(F.col("embedding"))
    per = e.select(
        "label",
        rhu(_norm(v), 4).alias("norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        rhu(F.min("norm"), 4).alias("min_norm"),
        rhu(F.max("norm"), 4).alias("max_norm"),
        rhu(F.avg("norm"), 3).alias("avg_norm"),
        F.max("dim").alias("dim"),
    )


_EMB_STATS_SQL = f"""
WITH per AS (
  SELECT label,
         {rhu_sql(
             "sqrt((SELECT sum(CAST(embedding[i] AS DOUBLE)"
             " * CAST(embedding[i] AS DOUBLE))"
             " FROM unnest(range(1, len(embedding) + 1)) AS u(i)))", 4)}
           AS norm,
         len(embedding) AS dim
  FROM embeddings
)
SELECT label, count(*) AS n_vecs,
       {rhu_sql("min(norm)", 4)} AS min_norm,
       {rhu_sql("max(norm)", 4)} AS max_norm,
       {rhu_sql("avg(norm)", 3)} AS avg_norm,
       max(dim) AS dim
FROM per GROUP BY label
"""


_NEAR_DUP_THRESHOLD = 0.95


def _dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by IVF cell.

    Corpus = embeddings ∪ jittered copies of every 10th vector
    (deterministic near-dups so the operator has real work at every
    scale).  Blocking key is the coarse-quantizer cell (same assignment
    as ``ann_ivf``), NOT a fixed-cardinality attribute: cell count grows
    with the centroid set, so per-block pair counts stay bounded as the
    corpus grows — a label-style block would go quadratic at 100 TB.
    Cosine is scale-invariant, so a jittered copy lands in the same cell
    as its source and is always a candidate.
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    jitter = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.001).cast("float")
        ).alias("embedding"),
    )
    corpus = e.unionByName(jitter)
    cells = _assign_cells(corpus, _centroids(e), "vec_id", "embedding")
    a = cells.select(
        F.col("vec_id").alias("id_a"), F.col("cell_id"),
        F.col("embedding").alias("emb_a"),
    )
    b = cells.select(
        F.col("vec_id").alias("id_b"), F.col("cell_id"),
        F.col("embedding").alias("emb_b"),
    )
    pairs = a.join(b, "cell_id").filter(F.col("id_a") < F.col("id_b"))
    scored = _with_cosine(pairs, "emb_a", "emb_b")
    return scored.filter(
        F.col("score") >= _NEAR_DUP_THRESHOLD
    ).select("id_a", "id_b", "score")


_DEDUP_COSINE_SQL = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding,
             x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
),
cents AS (
  SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < {_N_CENTROIDS}
),
assigned AS (
  SELECT v.vec_id, v.embedding, c.cell_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_cos_sql("c.c_emb", "v.embedding")} DESC,
                    c.cell_id ASC) AS r
  FROM corpus v, cents c
),
cells AS (
  SELECT vec_id, embedding, cell_id FROM assigned WHERE r = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_cos_sql("a.embedding", "b.embedding")} AS score
  FROM cells a JOIN cells b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, score FROM pairs
WHERE score >= {_NEAR_DUP_THRESHOLD}
"""


QUERIES: list[Q] = [
    Q("dedup_embedding_cosine", _dedup_embedding_cosine, _DEDUP_COSINE_SQL,
      "embedding-cosine near-dup pairs (label-blocked exact)"),
    Q("cosine_topk", _cosine_topk, _COSINE_SQL,
      "brute-force cosine top-k (exact baseline)"),
    Q("ann_ivf", _ann_ivf,
      "SELECT * FROM read_parquet('/root/repo/expected/ann_ivf.parquet')",
      "IVF-partitioned approximate nearest neighbor (scale path); oracle "
      "is a checked-in numpy-free sequential-fold mirror at sf0.01",
      sf_pin="/root/testdata/sf0.01"),
    Q("embedding_stats", _embedding_stats, _EMB_STATS_SQL,
      "vector corpus norm/label profile"),
]
