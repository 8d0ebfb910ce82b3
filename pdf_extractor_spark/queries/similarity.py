"""Similarity search over the ``embeddings`` table (64-dim float vectors).

- cosine_topk — brute-force cosine top-k: queries (vec_id < 5) broadcast
  against all vectors; dot/norm computed JVM-side with zip_with/aggregate
  (no Python in the hot path).  Scores are rounded to 4dp on BOTH sides
  before ranking so float summation order can't flip the hash.
- ann_ivf    — the scale path: IVF with a FITTED coarse quantizer.  K=16
  centroids come from a deterministic sampled k-means
  (core/kmeans.py: hash-bounded sample → driver fit → broadcast — the
  FAISS/MLlib recipe, so the quantizer tracks the data distribution
  instead of freezing an arbitrary seed slice).  Every vector is assigned
  to its nearest centroid (broadcast join — the 16-row centroid table is
  tiny), queries probe their top-2 nearest centroid cells only, then
  brute-force within the probed cells.  At 100 TB the fit reads a bounded
  256-vector sample, the assignment is a narrow broadcast pass, and the
  search join shuffles on cell_id, touching ~2/16 of the corpus per query
  instead of all of it.  The oracle is a checked-in expected parquet from
  the INDEPENDENT mirror fit+search (oracle_mirror/ivf.py +
  scripts/gen_expected.py); tests/test_kmeans.py pins bit-equality of
  the two fits, and tests/test_similarity.py holds recall ≥ 0.8 on a
  shifted (clustered + outlier) distribution where a seed-slice quantizer
  degrades.

Oracle input pin: ann_ivf's expected parquet and the centroid literals
inside the dedup_embedding_cosine oracle SQL are generated from
/root/testdata/sf0.01/embeddings.parquet — the driver's sf0.01 compare
input must be that same dataset (it is; TESTDATA.md).  BOTH queries
carry ``Q.sf_pin``: tests/test_oracle_parity.py runs a pinned query's
Spark side at the pin AND registers the oracle's DuckDB views from the
pin, so the rehearsal never pairs an sf0.001 corpus with an sf0.01
quantizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_extractor_spark.core import kmeans
from pdf_extractor_spark.queries.base import Q, load, rhu, rhu_sql

_N_QUERIES = 5
_TOP_K = 5
_N_CENTROIDS = 16
_N_PROBE = 2
_PINNED_SF = "/root/testdata/sf0.01"


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


# fitted centroids per (Spark app, sf_dir) — the fit is deterministic, so
# caching only saves the repeated sample scan + driver fit within a session
_FIT_CACHE: dict[tuple[str, str], list[list[float]]] = {}


def _fitted_centroids(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """K=16 coarse-quantizer centroids: hash-bounded sample pulled to the
    driver, deterministic Lloyd fit (core/kmeans.py spec); consumed as
    literal arrays by the narrow assignment expressions.  orderBy(
    md5(id), id).limit(n) is a TakeOrdered — O(n) per partition and
    collects exactly n rows at ANY corpus size, so the driver never holds
    more than n_sample×dim floats."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FIT_CACHE:
        e = load(spark, sf_dir, "embeddings")
        sample = (
            e.select(
                "vec_id", "embedding",
                F.md5(F.col("vec_id").cast("string")).alias("hk"),
            )
            .orderBy("hk", "vec_id")
            .limit(kmeans.N_FIT_SAMPLE)
            .collect()
        )
        # rows arrive hash-ordered (the fit spec's sample order)
        _FIT_CACHE[key] = kmeans.fit(
            [(r.vec_id, [float(x) for x in r.embedding]) for r in sample],
            k=_N_CENTROIDS,
        )
    return _FIT_CACHE[key]


def _cell_scores(emb_col, cents: list[list[float]]):
    """array<struct<score, neg_cell>> of rhu4 cosine against every fitted
    centroid, built entirely from LITERALS — the coarse-quantizer
    assignment as a NARROW per-row expression.  The previous shape
    (crossJoin with a 16-row centroid table + row_number window) pushed
    16× the corpus through a shuffle just to pick each row's argmax; at
    100 TB that is petabytes of exchange for a per-row computation.
    Centroid norms are precomputed with the identical left fold
    (core/kmeans._dot + math.sqrt), so scores match the DuckDB/mirror
    oracles bit for bit."""
    import math as _math

    v = _dvec(emb_col)
    nv = _norm(v)
    # ONE nested-array literal for the centroid matrix and one for the
    # norms (precomputed with the identical left fold): a per-centroid
    # expansion (16 × 64 F.lit leaves + 16 fold subtrees) costs Catalyst
    # seconds of analysis per query construction — as Literal nodes the
    # whole expression is a handful of tree nodes
    matrix = F.lit([[float(x) for x in c] for c in cents])
    norms = F.lit([_math.sqrt(kmeans._dot(c, c)) for c in cents])
    return F.transform(
        matrix,
        lambda c, j: F.struct(
            rhu(_dot(v, c) / (nv * norms[j]), 4).alias("score"),
            (-j).cast("bigint").alias("neg_cell"),
        ),
    )


def _assign_cells(vecs: DataFrame, cents: list[list[float]],
                  emb_col: str) -> DataFrame:
    """cell_id of the nearest fitted centroid per row (ties → lowest
    cell, via max over (score, -cell)).  Pure map — no join, no shuffle.

    Small-input guard: k×dim interpreted fold work per row wants all
    cores, but a bench-scale corpus arrives as one parquet file = one
    partition, so fan out first.  At cluster scale the input already has
    thousands of partitions and the guard is a no-op — the assignment
    stays the narrow pass it should be (the old crossJoin+window shape
    moved 16× the corpus through an exchange instead)."""
    para = vecs.sparkSession.sparkContext.defaultParallelism
    if vecs.rdd.getNumPartitions() < para:
        vecs = vecs.repartition(para)
    best = F.array_max(_cell_scores(F.col(emb_col), cents))
    return vecs.withColumn("cell_id", -best["neg_cell"])


def _probe_cells(df: DataFrame, emb_col: str, cents: list[list[float]],
                 n_probe: int) -> DataFrame:
    """Explode each row into its top-``n_probe`` nearest cells (ordered
    score DESC, cell_id ASC) — the query-side probe set, also narrow."""
    scores = _cell_scores(F.col(emb_col), cents)
    top = F.slice(F.reverse(F.array_sort(scores)), 1, n_probe)
    return (
        df.withColumn("_probe", F.explode(top))
        .withColumn("cell_id", -F.col("_probe.neg_cell"))
        .drop("_probe")
    )


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cents = _fitted_centroids(spark, sf_dir)

    # assignment: narrow argmax against the broadcast-as-literals fit
    cells = _assign_cells(
        e.select(F.col("vec_id").alias("n_id"),
                 F.col("embedding").alias("n_emb")),
        cents, "n_emb",
    )

    # queries probe their top-N_PROBE cells (narrow explode)
    probes = _probe_cells(
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_emb")),
        "q_emb", cents, _N_PROBE,
    )

    # search only within probed cells — the ONLY shuffle in the query,
    # keyed on cell_id, touching ~n_probe/k of the corpus
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
    scale).  Blocking key is the FITTED coarse-quantizer cell (same
    sampled-k-means assignment as ``ann_ivf``), NOT a fixed-cardinality
    attribute: cell count grows with the centroid set and the fit tracks
    the data distribution, so per-block pair counts stay bounded as the
    corpus grows — a label-style block would go quadratic at 100 TB, and
    unfitted seed cells collapse under distribution shift
    (tests/test_adversarial.py).  Cosine is scale-invariant, so a
    jittered copy lands in the same cell as its source and is always a
    candidate.  The oracle SQL blocks on the same cells via centroid
    literals from the independent mirror fit (oracle_mirror/ivf.py, on
    the pinned sf0.01 input); DuckDB evaluates assignment, cosine, and
    threshold itself.
    """
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    jitter = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.001).cast("float")
        ).alias("embedding"),
    )
    corpus = e.unionByName(jitter)
    cells = _assign_cells(
        corpus, _fitted_centroids(spark, sf_dir), "embedding"
    )
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


def _dedup_cosine_sql() -> str:
    """Oracle SQL with mirror-fit centroid literals — DEFERRED: building
    it runs the oracle-side k-means (oracle_mirror/ivf.py), which must
    not execute at module import (executor Python workers import this
    package for UDF closures; paying a fit per worker showed up as
    +0.5 s on the first pandas-UDF query of a session)."""
    from pdf_extractor_spark.oracle_mirror.ivf import centroid_sql_literals

    return f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding,
             x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
),
cents AS (
  SELECT cell_id, c_emb FROM {centroid_sql_literals(_PINNED_SF + "/embeddings.parquet")}
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
    # sf_pin: the oracle SQL embeds centroid literals from the mirror fit
    # on the PINNED sf0.01 input, so the Spark side must fit on the same
    # input — at any other sf the two sides would block on different
    # quantizers and agree only by coincidence (pairs that co-cell under
    # both fits).  The driver compares at sf0.01, where pin and harness
    # dir coincide; the rehearsal honors the pin for BOTH the Spark input
    # and the oracle's DuckDB views.
    Q("dedup_embedding_cosine", _dedup_embedding_cosine, _dedup_cosine_sql,
      "embedding-cosine near-dup pairs, blocked by fitted IVF "
      "coarse-quantizer cell (pinned sf0.01 quantizer oracle)",
      sf_pin=_PINNED_SF),
    Q("cosine_topk", _cosine_topk, _COSINE_SQL,
      "brute-force cosine top-k (exact baseline)"),
    Q("ann_ivf", _ann_ivf,
      "SELECT * FROM read_parquet('/root/repo/expected/ann_ivf.parquet')",
      "IVF ANN with fitted sampled-k-means quantizer (scale path); oracle "
      "is a checked-in independent sequential mirror at the pinned sf0.01",
      sf_pin=_PINNED_SF),
    Q("embedding_stats", _embedding_stats, _EMB_STATS_SQL,
      "vector corpus norm/label profile"),
]
