"""Adversarial-distribution variants for the dedup/ANN scale arguments.

Every scale mechanism added in rounds 2-3 (shingle DF cap, exact-dup rep
filter, fitted-cell blocking) has its failure mode at a distribution
edge the benign seed-42 corpora never exercise.  These tests build the
hostile inputs directly:

- shingle document-frequency EXACTLY at/over the `_MAX_SHINGLE_DF` cap;
- a large exact-duplicate group (the O(k²) LSH blowup input);
- clustered + outlier embeddings (the blocking-degeneracy probe).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from pdf_extractor_spark.queries.dedup import (
    _MAX_SHINGLE_DF,
    _jaccard_pairs,
    _minhash_pairs,
)


# ---------------------------------------------------------- DF-cap boundary

def _df_boundary_corpus(spark):
    """One boilerplate shingle shared by exactly _MAX_SHINGLE_DF docs
    (must be KEPT — the boundary is inclusive) and one shared by
    _MAX_SHINGLE_DF+1 docs (must be DROPPED).  Every doc is otherwise
    unique, plus one genuine near-dup pair that must survive."""
    rows = []
    for i in range(_MAX_SHINGLE_DF):
        rows.append((i, f"keep cap shingle unique{i} tail{i} x{i}"))
    for i in range(_MAX_SHINGLE_DF + 1):
        rows.append((1000 + i, f"drop over shingle unique{i} tl{i} y{i}"))
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows.append((5000, base))
    rows.append((5001, base + " lambda"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_df_cap_boundary_keep_and_drop(spark):
    c = _df_boundary_corpus(spark)
    from pdf_extractor_spark.queries.dedup import _shingles

    sh_all = _shingles(c).localCheckpoint(eager=False)
    df_counts = {
        r.shingle: r.cnt
        for r in sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # boundary layout is as constructed: exactly at cap vs one over
    assert df_counts["keep cap shingle"] == _MAX_SHINGLE_DF
    assert df_counts["drop over shingle"] == _MAX_SHINGLE_DF + 1

    # the capped inverted index keeps the at-cap shingle and drops the
    # over-cap one (inclusive boundary — the documented `<=` contract)
    capped = {
        r.shingle
        for r in sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _MAX_SHINGLE_DF)
        .select("shingle").collect()
    }
    assert "keep cap shingle" in capped
    assert "drop over shingle" not in capped

    # the true near-dup pair survives; boilerplate-only overlap (jaccard
    # ≈ 1/7 between at-cap group members) pairs nothing
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in _jaccard_pairs(c).collect()}
    assert (5000, 5001) in pairs
    assert pairs[(5000, 5001)] >= 0.8
    others = [p for p in pairs if p != (5000, 5001)]
    assert not others, f"boilerplate overlap produced pairs: {others}"


def test_df_cap_bounds_candidate_fanout(spark):
    """With the cap in force, per-shingle fan-out (and thus candidate
    pairs per join key) is bounded by DF² at the cap — the inverted
    index cannot put a quadratic hot key on one reducer."""
    c = _df_boundary_corpus(spark)
    from pdf_extractor_spark.queries.dedup import _shingles

    sh_all = _shingles(c).localCheckpoint(eager=False)
    capped = (
        sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _MAX_SHINGLE_DF)
    )
    max_df = capped.agg(F.max("df")).collect()[0][0]
    assert max_df <= _MAX_SHINGLE_DF


# ------------------------------------------------- exact-dup group blowup

def test_large_exact_dup_group_emits_linear_pairs(spark):
    """120 byte-identical copies: the rep pre-filter must emit exactly
    k-1 pairs (each copy ↔ the min-id representative), never the O(k²)
    all-pairs an LSH bucket join would produce — at 100 TB boilerplate
    duplicate groups reach millions of members."""
    k = 120
    rows = [(i, "the exact same boilerplate text appears everywhere here")
            for i in range(k)]
    rows += [(10_000 + i, f"unique filler document number {i} with words "
              f"alpha{i} beta{i} gamma{i}") for i in range(20)]
    c = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = [(r.doc_a, r.doc_b) for r in _minhash_pairs(c).collect()]
    dup_pairs = [p for p in pairs if p[0] < 10_000 and p[1] < 10_000]
    assert len(dup_pairs) == k - 1, f"expected {k-1}, got {len(dup_pairs)}"
    assert all(a == 0 for a, _ in dup_pairs), "all pairs anchor to the rep"


# -------------------------------------------- embedding blocking under skew

@pytest.fixture(scope="module")
def hostile_emb_dir(tmp_path_factory):
    """Clustered + outlier embeddings written as an sf-style dir, so the
    cell-blocked near-dup query runs unmodified against it."""
    from test_similarity import _clustered_corpus

    d = tmp_path_factory.mktemp("hostile")
    rows = _clustered_corpus(n=400, n_clusters=8, n_outliers=24)
    tbl = pa.Table.from_pydict({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [[float(x) for x in r[1]] for r in rows],
            pa.list_(pa.float32()),
        ),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_cell_blocking_bounded_and_complete_under_skew(spark, hostile_emb_dir):
    """On hostile skew (tight clusters + outliers) the fitted-cell
    blocking must stay BOUNDED — the largest block holds a fraction of
    the corpus, so per-block pair counts don't go quadratic — while
    still finding every deterministic jitter near-dup (cosine is
    scale-invariant, so a jittered copy shares its source's cell)."""
    from pdf_extractor_spark.queries import QUERIES
    from pdf_extractor_spark.queries.similarity import (
        _assign_cells,
        _fitted_centroids,
    )

    e = spark.read.parquet(f"{hostile_emb_dir}/embeddings.parquet")
    n = e.count()
    cents = _fitted_centroids(spark, hostile_emb_dir)
    cells = _assign_cells(e, cents, "embedding")
    occ = [
        r.cnt for r in cells.groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    ]
    # block boundedness: sum of per-cell pair counts ≪ all-pairs
    blocked_pairs = sum(c * (c - 1) // 2 for c in occ)
    all_pairs = n * (n - 1) // 2
    assert blocked_pairs / all_pairs < 0.35, (
        f"blocking degenerated: {blocked_pairs}/{all_pairs}"
    )

    # completeness: every jittered copy (vec_id % 10 == 0 → +1_000_000)
    # must appear among the near-dup pairs
    from pdf_extractor_spark.queries.similarity import (
        _dedup_embedding_cosine,
    )

    found = {
        (r.id_a, r.id_b)
        for r in _dedup_embedding_cosine(spark, hostile_emb_dir).collect()
    }
    expected = {
        (vid, vid + 1_000_000)
        for (vid,) in e.select("vec_id").collect()
        if vid % 10 == 0
    }
    missing = expected - found
    assert not missing, f"jitter near-dups lost by blocking: {missing}"


# -------------------------------------------- cell bound under 10x growth

def _uniform_emb_dir(tmp_path_factory, n: int, name: str) -> str:
    import random

    rng = random.Random(11)
    d = tmp_path_factory.mktemp(name)
    vecs = [[rng.uniform(-1.0, 1.0) for _ in range(8)] for _ in range(n)]
    tbl = pa.Table.from_pydict({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    })
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_cell_candidates_bounded_under_10x_growth(spark, tmp_path_factory):
    """The round-3 scale-killer: with a PINNED K, growing the corpus 10×
    grows every cell 10× and the within-cell pair join does 100× the
    work.  The corpus-scaled K rule (kmeans.n_centroids: fixed ~128-row
    target cell) must keep per-cell candidate counts bounded instead —
    the quadratic-in-cell-size pair work per cell stays ~TARGET², and
    the TOTAL pair work grows linearly with the corpus, not
    quadratically."""
    from pdf_extractor_spark.core import kmeans
    from pdf_extractor_spark.queries.similarity import (
        _assign_cells,
        _fitted_centroids,
    )

    def cell_sizes(n, name):
        d = _uniform_emb_dir(tmp_path_factory, n, name)
        e = spark.read.parquet(f"{d}/embeddings.parquet")
        cents = _fitted_centroids(spark, d)
        assert len(cents) == kmeans.n_centroids(n)
        return [
            r.cnt for r in _assign_cells(e, cents, "embedding")
            .groupBy("cell_id").agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ]

    base = cell_sizes(500, "grow-base")       # K = 16 (floor)
    grown = cell_sizes(5000, "grow-10x")      # K = 40 (scaled)

    # bounded cells: the biggest cell must NOT grow ~10× like a pinned-K
    # quantizer's would (500/16 ≈ 31 → 5000/16 ≈ 312 mean); with the
    # scaled K the mean stays ≤ TARGET_CELL_SIZE and the max stays a
    # small multiple of it even on an unclusterable uniform distribution
    assert sum(grown) == 5000 and len(grown) == 40
    assert max(grown) <= 4 * kmeans.TARGET_CELL_SIZE, (
        f"max cell {max(grown)} blew past the target bound"
    )
    # per-row candidate count (each row joins against its cellmates) must
    # be bounded by a small multiple of the target cell size INDEPENDENT
    # of corpus size — that is what makes total pair work linear in n.
    # (Below the K floor, cells are smaller than target, so comparing
    # work ratios across the floor knee is not meaningful; the bound is.)
    work = lambda sizes: sum(c * (c - 1) // 2 for c in sizes)  # noqa: E731
    per_row_base = 2 * work(base) / sum(base)
    per_row_grown = 2 * work(grown) / sum(grown)
    bound = 4 * kmeans.TARGET_CELL_SIZE
    assert per_row_base <= bound and per_row_grown <= bound, (
        f"per-row candidates unbounded: {per_row_base} -> {per_row_grown}"
    )
    # and the scaled K must decisively beat what the pinned K=16 shape
    # would do on the same 10× corpus (mean cell 312 → ~48.6k pairs/cell)
    pinned_work = 16 * ((5000 // 16) * (5000 // 16 - 1) // 2)
    assert work(grown) < pinned_work / 2, (
        "scaled-K pair work should beat the pinned-K shape decisively"
    )


# ------------------------------------------------- range-join bin boundary

def test_range_join_boundary_semantics(spark, tmp_path_factory):
    """Hand-computed containment at the exact edges the bin bucketing
    could get wrong: interval start (inclusive), the last microsecond
    before the end (inclusive), the end itself (exclusive), an interval
    that CROSSES a bin boundary (the exploded second bin must still
    produce the pair), a click covered by two overlapping windows, and
    a user with no views at all (left-join survival).

    The base timestamp is an exact bin boundary (1704067200 s is a
    multiple of the 6 h bin width), so "end == next bin start" is
    exercised literally.
    """
    from datetime import datetime, timedelta

    from pdf_extractor_spark.queries.temporal import _IVL_US, _range_join

    base = datetime(2024, 1, 1)  # epoch 1704067200s — a 6h-bin boundary
    assert (1_704_067_200 * 1_000_000) % _IVL_US == 0
    us = timedelta(microseconds=1)
    h = timedelta(hours=1)
    rows = [
        # views: v101 = [base, base+6h), v102 = [base+3h, base+9h)
        (101, base, 1, "view"),
        (102, base + 3 * h, 1, "view"),
        # clicks, user 1
        (1, base, 1, "click"),               # == v101 start → covered
        (2, base + 6 * h - us, 1, "click"),  # last us of v101 → both
        (3, base + 6 * h, 1, "click"),       # v101 end (excl) → v102 only
        (5, base + 4 * h, 1, "click"),       # inside both windows
        # click, user 2: no views for this user at all
        (4, base + 1 * h, 2, "click"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("rangejoin")
    pq.write_table(tbl, str(d / "events.parquet"))

    got = {
        r.event_id: (r.n_covering, r.first_view_id, r.last_view_id)
        for r in _range_join(spark, str(d)).collect()
    }
    assert got == {
        1: (1, 101, 101),   # start-inclusive
        2: (2, 101, 102),   # end boundary not yet reached
        3: (1, 102, 102),   # end-exclusive; cross-bin pair survives
        5: (2, 101, 102),   # two covering windows
        4: (0, None, None),  # left-join: uncovered click kept
    }


def test_source_overlap_hand_matrix(spark, tmp_path_factory):
    """Hand-computed overlap matrix pinning SET semantics: a shingle
    repeated across several docs of the same source counts once in both
    the pair overlap and the per-source totals, and disjoint sources
    produce no row at all."""
    from pdf_extractor_spark.queries.dedup import _source_overlap

    docs = [
        # srcA distinct 3-shingles: {"a b c", "b c d"} (doc 2 repeats one)
        (1, "srcA", "a b c d"),
        (2, "srcA", "b c d"),
        # srcB distinct: {"b c d", "c d e"} → shares exactly {"b c d"}
        (3, "srcB", "b c d e"),
        # srcC disjoint from both
        (4, "srcC", "x y z"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "source": pa.array([r[1] for r in docs], pa.string()),
            "text": pa.array([r[2] for r in docs], pa.string()),
        }
    )
    d = tmp_path_factory.mktemp("srcoverlap")
    pq.write_table(tbl, str(d / "documents.parquet"))

    rows = _source_overlap(spark, str(d)).collect()
    assert len(rows) == 1  # only the A–B pair overlaps
    r = rows[0]
    assert (r.source_a, r.source_b) == ("srcA", "srcB")
    assert (r.n_shared, r.n_a, r.n_b) == (1, 2, 2)
    assert r.containment == 0.5
