"""The IVF coarse-quantizer fit is implemented twice on purpose — the
engine side (core/kmeans.py, consumed by the Spark queries) and the
oracle side (oracle_mirror/ivf.py, consumed by gen_expected and the
dedup_embedding_cosine SQL literals).  These tests pin (a) bit-equality
of the two fits on real data — the canary that turns the ann_ivf /
dedup_embedding_cosine hash gates red if either implementation drifts
from the spec — and (b) the mirror's independence from the engine
modules."""

from __future__ import annotations

import ast
import inspect

import pyarrow.parquet as pq
import pytest

from pdf_extractor_spark.core import kmeans
from pdf_extractor_spark.oracle_mirror import ivf


def _pairs(path):
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    return list(zip(t.column("vec_id").to_pylist(),
                    t.column("embedding").to_pylist()))


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_fit_bit_equality_on_testdata(sf):
    path = f"/root/testdata/{sf}/embeddings.parquet"
    pairs = _pairs(path)
    k = kmeans.n_centroids(len(pairs))
    prod = kmeans.fit(
        kmeans.select_sample(pairs, kmeans.n_fit_sample(k)), k=k
    )
    mirror = ivf.fit_centroids_from_parquet(path)
    assert len(prod) == len(mirror) == k == 16  # sf corpora sit at the floor
    for p, m in zip(prod, mirror):
        assert tuple(p) == tuple(m), "fits diverge — spec violation"


def test_k_rule_engine_and_mirror_agree():
    """Spec step 0 is part of the cross-implementation contract: the
    corpus-scaled K and sample-size rules must agree between the engine
    and the independent mirror at every corpus size, keep the historical
    k=16/256 fit below the 2048-row knee, and grow linearly (fixed
    ~128-vector target cell) above it."""
    for n in (0, 1, 16, 500, 2000, 2048, 2049, 5000, 20_000, 10**9):
        k = kmeans.n_centroids(n)
        assert k == ivf.mirror_k(n), n
        assert kmeans.n_fit_sample(k) == ivf.mirror_n_sample(k), n
    assert kmeans.n_centroids(500) == 16
    assert kmeans.n_fit_sample(16) == 256          # historical fit unchanged
    assert kmeans.n_centroids(2048) == 16
    assert kmeans.n_centroids(2049) == 17          # the knee
    assert kmeans.n_centroids(5000) == 40
    assert kmeans.n_centroids(10**9) == 7_812_500  # linear: cells stay ~128


def test_fit_bit_equality_above_the_floor():
    """Bit-equality must hold in the SCALED-K regime too (k > 16, sample
    = 16·k), not just at the historical floor — a synthetic 5000-vector
    corpus exercises k=40."""
    import random

    rng = random.Random(7)
    pairs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(5000)
    ]
    k = kmeans.n_centroids(len(pairs))
    assert k == 40
    prod = kmeans.fit(
        kmeans.select_sample(pairs, kmeans.n_fit_sample(k)), k=k
    )
    mirror = ivf.mirror_fit(pairs)
    assert len(prod) == len(mirror) == k
    for p, m in zip(prod, mirror):
        assert tuple(p) == tuple(m), "scaled-K fits diverge"


def test_fit_bit_equality_on_tiny_and_degenerate_inputs():
    # fewer vectors than k: centroids = all vectors, hash-ordered
    tiny = [(i, [float(i + 1), 1.0, 0.5]) for i in range(5)]
    prod = kmeans.fit(kmeans.select_sample(tiny), k=16)
    mirror = ivf.mirror_fit(tiny, k=16)
    assert [tuple(c) for c in prod] == [tuple(c) for c in mirror]
    assert len(prod) == 5

    # duplicate vectors (ties in every cosine): tie-break must agree
    dup = [(i, [1.0, 2.0, 3.0]) for i in range(40)]
    prod = kmeans.fit(kmeans.select_sample(dup), k=4)
    mirror = ivf.mirror_fit(dup, k=4)
    assert [tuple(c) for c in prod] == [tuple(c) for c in mirror]

    assert kmeans.fit([], k=16) == [] == ivf.mirror_fit([], k=16)


def test_fit_is_input_order_insensitive():
    """The spec orders everything by (md5(id), id) / vec_id internally —
    shuffling the caller's row order must not change the fit."""
    path = "/root/testdata/sf0.001/embeddings.parquet"
    pairs = _pairs(path)
    a = kmeans.fit(kmeans.select_sample(pairs), k=16)
    b = kmeans.fit(kmeans.select_sample(list(reversed(pairs))), k=16)
    assert [tuple(c) for c in a] == [tuple(c) for c in b]


def test_mirror_imports_nothing_from_engine_modules():
    src = inspect.getsource(ivf)
    tree = ast.parse(src)
    mods = [
        n.module for n in ast.walk(tree)
        if isinstance(n, ast.ImportFrom) and n.module
    ] + [
        a.name for n in ast.walk(tree) if isinstance(n, ast.Import)
        for a in n.names
    ]
    for m in mods:
        assert not m.startswith("pdf_extractor_spark"), (
            f"oracle mirror must be self-contained, imports {m}"
        )


def test_centroid_sql_literals_round_trip_exactly():
    """repr() literals must parse back to the same doubles in DuckDB —
    otherwise the dedup_embedding_cosine oracle blocks on different
    cells than the Spark side."""
    import duckdb

    path = "/root/testdata/sf0.01/embeddings.parquet"
    cents = ivf.fit_centroids_from_parquet(path)
    rel = ivf.centroid_sql_literals(path)
    got = duckdb.sql(
        f"SELECT cell_id, c_emb FROM {rel} ORDER BY cell_id"
    ).fetchall()
    assert len(got) == len(cents)
    for (cid, emb), want in zip(got, cents):
        assert tuple(emb) == want, f"cell {cid} literals drifted"
