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
    prod = kmeans.fit(kmeans.select_sample(_pairs(path)), k=16)
    mirror = ivf.fit_centroids_from_parquet(path)
    assert len(prod) == len(mirror) == 16
    for p, m in zip(prod, mirror):
        assert tuple(p) == tuple(m), "fits diverge — spec violation"


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
