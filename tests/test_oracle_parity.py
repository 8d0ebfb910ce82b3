"""Driver-gate rehearsal: every registered query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row-count + column set +
order-insensitive canonical value multiset) at sf0.001 so mismatches are
caught here before the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pdf_extractor_spark import queries as regmod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SQL_CHECKED = [q for q in regmod.ALL if q.sql is not None]
ROWS_ONLY = [q for q in regmod.ALL if q.sql is None]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; normalize representation only
        return f"{v:.6f}".rstrip("0").rstrip(".")
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("q", SQL_CHECKED, ids=lambda q: q.name)
def test_query_matches_oracle(q, spark, oracle):
    sdf = q.fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = oracle.execute(q.sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{q.name}: column mismatch {s_cols} vs {d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{q.name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    cs = _canon_rows(s_cols, s_rows)
    cd = _canon_rows(d_cols, d_rows)
    if cs != cd:
        diff_a = [r for r in cs if r not in cd][:5]
        diff_b = [r for r in cd if r not in cs][:5]
        raise AssertionError(
            f"{q.name}: value mismatch\n spark-only: {diff_a}\n"
            f" oracle-only: {diff_b}"
        )


@pytest.mark.parametrize("q", ROWS_ONLY, ids=lambda q: q.name)
def test_rows_only_queries_run(q, spark):
    sdf = q.fn(spark, SF_DIR)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 30
