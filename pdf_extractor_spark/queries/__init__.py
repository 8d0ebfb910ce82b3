"""Query/oracle registry — the driver-facing coverage surface.

``QUERIES`` maps name → callable(spark, sf_dir) → DataFrame;
``ORACLE_SQL`` maps the SQL-expressible subset to DuckDB oracle strings.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.queries import (
    dedup,
    extraction,
    relational,
    similarity,
    textops,
)
from pdf_extractor_spark.queries.base import Q

ALL: list[Q] = (
    relational.QUERIES
    + textops.QUERIES
    + dedup.QUERIES
    + similarity.QUERIES
    + extraction.QUERIES
)

_names = [q.name for q in ALL]
assert len(_names) == len(set(_names)), "duplicate query names"

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    q.name: q.fn for q in ALL
}
ORACLE_SQL: Dict[str, str] = {
    q.name: q.sql for q in ALL if q.sql is not None
}


def get(name: str) -> Q:
    for q in ALL:
        if q.name == name:
            return q
    raise KeyError(name)
