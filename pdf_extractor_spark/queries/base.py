"""Shared plumbing for the query/oracle suite.

Each query is registered as a ``Q`` with a Spark callable
``fn(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB
oracle SQL string over the driver's pre-registered views (``region nation
customer supplier part orders lineitem events documents embeddings``).

Conventions that make the driver's order-insensitive value-hash stable:

- every computed column is explicitly aliased, identically on both sides;
- every floating-point result is explicitly ``round``-ed on both sides
  (Spark and DuckDB may sum doubles in different orders — rounding to a
  tolerance far above 1 ulp makes the hash deterministic);
- integer aggregates are cast to BIGINT on both sides (DuckDB ``sum(int)``
  is HUGEINT, Spark is LONG);
- timestamps cross the boundary as ``epoch_us`` BIGINT
  (Spark ``unix_micros`` ≙ DuckDB ``epoch_us``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None → rows-only check
    doc: str = ""


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def sql_escape(s: str) -> str:
    return s.replace("'", "''")


def rhu(col, digits: int):
    """Engine-portable round-half-up: floor(x*10^d + 0.5)/10^d.

    Spark rounds halves up, DuckDB rounds halves to even — a value landing
    exactly on a .xxxx5 boundary hashes differently under ``round``.  This
    form uses only IEEE multiply/add/floor, which both engines evaluate
    bit-identically, so the result is deterministic across engines.
    """
    from pyspark.sql import functions as F

    scale = float(10 ** digits)
    return F.floor(col * scale + 0.5) / scale


def rhu_sql(expr: str, digits: int) -> str:
    scale = float(10 ** digits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
