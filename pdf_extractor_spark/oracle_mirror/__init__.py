"""Independent oracle-side mirrors.

Code in this package restates semantic contracts with SEPARATE
implementations from the Spark query path (core/ + queries/ + job/), so
the DuckDB/expected-parquet oracles built from it can catch a bug in the
engine instead of echoing it.  Modules here must not import from
``pdf_extractor_spark.core``, ``.queries``, or ``.job`` —
tests/test_kmeans.py enforces that with an AST gate.
"""
