"""Ship the package to executor Python workers.

UDF closures (mapInPandas / pandas_udf) reference module-level functions in
``pdf_extractor_spark``; cloudpickle serializes those by reference, so the
worker process must be able to import the package.  When the driving
process wasn't launched from the repo root (the harness, spark-submit from
elsewhere), workers fail with ModuleNotFoundError.  ``ensure_workers``
zips the package once per session and registers it via
``SparkContext.addPyFile`` — the same mechanism as
``spark-submit --py-files pdf_extractor_spark.zip``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SHIPPED: set[str] = set()


def package_zip() -> str:
    """Build (idempotently) a zip of the package importable by workers."""
    out = os.path.join(
        tempfile.gettempdir(), "pdf_extractor_spark_pyfiles.zip"
    )
    # unique-per-process temp + atomic replace: two concurrent drivers
    # (parallel test/bench sessions) must never interleave writes into a
    # shared .tmp and ship a corrupt zip
    fd, tmp = tempfile.mkstemp(
        suffix=".zip", prefix="pdf_extractor_spark_pyfiles.",
        dir=tempfile.gettempdir(),
    )
    try:
        with os.fdopen(fd, "wb") as fh, \
                zipfile.ZipFile(fh, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(_PKG_DIR):
                for f in sorted(files):
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "pdf_extractor_spark",
                        os.path.relpath(full, _PKG_DIR),
                    )
                    zf.write(full, rel)
        os.replace(tmp, out)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return out


def ensure_workers(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    if not os.path.isdir(_PKG_DIR):
        # the package was itself imported from a zip — i.e. this driver
        # was launched `spark-submit --py-files pdf_extractor_spark.zip`,
        # and spark-submit already distributes that zip to every worker.
        # Re-zipping would walk a path inside the archive (empty result)
        # and re-register the same filename with different content,
        # which SparkContext.addPyFile rejects.
        _SHIPPED.add(app_id)
        return
    spark.sparkContext.addPyFile(package_zip())
    _SHIPPED.add(app_id)
