"""Pure-Python extraction core.  NO Spark imports allowed in this package.

This is the single source of truth for extraction semantics: the oracle
(`oracle.py`) runs it single-process; the Spark job runs the same functions
inside Arrow batches.  Per-turn text equality between the two is therefore
structural, not coincidental.
"""

from pdf_extractor_spark.core.normalize import (  # noqa: F401
    UNICODE_TO_LATEX,
    normalize_latex,
    sanitize_latex,
    strip_solution_prefix,
)
from pdf_extractor_spark.core.structure import parse_qa_id  # noqa: F401
