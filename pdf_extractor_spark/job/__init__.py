from pdf_extractor_spark.job.extract import run_extract  # noqa: F401
from pdf_extractor_spark.job.session import get_spark  # noqa: F401
