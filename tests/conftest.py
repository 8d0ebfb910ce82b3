from __future__ import annotations

import pytest

from pdf_extractor_spark.job.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest-pdf-extractor-spark", cores=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
