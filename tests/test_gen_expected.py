"""The checked-in expected/*.parquet oracles must stay reproducible from
the independent Python mirrors — if extraction/evaluation semantics change
without regenerating them (scripts/gen_expected.py), this fails before the
driver's hash gate does."""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import gen_expected as G  # noqa: E402


@pytest.fixture(scope="module")
def fresh():
    spans = G.oracle_spans()
    rows = G.eval_rows(spans)
    return {
        "extract_spans": G.gen_extract_spans(spans),
        "extract_audit": G.gen_extract_audit(spans),
        "evaluate_spans": G.gen_evaluate_spans(rows),
        "evaluate_summary": G.gen_evaluate_summary(rows),
        "ann_ivf": G.gen_ann_ivf(G.SF001_EMB),
    }


@pytest.mark.parametrize("name", [
    "extract_spans", "extract_audit", "evaluate_spans",
    "evaluate_summary", "ann_ivf",
])
def test_expected_parquet_in_sync(name, fresh):
    on_disk = pq.read_table(os.path.join(G.EXPECTED_DIR, f"{name}.parquet"))
    regenerated = fresh[name]
    assert on_disk.schema.equals(regenerated.schema), (
        f"{name}: schema drift — rerun scripts/gen_expected.py"
    )
    assert on_disk.equals(regenerated), (
        f"{name}: content drift — rerun scripts/gen_expected.py"
    )
