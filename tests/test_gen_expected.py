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
import train_bpe as TB  # noqa: E402


@pytest.fixture(scope="module")
def fresh():
    spans = G.oracle_spans()
    rows = G.eval_rows(spans)
    return {
        "extract_spans": G.gen_extract_spans(spans),
        "extract_audit": G.gen_extract_audit(spans),
        "evaluate_spans": G.gen_evaluate_spans(rows),
        "evaluate_summary": G.gen_evaluate_summary(rows),
        "ann_ivf": G.gen_ann_ivf(G.SF01_EMB),
        "bpe_encode": G.gen_bpe_encode(G.SF01_DOCS),
    }


@pytest.mark.parametrize("module", [G, TB])
def test_generator_imports_nothing_from_job_or_queries(module):
    """Oracle independence: the expected-parquet generator (and the BPE
    merges trainer, whose artifact both encoders consume) must not build
    its output out of the Spark job's own constants — a job-side bug
    would then self-certify.  Shared `core/` modules are the sanctioned
    parity strategy (CLAUDE.md); `job/` and `queries/` are not."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(module))
    imported = [
        node.module
        for node in ast.walk(tree)
        if isinstance(node, ast.ImportFrom) and node.module
    ] + [
        alias.name
        for node in ast.walk(tree)
        if isinstance(node, ast.Import)
        for alias in node.names
    ]
    for mod in imported:
        assert not mod.startswith("pdf_extractor_spark.job"), mod
        assert not mod.startswith("pdf_extractor_spark.queries"), mod


def test_perturbed_job_pattern_turns_gate_red(spark, monkeypatch):
    """Canary: if the JOB-side remaining-ref regex drifts (here: broken to
    match-nothing), the generator's independently restated pattern must
    disagree with the live Spark output — i.e. the oracle gate goes red
    instead of silently following the bug."""
    import re

    from pdf_extractor_spark.job import evaluate as JE
    from pdf_extractor_spark.job.evaluate import evaluate_spans

    text = "solve using problem 2.3a as before"
    spans = spark.createDataFrame(
        [("c1", 0, "s1", "q", text, 0, 0, "qa", 1, False)],
        "conv_id string, turn_idx int, span_id string, "
        "question_latex string, text string, turn_start int, "
        "turn_end int, kind string, n_fragments int, had_reference boolean",
    )
    # generator side (independent literal): this text HAS a remaining ref
    assert re.search(G._REMAINING_REF_PAT, ("q " + text).lower())

    # healthy job side agrees...
    healthy = evaluate_spans(spans).select("has_remaining_refs").collect()
    assert healthy[0].has_remaining_refs is True

    # ...perturbed job side diverges, and the generator does NOT follow
    monkeypatch.setattr(JE, "_REMAINING_REF_PAT", r"(?!x)x")
    broken = evaluate_spans(spans).select("has_remaining_refs").collect()
    assert broken[0].has_remaining_refs is False
    assert re.search(G._REMAINING_REF_PAT, ("q " + text).lower()), (
        "generator pattern must be independent of the job-side constant"
    )


@pytest.mark.parametrize("name", [
    "extract_spans", "extract_audit", "evaluate_spans",
    "evaluate_summary", "ann_ivf", "bpe_encode",
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
