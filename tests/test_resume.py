"""Resume/idempotence tests — the Spark analog of the reference's
simulate_interrupt.py + test_resume_workflow.md scenarios."""

from __future__ import annotations

import os

import pytest

from pdf_extractor_spark.job.extract import run_extract
from pdf_extractor_spark.job.sink import (
    committed_batches,
    read_audit,
    read_output,
    run_resumable,
)
from pdf_extractor_spark.queries.extraction import transcripts_df


def _sorted_rows(df):
    return sorted(
        tuple(str(x) for x in r)
        for r in df.select(
            "conv_id", "turn_idx", "span_id", "text"
        ).collect()
    )


def test_interrupt_then_resume_produces_identical_table(spark, tmp_path):
    tdf = transcripts_df(spark, n_convs=12, seed=7)
    out = str(tmp_path / "out")

    # crash after 1 committed batch (≙ simulate_interrupt.py)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, tdf, out, n_batches=4, fail_after_batches=1)

    assert len(committed_batches(spark, out)) == 1
    assert not os.path.exists(os.path.join(out, "_COMPLETE"))

    # resume: only the remaining batches run
    summary = run_resumable(spark, tdf, out, n_batches=4)
    assert summary == {"processed": 3, "skipped": 1, "complete": True}
    assert os.path.exists(os.path.join(out, "_COMPLETE"))

    # final table identical to a clean one-shot run — no dupes, no holes
    resumed = _sorted_rows(read_output(spark, out))
    oneshot = _sorted_rows(run_extract(tdf))
    assert resumed == oneshot


def test_rerun_after_complete_is_noop(spark, tmp_path):
    tdf = transcripts_df(spark, n_convs=6, seed=11)
    out = str(tmp_path / "out")
    first = run_resumable(spark, tdf, out, n_batches=2)
    assert first["complete"]
    again = run_resumable(spark, tdf, out, n_batches=2)
    assert again == {"processed": 0, "skipped": 2, "complete": True}


def test_audit_lineage_covers_all_buckets_and_checksums(spark, tmp_path):
    tdf = transcripts_df(spark, n_convs=10, seed=13)
    out = str(tmp_path / "out")
    run_resumable(spark, tdf, out, n_buckets=8, n_batches=2)

    audit = read_audit(spark, out)
    rows = audit.collect()
    data = read_output(spark, out)
    # every bucket that produced spans has exactly one audit row
    buckets_in_data = {
        r.bucket for r in data.select("bucket").distinct().collect()
    }
    assert {r.bucket for r in rows} == buckets_in_data
    assert all(r.n_spans > 0 for r in rows)
    # xor-fold checksum: positive int64 (60-bit md5 prefix XOR), and it
    # must equal an independent pure-Python recompute over the committed
    # data (order-insensitive by construction)
    from pdf_extractor_spark.queries.base import xor_checksum_py

    assert all(0 <= r.content_checksum < 2 ** 60 for r in rows)
    by_bucket = {}
    for d in data.select(
        "bucket", "conv_id", "span_id", "text"
    ).collect():
        by_bucket.setdefault(d.bucket, []).append(
            (d.conv_id, d.span_id, d.text)
        )
    for r in rows:
        assert r.content_checksum == xor_checksum_py(by_bucket[r.bucket])
    # spans accounted: audit totals == data totals
    assert sum(r.n_spans for r in rows) == data.count()


def test_checksum_count_pair_detects_duplicated_write():
    """XOR alone cancels even multiplicities — a doubled bucket write has
    the SAME checksum as the original.  The audit contract is therefore
    the (content_checksum, n_spans) PAIR (queries/base.py docstring):
    duplication preserves the XOR but flips the count, omission flips the
    XOR.  This pins that property so nobody ever drops n_spans from the
    comparison."""
    from pdf_extractor_spark.queries.base import xor_checksum_py

    rows = [("c1", "s1", "alpha"), ("c1", "s2", "beta")]
    doubled = rows + rows

    # the XOR blind spot, stated as a fact:
    assert xor_checksum_py(doubled) == xor_checksum_py([])
    assert xor_checksum_py(rows + rows[:1]) != xor_checksum_py(rows)

    # the pair closes it:
    pair = (xor_checksum_py(rows), len(rows))
    assert (xor_checksum_py(doubled), len(doubled)) != pair
    assert (xor_checksum_py(rows[:1]), 1) != pair
