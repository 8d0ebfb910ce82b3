"""Curriculum quality binning (`quality_bins`): the threshold fit and
the bin assignment, checked against an INDEPENDENT plain-Python
restatement of the spec over a hand-built corpus — the engine's own
expressions never compute the expected values.

Spec under test (queries/textops.py):
- sample = first 256 docs ordered by (md5(str(doc_id)), doc_id);
- thresholds = percentile_disc quantiles of the sample's quality scores
  at p ∈ {0.25, 0.50, 0.75} (1-based rank ceil(p·n) of ascending order);
- bin = 1 + number of thresholds strictly below the doc's score
  (value-defined: score ≤ t1 → 1, ≤ t2 → 2, ≤ t3 → 3, else 4).
"""

from __future__ import annotations

import hashlib
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_extractor_spark.queries import QUERIES


def _rhu4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _score(text: str | None) -> float:
    """Independent restatement of the quality score."""
    if text is None:
        return 0.0
    toks = [t for t in text.split(" ") if t != ""]
    n_chars = float(len(text))
    if toks:
        mean_tok = _rhu4((n_chars - (len(toks) - 1)) / len(toks))
    else:
        mean_tok = 0.0
    return _rhu4(
        0.5 * min(n_chars / 400.0, 1.0) + 0.5 * min(mean_tok / 8.0, 1.0)
    )


def _expected(docs: list[tuple[int, str | None]]):
    by_hash = sorted(
        docs, key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(),
                             d[0])
    )[:256]
    scores = sorted(_score(t) for _, t in by_hash)
    n = len(scores)
    t = [scores[max(0, math.ceil(p * n) - 1)] for p in (0.25, 0.5, 0.75)]

    def bin_of(s: float) -> int:
        if s <= t[0]:
            return 1
        if s <= t[1]:
            return 2
        if s <= t[2]:
            return 3
        return 4

    return t, {d: (_score(txt), bin_of(_score(txt))) for d, txt in docs}


def _write_docs(tmp_path, docs) -> str:
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    return sf


def test_bins_match_independent_spec(spark, tmp_path):
    # scores spread across the range: longer texts with longer tokens
    # score higher; include a NULL (bin 1) and duplicates (same bin)
    docs: list[tuple[int, str | None]] = [(0, None)]
    for i in range(1, 40):
        docs.append((i, ("a" * (1 + i % 10) + " ") * (1 + i)))
    docs.append((100, docs[5][1]))  # duplicate text of doc 5
    sf = _write_docs(tmp_path, docs)

    got = {
        r.doc_id: (r.quality_score, r.bin)
        for r in QUERIES["quality_bins"](spark, sf).collect()
    }
    _, want = _expected(docs)
    assert got == want
    # equal scores always land in the same bin (value-defined bins)
    assert got[100] == got[5]
    # all four bins are populated on this spread
    assert {b for _, b in got.values()} == {1, 2, 3, 4}


def test_bins_are_monotone_in_score(spark):
    rows = QUERIES["quality_bins"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_score = sorted(rows, key=lambda r: r.quality_score)
    bins = [r.bin for r in by_score]
    assert bins == sorted(bins), "bin must be monotone in quality_score"
    assert bins[0] == 1 and bins[-1] == 4
