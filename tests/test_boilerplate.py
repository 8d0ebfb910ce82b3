"""Semantics of C4-style boilerplate line removal (strip_boilerplate).

The oracle-parity sweep hash-checks Spark vs DuckDB; these pin the
SEMANTICS against hand-derivable facts: the universal footer is always
removed, the sub-threshold offer line is always kept, and reassembly
preserves original line order.
"""

from __future__ import annotations

from pdf_extractor_spark.queries.textops import (
    _BOILER_FOOTER,
    _BOILER_MAX_DF,
    _BOILER_OFFER,
    _BOILER_RIGHTS,
    _BOILER_WORDS,
    _strip_boilerplate,
)

SF = "/root/testdata/sf0.001"


def test_strip_boilerplate_semantics(spark):
    rows = _strip_boilerplate(spark, SF).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}

    n_docs = len(rows)
    # fixture sanity: the injected lines straddle the threshold
    assert n_docs > _BOILER_MAX_DF            # footer (every doc) is hot
    assert n_docs // 50 <= _BOILER_MAX_DF     # offer line stays cold

    for r in rows:
        # the universal footer and the %3 rights line are gone everywhere
        assert _BOILER_FOOTER not in r.clean_text.split("\n")
        assert _BOILER_RIGHTS not in r.clean_text.split("\n")
        # accounting holds
        assert r.n_removed >= 1               # at least the footer
        kept = r.clean_text.split("\n") if r.clean_text else []
        assert len(kept) == r.n_lines - r.n_removed

    # the sub-threshold offer line survives on its %50 docs
    offer_docs = [i for i in by_id if i % 50 == 0]
    assert offer_docs
    for i in offer_docs:
        assert by_id[i].clean_text.split("\n")[-1] == _BOILER_OFFER

    # order preservation: the first kept line is the doc's first 8 words
    from pdf_extractor_spark.queries.base import load

    texts = {
        r.doc_id: r.text
        for r in load(spark, SF, "documents").select("doc_id", "text").collect()
    }
    for i, r in list(by_id.items())[:20]:
        toks = [t for t in texts[i].split(" ") if t]
        if not toks:
            continue
        first_chunk = " ".join(toks[:_BOILER_WORDS])
        kept = r.clean_text.split("\n")
        # the first base chunk is near-unique word soup → always kept
        assert kept[0] == first_chunk
