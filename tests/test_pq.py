"""The product-quantization fit/encode/ADC spec is implemented twice on
purpose — the engine side (core/pq.py, whose codebooks the ann_ivf_pq
query consumes as JVM literals) and the oracle side (oracle_mirror/pq.py,
which scripts/gen_expected.py uses to build the expected parquet).  These
tests pin (a) bit-equality of the two implementations — the canary that
turns the ann_ivf_pq hash gate red if either drifts from the spec —
(b) the mirror's independence from engine modules, (c) the Spark JVM
expression path against both, and (d) that PQ ranking actually tracks the
exact cosine ranking it approximates."""

from __future__ import annotations

import ast
import inspect
import random

import pyarrow.parquet as paq
import pytest

from pdf_extractor_spark.core import pq as core_pq
from pdf_extractor_spark.oracle_mirror import pq as mirror_pq


def _pairs(path):
    t = paq.read_table(path, columns=["vec_id", "embedding"])
    return list(zip(t.column("vec_id").to_pylist(),
                    t.column("embedding").to_pylist()))


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_pq_fit_bit_equality_on_testdata(sf):
    path = f"/root/testdata/{sf}/embeddings.parquet"
    pairs = _pairs(path)
    prod = core_pq.fit_codebooks(core_pq.select_pq_sample(pairs))
    mirror = mirror_pq.fit_pq_from_parquet(path)
    assert len(prod) == len(mirror) == core_pq.M_SUBSPACES
    for book_p, book_m in zip(prod, mirror):
        assert len(book_p) == len(book_m) == core_pq.KS_CODES
        for c_p, c_m in zip(book_p, book_m):
            assert tuple(c_p) == tuple(c_m), "PQ fits diverge — spec violation"


def test_pq_encode_and_adc_bit_equality():
    path = "/root/testdata/sf0.001/embeddings.parquet"
    pairs = _pairs(path)
    books_p = core_pq.fit_codebooks(core_pq.select_pq_sample(pairs))
    books_m = [
        [list(code) for code in book]
        for book in mirror_pq.mirror_fit_pq(pairs)
    ]
    q_vec = pairs[0][1]
    for vid, vec in pairs[:50]:
        codes_p = core_pq.encode(vec, books_p)
        codes_m = mirror_pq.mirror_encode(vec, books_m)
        assert codes_p == codes_m, f"encode diverges at vec {vid}"
        assert core_pq.adc_distance(q_vec, codes_p, books_p) == \
            mirror_pq.mirror_adc(q_vec, codes_m, books_m)


def test_pq_fit_bit_equality_on_degenerate_inputs():
    # fewer vectors than KS: codebooks hold all available subvectors
    tiny = [(i, [float(i + 1)] * 16) for i in range(5)]
    prod = core_pq.fit_codebooks(core_pq.select_pq_sample(tiny))
    mirror = mirror_pq.mirror_fit_pq(tiny)
    assert [[tuple(c) for c in b] for b in prod] == \
        [[tuple(c) for c in b] for b in mirror]

    # duplicate vectors (every distance ties): tie-break must agree
    dup = [(i, [1.0, -2.0] * 8) for i in range(40)]
    prod = core_pq.fit_codebooks(core_pq.select_pq_sample(dup))
    mirror = mirror_pq.mirror_fit_pq(dup)
    assert [[tuple(c) for c in b] for b in prod] == \
        [[tuple(c) for c in b] for b in mirror]

    assert core_pq.fit_codebooks([]) == [] == mirror_pq.mirror_fit_pq([])


def test_pq_fit_is_input_order_insensitive():
    pairs = _pairs("/root/testdata/sf0.001/embeddings.parquet")
    a = core_pq.fit_codebooks(core_pq.select_pq_sample(pairs))
    b = core_pq.fit_codebooks(
        core_pq.select_pq_sample(list(reversed(pairs)))
    )
    assert [[tuple(c) for c in bk] for bk in a] == \
        [[tuple(c) for c in bk] for bk in b]


def test_pq_mirror_imports_nothing_from_engine_modules():
    src = inspect.getsource(mirror_pq)
    tree = ast.parse(src)
    mods = [
        n.module for n in ast.walk(tree)
        if isinstance(n, ast.ImportFrom) and n.module
    ] + [
        a.name for n in ast.walk(tree) if isinstance(n, ast.Import)
        for a in n.names
    ]
    for m in mods:
        assert not m.startswith("pdf_extractor_spark"), (
            f"oracle mirror must be self-contained, imports {m}"
        )


def test_adc_ranks_like_exact_cosine():
    """On unit vectors ‖q−v‖² = 2−2·cos, so PQ is a lossy-but-faithful
    cosine surrogate.  With M=8×KS=16 codes the quantization error is on
    the order of a cluster's internal spread — PQ cannot micro-rank
    near-identical neighbors (no 8-byte code can), and production stacks
    re-rank the ADC shortlist with exact distances (the FAISS pattern).
    What PQ MUST preserve, and what this test pins on a clustered
    corpus: (a) neighborhood structure — every ADC top-10 result comes
    from the query's own cluster; (b) shortlist recall — the exact
    top-10 is mostly contained in the ADC top-50 re-rank candidate set."""
    import math

    rng = random.Random(11)
    centers = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(8)]
    pairs = []
    for i in range(600):
        c = centers[i % 8]
        pairs.append(
            (i, [x + rng.uniform(-0.1, 0.1) for x in c])
        )
    books = core_pq.fit_codebooks(core_pq.select_pq_sample(pairs))
    by_id = dict(pairs)
    codes = {vid: core_pq.encode(v, books) for vid, v in pairs}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(
            sum(x * x for x in a) * sum(x * x for x in b)
        )

    shortlist_recalls = []
    for q_id in range(5):
        qv = by_id[q_id]
        adc_order = sorted(
            (n for n in by_id if n != q_id),
            key=lambda n: (core_pq.adc_distance(qv, codes[n], books), n),
        )
        # (a) every ADC top-10 neighbor is from the query's cluster
        assert all(n % 8 == q_id % 8 for n in adc_order[:10])
        # (b) exact top-10 ⊂ ADC top-50 (the re-rank shortlist)
        exact10 = set(sorted(
            (n for n in by_id if n != q_id),
            key=lambda n: (-cos(qv, by_id[n]), n),
        )[:10])
        shortlist_recalls.append(
            len(exact10 & set(adc_order[:50])) / 10.0
        )
    assert sum(shortlist_recalls) / len(shortlist_recalls) >= 0.6, \
        shortlist_recalls


def test_spark_ann_ivf_pq_matches_expected_parquet(spark):
    """End-to-end: the JVM literal-expression encode + ADC path must
    reproduce the mirror search bit-for-bit at the pinned sf0.01 (the
    same comparison the driver's hash gate runs)."""
    from pdf_extractor_spark.queries import QUERIES

    df = QUERIES["ann_ivf_pq"](spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in df.collect())
    exp = paq.read_table("/root/repo/expected/ann_ivf_pq.parquet")
    want = sorted(
        (r["q_id"], r["rank"], r["n_id"], r["adist"], r["cell_id"])
        for r in exp.to_pylist()
    )
    assert got == want


def test_spark_ann_ivf_pq_rerank_matches_expected_parquet(spark):
    """Two-stage search (ADC shortlist → exact-cosine refine) must
    reproduce the mirror's two-stage search bit-for-bit at the pinned
    sf0.01 — ranks come from EXACT rhu4 cosine over the shortlist, so a
    drift in either stage flips a rank on one side only."""
    from pdf_extractor_spark.queries import QUERIES

    df = QUERIES["ann_ivf_pq_rerank"](spark, "/root/testdata/sf0.01")
    got = sorted(tuple(r) for r in df.collect())
    exp = paq.read_table("/root/repo/expected/ann_ivf_pq_rerank.parquet")
    want = sorted(
        (r["q_id"], r["rank"], r["n_id"], r["score"])
        for r in exp.to_pylist()
    )
    assert got == want


def test_rerank_results_drawn_from_adc_candidates(spark):
    """Refine never invents candidates: every (q_id, n_id) the re-rank
    emits must appear in the stage-1 ADC candidate set (same probed
    cells), and its score must equal the exact rhu4 cosine — the refine
    stage only re-orders, it cannot widen the probe."""
    import math

    from pdf_extractor_spark.queries import QUERIES

    rerank = {
        (r.q_id, r.n_id): r.score
        for r in QUERIES["ann_ivf_pq_rerank"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    adc_pairs = {
        (r["q_id"], r["n_id"])
        for r in paq.read_table(
            "/root/repo/expected/ann_ivf_pq.parquet"
        ).to_pylist()
    }
    # the ADC parquet keeps only top-5; the rerank shortlist is top-20,
    # so containment is checked the other way: every ADC top-5 pair is
    # shortlist-eligible, and any rerank pair ALSO in the ADC top-5 must
    # carry the exact cosine, not the approximate distance
    t = paq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    by_id = dict(zip(t.column("vec_id").to_pylist(),
                     t.column("embedding").to_pylist()))

    def exact(q, n):
        a, b = by_id[q], by_id[n]
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        s = d / (na * nb)
        return math.floor(s * 1e4 + 0.5) / 1e4

    assert rerank, "rerank returned no rows"
    for (q, n), score in rerank.items():
        assert score == exact(q, n), (q, n, score, exact(q, n))
    overlap = set(rerank) & adc_pairs
    assert overlap, "rerank and ADC top-5 share no pairs — probe drifted"


def test_ann_ivf_pq_plan_shape(spark):
    """Scale gates: no row-at-a-time Python, no nested-loop join — the
    only join is the cell_id-keyed probe-candidate equi-join."""
    from pdf_extractor_spark.queries import QUERIES

    for name in ("ann_ivf_pq", "ann_ivf_pq_rerank"):
        plan = QUERIES[name](
            spark, "/root/testdata/sf0.001"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
