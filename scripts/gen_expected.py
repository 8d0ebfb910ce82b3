"""Generate the checked-in expected-output parquet files that give the
extraction/evaluation family (and ann_ivf) driver-hashable oracles.

The flagship pipeline's semantics are not ANSI-SQL, but the seed-42 corpus
is deterministic — so the single-process Python oracle
(pdf_extractor_spark/core/oracle.py, NO Spark involved) can serialize its
expected output once, and ``oracle_sql()`` becomes a plain
``SELECT ... FROM read_parquet('expected/<name>.parquet')`` that DuckDB
hash-compares against the live Spark run.  Every implementation here is
independent of the Spark code path (pure Python / sequential folds), so
the comparison is a real oracle, not an echo.

Run from the repo root:  python scripts/gen_expected.py
Regenerate whenever the extraction semantics or the seed-42 corpus change.
"""

from __future__ import annotations

import math
import os
import re
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extractor_spark.core.normalize import (
    normalize_latex,
    structure_similarity,
    text_similarity,
)
from pdf_extractor_spark.core.oracle import extract_table
from pdf_extractor_spark.core.refs import CONTEXT_OPEN
from pdf_extractor_spark.gen.transcripts import generate_transcripts

# Independent restatement of the remaining-reference sweep (the semantic
# contract from /root/reference/src/evaluator.py:53-69) — deliberately NOT
# imported from pdf_extractor_spark.job.evaluate, so a bug introduced in
# the job-side pattern cannot self-certify through its own oracle
# (tests/test_gen_expected.py carries the perturbation canary).
_REMAINING_REF_PAT = (
    r"(?:using|from|by|see|as in)\s+"
    r"(?:the result of |the result from |problem |question |exercise |part )?"
    r"\d+\.\d+[a-z]?\b"
    r"|\b(?:problem|question|exercise)\s+\d+\.\d+[a-z]?\b"
)

# Review-priority similarity threshold (evaluator.py:258-280 contract),
# restated rather than imported for the same reason.
_SIM_REVIEW_THRESHOLD = 0.95


def _xor_checksum_mirror(rows, sep: str = "\x1f") -> int:
    """Independent restatement of queries.base.xor_checksum's contract:
    XOR-fold of the first 15 md5 hex digits of sep-joined row values."""
    import hashlib

    acc = 0
    for vals in rows:
        h = hashlib.md5(sep.join(vals).encode("utf-8")).hexdigest()
        acc ^= int(h[:15], 16)
    return acc

EXPECTED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "expected"
)
# ann_ivf's oracle is generated from THIS dataset and the driver compares
# at its own sf0.01 dir — the gate relies on those being the same parquet
# (they are: TESTDATA.md's driver-generated fixture tree).  Q.sf_pin on
# ann_ivf makes the repo-side rehearsal honor the same pin.
SF01_EMB = "/root/testdata/sf0.01/embeddings.parquet"

_N_CONVS = 40
_SEED = 42


def rhu_py(x: float, digits: int) -> float:
    """Python mirror of queries.base.rhu — identical IEEE ops."""
    scale = float(10 ** digits)
    return math.floor(x * scale + 0.5) / scale


# ------------------------------------------------------------ extraction

def oracle_spans() -> list[dict]:
    corpus = generate_transcripts(n_convs=_N_CONVS, seed=_SEED)
    return extract_table(corpus.to_dict("records"))


def gen_extract_spans(spans: list[dict]) -> pa.Table:
    df = pd.DataFrame(spans)
    return pa.Table.from_pydict({
        "conv_id": pa.array(df["conv_id"], pa.string()),
        "turn_idx": pa.array(df["turn_idx"], pa.int32()),
        "span_id": pa.array(df["span_id"], pa.string()),
        "question_latex": pa.array(df["question_latex"], pa.string()),
        "text": pa.array(df["text"], pa.string()),
        "turn_start": pa.array(df["turn_start"], pa.int32()),
        "turn_end": pa.array(df["turn_end"], pa.int32()),
        "kind": pa.array(df["kind"], pa.string()),
        "n_fragments": pa.array(df["n_fragments"], pa.int32()),
        "had_reference": pa.array(df["had_reference"], pa.bool_()),
    })


def gen_extract_audit(spans: list[dict]) -> pa.Table:
    per: dict[str, list[dict]] = {}
    for s in spans:
        per.setdefault(s["conv_id"], []).append(s)
    rows = []
    for conv_id in sorted(per):
        ss = per[conv_id]
        rows.append({
            "conv_id": conv_id,
            "n_spans": len(ss),
            "n_fragments": sum(s["n_fragments"] for s in ss),
            "max_turn": max(s["turn_end"] for s in ss),
            "n_referenced": sum(1 for s in ss if s["had_reference"]),
            "n_stitched": sum(1 for s in ss if s["n_fragments"] > 1),
            "content_checksum": _xor_checksum_mirror(
                (s["span_id"], s["text"]) for s in ss
            ),
        })
    df = pd.DataFrame(rows)
    return pa.Table.from_pydict({
        "conv_id": pa.array(df["conv_id"], pa.string()),
        "n_spans": pa.array(df["n_spans"], pa.int64()),
        "n_fragments": pa.array(df["n_fragments"], pa.int64()),
        "max_turn": pa.array(df["max_turn"], pa.int64()),
        "n_referenced": pa.array(df["n_referenced"], pa.int64()),
        "n_stitched": pa.array(df["n_stitched"], pa.int64()),
        "content_checksum": pa.array(df["content_checksum"], pa.int64()),
    })


def gen_audit_consistency(spans: list[dict]) -> pa.Table:
    """Mirror of the resumable sink's per-bucket audit invariant
    (queries/extraction.py _audit_consistency): buckets the oracle spans
    itself with zlib.crc32(conv_id) % 32 (restating job/sink.py's
    crc32 bucketing independently), recomputes every audited metric, and
    expects ``consistent`` true everywhere — the engine side derives
    that flag by comparing its audit rows to a recount of its committed
    files, so either a sink bookkeeping bug or an extraction drift
    breaks the hash."""
    import zlib

    n_buckets, n_batches = 32, 4
    per: dict[int, list[dict]] = {}
    for s in spans:
        b = zlib.crc32(s["conv_id"].encode("utf-8")) % n_buckets
        per.setdefault(b, []).append(s)
    rows = []
    for b in sorted(per):
        ss = per[b]
        rows.append({
            "bucket": b,
            "batch": b % n_batches,
            "n_convs": len({s["conv_id"] for s in ss}),
            "n_spans": len(ss),
            "n_fragments": sum(s["n_fragments"] for s in ss),
            "n_referenced": sum(1 for s in ss if s["had_reference"]),
            "content_checksum": _xor_checksum_mirror(
                (s["conv_id"], s["span_id"], s["text"]) for s in ss
            ),
            "consistent": True,
        })
    df = pd.DataFrame(rows)
    return pa.Table.from_pydict({
        "bucket": pa.array(df["bucket"], pa.int32()),
        "batch": pa.array(df["batch"], pa.int32()),
        "n_convs": pa.array(df["n_convs"], pa.int64()),
        "n_spans": pa.array(df["n_spans"], pa.int64()),
        "n_fragments": pa.array(df["n_fragments"], pa.int64()),
        "n_referenced": pa.array(df["n_referenced"], pa.int64()),
        "content_checksum": pa.array(df["content_checksum"], pa.int64()),
        "consistent": pa.array(df["consistent"], pa.bool_()),
    })


# ------------------------------------------------------------ evaluation

def eval_rows(spans: list[dict]) -> list[dict]:
    """Pure-Python mirror of job/evaluate.py:evaluate_spans."""
    out = []
    for s in spans:
        text = s["text"]
        had_ref = bool(s["had_reference"])
        original = text.split(CONTEXT_OPEN)[0] if had_ref else text
        full = (s["question_latex"] + " " + original).lower()
        has_remaining = re.search(_REMAINING_REF_PAT, full) is not None
        well_formed = (
            text.count("{") == text.count("}") and text.count("$") % 2 == 0
        )
        sim = (
            float(text_similarity(
                normalize_latex(original), normalize_latex(text)
            ))
            if had_ref else None
        )
        ssim = (
            float(structure_similarity(original, text)) if had_ref else None
        )
        preserved = text.startswith(original)
        passed = well_formed and preserved
        sim_eff = 1.0 if sim is None else sim
        if not well_formed or not preserved:
            priority = "high"
        elif has_remaining and not had_ref:
            priority = "medium"
        elif had_ref and sim_eff < _SIM_REVIEW_THRESHOLD:
            priority = "low"
        else:
            priority = "none"
        out.append({
            "conv_id": s["conv_id"],
            "span_id": s["span_id"],
            "qa_id": s["conv_id"] + "/" + s["span_id"],
            "question_latex": s["question_latex"],
            "text": text,
            "had_reference": had_ref,
            "has_remaining_refs": has_remaining,
            "latex_well_formed": well_formed,
            "answer_similarity": sim,
            "structural_similarity": ssim,
            "answer_preserved": preserved,
            "overall_passed": passed,
            "review_priority": priority,
        })
    return out


def gen_evaluate_spans(rows: list[dict]) -> pa.Table:
    df = pd.DataFrame(rows)
    return pa.Table.from_pydict({
        "conv_id": pa.array(df["conv_id"], pa.string()),
        "span_id": pa.array(df["span_id"], pa.string()),
        "qa_id": pa.array(df["qa_id"], pa.string()),
        "question_latex": pa.array(df["question_latex"], pa.string()),
        "text": pa.array(df["text"], pa.string()),
        "had_reference": pa.array(df["had_reference"], pa.bool_()),
        "has_remaining_refs": pa.array(df["has_remaining_refs"], pa.bool_()),
        "latex_well_formed": pa.array(df["latex_well_formed"], pa.bool_()),
        "answer_similarity": pa.array(
            [r["answer_similarity"] for r in rows], pa.float64()
        ),
        "structural_similarity": pa.array(
            [r["structural_similarity"] for r in rows], pa.float64()
        ),
        "answer_preserved": pa.array(df["answer_preserved"], pa.bool_()),
        "overall_passed": pa.array(df["overall_passed"], pa.bool_()),
        "review_priority": pa.array(df["review_priority"], pa.string()),
    })


def _det_avg_py(vals: list[float]) -> float | None:
    """Order-independent mean mirror: per-value integer quantization
    (floor(x*1e6 + 0.5)), exact integer sum, one division, rhu(…, 4) —
    the same op sequence the Spark summary performs (job/evaluate.py
    ``_det_avg``), so partitioning can never flip the hash."""
    if not vals:
        return None
    num = float(sum(int(math.floor(v * 1_000_000.0 + 0.5)) for v in vals))
    den = float(len(vals)) * 1_000_000.0
    return rhu_py(num / den, 4)


def gen_evaluate_summary(rows: list[dict]) -> pa.Table:
    n = len(rows)
    passed = sum(1 for r in rows if r["overall_passed"])
    sims = [r["answer_similarity"] for r in rows
            if r["answer_similarity"] is not None]
    ssims = [r["structural_similarity"] for r in rows
             if r["structural_similarity"] is not None]
    return pa.Table.from_pydict({
        "total_qas": pa.array([n], pa.int64()),
        "passed": pa.array([passed], pa.int64()),
        "failed": pa.array([n - passed], pa.int64()),
        "needs_review": pa.array(
            [sum(1 for r in rows
                 if r["review_priority"] in ("high", "medium"))], pa.int64()
        ),
        "pass_rate": pa.array([rhu_py(passed / n, 4)], pa.float64()),
        "compilation_failures": pa.array(
            [sum(1 for r in rows if not r["latex_well_formed"])], pa.int64()
        ),
        "remaining_refs": pa.array(
            [sum(1 for r in rows if r["has_remaining_refs"])], pa.int64()
        ),
        "high_priority_reviews": pa.array(
            [sum(1 for r in rows if r["review_priority"] == "high")],
            pa.int64(),
        ),
        "avg_similarity": pa.array([_det_avg_py(sims)], pa.float64()),
        "avg_structural_similarity": pa.array(
            [_det_avg_py(ssims)], pa.float64()
        ),
    })


# --------------------------------------------------------------- ann_ivf

def _fold_dot(a: list[float], b: list[float]) -> float:
    """Left fold in array order — mirrors F.aggregate(zip_with(...))
    exactly (same IEEE add sequence)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x * y)
    return acc


def _cos(a: list[float], b: list[float]) -> float:
    score = _fold_dot(a, b) / (
        math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
    )
    return rhu_py(score, 4)


def gen_ann_ivf(emb_path: str) -> pa.Table:
    from pdf_extractor_spark.oracle_mirror.ivf import (
        fit_centroids_from_parquet,
    )

    t = pq.read_table(emb_path)
    vec_ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()  # float32 → Python float64
    by_id = dict(zip(vec_ids, embs))

    # fitted coarse quantizer — the independent mirror restatement of
    # core/kmeans.py's sampled-Lloyd spec (bit-equality pinned by
    # tests/test_kmeans.py)
    cents = [
        (j, list(c))
        for j, c in enumerate(fit_centroids_from_parquet(emb_path))
    ]
    return _ivf_search_table(by_id, cents)


def gen_ann_ivf_scaled(emb_path: str) -> pa.Table:
    """ann_ivf over the mirror's independently-restated 5×-expanded
    corpus with the corpus-scaled K (= 20 at the sf0.01 pin — above the
    floor, the whole point of the query)."""
    from pdf_extractor_spark.oracle_mirror.ivf import (
        expanded_pairs_from_parquet,
        fit_centroids_expanded,
    )

    by_id = {vid: list(vec)
             for vid, vec in expanded_pairs_from_parquet(emb_path)}
    cents = [
        (j, list(c))
        for j, c in enumerate(fit_centroids_expanded(emb_path))
    ]
    assert len(cents) > 16, "expanded corpus must fit above the K floor"
    return _ivf_search_table(by_id, cents)


def _ivf_search_table(by_id: dict, cents: list) -> pa.Table:
    n_probe, n_queries, top_k = 2, 5, 5
    # nearest-centroid assignment (ties → min cell_id)
    cell_of: dict[int, int] = {}
    for vid, emb in by_id.items():
        best = max(cents, key=lambda c: (_cos(c[1], emb), -c[0]))
        cell_of[vid] = best[0]
    members: dict[int, list[int]] = {}
    for vid, cell in cell_of.items():
        members.setdefault(cell, []).append(vid)

    rows = []
    for q_id in sorted(by_id):
        if q_id >= n_queries:
            continue
        q_emb = by_id[q_id]
        probes = sorted(
            cents, key=lambda c: (-_cos(c[1], q_emb), c[0])
        )[:n_probe]
        cands = []
        for cell_id, _ in probes:
            for n_id in members.get(cell_id, []):
                if n_id == q_id:
                    continue
                cands.append(
                    (q_id, n_id, _cos(q_emb, by_id[n_id]), cell_id)
                )
        cands.sort(key=lambda c: (-c[2], c[1]))
        for rank, (qi, ni, score, cell) in enumerate(cands[:top_k], 1):
            rows.append({"q_id": qi, "rank": rank, "n_id": ni,
                         "score": score, "cell_id": cell})
    return pa.Table.from_pydict({
        "q_id": pa.array([r["q_id"] for r in rows], pa.int64()),
        "rank": pa.array([r["rank"] for r in rows], pa.int32()),
        "n_id": pa.array([r["n_id"] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.float64()),
        "cell_id": pa.array([r["cell_id"] for r in rows], pa.int64()),
    })


def gen_ann_ivf_pq(emb_path: str) -> pa.Table:
    """IVF-PQ oracle: the mirror coarse fit picks the probed cells, the
    mirror PQ fit (oracle_mirror/pq.py — independent restatement of the
    core/pq.py spec) encodes every candidate, and ADC distances rank
    them — all sequential Python, no engine imports."""
    from pdf_extractor_spark.oracle_mirror.ivf import (
        fit_centroids_from_parquet,
    )
    from pdf_extractor_spark.oracle_mirror.pq import (
        fit_pq_from_parquet,
        mirror_adc,
        mirror_encode,
    )

    t = pq.read_table(emb_path)
    by_id = dict(zip(t.column("vec_id").to_pylist(),
                     t.column("embedding").to_pylist()))
    cents = [
        (j, list(c))
        for j, c in enumerate(fit_centroids_from_parquet(emb_path))
    ]
    books = [
        [list(code) for code in book]
        for book in fit_pq_from_parquet(emb_path)
    ]

    n_probe, n_queries, top_k = 2, 5, 5
    cell_of = {
        vid: max(cents, key=lambda c: (_cos(c[1], emb), -c[0]))[0]
        for vid, emb in by_id.items()
    }
    members: dict[int, list[int]] = {}
    for vid, cell in cell_of.items():
        members.setdefault(cell, []).append(vid)
    codes = {vid: mirror_encode(emb, books) for vid, emb in by_id.items()}

    rows = []
    for q_id in sorted(by_id):
        if q_id >= n_queries:
            continue
        q_emb = by_id[q_id]
        probes = sorted(
            cents, key=lambda c: (-_cos(c[1], q_emb), c[0])
        )[:n_probe]
        cands = []
        for cell_id, _ in probes:
            for n_id in members.get(cell_id, []):
                if n_id == q_id:
                    continue
                adist = rhu_py(mirror_adc(q_emb, codes[n_id], books), 4)
                cands.append((q_id, n_id, adist, cell_id))
        cands.sort(key=lambda c: (c[2], c[1]))
        for rank, (qi, ni, adist, cell) in enumerate(cands[:top_k], 1):
            rows.append({"q_id": qi, "rank": rank, "n_id": ni,
                         "adist": adist, "cell_id": cell})
    return pa.Table.from_pydict({
        "q_id": pa.array([r["q_id"] for r in rows], pa.int64()),
        "rank": pa.array([r["rank"] for r in rows], pa.int32()),
        "n_id": pa.array([r["n_id"] for r in rows], pa.int64()),
        "adist": pa.array([r["adist"] for r in rows], pa.float64()),
        "cell_id": pa.array([r["cell_id"] for r in rows], pa.int64()),
    })


def gen_ann_ivf_pq_rerank(emb_path: str) -> pa.Table:
    """Two-stage IVF-PQ oracle: the mirror ADC search keeps a top-R
    shortlist per query, then EXACT rhu4 cosine over only those raw
    vectors picks the final top-k — the same FAISS refine pattern the
    engine query implements, restated sequentially with no engine
    imports."""
    from pdf_extractor_spark.oracle_mirror.ivf import (
        fit_centroids_from_parquet,
    )
    from pdf_extractor_spark.oracle_mirror.pq import (
        fit_pq_from_parquet,
        mirror_adc,
        mirror_encode,
    )

    t = pq.read_table(emb_path)
    by_id = dict(zip(t.column("vec_id").to_pylist(),
                     t.column("embedding").to_pylist()))
    cents = [
        (j, list(c))
        for j, c in enumerate(fit_centroids_from_parquet(emb_path))
    ]
    books = [
        [list(code) for code in book]
        for book in fit_pq_from_parquet(emb_path)
    ]

    n_probe, n_queries, top_k, shortlist_r = 2, 5, 5, 20
    cell_of = {
        vid: max(cents, key=lambda c: (_cos(c[1], emb), -c[0]))[0]
        for vid, emb in by_id.items()
    }
    members: dict[int, list[int]] = {}
    for vid, cell in cell_of.items():
        members.setdefault(cell, []).append(vid)
    codes = {vid: mirror_encode(emb, books) for vid, emb in by_id.items()}

    rows = []
    for q_id in sorted(by_id):
        if q_id >= n_queries:
            continue
        q_emb = by_id[q_id]
        probes = sorted(
            cents, key=lambda c: (-_cos(c[1], q_emb), c[0])
        )[:n_probe]
        # stage 1: ADC shortlist (top-R by approximate distance)
        cands = []
        for cell_id, _ in probes:
            for n_id in members.get(cell_id, []):
                if n_id == q_id:
                    continue
                adist = rhu_py(mirror_adc(q_emb, codes[n_id], books), 4)
                cands.append((adist, n_id))
        cands.sort()
        shortlist = [n_id for _, n_id in cands[:shortlist_r]]
        # stage 2: exact rhu4 cosine over the shortlist only
        reranked = sorted(
            ((_cos(q_emb, by_id[n_id]), n_id) for n_id in shortlist),
            key=lambda p: (-p[0], p[1]),
        )
        for rank, (score, n_id) in enumerate(reranked[:top_k], 1):
            rows.append({"q_id": q_id, "rank": rank, "n_id": n_id,
                         "score": score})
    return pa.Table.from_pydict({
        "q_id": pa.array([r["q_id"] for r in rows], pa.int64()),
        "rank": pa.array([r["rank"] for r in rows], pa.int32()),
        "n_id": pa.array([r["n_id"] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.float64()),
    })


SF01_DOCS = "/root/testdata/sf0.01/documents.parquet"
_BPE_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_extractor_spark", "core", "bpe_merges.txt",
)


def gen_bpe_encode(docs_path: str) -> pa.Table:
    """bpe_encode oracle via the MIRROR encoder (oracle_mirror/bpe.py —
    independent restatement of the core/bpe.py spec; the merges table is
    shared DATA, not shared code)."""
    from pdf_extractor_spark.oracle_mirror.bpe import (
        mirror_checksum,
        mirror_encode,
        mirror_load_merges,
    )

    merges = mirror_load_merges(_BPE_MERGES_PATH)
    tab = pq.read_table(docs_path, columns=["doc_id", "text"])
    doc_ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    rows = []
    for doc_id, text in zip(doc_ids, texts):
        toks = mirror_encode(text, merges)
        rows.append((doc_id, len(toks), mirror_checksum(toks)))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "token_checksum": pa.array([r[2] for r in rows], pa.string()),
    })


def main() -> None:
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    spans = oracle_spans()
    rows = eval_rows(spans)
    outputs = {
        "extract_spans": gen_extract_spans(spans),
        "extract_audit": gen_extract_audit(spans),
        "audit_consistency": gen_audit_consistency(spans),
        "evaluate_spans": gen_evaluate_spans(rows),
        "evaluate_summary": gen_evaluate_summary(rows),
        "ann_ivf": gen_ann_ivf(SF01_EMB),
        "ann_ivf_scaled": gen_ann_ivf_scaled(SF01_EMB),
        "ann_ivf_pq": gen_ann_ivf_pq(SF01_EMB),
        "ann_ivf_pq_rerank": gen_ann_ivf_pq_rerank(SF01_EMB),
        "bpe_encode": gen_bpe_encode(SF01_DOCS),
    }
    for name, table in outputs.items():
        path = os.path.join(EXPECTED_DIR, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"{name}: {table.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
