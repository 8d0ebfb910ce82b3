"""Oracle-side mirror of the IVF coarse-quantizer fit.

Implements the deterministic sampled k-means SPEC from
pdf_extractor_spark/core/kmeans.py (sample = n smallest (md5(str(id)),
id); init = first k in that hash order; Lloyd steps with ascending-index
left-fold cosine, strict-> tie-break to the lowest cell, ascending-vec_id
mean accumulation, empty cells keep their centroid; float64 + math.sqrt
throughout) — with independent code, importing nothing from the engine
side.  tests/test_kmeans.py pins bit-equality of the two fits; if either
implementation drifts from the spec, that test and the ann_ivf /
dedup_embedding_cosine hash gates go red.

``centroid_sql_literals`` renders the fitted centroids as a DuckDB VALUES
clause so the dedup_embedding_cosine oracle SQL can block on the same
cells the Spark side computes, while every downstream number (assignment,
cosine, threshold) is still evaluated by DuckDB itself.  Literals use
17-significant-digit scientific notation, which DuckDB types as DOUBLE
directly and which uniquely identifies every float64
(tests/test_kmeans.py pins the exact round-trip).
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

import pyarrow.parquet as pq

MIRROR_N_ITERS = 5
# spec step 0 (restated independently): the cell count scales with the
# corpus at a ~128-vector target cell size, floored at the historical 16,
# and the fit sample is 16 rows per centroid
MIRROR_TARGET_CELL = 128
MIRROR_K_FLOOR = 16
MIRROR_SAMPLE_PER_CELL = 16


def mirror_k(n_rows: int) -> int:
    return max(MIRROR_K_FLOOR, math.ceil(n_rows / MIRROR_TARGET_CELL))


def mirror_n_sample(k: int) -> int:
    return MIRROR_SAMPLE_PER_CELL * k


def _mirror_cos(u, v) -> float:
    du = dv = uv = 0.0
    for i in range(len(u)):
        uv = uv + (u[i] * v[i])
    for i in range(len(u)):
        du = du + (u[i] * u[i])
    for i in range(len(v)):
        dv = dv + (v[i] * v[i])
    return uv / (math.sqrt(du) * math.sqrt(dv))


def mirror_fit(ids_vecs, k: int | None = None, n_sample: int | None = None,
               n_iters: int = MIRROR_N_ITERS):
    """Independent restatement of the fit spec over (vec_id, vector)
    pairs.  ``k``/``n_sample`` default to the corpus-scaled spec rule."""
    if k is None:
        k = mirror_k(len(ids_vecs))
    if n_sample is None:
        n_sample = mirror_n_sample(k)
    hash_order = sorted(
        ids_vecs,
        key=lambda p: (hashlib.md5(str(p[0]).encode()).hexdigest(), p[0]),
    )[:n_sample]
    cents = [list(map(float, vec)) for _, vec in hash_order[:k]]
    if not cents:
        return []
    by_id = sorted(hash_order, key=lambda p: p[0])
    dim = len(cents[0])
    for _ in range(n_iters):
        acc = [[0.0] * dim for _ in cents]
        cnt = [0] * len(cents)
        for _, vec in by_id:
            best, best_c = 0, _mirror_cos(cents[0], vec)
            for j in range(1, len(cents)):
                cj = _mirror_cos(cents[j], vec)
                if cj > best_c:
                    best, best_c = j, cj
            row = acc[best]
            for i in range(dim):
                row[i] = row[i] + vec[i]
            cnt[best] += 1
        for j in range(len(cents)):
            if cnt[j]:
                cents[j] = [x / cnt[j] for x in acc[j]]
    return cents


MIRROR_EXPAND_OFFSET = 1_000_000


def mirror_expand(pairs):
    """Independent restatement of the 5× exact-transform corpus
    expansion (queries/similarity.py _expanded_corpus): base plus
    reverse, rotate-13, alternate-negation, rotate-29 — permutation and
    sign ops only, so every derived vector is bit-identical on both
    sides with no float rounding in the derivation."""
    out = list(pairs)
    for j, tf in enumerate([
        lambda v: v[::-1],
        lambda v: v[13:] + v[:13],
        lambda v: [(-x if i % 2 else x) for i, x in enumerate(v)],
        lambda v: v[29:] + v[:29],
    ], start=1):
        out.extend(
            (vid + MIRROR_EXPAND_OFFSET * j, tf(list(vec)))
            for vid, vec in pairs
        )
    return out


@lru_cache(maxsize=4)
def expanded_pairs_from_parquet(emb_path: str):
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    base = list(zip(t.column("vec_id").to_pylist(),
                    t.column("embedding").to_pylist()))
    return mirror_expand(base)


@lru_cache(maxsize=4)
def fit_centroids_expanded(emb_path: str) -> tuple[tuple[float, ...], ...]:
    """Fitted centroids for the 5×-expanded corpus — K comes from the
    corpus-scaled rule, so at the sf0.01 pin (2500 rows) this is the
    K=20 above-the-floor fit."""
    return tuple(
        tuple(c) for c in mirror_fit(expanded_pairs_from_parquet(emb_path))
    )


@lru_cache(maxsize=4)
def fit_centroids_from_parquet(emb_path: str) -> tuple[tuple[float, ...], ...]:
    """Fitted centroids for an embeddings.parquet (vec_id, embedding)."""
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    pairs = list(zip(t.column("vec_id").to_pylist(),
                     t.column("embedding").to_pylist()))
    return tuple(tuple(c) for c in mirror_fit(pairs))


def centroid_sql_literals(emb_path: str) -> str:
    """DuckDB relation literal: (cell_id INT, c_emb DOUBLE[]) rows."""
    cents = fit_centroids_from_parquet(emb_path)
    # scientific notation with 17 significant digits: DuckDB types
    # e-notation literals as DOUBLE directly, whereas plain decimal
    # literals go through DECIMAL and can land one ulp off
    rows = ",\n    ".join(
        f"({j}, [{', '.join(f'{x:.16e}' for x in c)}]::DOUBLE[])"
        for j, c in enumerate(cents)
    )
    return f"(VALUES\n    {rows}\n  ) AS cents_t(cell_id, c_emb)"
