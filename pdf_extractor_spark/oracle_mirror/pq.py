"""Oracle-side mirror of the product-quantization fit/encode/ADC spec.

Implements the PQ SPEC from pdf_extractor_spark/core/pq.py (float64
normalization with ascending-index norm fold; hash-ordered 256-vector
sample; per-subspace Lloyd with ascending-index squared-L2 folds,
strict-< tie-break to the lowest code, ascending-vec_id mean
accumulation, empty codes keep their entry; ADC as the ascending-subspace
left fold of subspace squared-L2) — with independent code, importing
nothing from the engine side.  tests/test_pq.py pins bit-equality of the
two implementations; scripts/gen_expected.py uses THIS module to build
the ann_ivf_pq expected parquet, so a drift in either side turns the
driver hash gate red instead of self-certifying.
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

import pyarrow.parquet as pq

MIRROR_M = 8
MIRROR_KS = 16
MIRROR_SAMPLE_PER_CODE = 16
MIRROR_PQ_ITERS = 5


def _unit(vec):
    s = 0.0
    v = [float(x) for x in vec]
    for x in v:
        s = s + (x * x)
    n = math.sqrt(s)
    return [x / n for x in v]


def _d2(u, v) -> float:
    acc = 0.0
    for i in range(len(u)):
        di = u[i] - v[i]
        acc = acc + (di * di)
    return acc


def mirror_fit_pq(ids_vecs, m: int = MIRROR_M, ks: int = MIRROR_KS,
                  n_iters: int = MIRROR_PQ_ITERS):
    """Independent restatement of the PQ fit over (vec_id, vector)
    pairs; returns m codebooks of ks entries."""
    n_sample = MIRROR_SAMPLE_PER_CODE * ks
    hash_order = sorted(
        ids_vecs,
        key=lambda p: (hashlib.md5(str(p[0]).encode()).hexdigest(), p[0]),
    )[:n_sample]
    if not hash_order:
        return []
    units_hash = [(vid, _unit(vec)) for vid, vec in hash_order]
    units_id = sorted(units_hash, key=lambda p: p[0])
    dim = len(units_hash[0][1])
    dsub = dim // m
    books = []
    for sub in range(m):
        seg = lambda v: v[sub * dsub:(sub + 1) * dsub]  # noqa: E731
        codes = [list(seg(vec)) for _, vec in units_hash[:ks]]
        for _ in range(n_iters):
            acc = [[0.0] * dsub for _ in codes]
            cnt = [0] * len(codes)
            for _, vec in units_id:
                sv = seg(vec)
                best, best_d = 0, _d2(codes[0], sv)
                for j in range(1, len(codes)):
                    dj = _d2(codes[j], sv)
                    if dj < best_d:
                        best, best_d = j, dj
                row = acc[best]
                for i in range(dsub):
                    row[i] = row[i] + sv[i]
                cnt[best] += 1
            for j in range(len(codes)):
                if cnt[j]:
                    codes[j] = [x / cnt[j] for x in acc[j]]
        books.append(codes)
    return books


def mirror_encode(vec, books):
    unit = _unit(vec)
    dsub = len(unit) // len(books)
    out = []
    for sub in range(len(books)):
        sv = unit[sub * dsub:(sub + 1) * dsub]
        best, best_d = 0, _d2(books[sub][0], sv)
        for j in range(1, len(books[sub])):
            dj = _d2(books[sub][j], sv)
            if dj < best_d:
                best, best_d = j, dj
        out.append(best)
    return out


def mirror_adc(query_vec, codes, books) -> float:
    unit = _unit(query_vec)
    dsub = len(unit) // len(books)
    acc = 0.0
    for sub in range(len(books)):
        sv = unit[sub * dsub:(sub + 1) * dsub]
        acc = acc + _d2(books[sub][codes[sub]], sv)
    return acc


@lru_cache(maxsize=4)
def fit_pq_from_parquet(emb_path: str):
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    pairs = list(zip(t.column("vec_id").to_pylist(),
                     t.column("embedding").to_pylist()))
    return tuple(
        tuple(tuple(code) for code in book)
        for book in mirror_fit_pq(pairs)
    )
