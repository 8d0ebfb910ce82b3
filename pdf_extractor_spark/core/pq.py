"""Deterministic product-quantization (PQ) codebooks for IVF-PQ search.

IVF alone keeps the *candidate count* bounded (probe ~n_probe·128 vectors
per query), but every candidate still costs a full dim-wide cosine and the
index stores every raw vector: at 100 TB of fp32 embeddings the "index"
IS the corpus.  Product quantization (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011 — the FAISS ``IVFxx,PQ8``
family) compresses each vector to M one-byte codes and scores candidates
with M table lookups instead of dim multiply-adds:

- split the L2-NORMALIZED vector into M contiguous subvectors,
- per subspace, fit a tiny KS-entry codebook (Lloyd, squared-L2),
- encode: per subspace, the index of the nearest codebook entry,
- search (ADC — asymmetric distance computation): the query stays
  exact; a candidate's approximate squared-L2 distance is the sum over
  subspaces of ‖q_sub − codebook[m][code]‖².

On unit vectors, ‖q − v‖² = 2 − 2·cos(q, v), so ascending approximate L2
ranks identically to descending approximate cosine — PQ over normalized
vectors approximates exactly the cosine top-k the rest of this engine
speaks.  The storage story is the point at scale: M=8 single-byte codes
per vector vs 64×4 raw bytes = a 32× smaller index (100 TB of embeddings
→ ~3 TB of codes), and each candidate costs 8 lookup-adds instead of 64
multiply-adds.  (The reference has no ANN — this operator comes from the
training-data-pipeline brief, not reference parity.)

THE SPEC (cross-implementation contract; the oracle side is restated
independently in pdf_extractor_spark/oracle_mirror/pq.py and
tests/test_pq.py pins bit-equality — a bug in either implementation turns
the ann_ivf_pq expected-parquet hash gate red instead of self-certifying):

0. SIZE — M = 8 subspaces, KS = 16 codes per subspace, dsub = dim / M
   (dim must divide evenly).  n_sample = 16·KS = 256 training vectors.
1. NORMALIZE — every vector (training, corpus, query) is first cast to
   float64 and divided component-wise by its L2 norm, where the norm is
   math.sqrt of the ascending-index left fold Σ x[i]·x[i] (acc + x·x).
2. SAMPLE — the n_sample vectors with the smallest
   (md5(str(vec_id)).hexdigest(), vec_id) — the same hash-ordered
   TakeOrdered rule as the coarse-quantizer fit (core/kmeans.py step 1):
   deterministic at any scale and any partitioning, bounded driver
   memory.
3. INIT — per subspace m, the codebook is seeded with the subvectors
   [m·dsub, (m+1)·dsub) of the first KS sample vectors in that hash
   order.
4. ITERATE — 5 Lloyd steps per subspace, independently.  Assignment:
   each training subvector (ascending vec_id) goes to the codebook entry
   with the SMALLEST squared L2 distance, computed as the ascending-index
   left fold Σ (a[i]−b[i])² (acc + d·d), ties keeping the LOWEST code
   index (strict ``<`` comparison).  Update: each non-empty code becomes
   the component-wise mean of its members accumulated in ascending
   vec_id order; empty codes keep their previous entry.
5. ENCODE — per vector, per subspace: the code of the nearest codebook
   entry under the same squared-L2 fold and the same lowest-index
   tie-break.
6. ADC — for query q and candidate codes (c_0..c_{M−1}):
   dist = left fold over m ascending of ‖q_sub_m − codebook[m][c_m]‖²
   (acc + subdist), each subdist the same squared-L2 fold.

All arithmetic is float64 with a specified op order, so two faithful
implementations — and the JVM expression evaluation in
queries/similarity.py, which builds the identical folds from literal
codebooks — agree to the last bit.
"""

from __future__ import annotations

import math

from pdf_extractor_spark.core.kmeans import sample_key

M_SUBSPACES = 8
KS_CODES = 16
SAMPLE_PER_CODE = 16
N_PQ_SAMPLE = SAMPLE_PER_CODE * KS_CODES  # = 256
N_PQ_ITERS = 5


def _sq_l2(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc = acc + (d * d)
    return acc


def normalize(vec) -> list[float]:
    """Spec step 1: float64 unit vector (ascending-index norm fold)."""
    v = [float(x) for x in vec]
    acc = 0.0
    for x in v:
        acc = acc + (x * x)
    n = math.sqrt(acc)
    return [x / n for x in v]


def select_pq_sample(ids_vecs: list[tuple[int, list[float]]],
                     n_sample: int = N_PQ_SAMPLE
                     ) -> list[tuple[int, list[float]]]:
    """Spec step 2: the n_sample smallest (md5(id), id), hash-ordered
    (same rule as the coarse-quantizer sample)."""
    keyed = sorted(ids_vecs, key=lambda t: (sample_key(t[0]), t[0]))
    return keyed[:n_sample]


def fit_codebooks(sample_hash_ordered: list[tuple[int, list[float]]],
                  m: int = M_SUBSPACES, ks: int = KS_CODES,
                  n_iters: int = N_PQ_ITERS) -> list[list[list[float]]]:
    """Steps 1+3+4 over an already hash-ordered sample (the output of
    ``select_pq_sample``): returns ``m`` codebooks of ``ks`` centroids
    each (fewer than ks only if the corpus itself is smaller)."""
    if not sample_hash_ordered:
        return []
    dim = len(sample_hash_ordered[0][1])
    assert dim % m == 0, "dim must divide into M subspaces"
    dsub = dim // m
    units = [
        (vid, normalize(vec)) for vid, vec in sample_hash_ordered
    ]
    by_id = sorted(units, key=lambda t: t[0])
    books: list[list[list[float]]] = []
    for sub in range(m):
        lo, hi = sub * dsub, (sub + 1) * dsub
        codes: list[list[float]] = [
            list(vec[lo:hi]) for _, vec in units[:ks]
        ]
        for _ in range(n_iters):
            sums: list[list[float] | None] = [None] * len(codes)
            counts = [0] * len(codes)
            for _, vec in by_id:
                sv = vec[lo:hi]
                best_j = 0
                best_d = _sq_l2(codes[0], sv)
                for j in range(1, len(codes)):
                    d = _sq_l2(codes[j], sv)
                    if d < best_d:
                        best_j, best_d = j, d
                s = sums[best_j]
                if s is None:
                    sums[best_j] = list(sv)
                else:
                    for i, x in enumerate(sv):
                        s[i] = s[i] + x
                counts[best_j] += 1
            for j, s in enumerate(sums):
                if s is not None:
                    n = float(counts[j])
                    codes[j] = [v / n for v in s]
        books.append(codes)
    return books


def encode(vec, books: list[list[list[float]]]) -> list[int]:
    """Spec step 5: per-subspace nearest-code indices for one vector."""
    unit = normalize(vec)
    dsub = len(unit) // len(books)
    out = []
    for sub, codes in enumerate(books):
        sv = unit[sub * dsub:(sub + 1) * dsub]
        best_j = 0
        best_d = _sq_l2(codes[0], sv)
        for j in range(1, len(codes)):
            d = _sq_l2(codes[j], sv)
            if d < best_d:
                best_j, best_d = j, d
        out.append(best_j)
    return out


def adc_distance(query_vec, codes: list[int],
                 books: list[list[list[float]]]) -> float:
    """Spec step 6: approximate squared-L2 between an exact query and a
    PQ-encoded candidate."""
    unit = normalize(query_vec)
    dsub = len(unit) // len(books)
    acc = 0.0
    for sub, c in enumerate(codes):
        sv = unit[sub * dsub:(sub + 1) * dsub]
        acc = acc + _sq_l2(books[sub][c], sv)
    return acc
