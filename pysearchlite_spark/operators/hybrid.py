"""Hybrid retrieval: BM25 + vector search fused with reciprocal-rank
fusion (RRF, Cormack/Clarke/Buettcher SIGIR'09 — the standard used by
Elasticsearch/OpenSearch hybrid query and most RAG stacks).

The reference engine is lexical-only (boolean AND over an inverted index,
do_query.py:9-24); this composes the repo's two ranked retrieval engines
— the BM25 SearchIndex and the cosine ANN surface (operators/ann.py) —
into one result list. RRF is rank-based, so the two incomparable score
scales (BM25 sums vs cosine in [-1, 1]) never need calibration:

    rrf(d) = Σ_r 1 / (rrf_k + rank_r(d))        rank is 1-based;
                                                 lists that miss d
                                                 contribute nothing.

Scale shape: each leg runs its own distributed top-fetch_k (pruned
postings scan + block-max WAND; bucket-pruned ANN scan + rerank), and
only the two k-bounded result lists meet on the driver — fusion itself
is O(fetch_k) and never touches the corpus. That matches how production
hybrid search runs at any scale: fusion operates on per-retriever
candidate lists, not on tables.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


def rrf_fuse(rankings: Sequence[Sequence[int]], k: int = 10,
             rrf_k: int = 60) -> List[Tuple[int, float]]:
    """Fuse ranked id lists by reciprocal-rank fusion: top-k (id, score)
    with score(d) = Σ over lists 1/(rrf_k + rank(d)), rank 1-based.
    Output order (score desc, id asc) — deterministic under the score
    ties RRF produces constantly (any two docs with the same rank
    pattern tie exactly). rrf_k=60 is the constant from the original
    paper and the ES default. Duplicate ids within one list keep their
    best (first) rank — defensive; the engine's lists are unique."""
    if k <= 0:
        return []
    if rrf_k < 0:
        raise ValueError(f"rrf_k must be >= 0 (got {rrf_k})")
    scores: Dict[int, float] = {}
    for lst in rankings:
        seen = set()
        for rank, d in enumerate(lst, start=1):
            d = int(d)
            if d in seen:
                continue
            seen.add(d)
            scores[d] = scores.get(d, 0.0) + 1.0 / (rrf_k + rank)
    out = sorted(scores.items(), key=lambda it: (-it[1], it[0]))
    return [(d, s) for d, s in out[:k]]


def hybrid_topk(idx, ann, query: str, query_vec: Sequence[float],
                k: int = 10, rrf_k: int = 60,
                fetch_k: Optional[int] = None,
                mode: str = "or") -> List[Tuple[int, float]]:
    """Hybrid lexical+vector top-k over a corpus whose doc ids and vector
    ids share one id space: BM25 top-fetch_k from `idx` (SearchIndex) and
    cosine top-fetch_k from `ann` (an AnnIndex/IvfIndex, or a raw
    embeddings DataFrame for the exact brute-force leg), RRF-fused to
    (doc_id, rrf_score). fetch_k defaults to max(4k, 50) — fetching more
    than k per leg is what lets a doc strong in one modality but mediocre
    in the other surface (the ES window_size convention)."""
    from pyspark.sql import DataFrame

    from pysearchlite_spark.operators.ann import brute_cosine_topk

    fk = int(fetch_k) if fetch_k is not None else max(4 * k, 50)
    if fk < k:
        raise ValueError(f"fetch_k ({fk}) must be >= k ({k})")
    bm = idx.topk(query, k=fk, mode=mode)
    if isinstance(ann, DataFrame):
        nn_df = brute_cosine_topk(ann, query_vec, k=fk)
    else:
        nn_df = ann.topk(query_vec, k=fk)
    nn = [int(r["vec_id"]) for r in nn_df.collect()]
    return rrf_fuse([[d for d, _ in bm], nn], k=k, rrf_k=rrf_k)
