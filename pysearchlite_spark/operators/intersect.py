"""Vectorized posting-list intersection / union kernels.

Re-expresses the reference's k-way leapfrog intersection
(/root/reference/pysearchlite/inverted_index_skip_list.py:207-250) and its
skip-block seek (block_skip_list.py:183-311) as numpy batch operations:
instead of per-docID finger pointers, the candidate set from the smallest
list gallops into each larger list via `np.searchsorted` (binary search ==
the skip levels collapsed), and with packed postings only the skip blocks
that contain candidates are decoded (block-level selective decode — the
vectorized analogue of skipping whole blocks).

Semantics preserved (SURVEY.md §2.3): result docIDs ascending; evaluation
order df-ascending; missing term → empty (handled by the planner before
these kernels run).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from pysearchlite_spark import codec


def intersect_sorted(lists: Sequence[np.ndarray]) -> np.ndarray:
    """k-way intersection of sorted unique int64 arrays, smallest-first
    (df-ascending evaluation, reference :204). Vectorized leapfrog: the
    running candidate set binary-searches into the next list; mismatches are
    dropped in one vector op."""
    if not lists:
        return np.empty(0, dtype=np.int64)
    order = np.argsort([a.size for a in lists], kind="stable")
    cand = lists[order[0]]
    for i in order[1:]:
        if cand.size == 0:
            return cand
        other = lists[i]
        pos = np.searchsorted(other, cand)
        pos_clipped = np.minimum(pos, other.size - 1)
        cand = cand[other[pos_clipped] == cand]
    return cand


def union_sorted(lists: Sequence[np.ndarray]) -> np.ndarray:
    """k-way union, ascending. Missing terms contribute empty arrays and do
    NOT short-circuit (SURVEY.md §2.7)."""
    nonempty = [a for a in lists if a.size]
    if not nonempty:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(nonempty))


def min_match_sorted(lists: Sequence[np.ndarray], m: int) -> np.ndarray:
    """Docs present in at least `m` of the input lists, ascending (Lucene
    minimumNumberShouldMatch over per-term postings — each list is one
    DISTINCT term's docIDs, unique within a list, so the multiplicity in
    the concatenation IS the matched-term count). m=1 degenerates to the
    union, m=len(lists) to the intersection; both stay on their own
    faster kernels at the call sites."""
    nonempty = [a for a in lists if a.size]
    if len(nonempty) < m:
        return np.empty(0, dtype=np.int64)
    docs, counts = np.unique(np.concatenate(nonempty), return_counts=True)
    return docs[counts >= m]


def decode_candidate_blocks(docs: bytes, doc_offs: np.ndarray,
                            first_docs: np.ndarray, df: int,
                            candidates: np.ndarray) -> np.ndarray:
    """Selectively decode only the skip blocks that can contain any of
    `candidates` (sorted). Returns the decoded (sorted) docIDs of those
    blocks — a superset filter for intersection, avoiding a full decode of
    hot-term postings when the driving list is small."""
    nblocks = first_docs.shape[0]
    if nblocks == 0 or candidates.size == 0:
        return np.empty(0, dtype=np.int64)
    # block b covers [first_docs[b], first_docs[b+1]) (last block unbounded)
    bidx = np.searchsorted(first_docs, candidates, side="right") - 1
    bidx = np.unique(bidx[bidx >= 0])
    if bidx.size == 0:
        return np.empty(0, dtype=np.int64)
    if bidx.size >= max(1, nblocks // 2):
        # decoding most blocks anyway → full vectorized decode is cheaper
        return codec.unpack_docs(docs, df)
    parts = []
    packed = codec.PackedPostings(df, docs, b"", b"", first_docs,
                                  doc_offs, None, None, None)
    for b in bidx:
        parts.append(codec.unpack_block_docs(packed, int(b)))
    return np.concatenate(parts)


def intersect_packed(rows: List[dict]) -> np.ndarray:
    """Intersect packed posting rows (one per term, same segment), smallest
    df first with block-selective decode of the larger lists."""
    if not rows:
        return np.empty(0, dtype=np.int64)
    rows = sorted(rows, key=lambda r: r["df"])
    cand = codec.unpack_docs(rows[0]["docs"], rows[0]["df"])
    for r in rows[1:]:
        if cand.size == 0:
            return cand
        other = decode_candidate_blocks(
            r["docs"], np.asarray(r["doc_offs"], dtype=np.int32),
            np.asarray(r["first_docs"], dtype=np.int64), int(r["df"]), cand)
        if other.size == 0:
            return np.empty(0, dtype=np.int64)
        pos = np.searchsorted(other, cand)
        pos = np.minimum(pos, other.size - 1)
        cand = cand[other[pos] == cand]
    return cand
