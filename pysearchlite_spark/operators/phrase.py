"""Exact phrase matching over positional postings.

The reference engine has no phrase operator (its protocol is COUNT /
TOP_10 boolean AND, do_query.py:9-24) — this is the standard positional-
index extension of the same machinery: leapfrog AND over the phrase's
distinct terms produces candidate docs, then ONLY the skip blocks holding
candidates have their position streams decoded (the same block-selective
discipline the AND top-k path uses for tf/dl, engine._streams_for_ids).

Adjacency is verified fully vectorized: for phrase slot k the candidate
start positions are encoded as composite keys
    candidate_index * M + (position - k)
and the per-slot key sets are intersected — a doc matches iff some start
key survives every slot. No per-document Python loop; hot phrases cost
one sorted intersect per slot, like the boolean path.

Scale shape: positions are a per-row binary sidecar (pos/pos_offs in
POSTINGS_SCHEMA) with byte offsets per 128-doc skip block, so a phrase
against a df=10^7 term decodes positions for the blocks of the (post-AND)
survivors only; the distributed path runs this kernel per segment inside
applyInPandas with only matching doc_ids crossing the exchange.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from pysearchlite_spark import codec
from pysearchlite_spark.operators import intersect as I


def positions_for_ids(r: dict, ids: np.ndarray):
    """Decode row `r`'s in-doc positions for candidate docs `ids` (sorted,
    each guaranteed present in the row — they came from intersecting this
    very row). Returns (flat positions, per-id counts), block-selective:
    only skip blocks containing a candidate are touched."""
    if r.get("pos") is None:
        raise ValueError(
            "posting row has no position stream — the index was built "
            "without with_positions=True")
    df = int(r["df"])
    fd = np.asarray(r["first_docs"], dtype=np.int64)
    tf_offs = np.asarray(r["tf_offs"], dtype=np.int32)
    pos_offs = np.asarray(r["pos_offs"], dtype=np.int32)
    packed = codec.packed_from_row(r)
    bidx = np.clip(np.searchsorted(fd, ids, side="right") - 1,
                   0, fd.size - 1)
    out_parts: List[np.ndarray] = []
    counts = np.empty(ids.size, dtype=np.int64)
    filled = 0
    for b in np.unique(bidx):  # ids sorted → block visits ascend with ids
        sel = ids[bidx == b]
        docs_b = codec.unpack_block_docs(packed, int(b))
        tfs_b = codec.unpack_block_stream(
            r["tfs"], tf_offs, df, int(b)).astype(np.int64)
        pos_b = codec.unpack_block_positions(r["pos"], pos_offs,
                                             tfs_b, int(b))
        occ = np.zeros(tfs_b.size + 1, dtype=np.int64)
        np.cumsum(tfs_b, out=occ[1:])
        j = np.searchsorted(docs_b, sel)
        kt = tfs_b[j]
        oocc = np.zeros(j.size + 1, dtype=np.int64)
        np.cumsum(kt, out=oocc[1:])
        take = (np.repeat(occ[j], kt)
                + np.arange(int(oocc[-1]), dtype=np.int64)
                - np.repeat(oocc[:-1], kt))
        out_parts.append(pos_b[take])
        counts[filled:filled + j.size] = kt
        filled += j.size
    flat = (np.concatenate(out_parts) if out_parts
            else np.empty(0, dtype=np.int64))
    return flat, counts


def _candidate_positions(seg_rows: List[dict], terms: List[str],
                         deleted: Optional[np.ndarray]):
    """Shared prologue of the positional kernels: leapfrog-AND candidate
    docs over the distinct terms (P4 short-circuit, tombstones dropped
    BEFORE position decode), then block-selective position decode for the
    survivors. Returns (ids, pos_of) — pos_of is None when no position
    work is needed (no candidates, or a single-term query where the
    candidates ARE the answer)."""
    empty = np.empty(0, dtype=np.int64)
    if not terms:
        return empty, None
    by_term: Dict[str, dict] = {}
    for r in seg_rows:
        by_term[r["term"]] = r
    distinct = list(dict.fromkeys(terms))
    if any(t not in by_term for t in distinct):
        return empty, None  # P4 short-circuit per segment
    rows = [by_term[t] for t in distinct]
    ids = I.intersect_packed(rows)
    if deleted is not None and deleted.size and ids.size:
        ids = ids[codec.tombstone_keep_mask(ids, deleted)]
    if ids.size == 0 or len(terms) == 1:
        return ids, None
    return ids, {t: positions_for_ids(by_term[t], ids) for t in distinct}


def phrase_match_ids(seg_rows: List[dict], terms: List[str],
                     deleted: Optional[np.ndarray] = None) -> np.ndarray:
    """Doc ids (ascending) of ONE segment matching the exact token phrase
    `terms` (order + duplicates significant). seg_rows: the segment's
    posting rows for the phrase's distinct terms; tombstoned ids in
    `deleted` (sorted) are dropped BEFORE position decode."""
    empty = np.empty(0, dtype=np.int64)
    ids, pos_of = _candidate_positions(seg_rows, terms, deleted)
    if pos_of is None:
        return ids
    maxp = max((int(p.max()) if p.size else 0) for p, _ in pos_of.values())
    M = np.int64(maxp + len(terms) + 2)
    survivors = None
    for k, t in enumerate(terms):
        pvals, cnts = pos_of[t]
        idxrep = np.repeat(np.arange(ids.size, dtype=np.int64), cnts)
        keys = idxrep * M + (pvals - np.int64(k))
        if k:
            keys = keys[pvals >= k]  # a slot-k token can't start before k
        survivors = (keys if survivors is None else
                     np.intersect1d(survivors, keys, assume_unique=True))
        if survivors.size == 0:
            return empty
    return ids[np.unique(survivors // M)]


def near_match_ids(seg_rows: List[dict], terms: List[str], slop: int,
                   deleted: Optional[np.ndarray] = None) -> np.ndarray:
    """Ordered proximity (Lucene SpanNearQuery inOrder=True shape): doc ids
    (ascending) of ONE segment where the tokens of `terms` occur in order
    at strictly increasing positions with span (last - first) ≤
    len(terms)-1+slop. slop=0 degenerates to the exact consecutive phrase
    (a strictly increasing n-chain spanning n-1 positions forces every gap
    to 1) — parity with phrase_match_ids is test-enforced.

    Vectorized greedy chaining: occurrences are composite keys
    candidate_index * M + position (ascending); for each slot the minimal
    strictly-later occurrence IN THE SAME candidate is found with one
    searchsorted over the slot's key array. Greedy minimizes the chain's
    final position for every start, so a start matches iff its greedy span
    does — no per-document loop, cost O(occ(t1) · (n-1) · log occ)."""
    empty = np.empty(0, dtype=np.int64)
    ids, pos_of = _candidate_positions(seg_rows, terms, deleted)
    if pos_of is None:
        return ids
    maxp = max((int(p.max()) if p.size else 0) for p, _ in pos_of.values())
    M = np.int64(maxp + 2)
    comp: Dict[str, np.ndarray] = {}
    for t in pos_of:
        pvals, cnts = pos_of[t]
        idxrep = np.repeat(np.arange(ids.size, dtype=np.int64), cnts)
        comp[t] = idxrep * M + pvals  # ascending by construction
    cur = comp[terms[0]]
    start = cur
    for t in terms[1:]:
        arr = comp[t]
        j = np.searchsorted(arr, cur, side="right")
        ok = j < arr.size
        nxt = arr[np.minimum(j, arr.size - 1)]
        ok &= (nxt // M) == (cur // M)  # stay inside the candidate
        cur, start = nxt[ok], start[ok]
        if cur.size == 0:
            return empty
    span = (cur % M) - (start % M)
    hits = start[span <= np.int64(len(terms) - 1 + slop)]
    if hits.size == 0:
        return empty
    return ids[np.unique(hits // M)]


def near_unordered_match_ids(seg_rows: List[dict], terms: List[str],
                             slop: int,
                             deleted: Optional[np.ndarray] = None
                             ) -> np.ndarray:
    """Unordered proximity (Lucene SpanNearQuery inOrder=False shape): doc
    ids (ascending) of ONE segment where some position window of width
    n-1+slop contains at least one occurrence of EVERY distinct query term
    (n = number of distinct terms; duplicates in `terms` are collapsed —
    the unordered semantics is per-term-set, the ES match/span convention).

    A window works iff anchoring it at the MINIMUM of a satisfying
    position set does, and that minimum is itself an occurrence of some
    term — so it suffices to test every occurrence as an anchor `a` and
    ask each term for an occurrence in [a, a+W]. Vectorized: occurrences
    are the same candidate_index*M+position composite keys the ordered
    kernel uses; per term ONE searchsorted finds its smallest occurrence
    ≥ a, and the window test is a key comparison (the key order equals the
    (candidate, position) order, and M > maxpos+W keeps windows from
    leaking across candidates). Cost O(total_occ · n · log occ)."""
    empty = np.empty(0, dtype=np.int64)
    distinct = list(dict.fromkeys(terms))
    ids, pos_of = _candidate_positions(seg_rows, distinct, deleted)
    if pos_of is None:
        return ids
    n = len(distinct)
    w = np.int64(n - 1 + slop)
    maxp = max((int(p.max()) if p.size else 0) for p, _ in pos_of.values())
    M = np.int64(maxp + int(w) + 2)
    comp: Dict[str, np.ndarray] = {}
    for t in pos_of:
        pvals, cnts = pos_of[t]
        idxrep = np.repeat(np.arange(ids.size, dtype=np.int64), cnts)
        comp[t] = idxrep * M + pvals  # ascending by construction
    anchors = np.concatenate([comp[t] for t in distinct])
    ok = np.ones(anchors.size, dtype=bool)
    for t in distinct:
        arr = comp[t]
        j = np.searchsorted(arr, anchors, side="left")
        in_range = j < arr.size
        nxt = arr[np.minimum(j, arr.size - 1)]
        # smallest occurrence of t at key ≥ anchor must sit within the
        # window — key arithmetic is safe because M bounds pos+W
        ok &= in_range & (nxt <= anchors + w)
        if not ok.any():
            return empty
    return ids[np.unique(anchors[ok] // M)]
