"""BM25 scoring kernels: exhaustive vectorized scoring + block-max pruned
top-k (the block-max WAND analogue, SURVEY.md §2.9 — an extension the
reference lacks entirely; its TOP_10 runs the unranked boolean search,
/root/reference/pysearchlite/commands/do_query.py:15-17).

Two kernels, proven equal by tests:
  * score_disjunctive — exact scores for every doc matching ≥1 term
    (searchsorted scatter-add, O(total postings)).
  * blockmax_topk — zone-at-a-time pruning: docID space is cut into zones
    (the finest term's skip blocks); each zone's upper bound is
    Σ_t idf_t · max(max_partial of t's blocks overlapping the zone) — exact
    per-block bounds packed at build time. Zones are visited in descending
    upper-bound order and scoring stops when the bound cannot beat the
    current k-th (score, doc_id) — rank-identical to exhaustive by
    construction (ties: continue while ub >= threshold score).
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Sequence, Tuple

import numpy as np

from pysearchlite_spark import codec
from pysearchlite_spark.codec import bm25_partial


def score_disjunctive(doc_arrays: Sequence[np.ndarray],
                      tf_arrays: Sequence[np.ndarray],
                      dl_arrays: Sequence[np.ndarray],
                      idfs: Sequence[float], avgdl: float,
                      min_match: int = 1
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact BM25 scores for the union of matching docs (one segment).

    min_match (Lucene minimumNumberShouldMatch): keep only docs matched
    by at least that many DISTINCT query terms. Each doc_array is one
    term's postings (docIDs unique within a term), so the per-doc
    multiplicity in the concatenation IS the matched-term count."""
    nonempty = [d for d in doc_arrays if d.size]
    if not nonempty:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if min_match > 1:
        all_docs, counts = np.unique(np.concatenate(nonempty),
                                     return_counts=True)
    else:
        all_docs = np.unique(np.concatenate(nonempty))
    scores = np.zeros(all_docs.size, dtype=np.float64)
    for docs, tfs, dls, idf in zip(doc_arrays, tf_arrays, dl_arrays, idfs):
        if docs.size == 0:
            continue
        idx = np.searchsorted(all_docs, docs)
        scores[idx] += idf * bm25_partial(tfs, dls, avgdl)
    if min_match > 1:
        keep = counts >= min_match
        return all_docs[keep], scores[keep]
    return all_docs, scores


def topk_merge(parts: Sequence[Tuple[np.ndarray, np.ndarray]], k: int
               ) -> List[Tuple[int, float]]:
    """Merge per-segment (doc_ids, scores) into global top-k:
    score desc, doc_id asc."""
    if not parts:
        return []
    docs = np.concatenate([p[0] for p in parts]) if parts else np.empty(0)
    scores = np.concatenate([p[1] for p in parts]) if parts else np.empty(0)
    if docs.size == 0:
        return []
    if docs.size > k:
        # exact boundary: keep every doc scoring >= the k-th largest score so
        # ties at the cut resolve by doc_id in the lexsort below
        kth_score = np.partition(scores, docs.size - k)[docs.size - k]
        mask = scores >= kth_score
        docs, scores = docs[mask], scores[mask]
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def _zone_bounds_for_term(zone_edges: np.ndarray, first_docs: np.ndarray,
                          max_partial: np.ndarray,
                          last_doc: int | None = None) -> np.ndarray:
    """Per-zone upper bound of a term's partial score. zone_edges has Z+1
    edges; block b of the term covers [first_docs[b], first_docs[b+1]).
    last_doc bounds the FINAL block's coverage — without it the last block
    extends to +inf and a low-docID rare term poisons the upper bound of
    every zone above it (measured: zero pruning on a clustered rare term)."""
    Z = zone_edges.size - 1
    out = np.zeros(Z, dtype=np.float64)
    if first_docs.size == 0:
        return out
    # block range overlapping each zone
    lo = np.searchsorted(first_docs, zone_edges[:-1], side="right") - 1
    hi = np.searchsorted(first_docs, zone_edges[1:], side="left")
    lo = np.maximum(lo, 0)
    # vectorized: zones are the finest grid, so almost every zone overlaps
    # <= 2 blocks of any term — max of the two endpoint blocks is exact
    # there; the rare wider spans fall back to a loop (must stay an exact
    # UPPER bound: endpoint-max alone would miss interior blocks)
    valid = hi > lo
    l, h = lo[valid], hi[valid]
    res = max_partial[l].copy()
    two = h - l >= 2
    res[two] = np.maximum(res[two], max_partial[h[two] - 1])
    for i in np.flatnonzero(h - l > 2):
        res[i] = max_partial[l[i]:h[i]].max()
    out[valid] = res
    if last_doc is not None:
        out[zone_edges[:-1] > last_doc] = 0.0
    return out


def _term_last_doc(r: dict) -> int | None:
    """Largest docID of a packed row — one final-block decode (<= 128
    varbytes); caps the last block's zone coverage."""
    nb = len(r["first_docs"])
    if nb == 0:
        return None
    d, _, _ = _decode_blocks(r, nb - 1, nb)
    return int(d[-1])


def zone_bounds(rows: List[dict], idfs: Dict[str, float]):
    """Shared zone construction for decide_blockmax / blockmax_topk:
    (zone_edges, ub, per_term). Zones = skip blocks of the largest-df term
    (finest doc-density grid); the first zone widens down to the GLOBAL
    minimum first_doc across all terms — otherwise docs of other terms
    below the big term's first block would fall outside every zone and
    never be scored. Metadata-only (one final-block decode per term for
    last-doc capping)."""
    big = max(rows, key=lambda r: r["df"])
    edges = np.asarray(big["first_docs"], dtype=np.int64)
    mins = [np.asarray(r["first_docs"], dtype=np.int64)[0]
            for r in rows if len(r["first_docs"])]
    global_min = min(mins) if mins else 0
    if edges.size == 0:
        edges = np.array([global_min], dtype=np.int64)
    else:
        edges = edges.copy()
        edges[0] = min(int(edges[0]), int(global_min))
    zone_edges = np.concatenate([edges, [np.iinfo(np.int64).max]])
    ub = np.zeros(zone_edges.size - 1, dtype=np.float64)
    per_term = []
    for r in rows:
        fd = np.asarray(r["first_docs"], dtype=np.int64)
        mp = np.asarray(r["max_partial"], dtype=np.float64)
        ub += idfs[r["term"]] * _zone_bounds_for_term(
            zone_edges, fd, mp, _term_last_doc(r))
        per_term.append((r, fd))
    return zone_edges, ub, per_term


def decide_blockmax(rows: List[dict], idfs: Dict[str, float], k: int,
                    visit_frac_cutoff: float = 0.25, zb=None) -> bool:
    """Adaptive auto mode: choose pruned (True) vs exhaustive (False) from
    METADATA ONLY (first_docs/max_partial — no posting decode). Pass a
    precomputed zone_bounds() result via zb to avoid recomputation when the
    caller will also run blockmax_topk.

    Estimate how many zones block-max would visit: zones are ranked by their
    upper bound; scoring stops once the k-th best real score beats the next
    zone's ub. Real scores are unknown pre-decode, so assume pessimistically
    the final threshold reaches only half the best zone's ub — count zones
    with ub >= that. Tie-heavy head-term queries (every zone's ub
    comparable — the measured 8-25x-slower-than-exhaustive regime) estimate
    ~all zones visited → exhaustive; selective queries (rare high-idf term
    dominating few zones) estimate a small fraction → pruned."""
    if not rows or k <= 0:
        return False
    big = max(rows, key=lambda r: r["df"])
    if len(big["first_docs"]) <= 8:
        return False  # tiny segment: exhaustive vector pass trivially fast
    _, ub, _ = zb if zb is not None else zone_bounds(rows, idfs)
    if ub.size == 0 or ub.max() <= 0:
        return False
    visited_est = int((ub >= 0.5 * ub.max()).sum())
    return visited_est <= visit_frac_cutoff * ub.size


def blockmax_topk(rows: List[dict], idfs: Dict[str, float], avgdl: float,
                  k: int, bound_scale: float = 1.0,
                  zb=None) -> List[Tuple[int, float]]:
    """Block-max pruned top-k over one segment's packed posting rows
    (each row: term/df/docs/tfs/dls/first_docs/*_offs/max_partial).
    bound_scale >= 1 inflates the packed upper bounds when the CURRENT
    avgdl exceeds the segment's pack-time avgdl (partial scores grow with
    avgdl; worst-case growth is the avgdl ratio), keeping pruning safe
    after streaming appends drift the global stat. zb: precomputed
    zone_bounds() (shared with decide_blockmax in auto mode)."""
    if not rows or k <= 0:
        return []
    zone_edges, ub, per_term = zb if zb is not None else zone_bounds(rows,
                                                                     idfs)
    if bound_scale != 1.0:
        ub = ub * bound_scale

    zorder = np.argsort(-ub, kind="stable")
    heap: List[Tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    for z in zorder:
        if len(heap) >= k and ub[z] < heap[0][0]:
            break
        z_lo, z_hi = int(zone_edges[z]), int(zone_edges[z + 1])
        # decode each term's blocks overlapping this zone, score the zone
        docs_l, tfs_l, dls_l, idf_l = [], [], [], []
        for r, fd in per_term:
            if fd.size == 0:
                continue
            lo = max(0, int(np.searchsorted(fd, z_lo, side="right")) - 1)
            hi = int(np.searchsorted(fd, z_hi, side="left"))
            if hi <= lo:
                continue
            d, t, l = _decode_blocks(r, lo, hi)
            m = (d >= z_lo) & (d < z_hi)
            if not m.any():
                continue
            docs_l.append(d[m])
            tfs_l.append(t[m])
            dls_l.append(l[m])
            idf_l.append(idfs[r["term"]])
        if not docs_l:
            continue
        zdocs, zscores = score_disjunctive(docs_l, tfs_l, dls_l, idf_l, avgdl)
        for d, s in zip(zdocs.tolist(), zscores.tolist()):
            item = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    results = [(-nd, s) for s, nd in heap]
    results.sort(key=lambda x: (-x[1], x[0]))
    return [(int(d), float(s)) for d, s in results]


def _decode_blocks(r: dict, lo: int, hi: int
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode blocks [lo, hi) of a packed row's three streams (bulk range
    decode — one varbyte pass per stream)."""
    return codec.unpack_block_range(codec.packed_from_row(r), lo, hi)


# --------------------------------------------- synonym-group pruning ----
#
# A synonym GROUP scores as one pseudo-term: per-doc tf is the SUM of
# member tfs and BM25 saturation applies once to the sum (Lucene
# SynonymQuery). Its per-zone upper bound is
#     idf_g · Σ_{m ∈ group} member_zone_bound(m)
# which is valid because bm25_partial is CONCAVE in tf with f(0) = 0 and
# therefore subadditive: f(Σ tf_m, dl) ≤ Σ f(tf_m, dl) ≤ Σ block-max(m).
# (dl is identical across members of the same doc, so the per-member
# bound applies at the doc's own dl.) Zones partition docID space, so a
# doc's member postings all land in the SAME zone and the in-zone tf
# merge equals the global merge restricted to the zone — the pruned
# kernel is rank-identical to the exhaustive group pass by construction.

def zone_bounds_groups(groups_rows: Sequence[List[dict]],
                       idfs_g: Sequence[float]):
    """Zone construction for group queries: (zone_edges, ub, per_group).
    Zones come from the largest-df member across ALL groups (finest doc
    density grid), first zone widened to the global minimum first_doc —
    same construction as zone_bounds. per_group mirrors per_term but is
    nested: one [(row, first_docs)] list per group. Metadata-only apart
    from one final-block decode per member (last-doc capping)."""
    flat = [r for rows in groups_rows for r in rows]
    big = max(flat, key=lambda r: r["df"])
    edges = np.asarray(big["first_docs"], dtype=np.int64)
    mins = [np.asarray(r["first_docs"], dtype=np.int64)[0]
            for r in flat if len(r["first_docs"])]
    global_min = min(mins) if mins else 0
    if edges.size == 0:
        edges = np.array([global_min], dtype=np.int64)
    else:
        edges = edges.copy()
        edges[0] = min(int(edges[0]), int(global_min))
    zone_edges = np.concatenate([edges, [np.iinfo(np.int64).max]])
    ub = np.zeros(zone_edges.size - 1, dtype=np.float64)
    per_group = []
    for rows, idf in zip(groups_rows, idfs_g):
        fds = []
        g_ub = np.zeros(zone_edges.size - 1, dtype=np.float64)
        for r in rows:
            fd = np.asarray(r["first_docs"], dtype=np.int64)
            mp = np.asarray(r["max_partial"], dtype=np.float64)
            g_ub += _zone_bounds_for_term(zone_edges, fd, mp,
                                          _term_last_doc(r))
            fds.append((r, fd))
        ub += idf * g_ub
        per_group.append(fds)
    return zone_edges, ub, per_group


def decide_blockmax_groups(groups_rows: Sequence[List[dict]],
                           idfs_g: Sequence[float], k: int,
                           visit_frac_cutoff: float = 0.25,
                           zb=None) -> bool:
    """Adaptive auto mode for group queries — same metadata-only decision
    rule as decide_blockmax, over the group zone bounds. Pass a
    precomputed zone_bounds_groups() via zb to share with the scorer."""
    flat = [r for rows in groups_rows for r in rows]
    if not flat or k <= 0:
        return False
    big = max(flat, key=lambda r: r["df"])
    if len(big["first_docs"]) <= 8:
        return False
    _, ub, _ = zb if zb is not None else zone_bounds_groups(groups_rows,
                                                            idfs_g)
    if ub.size == 0 or ub.max() <= 0:
        return False
    visited_est = int((ub >= 0.5 * ub.max()).sum())
    return visited_est <= visit_frac_cutoff * ub.size


def blockmax_topk_groups(groups_rows: Sequence[List[dict]],
                         idfs_g: Sequence[float], avgdl: float, k: int,
                         bound_scale: float = 1.0,
                         zb=None) -> List[Tuple[int, float]]:
    """Block-max pruned top-k under synonym-group semantics. Zones are
    visited in descending group-upper-bound order; within a zone each
    group's member blocks are decoded, zone-masked and tf-merged (the
    exact zone slice of _merge_group_streams' global merge — integer tf
    sums are order-exact in float64), then groups score disjunctively.
    Rank-identical to the exhaustive group pass (ties: continue while
    ub >= current k-th (score, -doc_id))."""
    if not groups_rows or k <= 0:
        return []
    zone_edges, ub, per_group = (zb if zb is not None
                                 else zone_bounds_groups(groups_rows,
                                                         idfs_g))
    if bound_scale != 1.0:
        ub = ub * bound_scale

    zorder = np.argsort(-ub, kind="stable")
    heap: List[Tuple[float, int]] = []  # (score, -doc_id) min-heap
    for z in zorder:
        if len(heap) >= k and ub[z] < heap[0][0]:
            break
        z_lo, z_hi = int(zone_edges[z]), int(zone_edges[z + 1])
        gdocs_l, gtfs_l, gdls_l, gidf_l = [], [], [], []
        for fds, idf in zip(per_group, idfs_g):
            m_docs, m_tfs, m_dls = [], [], []
            for r, fd in fds:
                if fd.size == 0:
                    continue
                lo = max(0, int(np.searchsorted(fd, z_lo,
                                                side="right")) - 1)
                hi = int(np.searchsorted(fd, z_hi, side="left"))
                if hi <= lo:
                    continue
                d, t, l = _decode_blocks(r, lo, hi)
                m = (d >= z_lo) & (d < z_hi)
                if not m.any():
                    continue
                m_docs.append(d[m])
                m_tfs.append(t[m].astype(np.int64))
                m_dls.append(l[m].astype(np.int64))
            if not m_docs:
                continue
            if len(m_docs) == 1:
                u, tf, dl = m_docs[0], m_tfs[0], m_dls[0]
            else:
                cat = np.concatenate(m_docs)
                u, inv = np.unique(cat, return_inverse=True)
                tf = np.bincount(
                    inv, weights=np.concatenate(m_tfs)).astype(np.int64)
                dl = np.zeros(u.size, dtype=np.int64)
                dl[inv] = np.concatenate(m_dls)
            gdocs_l.append(u)
            gtfs_l.append(tf)
            gdls_l.append(dl)
            gidf_l.append(idf)
        if not gdocs_l:
            continue
        zdocs, zscores = score_disjunctive(gdocs_l, gtfs_l, gdls_l,
                                           gidf_l, avgdl)
        for d, s in zip(zdocs.tolist(), zscores.tolist()):
            item = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    results = [(-nd, s) for s, nd in heap]
    results.sort(key=lambda x: (-x[1], x[0]))
    return [(int(d), float(s)) for d, s in results]
