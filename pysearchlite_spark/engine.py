"""SearchIndex — query-side facade (the rebuild of the reference API surface
psl.init/index/save_index/restore_index/search/count,
/root/reference/pysearchlite/search_engine.py:19-60, plus the north-rule BM25
top-k extension).

Planner (reference parity, SURVEY.md §4.1):
  * missing-term short-circuit: any query term with global df == 0 → []
    before any posting I/O (inverted_index_skip_list.py:198-201);
  * df-ascending intersection order (:204);
  * single-term fast path (search_engine.py:51-52);
  * COUNT without materializing names (:252-298).

Two execution paths:
  * driver kernels (default): the pruned postings scan (term-bucket partition
    pruning + `term IN` parquet predicate pushdown) collects k·segments rows
    to the driver, numpy kernels do the rest — right for interactive queries
    where postings for the k query terms fit driver memory;
  * distributed=True: the same kernels run per-segment inside
    applyInPandas, only per-segment partial results (top-k / counts /
    matching ids) are collected — the 10^12-doc path.
"""

from __future__ import annotations

import math
import re
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysearchlite_spark import codec
from pysearchlite_spark.operators import intersect as I
from pysearchlite_spark.operators import phrase as P
from pysearchlite_spark.operators import wand as W
from pysearchlite_spark.plans.builder import term_bucket
from pysearchlite_spark.sources.catalog import (DOCMAP_SCHEMA,
                                                POSTINGS_SCHEMA, IndexCatalog)
from pysearchlite_spark.tokenizer import ASCII_TOKEN, query_terms


# Columns the boolean/top-k kernels consume — every distributed scan
# selects EXACTLY these so the (heavier) positional sidecar pages are
# pruned at the parquet reader unless a phrase query asks for them.
QUERY_COLS = ["term", "seg", "df", "docs", "tfs", "dls", "first_docs",
              "doc_offs", "tf_offs", "dl_offs", "max_partial"]
PHRASE_COLS = QUERY_COLS + ["pos", "pos_offs"]
# Boolean kernels (AND/OR/NOT/msm intersection & union, counting) never
# touch the scoring streams — a boolean scan reads and SHUFFLES only the
# docID side of the index (the tf/dl streams are comparable in bytes to
# the doc stream, so this roughly halves both the parquet read and the
# cogroup exchange for every distributed boolean query).
BOOL_COLS = ["term", "seg", "df", "docs", "first_docs", "doc_offs"]

# Largest literal In() pushed into a scan filter; beyond this Catalyst
# planning goes quadratic and the pushdown stops paying — switch to a
# broadcast (semi-)join on the key set instead. Module-level so tests can
# exercise the join path without a 10k-term dictionary.
IN_LIST_MAX = 10_000


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _fuzzy_mask(terms, target: str, k: int, prefix: str) -> np.ndarray:
    """Boolean mask over a pandas Series of dictionary terms: full-string
    Levenshtein distance to `target` ≤ k (and exact `prefix` when set)."""
    idx, dist = _fuzzy_dp(terms, target, k, prefix)
    out = np.zeros(len(terms), dtype=bool)
    out[idx[dist <= k]] = True
    return out


def _fuzzy_dp(terms, target: str, k: int, prefix: str
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Banded Levenshtein over a pandas Series of dictionary terms:
    returns (candidate_indices, distances) for terms inside the length
    band |len(t)-len(target)| ≤ k (and matching `prefix` when set) —
    distances are FULL exact Levenshtein (callers threshold ≤ k for
    membership, or rank by the value for suggestions).
    Vectorized ACROSS candidates: the DP rows are (n_candidates, L+1)
    numpy arrays, so the Python-level loop is O(|target|·L) regardless of
    dictionary size — the per-candidate axis stays in C. Terms are ASCII
    by construction (tokenizer.py [A-Za-z0-9]+ lowered), so byte codes
    are character codes."""
    arr = terms.to_numpy(dtype=object)
    m = len(target)
    lens = np.fromiter((len(t) for t in arr), dtype=np.int64,
                       count=arr.size)
    band = np.abs(lens - m) <= k          # |len(a)-len(b)| ≤ lev(a,b)
    if prefix:
        band &= terms.str.startswith(prefix).to_numpy()
    idx = np.nonzero(band)[0]
    if idx.size == 0 or m == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    # the candidate rows are (term, segment) pairs — the same term string
    # appears once PER SEGMENT, so the DP would redo identical work for
    # every replica (measured ~4x on a multi-segment preloaded cache).
    # Dedup the strings, DP once per distinct term, broadcast back.
    sub, inv = np.unique(arr[idx], return_inverse=True)
    sub_lens = np.fromiter((len(t) for t in sub), dtype=np.int64,
                           count=sub.size)
    L = int(sub_lens.max())
    codes = np.zeros((sub.size, L), dtype=np.int32)
    for i, t in enumerate(sub):
        b = t.encode("ascii", "replace")
        codes[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    tco = np.frombuffer(target.encode("ascii", "replace"), dtype=np.uint8)
    prev = np.tile(np.arange(L + 1, dtype=np.int32), (sub.size, 1))
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ti = np.int32(tco[i - 1])
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j], cur[:, j - 1]) + 1,
                prev[:, j - 1] + (codes[:, j - 1] != ti))
        prev = cur
    dist = prev[np.arange(sub.size), sub_lens]
    return idx, dist.astype(np.int64)[inv]


def _mask_deleted(ids: np.ndarray, deleted: Optional[np.ndarray]
                  ) -> np.ndarray:
    """Drop ids present in the SORTED deleted array (tombstone mask)."""
    if deleted is None or deleted.size == 0 or ids.size == 0:
        return ids
    return ids[codec.tombstone_keep_mask(ids, deleted)]


def _allowed_mask(ids: np.ndarray, allowed: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: ids present in the SORTED allowed array (the
    filter-bitset mirror of the tombstone mask — keep members instead of
    dropping them)."""
    if ids.size == 0:
        return np.zeros(0, dtype=bool)
    pos = np.searchsorted(allowed, ids)
    ok = pos < allowed.size
    ok[ok] = allowed[pos[ok]] == ids[ok]
    return ok


def _after_cut(docs: np.ndarray, scores: np.ndarray,
               after: Optional[Tuple[int, float]]
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Keep entries STRICTLY after the (doc_id, score) cursor in the
    global (score desc, doc_id asc) order — the searchAfter page mask.
    The cursor is a result tuple exactly as topk returns them (pass the
    previous page's last element verbatim). Exact float comparison is
    correct here: the cursor score is the same deterministic double the
    kernels produced."""
    if after is None or docs.size == 0:
        return docs, scores
    d_a, s_a = int(after[0]), float(after[1])
    keep = (scores < s_a) | ((scores == s_a) & (docs > d_a))
    # the cursor doc itself can never be on the next page — dropping it
    # by id too keeps text-protocol cursors (scores rounded for printing,
    # possibly UP past the true score) from re-including their own doc
    keep &= docs != d_a
    return docs[keep], scores[keep]


def _merge_group_streams(rows: List[dict], deleted: Optional[np.ndarray],
                         allowed: Optional[np.ndarray]
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge one synonym GROUP's member posting rows (same segment) into
    a single pseudo-term stream — Lucene SynonymQuery semantics: the
    group matches the union of member docs, a doc's tf is the SUM of its
    member tfs (then the BM25 saturation applies ONCE to the sum — NOT
    the sum of per-member partials), dl is the doc's length (identical
    across members). Full-decode path; masks applied per member first."""
    doc_l, tf_l, dl_l = [], [], []
    for r in rows:
        df = int(r["df"])
        docs = codec.unpack_docs(r["docs"], df)
        tfs = codec.unpack_stream(r["tfs"], df).astype(np.int64)
        dls = codec.unpack_stream(r["dls"], df).astype(np.int64)
        if deleted is not None and deleted.size:
            keep = codec.tombstone_keep_mask(docs, deleted)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        if allowed is not None:
            keep = _allowed_mask(docs, allowed)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        doc_l.append(docs)
        tf_l.append(tfs)
        dl_l.append(dls)
    cat = np.concatenate(doc_l) if doc_l else np.empty(0, np.int64)
    if cat.size == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    u, inv = np.unique(cat, return_inverse=True)
    tf = np.bincount(inv, weights=np.concatenate(tf_l)).astype(np.int64)
    dl = np.zeros(u.size, dtype=np.int64)
    dl[inv] = np.concatenate(dl_l)  # identical per doc across members
    return u, tf, dl


def score_segment_groups(groups_rows: List[List[dict]],
                         idfs_g: List[float], k: int, mode: str,
                         avgdl: float, min_match: int = 1,
                         deleted: Optional[np.ndarray] = None,
                         allowed: Optional[np.ndarray] = None,
                         after: Optional[Tuple[int, float]] = None,
                         use_blockmax="auto", bound_scale: float = 1.0
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Score one segment under synonym-group semantics: each group is a
    pseudo-term (merged via _merge_group_streams) with idf from the
    group's MAX member df (Lucene SynonymQuery's docFreq bound), then
    the ordinary disjunctive/conjunctive scoring over pseudo-terms.

    use_blockmax: group-aware block-max pruning (W.blockmax_topk_groups)
    — a group's zone upper bound is idf_g · Σ member block maxes, valid
    because BM25 saturation is concave/subadditive in tf (see wand.py).
    'auto' runs the same metadata-only probe as plain terms; pruning is
    disabled under masks/msm/after for the same ghost-heap reasons as
    score_segment_rows (bounds include docs the constraint rejects)."""
    if allowed is not None and allowed.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if (after is not None or allowed is not None
            or (deleted is not None and deleted.size)
            or (min_match > 1 and mode != "and")):
        use_blockmax = False
    if mode != "and":
        zb = None
        if use_blockmax == "auto":
            use_blockmax = False
            flat = [r for rows in groups_rows for r in rows]
            if flat and k > 0:
                big = max(flat, key=lambda r: r["df"])
                if len(big["first_docs"]) > 8:
                    zb = W.zone_bounds_groups(groups_rows, idfs_g)
                    use_blockmax = W.decide_blockmax_groups(
                        groups_rows, idfs_g, k, zb=zb)
        if use_blockmax:
            flat = [r for rows in groups_rows for r in rows]
            if not flat:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            top = W.blockmax_topk_groups(groups_rows, idfs_g, avgdl, k,
                                         bound_scale=bound_scale, zb=zb)
            if not top:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            d, s = zip(*top)
            return np.asarray(d, np.int64), np.asarray(s, np.float64)
    streams = [_merge_group_streams(rows, deleted, allowed)
               for rows in groups_rows]
    if mode == "and":
        if any(s[0].size == 0 for s in streams):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = I.intersect_sorted([s[0] for s in streams])
        if ids.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        scores = np.zeros(ids.size, dtype=np.float64)
        for (u, tf, dl), idf in zip(streams, idfs_g):
            pos = np.searchsorted(u, ids)
            scores += idf * codec.bm25_partial(tf[pos], dl[pos], avgdl)
        docs = ids
    else:
        docs, scores = W.score_disjunctive(
            [s[0] for s in streams], [s[1] for s in streams],
            [s[2] for s in streams], idfs_g, avgdl, min_match=min_match)
    docs, scores = _after_cut(docs, scores, after)
    return _truncate_topk(docs, scores, k)


def _split_aux(ddf: Optional[pd.DataFrame], has_filter: bool
               ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Parse one segment's cogrouped aux rows (_seg_aux_grouped) into the
    two kernel masks: (deleted, allowed), each sorted unique or None.
    kind 0 = tombstone, kind 1 = allow-list member. With a filter active,
    NO allow rows means nothing in this segment qualifies — allowed comes
    back as an EMPTY array, which is not None/unfiltered. ONE parser for
    every cogrouped kernel (scoring, boolean match, count) so the aux-row
    contract can never drift between them."""
    deleted = allowed = None
    if ddf is not None and len(ddf):
        dd = ddf.loc[ddf["kind"] == 0, "doc_id"]
        if len(dd):
            deleted = np.unique(dd.to_numpy(np.int64))
        if has_filter:
            aa = ddf.loc[ddf["kind"] == 1, "doc_id"]
            allowed = np.unique(aa.to_numpy(np.int64))
    if has_filter and allowed is None:
        allowed = np.empty(0, dtype=np.int64)
    return deleted, allowed


def _streams_for_ids(r: dict, ids: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a packed row's (docs, tfs, dls) for the blocks containing
    `ids` only — contiguous block runs via bulk varbyte range decode. The
    AND top-k hot path: scoring a 5-doc intersection against a df=10^6
    term must not decode 10^6 x 3 streams (the block-selective decode the
    intersection itself already used). Falls back to full decode when most
    blocks are touched anyway."""
    df = int(r["df"])
    fd = np.asarray(r["first_docs"], dtype=np.int64)
    if fd.size == 0 or ids.size == 0:
        return (codec.unpack_docs(r["docs"], df),
                codec.unpack_stream(r["tfs"], df),
                codec.unpack_stream(r["dls"], df))
    bidx = np.unique(np.clip(
        np.searchsorted(fd, ids, side="right") - 1, 0, fd.size - 1))
    if bidx.size >= max(1, fd.size // 2):
        return (codec.unpack_docs(r["docs"], df),
                codec.unpack_stream(r["tfs"], df),
                codec.unpack_stream(r["dls"], df))
    packed = codec.packed_from_row(r)
    # contiguous runs of needed blocks → one bulk range decode per run;
    # runs are ascending so the concatenated docs stay sorted
    breaks = np.flatnonzero(np.diff(bidx) > 1) + 1
    d_l, t_l, l_l = [], [], []
    for run in np.split(bidx, breaks):
        d, t, l = codec.unpack_block_range(packed, int(run[0]),
                                           int(run[-1]) + 1)
        d_l.append(d)
        t_l.append(t)
        l_l.append(l)
    return np.concatenate(d_l), np.concatenate(t_l), np.concatenate(l_l)


def score_segment_rows(rows: List[dict], idfs: Dict[str, float],
                       n_query_terms: int, k: int, mode: str,
                       use_blockmax, avgdl: float,
                       bound_scale: float = 1.0,
                       deleted: Optional[np.ndarray] = None,
                       allowed: Optional[np.ndarray] = None,
                       min_match: int = 1,
                       after: Optional[Tuple[int, float]] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Score one segment's packed posting rows. Module-level (no engine
    state) so the distributed applyInPandas path serializes only plain
    values, never the SparkSession.

    deleted: SORTED doc_ids tombstoned by pending delete files. Masked
    BEFORE top-k truncation (a deleted doc must not occupy a result slot
    or a tie boundary). Segments carrying live tombstones score on the
    exhaustive vectorized path — block-max pruning bounds include the
    deleted docs' partials, so its heap could fill with ghosts;
    compaction applies the deletes and restores pruning.

    allowed: SORTED doc_ids of THIS segment's slice of a filter
    allow-list (filtered search, the Lucene filter-query shape). Same
    pre-truncation discipline as deleted, opposite polarity: only members
    survive. Lucene-identical scoring semantics — the filter restricts
    candidates but idf/avgdl/n_docs stay corpus-wide, so a surviving
    doc's score is unchanged. Block-max pruning is disabled for the same
    ghost-heap reason as deletes (zone bounds include excluded docs);
    None means unfiltered, an EMPTY array means nothing in this segment
    qualifies.

    min_match (Lucene minimumNumberShouldMatch, mode='or' only): keep
    docs matched by at least that many distinct query terms. Scores of
    survivors are unchanged (every matched term still contributes).
    Block-max pruning is disabled — its bounds admit docs the msm
    constraint rejects, so the pruned heap could fill with them.

    after (Lucene searchAfter): a (doc_id, score) cursor — keep only docs
    STRICTLY after it in the global (score desc, doc_id asc) order, i.e.
    page k..2k of a paginated walk. Applied before truncation; block-max
    is disabled because the pruned heap would fill with pre-cursor docs
    (pagination is the rare deep-walk path, same trade Lucene makes by
    re-collecting)."""
    zb = None
    if after is not None:
        use_blockmax = False
    if allowed is not None:
        if allowed.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        use_blockmax = False
    if min_match > 1 and mode != "and":
        if len(rows) < min_match:  # can't reach m distinct terms here
            return np.empty(0, np.int64), np.empty(0, np.float64)
        use_blockmax = False
    if deleted is not None and deleted.size:
        use_blockmax = False
    if use_blockmax == "auto":
        # ADAPTIVE: a metadata-only probe (W.decide_blockmax) estimates the
        # zone-visit fraction. Head-term tie-heavy queries (nearly every doc
        # matches, zone bounds comparable — where exhaustive beat block-max
        # by 8-25x on profiled Zipf workloads) choose the exhaustive
        # vectorized pass; selective queries (rare high-idf term, k <<
        # matches) choose pruned. Rank-identity between the two is
        # test-enforced either way. The zone bounds are computed ONCE and
        # shared with blockmax_topk when pruning is chosen.
        use_blockmax = False
        if mode != "and" and rows and k > 0:
            # skip the probe entirely for tiny segments (decide's own
            # early-exit) — don't pay zone_bounds to learn "exhaustive"
            big = max(rows, key=lambda r: r["df"])
            if len(big["first_docs"]) > 8:
                zb = W.zone_bounds(rows, idfs)
                use_blockmax = W.decide_blockmax(rows, idfs, k, zb=zb)
    if mode == "and":
        if len(rows) < n_query_terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = _mask_deleted(I.intersect_packed(rows), deleted)
        if allowed is not None and ids.size:
            ids = ids[_allowed_mask(ids, allowed)]
        if ids.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        scores = np.zeros(ids.size, dtype=np.float64)
        for r in rows:
            docs, tfs, dls = _streams_for_ids(r, ids)
            pos = np.searchsorted(docs, ids)
            scores += idfs[r["term"]] * codec.bm25_partial(
                tfs[pos], dls[pos], avgdl)
        ids, scores = _after_cut(ids, scores, after)
        return _truncate_topk(ids, scores, k)
    if use_blockmax:
        top = W.blockmax_topk(rows, idfs, avgdl, k,
                              bound_scale=bound_scale, zb=zb)
        if not top:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        d, s = zip(*top)
        return np.asarray(d, np.int64), np.asarray(s, np.float64)
    doc_l, tf_l, dl_l, idf_l = [], [], [], []
    for r in rows:
        df = int(r["df"])
        docs = codec.unpack_docs(r["docs"], df)
        tfs = codec.unpack_stream(r["tfs"], df).astype(np.int64)
        dls = codec.unpack_stream(r["dls"], df).astype(np.int64)
        if deleted is not None and deleted.size:
            # drop tombstoned entries from the decoded streams — scoring
            # then behaves exactly as if the docs were never indexed
            # (except the documented pre-compaction idf/avgdl semantics)
            keep = codec.tombstone_keep_mask(docs, deleted)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        if allowed is not None:
            keep = _allowed_mask(docs, allowed)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        doc_l.append(docs)
        tf_l.append(tfs)
        dl_l.append(dls)
        idf_l.append(idfs[r["term"]])
    docs, scores = W.score_disjunctive(doc_l, tf_l, dl_l, idf_l, avgdl,
                                       min_match=min_match)
    docs, scores = _after_cut(docs, scores, after)
    return _truncate_topk(docs, scores, k)


def _truncate_topk(docs: np.ndarray, scores: np.ndarray, k: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-segment truncation to EXACTLY the top-k by the global order
    (score desc, doc_id asc) — the single site for this rule; the
    distributed path must not re-implement it. Tie-safe: the global top-k
    can never contain a doc preceded by k same-segment docs in that order,
    so capping ties at the k smallest doc_ids loses nothing — and without
    the cap a tie-heavy segment (e.g. 150k identical docs) would ship its
    ENTIRE match set to the driver for a k=10 query."""
    if docs.size > k:
        kth = np.partition(scores, docs.size - k)[docs.size - k]
        m = scores >= kth
        docs, scores = docs[m], scores[m]
        if docs.size > k:  # ties across the k-th boundary
            order = np.lexsort((docs, -scores))[:k]
            order.sort()  # preserve ascending-docID output order
            docs, scores = docs[order], scores[order]
    return docs, scores


class FilterHandle:
    """A search filter resolved ONCE and reused across queries.

    Repeated filtered retrieval (the "rank only docs that passed the
    upstream quality pass" loop) pays the allow-list resolution — a
    docmap scan/semi-join Spark job — on EVERY query when the filter is
    passed as raw ids/SQL (the 1.45-1.89× overhead measured in
    BENCH/filter_scale.json). `idx.prepare_filter(...)` resolves the
    allow-list once and hands back this handle; every `filter_ids=`
    parameter accepts it and reuses the cached shapes:

      * routed_df(): the (pseg, doc_id) frame the distributed cogroup
        path consumes, persisted MEMORY_AND_DISK so each query's
        semi-join re-reads the cache instead of re-scanning the docmap;
      * by_seg(): posting-segment → sorted unique doc_ids dict for the
        driver/preloaded path (resolved with ONE job, then free);
      * flat(): the boolean paths' single sorted array, derived from
        by_seg() without another job (pseg routing only re-attributes
        seg — the id set is identical).

    Results are byte-identical to the per-query path: the handle calls
    the same `_routed_filter_df` resolution, just once. Safe to cache
    because a SearchIndex is snapshot-bound — delete files are read at
    construction and never mutate — so a handle can only go stale by
    being passed to a DIFFERENT SearchIndex, which `_check` rejects.
    Call release() to drop the persisted frame when done."""

    def __init__(self, index: "SearchIndex", filter_ids=None,
                 filter_sql: Optional[str] = None) -> None:
        if (filter_ids is None) == (filter_sql is None):
            raise ValueError(
                "exactly one of filter_ids / filter_sql is required")
        if isinstance(filter_ids, FilterHandle):
            raise TypeError("filter_ids is already a FilterHandle")
        self._index = index
        self._spec = (filter_ids, filter_sql)
        self._routed: Optional[DataFrame] = None
        self._by_seg: Optional[Dict[int, np.ndarray]] = None
        self._flat: Optional[np.ndarray] = None

    def _check(self, index: "SearchIndex") -> "FilterHandle":
        if index is not self._index:
            raise ValueError(
                "FilterHandle is bound to a different SearchIndex — "
                "prepare_filter() again on the index you query")
        return self

    def routed_df(self) -> DataFrame:
        if self._routed is None:
            from pyspark import StorageLevel
            self._routed = (
                self._index._resolve_routed_filter_df(*self._spec)
                .persist(StorageLevel.MEMORY_AND_DISK))
        return self._routed

    def by_seg(self) -> Dict[int, np.ndarray]:
        if self._by_seg is None:
            pdf = (self._index._resolve_routed_filter_df(*self._spec)
                   .toPandas()
                   if self._routed is None else self._routed.toPandas())
            self._by_seg = {
                int(seg): np.unique(grp["doc_id"].to_numpy(np.int64))
                for seg, grp in pdf.groupby("seg")}
        return self._by_seg

    def flat(self) -> np.ndarray:
        if self._flat is None:
            arrs = list(self.by_seg().values())
            self._flat = (np.unique(np.concatenate(arrs)) if arrs
                          else np.empty(0, dtype=np.int64))
        return self._flat

    def release(self) -> None:
        """Unpersist the cached distributed frame (driver-side caches
        are plain numpy and just get garbage-collected)."""
        if self._routed is not None:
            self._routed.unpersist()
            self._routed = None


class SearchIndex:
    def __init__(self, spark: SparkSession, index_dir: str,
                 snapshot_id: Optional[int] = None) -> None:
        """snapshot_id: time travel — read any committed snapshot (results
        exactly as of that commit; default = current)."""
        self.spark = spark
        self.cat = IndexCatalog(index_dir)
        snap = (self.cat.current_snapshot() if snapshot_id is None
                else self.cat.snapshot(snapshot_id))
        if snap is None:
            raise ValueError(
                f"no committed snapshot in {index_dir}" if snapshot_id is None
                else f"snapshot {snapshot_id} not found in {index_dir}")
        self.snapshot = snap
        self.stats = snap["stats"]
        self.n_docs = int(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.n_buckets = int(self.stats["n_buckets"])
        # snapshot-scoped reads: only segments committed in the current
        # manifest are visible (staged/orphaned/pre-compaction segment dirs
        # on disk are ignored — Iceberg-style snapshot isolation)
        post_segs = snap.get("posting_segments", snap["segments"])
        doc_segs = snap.get("doc_segments", snap["segments"])
        self._postings = (spark.read.schema(POSTINGS_SCHEMA)
                          .parquet(self.cat.postings_dir())
                          .filter(F.col("seg").isin([int(s) for s in post_segs])))
        self._docmap = (spark.read.schema(DOCMAP_SCHEMA)
                        .parquet(self.cat.docmap_dir())
                        .filter(F.col("seg").isin([int(s) for s in doc_segs])))
        self.pack_avgdl = {int(k): float(v) for k, v in
                           (self.stats.get("pack_avgdl") or {}).items()}
        # tombstones (plans/deletes.py): PENDING files mask postings AND
        # docmap; APPLIED files (compaction already rewrote the postings
        # without those docs) mask docmap reads only
        self.delete_files = [int(x) for x in
                             (snap.get("delete_files") or [])]
        self.applied_delete_files = [int(x) for x in
                                     (snap.get("applied_delete_files")
                                      or [])]
        self._deleted_np: Optional[np.ndarray] = None
        self._deleted_by_seg_map: Optional[Dict[int, np.ndarray]] = None
        self._term_cache: Dict[str, List[dict]] = {}
        self._cache_has_pos = False
        self._cache_pdf: Optional[pd.DataFrame] = None
        self._cache_pos: Optional[dict] = None
        self._cache_complete = False
        # transparent filter-handle LRU: repeated identical filter_sql
        # predicates through the PLAIN API reuse one resolved handle
        # (keyed by the predicate string; safe because the index is
        # snapshot-bound, same argument as FilterHandle)
        self._filter_lru: "OrderedDict[str, FilterHandle]" = OrderedDict()

    # -------------------------------------------------------- hot cache ---
    def preload(self, terms: Optional[List[str]] = None,
                with_positions: bool = False) -> int:
        """Load postings into a driver-side term cache — the analogue of the
        reference's mmap index residency (inverted_index_skip_list.py:147-180):
        after one distributed scan, queries run entirely in numpy with no
        Spark job dispatch (~µs–ms instead of ~100ms). With terms=None the
        whole index is cached (fine when the packed index fits driver
        memory — it is delta+varbyte compressed; for 10^12-doc indexes pass
        the query workload's terms or stay on the scan path).

        with_positions=True also caches the position sidecar so PHRASE
        queries run warm (needs a positional index). The cache is one
        coherent frame with one column set: switching positionality resets
        it (boolean queries read the positional cache fine — the kernels
        select the keys they need — so warm mixed workloads should preload
        once with positions)."""
        if with_positions and not self.stats.get("has_positions"):
            raise ValueError("preload(with_positions=True) needs a "
                             "positional index")
        if (self._cache_pdf is not None
                and bool(with_positions) != self._cache_has_pos):
            self._cache_pdf = None
            self._cache_pos = None
            self._term_cache.clear()
            self._cache_complete = False
        df = self._postings if terms is None else self.postings_df(terms)
        pdf = df.select(*(PHRASE_COLS if with_positions
                          else QUERY_COLS)).toPandas()
        # LAZY row materialization: building one dict per row up front cost
        # minutes on a 1M-doc index (1.2M python dicts); instead keep the
        # frame + a term→positions map and materialize a term's row dicts on
        # first access (queries touch a handful of terms).
        n_new = len(pdf)
        if terms is not None and self._cache_pdf is not None:
            # MERGE with the existing cache (never replace wholesale): a
            # partial preload after a full one must not orphan cached terms
            # while _cache_complete stays True, and repeated partial preloads
            # must accumulate rather than drop earlier warmed terms.
            fetched = set(terms)
            keep = self._cache_pdf[~self._cache_pdf["term"].isin(fetched)]
            pdf = pd.concat([keep, pdf], ignore_index=True)
            for t in fetched:
                self._term_cache.pop(t, None)  # refreshed below lazily
        elif terms is None:
            self._term_cache.clear()
        self._cache_pdf = pdf.sort_values(["term", "seg"],
                                          kind="stable").reset_index(drop=True)
        self._cache_pos = self._cache_pdf.groupby("term", sort=False
                                                  ).indices
        self._cache_has_pos = bool(with_positions)
        if terms is None:
            self._cache_complete = True
        else:
            for t in terms:
                if t not in self._cache_pos:
                    self._term_cache.setdefault(t, [])
        return n_new

    def _cached_rows(self, term: str) -> List[dict]:
        rows = self._term_cache.get(term)
        if rows is None:
            pos = self._cache_pos.get(term) if self._cache_pos is not None \
                else None
            rows = ([] if pos is None else
                    self._cache_pdf.iloc[pos].to_dict("records"))
            self._term_cache[term] = rows
        return rows

    # ------------------------------------------------------- tombstones ---
    def _pending_deletes_df(self) -> DataFrame:
        from pysearchlite_spark.plans.deletes import deletes_df
        return deletes_df(self.spark, self.cat, self.delete_files)

    def _deleted(self) -> Optional[np.ndarray]:
        """SORTED pending-tombstone doc_ids for the driver paths (loaded
        once per SearchIndex; None when the snapshot has none). The
        distributed paths never call this — they cogroup the delete rows
        per posting segment instead."""
        if not self.delete_files:
            return None
        if self._deleted_np is None:
            # derived from the by-seg map — ONE scan of the delete files
            # serves both driver shapes (flat mask + per-segment slices)
            arrs = list((self._deleted_by_seg() or {}).values())
            self._deleted_np = (np.unique(np.concatenate(arrs)) if arrs
                                else np.empty(0, dtype=np.int64))
        return self._deleted_np

    def _deleted_by_seg(self) -> Optional[Dict[int, np.ndarray]]:
        """Pending tombstones keyed by POSTING segment (pseg — the same
        routing key the distributed paths cogroup on), each value a sorted
        unique doc_id array. Exact attribution: a segment with no
        tombstones of its own gets no entry and keeps block-max pruning,
        even when its docID range neighbours a heavily-deleted segment
        that carries none of the query's terms (a lo/hi range slice over
        the flat array mis-attributed those)."""
        if not self.delete_files:
            return None
        if self._deleted_by_seg_map is None:
            pdf = (self._pending_deletes_df()
                   .select("pseg", "doc_id").toPandas())
            self._deleted_by_seg_map = {
                int(seg): np.unique(grp["doc_id"].to_numpy(np.int64))
                for seg, grp in pdf.groupby("pseg")}
        return self._deleted_by_seg_map

    def docmap_df(self, live: bool = True) -> DataFrame:
        """The snapshot's docmap (doc_id, url, doc_len, seg). live=True
        (default) masks every tombstoned doc — pending AND applied files:
        compaction rewrites postings but leaves docmap rows on disk."""
        if not live:
            return self._docmap
        files = self.delete_files + self.applied_delete_files
        if not files:
            return self._docmap
        from pysearchlite_spark.plans.deletes import deletes_df
        dels = deletes_df(self.spark, self.cat, files).select("doc_id")
        return self._docmap.join(dels, "doc_id", "left_anti")

    # ------------------------------------------------------ filter lists --
    def prepare_filter(self, filter_ids=None,
                       filter_sql: Optional[str] = None) -> FilterHandle:
        """Resolve a search filter once into a reusable FilterHandle.

        Pass the handle anywhere a `filter_ids=` parameter is accepted
        (topk/count/search/search_df/topk_synonyms/...); repeated
        filtered queries then skip the per-query allow-list resolution
        job and reuse the cached routed frame / per-segment arrays.
        Results are identical to passing the raw ids/SQL directly."""
        return FilterHandle(self, filter_ids, filter_sql)

    def clear_filter_cache(self) -> None:
        """Release every filter_sql handle the plain API cached via
        `_cached_filter_handle` (unpersists their routed frames). Handles
        returned by prepare_filter() are caller-owned and unaffected."""
        while self._filter_lru:
            _, h = self._filter_lru.popitem(last=False)
            h.release()

    _FILTER_LRU_MAX = 8

    def _cached_filter_handle(self, filter_sql: str) -> FilterHandle:
        """The transparent fast path for repeated identical filter_sql
        through the plain API (topk/count/search/... with filter_sql=):
        the first query resolves and persists the allow-list exactly as
        prepare_filter() would; every later query with the SAME predicate
        string reuses that handle, so callers who never learned
        prepare_filter still amortize the resolution job. LRU-bounded —
        evicted handles unpersist their routed frame."""
        h = self._filter_lru.get(filter_sql)
        if h is None:
            h = FilterHandle(self, None, filter_sql)
            self._filter_lru[filter_sql] = h
            if len(self._filter_lru) > self._FILTER_LRU_MAX:
                _, old = self._filter_lru.popitem(last=False)
                old.release()
        else:
            self._filter_lru.move_to_end(filter_sql)
        return h

    def _routed_filter_df(self, filter_ids=None,
                          filter_sql: Optional[str] = None) -> DataFrame:
        """Resolve a search filter into (seg, doc_id) rows keyed by the
        POSTING segment that holds each doc — the same pseg routing the
        delete files use (snapshot pseg_of, identity until a compaction
        diverges doc segments from posting segments), so the distributed
        path can cogroup the allow-list per segment instead of
        broadcasting a global id set (the 10^12-doc shape: an allow-list
        produced by a quality/dedup pass can be billions of rows).

        filter_sql: a SQL predicate over docmap columns
        (doc_id, url, doc_len, seg) — ONE pruned docmap scan.
        filter_ids: a DataFrame with a doc_id column (e.g. the output of a
        quality pass), a plain iterable of ints, or a FilterHandle from
        prepare_filter() (reuses the resolved, persisted frame);
        semi-joined against the LIVE docmap, which validates ids, dedupes,
        and attributes dseg. Tombstoned docs can never re-enter through a
        filter."""
        if isinstance(filter_ids, FilterHandle):
            return filter_ids._check(self).routed_df()
        if filter_sql is not None and filter_ids is None:
            return self._cached_filter_handle(filter_sql).routed_df()
        return self._resolve_routed_filter_df(filter_ids, filter_sql)

    def _resolve_routed_filter_df(self, filter_ids=None,
                                  filter_sql: Optional[str] = None
                                  ) -> DataFrame:
        """The raw resolution behind _routed_filter_df — FilterHandle
        calls this directly (the dispatching wrapper would hand the
        handle back to itself)."""
        rows = self._filter_base_df(filter_ids, filter_sql)
        pseg_of = {int(k): int(v) for k, v in
                   (self.stats.get("pseg_of") or {}).items()}
        if pseg_of:
            mapping = F.create_map(*[x for k, v in pseg_of.items()
                                     for x in (F.lit(k), F.lit(v))])
            seg = F.coalesce(mapping[F.col("seg")], F.col("seg"))
        else:
            seg = F.col("seg")
        return rows.select(seg.cast("long").alias("seg"), "doc_id")

    def _filter_base_df(self, filter_ids=None,
                        filter_sql: Optional[str] = None) -> DataFrame:
        """Validated allow-list rows (doc_id, seg = docmap DOC segment,
        pre-routing) from either filter spelling — the shared resolution
        step; _routed_filter_df adds pseg attribution on top, the flat
        paths take doc_id alone."""
        base = self.docmap_df(live=True)
        if filter_sql is not None:
            return base.filter(filter_sql).select("doc_id", "seg")
        if not isinstance(filter_ids, DataFrame):
            ids_df = self.spark.createDataFrame(
                pd.DataFrame({"doc_id": np.asarray(
                    list(filter_ids), dtype=np.int64)}),
                "doc_id long")
        else:
            ids_df = filter_ids.select("doc_id")
        return (base.join(ids_df, "doc_id", "left_semi")
                .select("doc_id", "seg"))

    def _filter_by_seg(self, filter_ids=None,
                       filter_sql: Optional[str] = None
                       ) -> Dict[int, np.ndarray]:
        """Driver-path shape of the filter: posting segment → sorted
        unique allowed doc_ids (the allow-list mirror of
        _deleted_by_seg). Collects the filtered id set — fine for the
        interactive path; the distributed path cogroups instead."""
        if isinstance(filter_ids, FilterHandle):
            return filter_ids._check(self).by_seg()
        if filter_sql is not None and filter_ids is None:
            return self._cached_filter_handle(filter_sql).by_seg()
        pdf = (self._routed_filter_df(filter_ids, filter_sql)
               .toPandas())
        return {int(seg): np.unique(grp["doc_id"].to_numpy(np.int64))
                for seg, grp in pdf.groupby("seg")}

    def _filter_flat(self, filter_ids=None,
                     filter_sql: Optional[str] = None) -> np.ndarray:
        """Flat driver-path shape: one sorted unique allowed array (the
        boolean paths mask once at the end, so per-segment slices — and
        the pseg routing that keys them — buy nothing there)."""
        if isinstance(filter_ids, FilterHandle):
            return filter_ids._check(self).flat()
        if filter_sql is not None and filter_ids is None:
            return self._cached_filter_handle(filter_sql).flat()
        pdf = (self._filter_base_df(filter_ids, filter_sql)
               .select("doc_id").toPandas())
        return np.unique(pdf["doc_id"].to_numpy(np.int64))

    # ------------------------------------------------------------ scan ----
    def postings_df(self, terms: List[str]) -> DataFrame:
        """Pruned scan: partition pruning on tb + predicate pushdown on
        term. Past ~10k terms (a short-prefix expansion can hit the whole
        dictionary) an In() expression is quadratic to plan and useless as
        a pushdown — switch to a broadcast semi-join on the term set; the
        tb partition filter still prunes (the buckets cover all terms)."""
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        scan = self._postings.filter(F.col("tb").isin(buckets))
        if len(terms) <= IN_LIST_MAX:
            return scan.filter(F.col("term").isin(terms))
        terms_df = self.spark.createDataFrame(
            pd.DataFrame({"term": list(terms)}))
        return scan.join(F.broadcast(terms_df), "term", "left_semi")

    def _term_is_cached(self, t: str) -> bool:
        """Single source of truth for preload-cache membership — the boolean
        (_fetch) and phrase (_fetch_phrase) warm paths must agree on it."""
        return (self._cache_complete or t in self._term_cache
                or (self._cache_pos is not None
                    and t in self._cache_pos))

    def _fetch(self, terms: List[str]) -> List[dict]:
        """Posting rows (as dicts) for `terms` — straight from the preload
        cache when every term is warm (no DataFrame round-trip on the hot
        cached path), else one pruned Spark scan."""
        if not terms:
            return []
        if all(self._term_is_cached(t) for t in terms):
            return [r for t in set(terms) for r in self._cached_rows(t)]
        return (self.postings_df(terms).select(*QUERY_COLS)
                .toPandas().to_dict("records"))

    @staticmethod
    def _rows_by_seg(rows: List[dict]) -> Dict[int, List[dict]]:
        out: Dict[int, List[dict]] = {}
        for r in rows:
            out.setdefault(int(r["seg"]), []).append(r)
        return out

    def global_dfs(self, rows: List[dict], terms: List[str]
                   ) -> Dict[str, int]:
        dfs = {t: 0 for t in terms}
        for r in rows:
            if r["term"] in dfs:
                dfs[r["term"]] += int(r["df"])
        return dfs

    # ------------------------------------------------------- boolean AND --
    def search_and_ids(self, query: str, distributed: bool = False,
                       filter_ids=None, filter_sql: Optional[str] = None
                       ) -> np.ndarray:
        terms = query_terms(query)
        if not terms:
            return np.empty(0, dtype=np.int64)
        has_filter = filter_ids is not None or filter_sql is not None
        if distributed:
            return self._search_and_ids_dist(
                terms, filter_df=(self._routed_filter_df(
                    filter_ids, filter_sql) if has_filter else None))
        fetched = self._fetch(terms)
        dfs = self.global_dfs(fetched, terms)
        if any(dfs[t] == 0 for t in terms):  # P4 short-circuit
            return np.empty(0, dtype=np.int64)
        parts = []
        for seg, rows in sorted(self._rows_by_seg(fetched).items()):
            if len(rows) < len(terms):
                continue  # a term missing in this segment → no seg matches
            parts.append(I.intersect_packed(rows))
        if not parts:
            return np.empty(0, dtype=np.int64)
        # segments are disjoint ascending ranges
        ids = _mask_deleted(np.concatenate(parts), self._deleted())
        return self._apply_flat_filter(ids, filter_ids, filter_sql,
                                       has_filter)

    def _apply_flat_filter(self, ids: np.ndarray, filter_ids, filter_sql,
                           has_filter: bool) -> np.ndarray:
        """Tail step of the driver-side boolean paths: keep only
        allow-list members (one sorted mask over the already-merged ids —
        boolean results are flat, unlike the per-segment scoring paths)."""
        if not has_filter or ids.size == 0:
            return ids
        allowed = self._filter_flat(filter_ids, filter_sql)
        return ids[_allowed_mask(ids, allowed)]

    def search_or_ids(self, query: str, distributed: bool = False,
                      filter_ids=None, filter_sql: Optional[str] = None
                      ) -> np.ndarray:
        terms = query_terms(query)
        if not terms:
            return np.empty(0, dtype=np.int64)
        has_filter = filter_ids is not None or filter_sql is not None
        if distributed:
            return self._search_or_ids_dist(
                terms, filter_df=(self._routed_filter_df(
                    filter_ids, filter_sql) if has_filter else None))
        return self._apply_flat_filter(self._or_ids_local(terms),
                                       filter_ids, filter_sql, has_filter)

    def _or_ids_local(self, terms: List[str]) -> np.ndarray:
        fetched = self._fetch(terms)
        parts = []
        for seg, rows in sorted(self._rows_by_seg(fetched).items()):
            parts.append(I.union_sorted(
                [codec.unpack_docs(r["docs"], int(r["df"])) for r in rows]))
        if not parts:
            return np.empty(0, dtype=np.int64)
        return _mask_deleted(np.concatenate(parts), self._deleted())

    # --------------------------------------------- minimum-should-match --
    def search_min_match_ids(self, query: str, min_match: int,
                             distributed: bool = False,
                             filter_ids=None,
                             filter_sql: Optional[str] = None
                             ) -> np.ndarray:
        """Docs matching at least `min_match` DISTINCT query terms
        (Lucene BooleanQuery minimumNumberShouldMatch), ascending docID.
        min_match=1 is OR, min_match=len(terms) is AND — the in-between
        is the "2 of these 5 keywords" recall/precision dial. Union
        shape: a dead term never short-circuits, it just can't count.
        Both paths count per segment (segments partition the docID space,
        so per-segment multiplicities ARE the global matched-term
        counts); the distributed kernel ships only matching ids."""
        terms = query_terms(query)  # deduped (first occurrence wins)
        if not terms:
            return np.empty(0, dtype=np.int64)
        m = max(1, int(min_match))
        if m > len(terms):
            return np.empty(0, dtype=np.int64)
        has_filter = filter_ids is not None or filter_sql is not None
        if distributed:
            out = (self._matching_ids_dist(
                terms, "min", min_match=m,
                filter_df=(self._routed_filter_df(filter_ids, filter_sql)
                           if has_filter else None))
                .orderBy("doc_id").toPandas())
            return out["doc_id"].to_numpy(np.int64)
        fetched = self._fetch(terms)
        parts = []
        for seg, rows in sorted(self._rows_by_seg(fetched).items()):
            parts.append(I.min_match_sorted(
                [codec.unpack_docs(r["docs"], int(r["df"]))
                 for r in rows], m))
        if not parts:
            return np.empty(0, dtype=np.int64)
        ids = _mask_deleted(np.concatenate(parts), self._deleted())
        return self._apply_flat_filter(ids, filter_ids, filter_sql,
                                       has_filter)

    # --------------------------------------------------------- synonyms --
    def _synonym_groups(self, query: str,
                        synonyms: Dict[str, List[str]]) -> List[List[str]]:
        """Query terms → ordered synonym groups: each query term expands
        to [term] + its synonyms (tokenized, deduped within the group).
        Terms without an entry are singleton groups."""
        groups = []
        for t in query_terms(query):
            g = [t] + [s for alt in (synonyms.get(t) or ())
                       for s in query_terms(alt)]
            groups.append(list(dict.fromkeys(g)))
        return groups

    def search_synonym_ids(self, query: str,
                           synonyms: Dict[str, List[str]],
                           distributed: bool = False) -> np.ndarray:
        """Boolean AND with query-time synonym expansion (Lucene
        SynonymGraphFilter shape): each query term matches if the doc
        contains the term OR any of its synonyms; docs must satisfy
        every group. Per segment: union within group, intersect across
        groups (segments partition the docID space)."""
        groups = self._synonym_groups(query, synonyms)
        if not groups:
            return np.empty(0, dtype=np.int64)
        all_terms = list(dict.fromkeys(t for g in groups for t in g))
        if distributed:
            out = (self._matching_ids_dist(all_terms, "groups",
                                           groups=groups)
                   .orderBy("doc_id").toPandas())
            return out["doc_id"].to_numpy(np.int64)
        fetched = self._fetch(all_terms)
        dfs = self.global_dfs(fetched, all_terms)
        if any(all(dfs[t] == 0 for t in g) for g in groups):
            return np.empty(0, dtype=np.int64)  # a whole group is dead
        parts = []
        for seg, rows in sorted(self._rows_by_seg(fetched).items()):
            by_term = {r["term"]: r for r in rows}
            unions = []
            for g in groups:
                grows = [by_term[t] for t in g if t in by_term]
                unions.append(I.union_sorted(
                    [codec.unpack_docs(r["docs"], int(r["df"]))
                     for r in grows]))
            if any(u.size == 0 for u in unions):
                continue
            parts.append(I.intersect_sorted(unions))
        if not parts:
            return np.empty(0, dtype=np.int64)
        return _mask_deleted(np.concatenate(parts), self._deleted())

    def count_synonyms(self, query: str, synonyms: Dict[str, List[str]],
                       distributed: bool = False) -> int:
        if distributed:
            # count without materializing ids on the driver (no global
            # sort, no id transfer) — same discipline as _count_and_dist
            groups = self._synonym_groups(query, synonyms)
            if not groups:
                return 0
            all_terms = list(dict.fromkeys(t for g in groups for t in g))
            out = (self._matching_ids_dist(all_terms, "groups",
                                           groups=groups)
                   .agg(F.count("doc_id").alias("total")).collect())
            return int(out[0]["total"] or 0)
        return int(self.search_synonym_ids(query, synonyms).size)

    def topk_synonyms(self, query: str, synonyms: Dict[str, List[str]],
                      k: int = 10, mode: str = "or",
                      use_blockmax="auto",
                      distributed: bool = False, min_match: int = 1,
                      filter_ids=None, filter_sql: Optional[str] = None,
                      after: Optional[Tuple[int, float]] = None
                      ) -> List[Tuple[int, float]]:
        """BM25 top-k with query-time synonyms — Lucene SynonymQuery
        scoring: each group is ONE pseudo-term whose per-doc tf is the
        SUM of member tfs (saturation applies once to the sum) and whose
        idf comes from the group's MAX member df (the docFreq upper
        bound), so adding a rare synonym never inflates a common term's
        idf. mode/min_match/filters/after compose exactly as in topk.
        Thin wrapper: query terms expand to groups, topk_groups scores."""
        return self.topk_groups(
            self._synonym_groups(query, synonyms), k=k, mode=mode,
            use_blockmax=use_blockmax,
            distributed=distributed, min_match=min_match,
            filter_ids=filter_ids, filter_sql=filter_sql, after=after)

    def topk_groups(self, groups: List[List[str]],
                    k: int = 10, mode: str = "or",
                    boosts: Optional[List[float]] = None,
                    use_blockmax="auto",
                    distributed: bool = False, min_match: int = 1,
                    filter_ids=None, filter_sql: Optional[str] = None,
                    after: Optional[Tuple[int, float]] = None
                    ) -> List[Tuple[int, float]]:
        """BM25 top-k over explicit disjunction groups — the Lucene
        BooleanQuery-of-SynonymQuery shape `(a OR b) c^2`: each group is
        ONE pseudo-term whose per-doc tf is the SUM of member tfs
        (saturation applies once to the sum) and whose idf comes from the
        group's MAX member df (the docFreq upper bound). `boosts`
        (parallel to groups, default all 1.0) multiplies each group's
        score contribution — Lucene BoostQuery multiplies the sub-query
        score, and a group's score is idf·saturation, so the boost folds
        into the group idf EXACTLY (bit-identical to scaling after the
        fact). mode/min_match/filters/after compose as in topk."""
        groups = [list(dict.fromkeys(g)) for g in groups]
        if boosts is None:
            boosts = [1.0] * len(groups)
        if len(boosts) != len(groups):
            raise ValueError("boosts must be parallel to groups")
        if any(b < 0 for b in boosts):
            raise ValueError("boosts must be non-negative")
        if not groups or any(not g for g in groups) or k <= 0:
            return []
        if min_match > 1 and mode == "and":
            raise ValueError("min_match applies to mode='or'")
        all_terms = list(dict.fromkeys(t for g in groups for t in g))
        has_filter = filter_ids is not None or filter_sql is not None
        if distributed:
            dfs = self._global_dfs_dist(all_terms)
        else:
            fetched = self._fetch(all_terms)
            dfs = self.global_dfs(fetched, all_terms)
        if mode == "and" and any(all(dfs[t] == 0 for t in g)
                                 for g in groups):
            return []
        idfs_g = [b * bm25_idf(self.n_docs, max(dfs[t] for t in g))
                  if any(dfs[t] > 0 for t in g) else 0.0
                  for g, b in zip(groups, boosts)]
        if distributed:
            return self._topk_syn_dist(
                groups, idfs_g, k, mode, min_match, after, dfs=dfs,
                use_blockmax=use_blockmax,
                filter_df=(self._routed_filter_df(filter_ids, filter_sql)
                           if has_filter else None))
        seg_rows = sorted(self._rows_by_seg(fetched).items())
        # resolve the allow-list (a Spark job) only once some segment
        # actually carries the query's terms — all-miss is [] for free
        flt = (self._filter_by_seg(filter_ids, filter_sql)
               if has_filter and seg_rows else None)
        _no_allow = np.empty(0, dtype=np.int64)
        by_seg = self._deleted_by_seg()
        parts: List[Tuple[np.ndarray, np.ndarray]] = []
        for seg, rows in seg_rows:
            by_term = {r["term"]: r for r in rows}
            groups_rows = [[by_term[t] for t in g if t in by_term]
                           for g in groups]
            d = by_seg.get(int(seg)) if by_seg else None
            a = flt.get(int(seg), _no_allow) if flt is not None else None
            parts.append(score_segment_groups(
                groups_rows, idfs_g, k, mode, self.avgdl,
                min_match=min_match, deleted=d, allowed=a, after=after,
                use_blockmax=use_blockmax,
                bound_scale=self._bound_scale(seg)))
        return W.topk_merge(parts, k)

    def _topk_syn_dist(self, groups: List[List[str]],
                       idfs_g: List[float], k: int, mode: str,
                       min_match: int, after,
                       dfs: Optional[Dict[str, int]] = None,
                       use_blockmax="auto",
                       filter_df: Optional[DataFrame] = None
                       ) -> List[Tuple[int, float]]:
        """Distributed synonym scoring: the per-segment group kernel runs
        inside applyInPandas (tombstones/filters cogrouped as usual),
        only per-segment top-k partials reach the driver. `dfs` (already
        computed by the caller) prunes dead terms from the scan — a df=0
        member must not cost its term-bucket scan (P4 discipline)."""
        all_terms = list(dict.fromkeys(
            t for g in groups for t in g
            if dfs is None or dfs.get(t, 0) > 0))
        if not all_terms:
            return []
        avgdl, kk, md, mm = self.avgdl, k, mode, min_match
        ubm = use_blockmax
        scales = {int(s): self._bound_scale(s) for s in self.pack_avgdl}
        has_filter = filter_df is not None

        def run(key, pdf: pd.DataFrame,
                ddf: Optional[pd.DataFrame] = None) -> pd.DataFrame:
            by_term = {r["term"]: r for r in pdf.to_dict("records")}
            deleted, allowed = _split_aux(ddf, has_filter)
            groups_rows = [[by_term[t] for t in g if t in by_term]
                           for g in groups]
            d, s = score_segment_groups(groups_rows, idfs_g, kk, md,
                                        avgdl, min_match=mm,
                                        deleted=deleted, allowed=allowed,
                                        after=after, use_blockmax=ubm,
                                        bound_scale=scales.get(
                                            int(key[0]), 1.0))
            return pd.DataFrame({"doc_id": d, "score": s})

        grouped = (self.postings_df(all_terms).select(*QUERY_COLS)
                   .groupBy("seg"))
        schema = "doc_id long, score double"
        if not self.delete_files and not has_filter:
            scored = grouped.applyInPandas(
                lambda key, pdf: run(key, pdf, None), schema)
        else:
            scored = grouped.cogroup(
                self._seg_aux_grouped(filter_df)).applyInPandas(run, schema)
        out = scored.toPandas()
        return W.topk_merge([(out["doc_id"].to_numpy(np.int64),
                              out["score"].to_numpy(np.float64))], k)

    def count_min_match(self, query: str, min_match: int,
                        distributed: bool = False, filter_ids=None,
                        filter_sql: Optional[str] = None) -> int:
        return int(self.search_min_match_ids(
            query, min_match, distributed=distributed,
            filter_ids=filter_ids, filter_sql=filter_sql).size)

    def search_min_match(self, query: str, min_match: int,
                         distributed: bool = False, filter_ids=None,
                         filter_sql: Optional[str] = None) -> List[str]:
        """Min-should-match query → doc names (urls), ascending docID."""
        return self._urls_for_ids(self.search_min_match_ids(
            query, min_match, distributed=distributed,
            filter_ids=filter_ids, filter_sql=filter_sql))

    # ---------------------------------------------------- boolean NOT ----
    def search_and_not_ids(self, query: str, exclude: str,
                           distributed: bool = False) -> np.ndarray:
        """AND-NOT: docs matching ALL of `query`'s terms and NONE of
        `exclude`'s (ascending docID). Completes the boolean algebra the
        reference stops short of (do_query.py is AND-only). Both paths
        subtract per segment with the sorted-mask kernel — the exclusion
        set is never unioned globally, so a stop-word exclude term costs
        its per-segment postings, not a giant driver-side set."""
        inc = query_terms(query)
        exc = query_terms(exclude)
        if not inc:
            return np.empty(0, dtype=np.int64)
        if not exc:
            return self.search_and_ids(query, distributed=distributed)
        if distributed:
            dfs = self._global_dfs_dist(inc)
            if any(dfs[t] == 0 for t in inc):  # P4 short-circuit
                return np.empty(0, dtype=np.int64)
            out = (self._matching_ids_dist(inc, "and", exclude=exc)
                   .orderBy("doc_id").toPandas())
            return out["doc_id"].to_numpy(np.int64)
        fetched = self._fetch(list(dict.fromkeys(inc + exc)))
        dfs = self.global_dfs(fetched, inc)
        if any(dfs[t] == 0 for t in inc):
            return np.empty(0, dtype=np.int64)
        exc_set = set(exc)
        n_inc = len(set(inc))
        parts = []
        for seg, rows in sorted(self._rows_by_seg(fetched).items()):
            inc_rows = [r for r in rows if r["term"] not in exc_set]
            if len(inc_rows) < n_inc:
                continue  # an include term missing in this segment
            ids = I.intersect_packed(inc_rows)
            exc_rows = [r for r in rows if r["term"] in exc_set]
            if exc_rows and ids.size:
                ids = _mask_deleted(ids, I.union_sorted(
                    [codec.unpack_docs(r["docs"], int(r["df"]))
                     for r in exc_rows]))
            parts.append(ids)
        if not parts:
            return np.empty(0, dtype=np.int64)
        return _mask_deleted(np.concatenate(parts), self._deleted())

    def count_and_not(self, query: str, exclude: str,
                      distributed: bool = False) -> int:
        if distributed:
            inc, exc = query_terms(query), query_terms(exclude)
            if not inc:
                return 0
            dfs = self._global_dfs_dist(inc)
            if any(dfs[t] == 0 for t in inc):
                return 0
            out = (self._matching_ids_dist(inc, "and", exclude=exc or None)
                   .agg(F.count("doc_id").alias("total")).collect())
            return int(out[0]["total"] or 0)
        return int(self.search_and_not_ids(query, exclude).size)

    def search_and_not(self, query: str, exclude: str,
                       distributed: bool = False) -> List[str]:
        """AND-NOT query → doc names (urls), ascending docID order."""
        return self._urls_for_ids(self.search_and_not_ids(
            query, exclude, distributed=distributed))

    # ------------------------------------------------------------ prefix --
    def expand_prefix(self, prefix: str,
                      max_terms: Optional[int] = None) -> List[str]:
        """Dictionary terms starting with `prefix` (a single [a-z0-9]+ run
        under the reference tokenizer; anything else expands to nothing).
        With max_terms set, keeps the highest-global-df terms (ties broken
        by term) — Lucene's maxExpansions semantics, bounding query cost on
        a huge dictionary; max_terms=None is the exact multi-term OR.

        Scale: tb is a crc32 hash bucket (builder.py:64), so a prefix scan
        cannot partition-prune — but postings are term-sorted within every
        (seg,tb) file, so the pushed StartsWith filter skips row groups via
        parquet min/max stats on `term`, and only (term, df) are read.
        A fully-preloaded index expands driver-side with no Spark job."""
        p = prefix.strip().lower()
        if not p or ASCII_TOKEN.fullmatch(p) is None:
            return []
        return self._expand_terms(F.col("term").startswith(p),
                                  lambda s: s.str.startswith(p), max_terms)

    def _expand_terms(self, cond, pd_mask, max_terms: Optional[int]
                      ) -> List[str]:
        """Shared dictionary-expansion tail (prefix/wildcard): aggregate
        global df per matching term; with max_terms, keep the highest-df
        terms (ties by term) — Lucene's maxExpansions. A fully-preloaded
        index expands driver-side with no Spark job."""
        if self._cache_complete and self._cache_pdf is not None:
            sub = self._cache_pdf[pd_mask(self._cache_pdf["term"])]
            agg = sub.groupby("term", sort=False)["df"].sum()
            if max_terms is None:
                return sorted(agg.index)
            agg = agg.reset_index()
            agg = agg.sort_values(["df", "term"],
                                  ascending=[False, True],
                                  kind="stable")
            return list(agg["term"].head(max_terms))
        agg = (self._postings
               .filter(cond)
               .groupBy("term").agg(F.sum("df").alias("df")))
        if max_terms is None:
            return sorted(r["term"]
                          for r in agg.select("term").collect())
        agg = agg.orderBy(F.desc("df"), F.asc("term")).limit(max_terms)
        return [r["term"] for r in agg.select("term").collect()]

    # ---------------------------------------------------------- wildcard --
    _WILDCARD_OK = re.compile(r"[a-z0-9*?]+")

    def expand_wildcard(self, pattern: str,
                        max_terms: Optional[int] = None) -> List[str]:
        """Dictionary terms matching a Lucene-style wildcard pattern over
        the reference token alphabet: `*` = any run of [a-z0-9] (incl.
        empty), `?` = exactly one. A pattern with no wildcard degenerates
        to an existence probe for the exact term. max_terms keeps the
        highest-global-df expansions (ties by term), like expand_prefix.

        Scale: the literal prefix before the first wildcard is pushed as
        a StartsWith filter — postings files are term-sorted, so parquet
        min/max stats skip row groups; a leading-wildcard pattern scans
        the whole dictionary (the documented Lucene cost cliff) but still
        reads only (term, df) columns."""
        p = pattern.strip().lower()
        if not p or self._WILDCARD_OK.fullmatch(p) is None:
            return []
        rx = "".join("[a-z0-9]*" if ch == "*" else
                     ("[a-z0-9]" if ch == "?" else ch) for ch in p)
        lit = re.match(r"[a-z0-9]*", p).group(0)
        cond = F.col("term").rlike(f"^{rx}$")
        if lit:
            cond = F.col("term").startswith(lit) & cond
        return self._expand_terms(cond, lambda s: s.str.fullmatch(rx),
                                  max_terms)

    def expand_regex(self, pattern: str,
                     max_terms: Optional[int] = None) -> List[str]:
        """Dictionary terms fully matching a regular expression (Lucene
        RegexpQuery shape; the portable subset — literals, classes,
        alternation, quantifiers — valid in BOTH Python re and Java
        regex, since the cache path runs the former and the scan path
        Spark's rlike). Anchored to the whole term. The pattern is NOT
        case-folded (lowering would invert escape classes like \\D→\\d);
        index terms are lowercase, so write lowercase literals. Invalid
        patterns (for either engine) expand to nothing, never crash the
        scan. A literal prefix (extracted from the pattern head) is
        pushed as StartsWith for row-group skipping; otherwise this is
        the full 2-column dictionary scan, like any leading-wildcard
        query."""
        p = pattern.strip()
        if not p:
            return []
        try:
            re.compile(p)
        except re.error:
            return []
        try:
            # rlike executes java.util.regex — probe Java validity too,
            # or a Python-only construct ((?P<x>…), ab{) would surface as
            # a mid-job PatternSyntaxException instead of "no matches"
            self.spark._jvm.java.util.regex.Pattern.compile(p)
        except Exception:
            return []
        lit = re.match(r"[a-z0-9]*", p).group(0)
        if "|" in p:
            # a top-level alternation makes ANY literal head unsound
            # ("abc|def" must not be pruned to abc*); scoping is not worth
            # parsing — drop the prefix, keep the full dictionary scan
            lit = ""
        elif len(lit) < len(p) and p[len(lit)] in "?*{":
            # a quantifier right after the literal head makes its last
            # char optional — drop it to keep the prefix sound
            lit = lit[:-1]
        cond = F.col("term").rlike(f"^(?:{p})$")
        if lit:
            cond = F.col("term").startswith(lit) & cond
        rx = re.compile(p)
        return self._expand_terms(
            cond, lambda s: s.map(lambda t: rx.fullmatch(t) is not None),
            max_terms)

    # --------------------------------------------------------------- fuzzy --
    def expand_fuzzy(self, term: str, max_edits: int = 2,
                     prefix_len: int = 0,
                     max_terms: Optional[int] = None) -> List[str]:
        """Dictionary terms within Levenshtein distance `max_edits` of
        `term` (Lucene FuzzyQuery shape, transpositions=false: plain
        Levenshtein so Spark's levenshtein(), DuckDB's levenshtein() and
        the numpy DP all agree byte-for-byte). `max_edits` ∈ {0,1,2}
        exactly as Lucene bounds it (0 degenerates to an existence
        probe). `prefix_len` > 0 requires the first prefix_len chars to
        match exactly — distance is still computed over the FULL strings
        (simpler than Lucene's suffix automaton, SQL-reproducible) — and
        turns the dictionary scan into a StartsWith row-group skip.
        max_terms keeps the highest-global-df expansions (ties by term),
        the same maxExpansions convention as prefix/wildcard (Lucene
        FuzzyQuery itself prefers *closest* terms; df is this engine's
        uniform cost bound across all multi-term queries).

        Scale: the scan reads only (term, df); the length band
        |len(t)-len(q)| ≤ k and the thresholded levenshtein (early-exit
        banded DP in the JVM, -1 past the threshold) bound per-row cost;
        with prefix_len the StartsWith pushdown skips row groups via
        parquet min/max on the term-sorted postings. A fully-preloaded
        index expands driver-side with no Spark job."""
        if not 0 <= max_edits <= 2:
            raise ValueError("max_edits must be 0, 1 or 2 "
                             f"(got {max_edits})")
        t = term.strip().lower()
        if not t or ASCII_TOKEN.fullmatch(t) is None:
            return []
        k = max_edits
        prefix = t[:prefix_len] if prefix_len > 0 else ""
        m = len(t)
        cond = (F.length(F.col("term")).between(m - k, m + k)
                & (F.levenshtein(F.col("term"), F.lit(t), k) >= 0))
        if prefix:
            cond = F.col("term").startswith(prefix) & cond
        return self._expand_terms(
            cond, lambda s: _fuzzy_mask(s, t, k, prefix), max_terms)

    def search_fuzzy_ids(self, term: str, max_edits: int = 2,
                         prefix_len: int = 0, distributed: bool = False,
                         max_terms: Optional[int] = None) -> np.ndarray:
        """Docs containing ANY term within `max_edits` of `term`
        (ascending docID): dictionary expansion + the OR machinery."""
        terms = self.expand_fuzzy(term, max_edits=max_edits,
                                  prefix_len=prefix_len,
                                  max_terms=max_terms)
        if not terms:
            return np.empty(0, dtype=np.int64)
        if distributed:
            return self._search_or_ids_dist(terms)
        return self._or_ids_local(terms)

    def count_fuzzy(self, term: str, max_edits: int = 2,
                    prefix_len: int = 0, distributed: bool = False,
                    max_terms: Optional[int] = None) -> int:
        return int(self.search_fuzzy_ids(
            term, max_edits=max_edits, prefix_len=prefix_len,
            distributed=distributed, max_terms=max_terms).size)

    def search_fuzzy(self, term: str, max_edits: int = 2,
                     prefix_len: int = 0, distributed: bool = False,
                     max_terms: Optional[int] = None) -> List[str]:
        """Fuzzy query → doc names (urls), ascending docID order."""
        return self._urls_for_ids(self.search_fuzzy_ids(
            term, max_edits=max_edits, prefix_len=prefix_len,
            distributed=distributed, max_terms=max_terms))

    def suggest(self, term: str, k: int = 5, max_edits: int = 2,
                prefix_len: int = 0) -> List[Tuple[str, int, int]]:
        """Spell suggestions ("did you mean") — the Lucene
        DirectSpellChecker shape: dictionary terms within `max_edits`
        full-string Levenshtein distance of `term` (excluding `term`
        itself), ranked by (distance asc, global df desc, term asc),
        top k as (term, distance, df) tuples. Reuses the fuzzy
        machinery: length-band + optional exact-prefix pushdown on the
        2-column dictionary scan (JVM levenshtein gives the distance),
        or the candidate-vectorized numpy DP when the index is
        preloaded. SQL-reproducible: plain Levenshtein, so DuckDB's
        levenshtein() agrees byte-for-byte."""
        if not 0 <= max_edits <= 2:
            raise ValueError("max_edits must be 0, 1 or 2 "
                             f"(got {max_edits})")
        t = term.strip().lower()
        if not t or ASCII_TOKEN.fullmatch(t) is None or k <= 0:
            return []
        prefix = t[:prefix_len] if prefix_len > 0 else ""
        if self._cache_complete and self._cache_pdf is not None:
            pdf = self._cache_pdf
            idx, dist = _fuzzy_dp(pdf["term"].reset_index(drop=True),
                                  t, max_edits, prefix)
            keep = dist <= max_edits
            idx, dist = idx[keep], dist[keep]
            if idx.size == 0:
                return []
            sub = pd.DataFrame({
                "term": pdf["term"].to_numpy(dtype=object)[idx],
                "df": pdf["df"].to_numpy(np.int64)[idx],
                "distance": dist})
            agg = (sub.groupby(["term", "distance"], sort=False,
                               as_index=False)["df"].sum())
            agg = agg[agg["term"] != t]
            agg = agg.sort_values(["distance", "df", "term"],
                                  ascending=[True, False, True],
                                  kind="stable").head(k)
            return [(str(r.term), int(r.distance), int(r.df))
                    for r in agg.itertuples()]
        m = len(t)
        dcol = F.levenshtein(F.col("term"), F.lit(t))
        cond = (F.length(F.col("term")).between(m - max_edits,
                                                m + max_edits)
                & (F.levenshtein(F.col("term"), F.lit(t),
                                 max_edits) >= 0)
                & (F.col("term") != t))
        if prefix:
            cond = F.col("term").startswith(prefix) & cond
        rows = (self._postings.filter(cond)
                .groupBy("term").agg(F.sum("df").alias("df"))
                .select("term", dcol.alias("distance"), "df")
                .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
                .limit(k).collect())
        return [(r["term"], int(r["distance"]), int(r["df"]))
                for r in rows]

    def mlt_terms(self, text: str, max_query_terms: int = 25,
                  min_tf: int = 1, min_df: int = 1) -> List[str]:
        """More-like-this query-term selection (Lucene
        MoreLikeThis.retrieveInterestingTerms): tokenize `text` with the
        index's own analyzer, score each distinct term by
        tf_in_text · idf (the BM25 idf over the CORPUS df), and keep the
        top `max_query_terms` by (score desc, term asc). min_tf / min_df
        drop noise terms exactly as Lucene's minTermFreq/minDocFreq.
        The score is rounded to 6 decimals before ranking so the SQL
        oracle's ln() agrees on ties."""
        from collections import Counter

        toks = [w.lower() for w in ASCII_TOKEN.findall(text)]
        tfs = {w: c for w, c in Counter(toks).items() if c >= min_tf}
        if not tfs:
            return []
        terms = sorted(tfs)
        fetched = self._fetch(terms)
        dfs = self.global_dfs(fetched, terms)
        scored = [(round(tfs[w] * bm25_idf(self.n_docs, dfs[w]), 6), w)
                  for w in terms if dfs[w] >= max(1, min_df)]
        scored.sort(key=lambda x: (-x[0], x[1]))
        return [w for _, w in scored[:max_query_terms]]

    def more_like_this(self, text: str, k: int = 10,
                       max_query_terms: int = 25, min_tf: int = 1,
                       min_df: int = 1,
                       exclude_doc: Optional[int] = None,
                       distributed: bool = False
                       ) -> List[Tuple[int, float]]:
        """Lucene MoreLikeThis: rank documents similar to `text` —
        select its most characteristic terms (mlt_terms), then ordinary
        disjunctive BM25 top-k over them. exclude_doc drops the source
        document (fetch k+1, remove, trim — exact because at most one
        doc is excluded, so the global top-k among the rest is a subset
        of the top-(k+1))."""
        terms = self.mlt_terms(text, max_query_terms=max_query_terms,
                               min_tf=min_tf, min_df=min_df)
        if not terms or k <= 0:
            return []
        kk = k + 1 if exclude_doc is not None else k
        top = self.topk(" ".join(terms), k=kk, distributed=distributed)
        if exclude_doc is not None:
            top = [(d, s) for d, s in top if d != int(exclude_doc)][:k]
        return top

    def search_regex_ids(self, pattern: str, distributed: bool = False,
                         max_terms: Optional[int] = None) -> np.ndarray:
        """Docs containing ANY term fully matching the regex (ascending
        docID): dictionary expansion + the OR machinery."""
        terms = self.expand_regex(pattern, max_terms=max_terms)
        if not terms:
            return np.empty(0, dtype=np.int64)
        if distributed:
            return self._search_or_ids_dist(terms)
        return self._or_ids_local(terms)

    def count_regex(self, pattern: str, distributed: bool = False,
                    max_terms: Optional[int] = None) -> int:
        return int(self.search_regex_ids(
            pattern, distributed=distributed, max_terms=max_terms).size)

    def search_wildcard_ids(self, pattern: str, distributed: bool = False,
                            max_terms: Optional[int] = None) -> np.ndarray:
        """Docs containing ANY term matching the wildcard pattern
        (ascending docID): dictionary expansion + the OR machinery, same
        as prefix queries."""
        terms = self.expand_wildcard(pattern, max_terms=max_terms)
        if not terms:
            return np.empty(0, dtype=np.int64)
        if distributed:
            return self._search_or_ids_dist(terms)
        return self._or_ids_local(terms)

    def count_wildcard(self, pattern: str, distributed: bool = False,
                       max_terms: Optional[int] = None) -> int:
        return int(self.search_wildcard_ids(
            pattern, distributed=distributed, max_terms=max_terms).size)

    def search_wildcard(self, pattern: str, distributed: bool = False,
                        max_terms: Optional[int] = None) -> List[str]:
        """Wildcard query → doc names (urls), ascending docID order."""
        return self._urls_for_ids(self.search_wildcard_ids(
            pattern, distributed=distributed, max_terms=max_terms))

    def search_prefix_ids(self, prefix: str, distributed: bool = False,
                          max_terms: Optional[int] = None) -> np.ndarray:
        """Docs containing ANY term starting with `prefix` (ascending
        docID): dictionary expansion + the OR machinery. The distributed
        path unions per-segment on the executors — the expansion list is
        pushed as an In() filter exactly like a written-out OR query."""
        terms = self.expand_prefix(prefix, max_terms=max_terms)
        if not terms:
            return np.empty(0, dtype=np.int64)
        if distributed:
            return self._search_or_ids_dist(terms)
        return self._or_ids_local(terms)

    def count_prefix(self, prefix: str, distributed: bool = False,
                     max_terms: Optional[int] = None) -> int:
        return int(self.search_prefix_ids(
            prefix, distributed=distributed, max_terms=max_terms).size)

    def search_prefix(self, prefix: str, distributed: bool = False,
                      max_terms: Optional[int] = None) -> List[str]:
        """Prefix query → doc names (urls), ascending docID order."""
        return self._urls_for_ids(self.search_prefix_ids(
            prefix, distributed=distributed, max_terms=max_terms))

    def count(self, query: str, distributed: bool = False,
              filter_ids=None, filter_sql: Optional[str] = None) -> int:
        has_filter = filter_ids is not None or filter_sql is not None
        if distributed:
            return self._count_and_dist(
                query_terms(query),
                filter_df=(self._routed_filter_df(filter_ids, filter_sql)
                           if has_filter else None))
        return int(self.search_and_ids(query, filter_ids=filter_ids,
                                       filter_sql=filter_sql).size)

    def search(self, query: str, distributed: bool = False) -> List[str]:
        """AND query → doc names (urls), ascending docID order
        (search_engine.py:49-55 semantics)."""
        ids = self.search_and_ids(query, distributed=distributed)
        return self._urls_for_ids(ids)

    def _urls_for_ids(self, ids: np.ndarray) -> List[str]:
        if ids.size == 0:
            return []
        if ids.size <= IN_LIST_MAX:
            # small result: In-list pushdown prunes the docmap scan (S8)
            rows = (self._docmap.filter(F.col("doc_id").isin(ids.tolist()))
                    .select("doc_id", "url").collect())
        else:
            # large result: a 100k+-element In expression is quadratic to
            # plan — join against the id set instead (broadcast: the id
            # frame is the small side)
            ids_df = self.spark.createDataFrame(
                pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64)}))
            rows = (self._docmap.join(F.broadcast(ids_df), "doc_id")
                    .select("doc_id", "url").collect())
        name = {r["doc_id"]: r["url"] for r in rows}
        return [name[int(i)] for i in ids]

    # ------------------------------------------------------------ phrase --
    def _phrase_terms(self, phrase: str) -> List[str]:
        if not self.stats.get("has_positions"):
            raise ValueError(
                "phrase queries need a positional index — "
                "build_index(..., with_positions=True)")
        return query_terms(phrase, dedup=False)  # order + dups significant

    def search_phrase_ids(self, phrase: str, distributed="auto"
                          ) -> np.ndarray:
        """Docs containing the EXACT consecutive token sequence (after the
        reference tokenizer: ASCII runs, lowercased). Extension beyond the
        reference's boolean protocol — see operators/phrase.py for the
        kernel; per-segment intersect + block-selective position decode.

        distributed: True / False force a path; the default 'auto' picks
        per query from corpus size + a df probe
        (_positional_auto_distributed) — results identical either way."""
        terms = self._phrase_terms(phrase)
        route = self._positional_route(distributed)
        if route is None:
            route = self._positional_auto_distributed(terms)
        if route:
            return self._positional_ids_dist(terms, P.phrase_match_ids)
        return self._positional_ids_local(terms, P.phrase_match_ids)

    @staticmethod
    def _near_kernel(slop: int, in_order: bool = True):
        """The ONE place the proximity kernel closure (and its slop
        validation) lives — search_near_ids / count_near / search_df all
        route through it so every entry path rejects a negative slop
        identically instead of silently returning empty."""
        if slop < 0:
            raise ValueError("slop must be >= 0")
        match = P.near_match_ids if in_order else P.near_unordered_match_ids

        def kernel(rows, ts, deleted=None):
            return match(rows, ts, slop, deleted=deleted)

        return kernel

    def search_near_ids(self, query: str, slop: int,
                        distributed="auto",
                        in_order: bool = True) -> np.ndarray:
        """Proximity query (Lucene SpanNearQuery): docs where the query
        tokens occur within a span of ≤ len(terms)-1+slop positions.
        in_order=True requires the tokens in query order at strictly
        increasing positions (slop=0 is exactly the consecutive phrase;
        greedy-chain kernel, operators/phrase.py:near_match_ids);
        in_order=False accepts any arrangement of the DISTINCT terms
        inside the window (anchor-scan kernel, near_unordered_match_ids).
        distributed: True/False force a path; 'auto' (default) picks per
        query — see search_phrase_ids."""
        kernel = self._near_kernel(slop, in_order)
        terms = self._phrase_terms(query)
        route = self._positional_route(distributed)
        if route is None:
            route = self._positional_auto_distributed(terms)
        if route:
            return self._positional_ids_dist(terms, kernel)
        return self._positional_ids_local(terms, kernel)

    def count_near(self, query: str, slop: int,
                   distributed=False, in_order: bool = True) -> int:
        route = self._positional_route(distributed)
        if route is None:
            route = self._positional_auto_distributed(
                self._phrase_terms(query))
        if route:
            return self._count_positional_dist(
                self._phrase_terms(query),
                self._near_kernel(slop, in_order))
        return int(self.search_near_ids(query, slop, distributed=False,
                                        in_order=in_order).size)

    def search_near(self, query: str, slop: int,
                    distributed: bool = False,
                    in_order: bool = True) -> List[str]:
        """Proximity query → doc names (urls), ascending docID order."""
        return self._urls_for_ids(self.search_near_ids(
            query, slop, distributed=distributed, in_order=in_order))

    # ------------------------------------------------------------ facets --
    def facet_counts(self, query: str, docs: DataFrame, facet_col: str,
                     mode: str = "and", exclude: str = "",
                     id_col: str = "doc_id") -> DataFrame:
        """Search-engine faceting (the Solr/ES terms-aggregation shape):
        value counts of `facet_col` over the docs matching `query`, as a
        lazy DataFrame (facet, n). The distributed id set joins the docs
        table reading only (id_col, facet_col) — column pruning — and the
        groupBy count is map-side combined, so what crosses the final
        exchange is one row per distinct facet value per partition."""
        ids = self.search_df(query, mode=mode, exclude=exclude) \
            .select("doc_id")
        j = ids.join(
            docs.select(F.col(id_col).cast("long").alias("doc_id"),
                        F.col(facet_col).alias("facet")), "doc_id")
        return j.groupBy("facet").agg(F.count(F.lit(1)).alias("n"))

    def facet_range(self, query: str, docs: DataFrame, value_col: str,
                    edges: List[float], mode: str = "and",
                    exclude: str = "", id_col: str = "doc_id"
                    ) -> DataFrame:
        """Range faceting (the ES range-aggregation shape): counts of
        query-matching docs per half-open [lo, hi) bin of `value_col`,
        with bin i = [edges[i], edges[i+1]). Values outside
        [edges[0], edges[-1]) are excluded and empty bins are absent
        (the GROUP BY shape — callers wanting zero rows outer-join a
        bins frame). Lazy DataFrame (bin, lo, hi, n).

        Plan shape mirrors facet_counts: the distributed id set joins a
        2-column projection of the docs table, the bin CASE chain is
        pure JVM (whole-stage codegen), and the groupBy count is
        map-side combined — one row per seen bin per partition crosses
        the exchange."""
        if len(edges) < 2 or any(float(edges[i]) >= float(edges[i + 1])
                                 for i in range(len(edges) - 1)):
            raise ValueError("edges must be >= 2 strictly increasing "
                             f"values (got {edges})")
        ids = self.search_df(query, mode=mode, exclude=exclude) \
            .select("doc_id")
        j = ids.join(docs.select(F.col(id_col).cast("long").alias("doc_id"),
                                 F.col(value_col).cast("double").alias("v")),
                     "doc_id")
        v = F.col("v")
        binned = None
        for i in range(len(edges) - 1):
            cond = (v >= float(edges[i])) & (v < float(edges[i + 1]))
            binned = (F.when(cond, i) if binned is None
                      else binned.when(cond, i))
        lo_arr = F.array(*[F.lit(float(e)) for e in edges[:-1]])
        hi_arr = F.array(*[F.lit(float(e)) for e in edges[1:]])
        return (j.select(binned.cast("long").alias("bin"))
                .where(F.col("bin").isNotNull())
                .groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
                .select("bin",
                        F.element_at(lo_arr, F.col("bin").cast("int") + 1
                                     ).alias("lo"),
                        F.element_at(hi_arr, F.col("bin").cast("int") + 1
                                     ).alias("hi"),
                        "n"))

    def search_sorted(self, query: str, by: str = "doc_len", k: int = 10,
                      ascending: bool = False,
                      docs: Optional[DataFrame] = None,
                      id_col: str = "doc_id", mode: str = "and",
                      exclude: str = "") -> DataFrame:
        """Sort-by-field retrieval (the Lucene Sort/SortField shape): the
        top-k query matches ordered by a document attribute instead of
        BM25 — "newest first", "longest first". `by` is a docmap column
        (doc_id, url, doc_len) when docs is None, else a column of the
        supplied docs table. Ties break by doc_id ascending, so the k-th
        boundary is deterministic. Lazy DataFrame (doc_id, <by>).

        Scale shape: the distributed id set joins a 2-column projection
        and orderBy+limit compiles to TakeOrderedAndProject — per-
        partition top-k heaps, k rows per partition to the driver side
        of the exchange, never a full sort materialization."""
        ids = self.search_df(query, mode=mode, exclude=exclude) \
            .select("doc_id")
        src = (self.docmap_df(live=True) if docs is None else docs)
        j = ids.join(
            src.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.col(by).alias(by)), "doc_id")
        order = [F.asc(by) if ascending else F.desc(by), F.asc("doc_id")]
        return j.orderBy(*order).limit(int(k))

    def scores_df(self, query: str, mode: str = "or",
                  min_match: int = 1) -> DataFrame:
        """EVERY matching doc with its BM25 score as a LAZY DataFrame
        (doc_id, score) — the score-the-match-set surface (reranker
        features, score exports, collapse/grouping) as opposed to topk's
        driver-side top-k list. Same per-segment scoring kernel as the
        distributed topk, same accumulation order (scores are
        bit-identical to topk's), no truncation anywhere: each segment
        task emits its full scored match set and NOTHING reaches the
        driver — sink it or feed downstream joins.

        Scale shape: one pruned postings scan (tb partitions + term
        pushdown), per-segment applyInPandas kernel, tombstones cogrouped
        per segment. Block-max pruning is irrelevant by construction
        (nothing is truncated, every match is emitted)."""
        if min_match > 1 and mode == "and":
            raise ValueError("min_match applies to mode='or' (mode='and' "
                             "already requires every term)")
        terms = query_terms(query)
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not terms:
            return empty
        dfs = self._global_dfs_dist(terms)
        live = [t for t in terms if dfs[t] > 0]
        if not live or (mode == "and" and len(live) < len(terms)) \
                or (mode != "and" and len(live) < min_match):
            return empty
        ts = terms if mode == "and" else live
        idfs = self._idfs(dfs)
        avgdl, md, mm, nq = self.avgdl, mode, min_match, len(ts)
        scales = {int(s): self._bound_scale(s) for s in self.pack_avgdl}
        no_k = 1 << 62  # larger than any match set — disables truncation

        def run(key, pdf: pd.DataFrame,
                ddf: Optional[pd.DataFrame] = None) -> pd.DataFrame:
            by_term = {r["term"]: r for r in pdf.to_dict("records")}
            deleted, _ = _split_aux(ddf, False)
            rows = [by_term[t] for t in ts if t in by_term]
            if not rows:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")})
            d, s = score_segment_rows(rows, idfs, nq, no_k, md, False,
                                      avgdl, scales.get(int(key[0]), 1.0),
                                      deleted=deleted, min_match=mm)
            return pd.DataFrame({"doc_id": d, "score": s})

        grouped = self.postings_df(ts).select(*QUERY_COLS).groupBy("seg")
        schema = "doc_id long, score double"
        if not self.delete_files:
            return grouped.applyInPandas(
                lambda key, pdf: run(key, pdf, None), schema)
        return grouped.cogroup(self._seg_aux_grouped(None)).applyInPandas(
            run, schema)

    def search_collapse(self, query: str, docs: DataFrame,
                        collapse_col: str, k: int = 10, mode: str = "or",
                        min_match: int = 1, id_col: str = "doc_id"
                        ) -> DataFrame:
        """Field collapsing (the Lucene grouping / ES `collapse` shape):
        the top-k matches ranked by BM25, keeping only the BEST-scoring
        doc per distinct `collapse_col` value — "one result per site".
        Group rank = its best member's score; ties break by doc_id
        ascending at both levels, so results are deterministic. Lazy
        DataFrame (doc_id, score, collapse) in (score desc, doc_id asc)
        order.

        Scale shape: collapse is intrinsically a match-set aggregation
        (the winning doc of a group may sit below any per-segment top-k
        cut, so no index-side truncation is sound — same reason ES
        collapses in the collector over all shard matches). scores_df
        emits per-segment scored matches with no driver hop, a 2-column
        projection of `docs` supplies the collapse key, and the
        best-per-group reduction is groupBy + max_by — a declarative
        aggregate with MAP-SIDE partial combine, so one row per group per
        partition crosses the exchange (a row_number window would sort
        whole partitions instead). The final orderBy+limit compiles to
        TakeOrderedAndProject."""
        scored = self.scores_df(query, mode=mode, min_match=min_match)
        j = scored.join(
            docs.select(F.col(id_col).cast("long").alias("doc_id"),
                        F.col(collapse_col).alias("collapse")), "doc_id")
        best = (j.groupBy("collapse")
                .agg(F.max_by(
                    F.struct("doc_id", "score"),
                    # max over (score asc, doc_id desc) == best by the
                    # (score desc, doc_id asc) result order
                    F.struct(F.col("score"),
                             (-F.col("doc_id")).alias("nd"))).alias("b"))
                .select(F.col("b.doc_id").alias("doc_id"),
                        F.col("b.score").alias("score"), "collapse"))
        return (best.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(int(k)))

    # -------------------------------------------------- term statistics ---
    def term_stats(self, terms: List[str], distributed: bool = False
                   ) -> List[Tuple[str, int, int]]:
        """Collection statistics per term (the Lucene
        CollectionStatistics/TermStatistics surface): (term, df, cf)
        sorted by term, where df = docFreq (docs containing the term)
        and cf = totalTermFreq (total occurrences) — both index-wide,
        pre-tombstone, exactly Lucene's convention. Terms absent from
        the index are omitted.

        Driver path: the pruned (tb partition + term pushdown) postings
        scan / warm cache, tf streams decoded in numpy. distributed=True:
        decode runs inside mapInPandas per (term, segment) row and only
        the per-term aggregate crosses — the 10^12-doc path."""
        ts = sorted({w.lower() for w in terms
                     if w and ASCII_TOKEN.fullmatch(w.lower())})
        if not ts:
            return []
        if distributed:
            scan = self.postings_df(ts).select("term", "df", "tfs")

            def decode(batches):
                for pdf in batches:
                    cf = [int(codec.unpack_stream(b, int(d)).sum())
                          for b, d in zip(pdf["tfs"], pdf["df"])]
                    yield pd.DataFrame({"term": pdf["term"],
                                        "df": pdf["df"].astype("int64"),
                                        "cf": np.asarray(cf, np.int64)})

            rows = (scan.mapInPandas(decode, "term string, df long, cf long")
                    .groupBy("term").agg(F.sum("df").alias("df"),
                                         F.sum("cf").alias("cf"))
                    .collect())
            out = [(r["term"], int(r["df"]), int(r["cf"])) for r in rows]
            return sorted(out)
        agg: Dict[str, List[int]] = {}
        for r in self._fetch(ts):
            d, c = agg.setdefault(r["term"], [0, 0])
            agg[r["term"]][0] = d + int(r["df"])
            agg[r["term"]][1] = c + int(
                codec.unpack_stream(r["tfs"], int(r["df"])).sum())
        return sorted((t, d, c) for t, (d, c) in agg.items())

    # ------------------------------------------------ significant terms ---
    def significant_terms(self, query: Optional[str] = None, k: int = 10,
                          min_fg: int = 1, mode: str = "and",
                          filter_ids=None,
                          filter_sql: Optional[str] = None
                          ) -> List[Tuple[str, int, int, float]]:
        """Significant-terms aggregation (the ES shape): terms
        overrepresented in a FOREGROUND doc set vs the whole corpus,
        scored with JLH = (fg% - bg%) · (fg% / bg%) and returned as the
        top-k (term, fg_df, df, score) by (score desc, term asc). The
        foreground is either the docs matching `query` (mode/and
        semantics as in search) or an explicit allow-list via
        filter_ids/filter_sql (the "what characterizes the docs my
        quality pass flagged?" shape). Background stats are index-wide
        df (pre-tombstone, the Lucene docFreq convention); the
        foreground is resolved against the LIVE docmap.

        Scale shape: ONE full postings scan (term+df+docs columns only —
        tf/dl/position sidecars never read) cogrouped per segment with
        the pseg-routed foreground rows (never broadcast); the
        per-(term, seg) foreground membership count is a vectorized
        sorted-array searchsorted; the global per-term aggregate, JLH
        score and top-k ordering all run JVM-side and exactly k rows
        reach the driver."""
        if (query is None) == (filter_ids is None and filter_sql is None):
            raise ValueError("give exactly one foreground: query OR "
                             "filter_ids/filter_sql")
        if query is not None:
            ids = self.search_df(query, mode=mode).select("doc_id")
            fg = self._routed_filter_df(filter_ids=ids)
        else:
            fg = self._routed_filter_df(filter_ids, filter_sql)
        # the handle paths (FilterHandle / cached filter_sql) hand back an
        # already-persisted frame owned by the handle — don't unpersist it
        own = not (isinstance(filter_ids, FilterHandle)
                   or (filter_sql is not None and filter_ids is None))
        if own:
            fg = fg.persist()
        try:
            if k <= 0:
                return []
            # ONE action resolves count AND (small-fg) ids: collect up to
            # bcast_max+1 ids — a complete result gives the exact count
            # plus the broadcast array the small-fg route needs anyway
            # (formerly a count job THEN a toPandas job over the same
            # persisted frame); an overflow discards the sample and falls
            # back to the count + cogroup shape, so a 10^12-doc foreground
            # still never collects
            import os as _os
            bcast_max = int(_os.environ.get("PSL_SIGTERMS_BCAST_MAX",
                                            "2000000"))
            head = (fg.select("doc_id").limit(bcast_max + 1).toPandas()
                    if bcast_max > 0 else None)
            if head is not None and len(head) <= bcast_max:
                fn = len(head)
                if fn == 0:
                    return []
                allow_np = np.unique(head["doc_id"].to_numpy(np.int64))
                sig = self._significant_df(fg, fn, min_fg, k,
                                           allow_np=allow_np)
            else:
                fn = fg.count()
                if fn == 0:
                    return []
                sig = self._significant_df(fg, fn, min_fg, k)
            rows = sig.collect()
            return [(r["term"], int(r["fg_df"]), int(r["df"]),
                     float(r["score"])) for r in rows]
        finally:
            if own:
                fg.unpersist()

    def _significant_df(self, fg: DataFrame, fn: int, min_fg: int,
                        k: int, allow_np=None) -> DataFrame:
        """The lazy plan behind significant_terms (split out so
        tools/explain_plans.py can audit it): full postings scan pruned
        to (term[, seg, tb], df, docs), foreground membership counted
        per posting row, JVM-side aggregate + JLH score + top-k.

        ADAPTIVE foreground attachment (fn is already known — the caller
        counted the routed foreground):
          * fn <= PSL_SIGTERMS_BCAST_MAX (default 2M): the sorted id set
            is collected and BROADCAST; the postings scan streams map-side
            through one mapInPandas — no foreground explode, no postings
            exchange, no cogroup (the small-fg shape; a 2M-id allow list
            is ~16 MB broadcast).
          * larger fn: per-segment cogroup keyed (seg, tb) — the
            foreground never collects/broadcasts, the 10^12-doc shape.
        Both paths run the identical decode+searchsorted kernel, so the
        result is bit-identical either way (test-enforced)."""
        def fdf_kernel(payloads: np.ndarray, dfs: np.ndarray,
                       allow: np.ndarray) -> np.ndarray:
            # batch decode: ONE varbyte pass per ≤4M-posting chunk
            # (chunked so the transient decoded array stays bounded
            # regardless of segment size), then one searchsorted over
            # the concatenation and a cumsum-diff per-row hit count —
            # no per-term Python loop (was 17 s at 1M docs).
            fdf = np.zeros(dfs.size, dtype=np.int64)
            if not allow.size:
                return fdf
            chunk = 1 << 22
            i = 0
            while i < dfs.size:
                j, acc = i, 0
                while j < dfs.size and (acc == 0
                                        or acc + dfs[j] <= chunk):
                    acc += int(dfs[j])
                    j += 1
                docs, offs = codec.unpack_docs_batch(
                    payloads[i:j], dfs[i:j])
                pos = np.searchsorted(allow, docs)
                pos[pos == allow.size] = allow.size - 1
                hits = np.concatenate(
                    ([0], np.cumsum(allow[pos] == docs)))
                fdf[i:j] = hits[offs[1:]] - hits[offs[:-1]]
                i = j
            return fdf

        import os as _os
        bcast_max = int(_os.environ.get("PSL_SIGTERMS_BCAST_MAX",
                                        "2000000"))
        if allow_np is not None or fn <= bcast_max:
            # allow_np: the caller already collected the id set (one
            # bounded action resolves count + ids — see significant_terms)
            if allow_np is None:
                allow_np = np.unique(
                    fg.select("doc_id").toPandas()["doc_id"]
                    .to_numpy(np.int64))
            allow_bc = self.spark.sparkContext.broadcast(allow_np)

            def run_scan(batches):
                allow = allow_bc.value
                for pdf in batches:
                    yield pd.DataFrame({
                        "term": pdf["term"],
                        "fdf": fdf_kernel(pdf["docs"].to_numpy(object),
                                          pdf["df"].to_numpy(np.int64),
                                          allow),
                        "df": pdf["df"]})

            scored = (self._postings.select("term", "df", "docs")
                      .mapInPandas(run_scan,
                                   "term string, fdf long, df long"))
        else:
            def run(key, pdf: pd.DataFrame, ddf: pd.DataFrame
                    ) -> pd.DataFrame:
                # a segment with NO foreground rows must still emit its
                # (term, fdf=0, df) rows — the global per-term df sums
                # over every segment, foreground or not
                allow = np.unique(ddf.loc[ddf["kind"] == 1, "doc_id"]
                                  .to_numpy(np.int64))
                dfs = pdf["df"].to_numpy(np.int64)
                return pd.DataFrame({
                    "term": pdf["term"].reset_index(drop=True),
                    "fdf": fdf_kernel(pdf["docs"].to_numpy(object),
                                      dfs, allow),
                    "df": dfs})

            # cogroup on (seg, tb), not seg alone: a 1M-doc index has ~4
            # segments, so seg-keyed cogroup caps the full-scan
            # parallelism at 4 tasks; keying by term bucket too gives
            # segs × n_buckets tasks (64 here). The foreground explodes
            # across every tb (any bucket's terms can contain any doc —
            # the duplication is intrinsic to the finer routing and stays
            # a distributed shuffle, never a broadcast).
            scan = self._postings.select("term", "seg", "tb", "df", "docs")
            fg_tb = fg.withColumn(
                "tb", F.explode(F.array(*[F.lit(i)
                                          for i in range(self.n_buckets)]))
            ).withColumn("kind", F.lit(1))
            scored = scan.groupBy("seg", "tb").cogroup(
                fg_tb.groupBy("seg", "tb")).applyInPandas(
                run, "term string, fdf long, df long")
        fgp = F.col("fg_df").cast("double") / F.lit(float(fn))
        bgp = F.col("df").cast("double") / F.lit(float(self.n_docs))
        return (scored.groupBy("term")
                .agg(F.sum("fdf").alias("fg_df"),
                     F.sum("df").alias("df"))
                .filter(F.col("fg_df") >= int(min_fg))
                .select("term", "fg_df", "df",
                        F.round((fgp - bgp) * (fgp / bgp), 6)
                        .alias("score"))
                .orderBy(F.desc("score"), F.asc("term"))
                .limit(int(k)))

    # ---------------------------------------------------------- snippets --
    def search_snippets(self, query: str, docs: DataFrame,
                        window: int = 5, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
        """Keyword-in-context highlighting (the Lucene highlighter shape):
        for every AND-matching doc, the 1-based token position of the
        FIRST query-term hit and a ±window-token snippet around it, as a
        lazy DataFrame (doc_id, first_pos, snippet).

        Spark-first design: the index prunes WHICH docs pay the
        re-tokenize (the lazy distributed id set from search_df joins the
        docs table on doc_id), and the snippet itself is pure JVM
        expressions — lower/split tokens, array_position per term,
        least() for the first hit, slice + array_join for the window — so
        the whole stage is whole-stage-codegen with zero Python. Like
        Lucene, highlighting re-analyzes the stored text rather than
        storing every token in the index."""
        terms = query_terms(query)
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, first_pos long, snippet string")
        ids = self.search_df(query).select("doc_id")
        j = ids.join(docs.select(F.col(id_col).cast("long").alias("doc_id"),
                                 F.col(text_col).alias("text")), "doc_id")
        # findall-THEN-lower, exactly like the index tokenizer
        # (tokenizer.py): lowering the whole text first can manufacture
        # ASCII tokens out of unicode case folds ('İ' → 'i' + U+0307) and
        # shift every position; lower() on matched ASCII runs is safe
        toks = F.transform(
            F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0),
            F.lower)
        j = j.withColumn("toks", toks)
        # array_position = 0 when absent; AND semantics guarantees every
        # term is present, but guard with when() so a tokenizer edge case
        # degrades to NULL instead of position 0
        hits = [F.when(F.array_position("toks", t) > 0,
                       F.array_position("toks", t)) for t in terms]
        p = hits[0] if len(hits) == 1 else F.least(*hits)
        j = j.withColumn("first_pos", p)
        start = F.greatest(F.lit(1), F.col("first_pos") - window)
        length = F.col("first_pos") + window - start + F.lit(1)
        return j.select(
            "doc_id", "first_pos",
            F.array_join(F.slice("toks", start, length), " ")
            .alias("snippet"))

    def _positional_auto_distributed(self, terms: List[str]) -> bool:
        """Adaptive driver-vs-distributed choice for positional queries
        (phrase / NEAR), the decide_blockmax discipline applied one level
        up: decide from METADATA before any position payload moves.

        * n_docs <= PSL_PHRASE_AUTO_MIN_DOCS (default 200k): driver path,
          NO probe job — at small corpora the driver path always wins
          (BENCH/phrase_scale.json) and the probe would only add a job.
        * larger corpora: ONE df-only probe scan (term, df — no payload
          columns cross); if the total postings the driver path would
          have to ship exceeds PSL_PHRASE_AUTO_DIST_MIN (default 2M
          postings), run distributed (executors read their own segments;
          measured 1.9x faster on high-df phrases at 1M docs), else
          fetch-and-run on the driver (selective phrases: the kernel is
          microseconds, job dispatch dominates).
        Either choice returns identical ids — the kernels are shared."""
        import os as _os
        if self.n_docs <= int(_os.environ.get(
                "PSL_PHRASE_AUTO_MIN_DOCS", "200000")):
            return False
        distinct = list(dict.fromkeys(terms))
        if self._cache_has_pos and all(self._term_is_cached(t)
                                       for t in distinct):
            return False  # warm cache: the driver path is free of I/O
        pdf = (self.postings_df(distinct).select("term", "df")
               .groupBy("term").agg(F.sum("df").alias("df")).toPandas())
        dfs = {r["term"]: int(r["df"]) for _, r in pdf.iterrows()}
        if any(dfs.get(t, 0) == 0 for t in distinct):
            return False  # P4: provably empty — let the driver path
        #                   short-circuit without fetching payloads
        total = sum(dfs.values())
        return total > int(_os.environ.get(
            "PSL_PHRASE_AUTO_DIST_MIN", "2000000"))

    def _positional_route(self, distributed) -> bool:
        """Normalize the distributed flag: True/False are explicit caller
        choices; 'auto'/None defer to _positional_auto_distributed."""
        if isinstance(distributed, bool):
            return distributed
        return None  # sentinel: caller must consult the auto probe

    def _positional_ids_local(self, terms: List[str], kernel) -> np.ndarray:
        """Driver-path positional query: fetch the distinct terms' rows
        (position sidecar included), P4 short-circuit on global dfs, then
        run `kernel(rows, terms, deleted=...)` per segment."""
        if not terms:
            return np.empty(0, dtype=np.int64)
        distinct = list(dict.fromkeys(terms))
        fetched = self._fetch_phrase(distinct)
        dfs = self.global_dfs(fetched, distinct)
        if any(dfs[t] == 0 for t in distinct):  # P4 short-circuit
            return np.empty(0, dtype=np.int64)
        dmap = self._deleted_by_seg() or {}
        parts = [kernel(rows, terms, deleted=dmap.get(int(seg)))
                 for seg, rows in sorted(self._rows_by_seg(fetched).items())]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)  # segments are disjoint ascending

    def _phrase_dist_precheck(self, terms: List[str]) -> bool:
        """Shared gate of the distributed phrase paths: global dfs in one
        job, P4 short-circuit — False means the result is provably empty
        without running the kernel."""
        distinct = list(dict.fromkeys(terms))
        dfs = self._global_dfs_dist(distinct)
        return not any(dfs[t] == 0 for t in distinct)

    def _fetch_phrase(self, distinct: List[str]) -> List[dict]:
        """_fetch, but rows must carry the position sidecar: served from
        the cache only when it was preloaded with_positions=True."""
        if self._cache_has_pos:
            if all(self._term_is_cached(t) for t in distinct):
                return [r for t in distinct
                        for r in self._cached_rows(t)]
        return (self.postings_df(distinct).select(*PHRASE_COLS)
                .toPandas().to_dict("records"))

    def _count_positional_dist(self, terms: List[str], kernel=None) -> int:
        """Distributed positional COUNT (phrase and near share it):
        per-segment sizes are the only thing collected — same discipline
        as _count_and_dist (no id materialization, no global sort, no
        driver transfer of matches)."""
        if not terms or not self._phrase_dist_precheck(terms):
            return 0
        out = (self._phrase_ids_dist_df(terms, kernel)
               .agg(F.count("doc_id").alias("total")).collect())
        return int(out[0]["total"] or 0)

    def count_phrase(self, phrase: str, distributed=False) -> int:
        route = self._positional_route(distributed)
        if route is None:
            route = self._positional_auto_distributed(
                self._phrase_terms(phrase))
        if route:
            return self._count_positional_dist(self._phrase_terms(phrase))
        return int(self.search_phrase_ids(phrase, distributed=False).size)

    def search_phrase(self, phrase: str, distributed: bool = False
                      ) -> List[str]:
        return self._urls_for_ids(
            self.search_phrase_ids(phrase, distributed=distributed))

    def _phrase_ids_dist_df(self, terms: List[str],
                            kernel=None) -> DataFrame:
        """Per-segment positional kernel as a lazy doc_id DataFrame (the
        positional analogue of _matching_ids_dist): only MATCHING ids
        cross the exchange; position pages are read only here. kernel
        defaults to the exact-phrase matcher; search_near_ids passes the
        slop-bound proximity matcher."""
        kernel = kernel or P.phrase_match_ids

        def match(pdf: pd.DataFrame, ddf: Optional[pd.DataFrame]
                  ) -> pd.DataFrame:
            deleted = (np.unique(ddf["doc_id"].to_numpy(np.int64))
                       if ddf is not None and len(ddf) else None)
            ids = kernel(pdf.to_dict("records"), terms, deleted=deleted)
            return pd.DataFrame({"doc_id": ids})

        distinct = list(dict.fromkeys(terms))
        grouped = (self.postings_df(distinct).select(*PHRASE_COLS)
                   .groupBy("seg"))
        if not self.delete_files:
            return grouped.applyInPandas(
                lambda key, pdf: match(pdf, None), "doc_id long")
        return grouped.cogroup(self._seg_deletes_grouped()).applyInPandas(
            lambda key, pdf, ddf: match(pdf, ddf), "doc_id long")

    def _positional_ids_dist(self, terms: List[str],
                             kernel) -> np.ndarray:
        if not terms or not self._phrase_dist_precheck(terms):
            return np.empty(0, dtype=np.int64)
        out = (self._phrase_ids_dist_df(terms, kernel)
               .orderBy("doc_id").toPandas())
        return out["doc_id"].to_numpy(np.int64)

    # ------------------------------------------------------------- BM25 --
    def _bound_scale(self, seg: int) -> float:
        """Block-max max_partial bounds are exact at the segment's PACK-time
        avgdl; if streaming appends RAISED the global avgdl since, true
        partials can exceed the baked bounds by at most the avgdl ratio
        (worst case tf→0, dl→∞) — scale bounds up so pruning stays safe.
        Segments without a recorded pack_avgdl (pre-upgrade snapshots) fall
        back to 1.0 — matching their build-time behavior."""
        pa = self.pack_avgdl.get(int(seg))
        if not pa or pa <= 0:
            return 1.0
        return max(1.0, self.avgdl / pa)

    def _idfs(self, dfs: Dict[str, int]) -> Dict[str, float]:
        return {t: bm25_idf(self.n_docs, d) for t, d in dfs.items() if d > 0}

    def describe(self) -> dict:
        """Operational snapshot of the index handle — the `_cat indices`
        / Luke-style introspection surface: corpus stats, committed
        segment lists, pending delete files, positionality, on-disk
        bytes per table. One local-filesystem walk + manifest read, no
        Spark job."""
        import os

        def du(path: str) -> int:
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            return total

        snap = self.snapshot
        out = {
            "index_dir": self.cat.root,
            "snapshot_id": int(snap["snapshot_id"]),
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
            "n_buckets": self.n_buckets,
            "has_positions": bool(self.stats.get("has_positions")),
            "doc_segments": [int(s) for s in snap.get(
                "doc_segments", snap["segments"])],
            "posting_segments": [int(s) for s in snap.get(
                "posting_segments", snap["segments"])],
            "pending_delete_files": len(self.delete_files or []),
            "n_snapshots": len(self.cat.load_manifest()["snapshots"]),
        }
        if "://" not in self.cat.root:  # local fs only; object stores
            out["postings_bytes"] = du(self.cat.postings_dir())
            out["docmap_bytes"] = du(self.cat.docmap_dir())
        return out

    def search_query_ids(self, q: str, distributed: bool = False
                         ) -> np.ndarray:
        """Lucene-style query STRING → matching doc_ids: terms, quoted
        phrases ("a b", "a b"~slop), -negation, wild*cards, /regex/ — see
        query_parser for the grammar; each clause runs its own kernel."""
        from pysearchlite_spark import query_parser as QP
        return QP.evaluate(self, q, distributed=distributed)

    def search_query_df(self, q: str) -> DataFrame:
        """Lazy (doc_id, url) frame for a query string — per-clause
        search_df frames composed with semi/anti joins, nothing
        collected (the 10^12-doc path)."""
        from pysearchlite_spark import query_parser as QP
        return QP.evaluate_df(self, q)

    def topk_query(self, q: str, k: int = 10, distributed: bool = False
                   ) -> List[Tuple[int, float]]:
        """Ranked retrieval for a query STRING: every clause gates
        membership (phrases, wildcards, negations — the boolean match
        set), plain term clauses score (disjunctive BM25), ranked inside
        the match set via the filtered top-k path."""
        from pysearchlite_spark import query_parser as QP
        return QP.evaluate_topk(self, q, k=k, distributed=distributed)

    def explain_score(self, query: str, doc_id: int) -> dict:
        """Per-term BM25 breakdown for one (query, doc) — the Lucene
        Explanation shape, the relevance-tuning/debugging surface. Returns
        {"doc_id", "score", "deleted", "avgdl", "n_docs", "terms": {term:
        {"tf", "dl", "df", "idf", "partial"}}} where partial = idf *
        bm25_partial(tf, dl, avgdl) and score = sum of partials in
        QUERY-TERM order — the exact accumulation topk performs, so the
        reported score is bit-identical to the doc's ranked score.
        Decodes only the skip blocks containing the doc (same
        block-selective path the AND scorer uses); a tombstoned doc
        reports deleted=True and score 0."""
        d = int(doc_id)
        terms = query_terms(query)
        out: dict = {"doc_id": d, "score": 0.0, "deleted": False,
                     "avgdl": self.avgdl, "n_docs": self.n_docs,
                     "terms": {}}
        if not terms:
            return out
        dels = self._deleted()
        if dels is not None and dels.size:
            i = int(np.searchsorted(dels, d))
            if i < dels.size and dels[i] == d:
                out["deleted"] = True
                return out
        fetched = self._fetch(terms)
        dfs = self.global_dfs(fetched, terms)
        idfs = self._idfs(dfs)
        ids = np.asarray([d], dtype=np.int64)
        by_term = {}
        for r in fetched:
            docs, tfs, dls = _streams_for_ids(r, ids)
            pos = np.searchsorted(docs, d)
            if pos < docs.size and docs[pos] == d:
                by_term[r["term"]] = (int(tfs[pos]), int(dls[pos]))
        for t in terms:  # query-term order == the scorers' sum order
            if t not in by_term:
                continue
            tf, dl = by_term[t]
            partial = float(idfs[t] * codec.bm25_partial(
                np.asarray([tf]), np.asarray([dl]), self.avgdl)[0])
            out["terms"][t] = {"tf": tf, "dl": dl, "df": dfs[t],
                               "idf": idfs[t], "partial": partial}
            out["score"] += partial
        return out

    def topk(self, query: str, k: int = 10, mode: str = "or",
             use_blockmax="auto", distributed: bool = False,
             filter_ids=None, filter_sql: Optional[str] = None,
             min_match: int = 1,
             after: Optional[Tuple[int, float]] = None
             ) -> List[Tuple[int, float]]:
        """BM25 top-k: (doc_id, score) by score desc, doc_id asc.
        mode='or' (disjunctive, default) or 'and' (all terms required).

        filter_ids / filter_sql (filtered search, the Lucene filter-query
        shape every production engine needs — "rank only docs that passed
        the quality pass"): restrict results to an allow-list, given as a
        doc_id DataFrame/iterable or a SQL predicate over the docmap.
        Scores of surviving docs are UNCHANGED (idf/avgdl stay
        corpus-wide); the filter is applied before per-segment top-k
        truncation, so docs below the unfiltered top-k surface correctly
        (this is not post-filtering).

        min_match (mode='or'): Lucene minimumNumberShouldMatch — rank
        only docs matching at least that many distinct query terms;
        survivors keep their full disjunctive scores. min_match=1 is
        plain OR; min_match=len(terms) ranks exactly the AND set but
        (unlike mode='and') never short-circuits on a dead term.

        after (Lucene searchAfter pagination): the previous page's last
        result tuple, verbatim; returns the next k results strictly after it in
        the (score desc, doc_id asc) total order. Cursor pagination stays
        O(k) per page on every path — no deep OFFSET materialization —
        and composes with filters/msm."""
        if min_match > 1 and mode == "and":
            raise ValueError("min_match applies to mode='or' (mode='and' "
                             "already requires every term)")
        terms = query_terms(query)
        if not terms or k <= 0:
            return []
        has_filter = filter_ids is not None or filter_sql is not None
        if distributed:
            return self._topk_many(
                [terms], k, mode, use_blockmax,
                filter_df=(self._routed_filter_df(filter_ids, filter_sql)
                           if has_filter else None),
                min_match=min_match, after=after)[0]
        fetched = self._fetch(terms)
        dfs = self.global_dfs(fetched, terms)
        if mode == "and" and any(dfs[t] == 0 for t in terms):
            return []
        idfs = self._idfs(dfs)
        # tombstones keyed by posting segment (exact attribution via the
        # delete files' own pseg routing): clean segments get deleted=None
        # and KEEP block-max pruning — one stale doc in segment 0 must not
        # force the exhaustive path on 999 clean segments, and neither must
        # a heavily-deleted segment that carries none of the query's terms
        by_seg = self._deleted_by_seg()
        seg_rows = sorted(self._rows_by_seg(fetched).items())
        # resolve the allow-list (a Spark job: docmap semi-join + pseg
        # routing + collect) only once we know some segment actually
        # carries the query's terms — an all-miss query is [] for free
        flt = (self._filter_by_seg(filter_ids, filter_sql)
               if has_filter and seg_rows else None)
        _no_allow = np.empty(0, dtype=np.int64)
        # score accumulation in QUERY-TERM order (the distributed kernel's
        # order) — the scan/cache can surface rows in any order, and float
        # summation order must not vary run-to-run or local-vs-distributed
        # (1-ULP skew flips knife-edge rank ties)
        torder = {t: i for i, t in enumerate(terms)}
        parts: List[Tuple[np.ndarray, np.ndarray]] = []
        for seg, rows in seg_rows:
            rows = sorted(rows, key=lambda r: torder[r["term"]])
            d = by_seg.get(int(seg)) if by_seg else None
            # a segment absent from the allow-list map has NO allowed
            # docs — empty array (skip), which is not None (unfiltered)
            a = flt.get(int(seg), _no_allow) if flt is not None else None
            parts.append(score_segment_rows(rows, idfs, len(terms), k, mode,
                                            use_blockmax, self.avgdl,
                                            self._bound_scale(seg),
                                            deleted=d, allowed=a,
                                            min_match=min_match,
                                            after=after))
        return W.topk_merge(parts, k)

    def topk_batch(self, queries: List[str], k: int = 10, mode: str = "or",
                   use_blockmax="auto", filter_ids=None,
                   filter_sql: Optional[str] = None, min_match: int = 1
                   ) -> List[List[Tuple[int, float]]]:
        """BM25 top-k for MANY queries in ONE distributed job (the text
        analogue of AnnIndex.topk_batch): one pruned postings scan over the
        union of all query terms, one per-segment applyInPandas pass that
        scores every query against its segment rows (per-segment top-k
        truncation per query), qid-tagged partials merged on the driver.
        Amortizes the per-job dispatch that dominates single-query latency
        — a 100-TB pipeline evaluates query workloads, not single queries.
        Returns one (doc_id, score) list per input query, aligned.
        filter_ids/filter_sql: one allow-list applied to every query in
        the batch (see topk) — the "evaluate a workload against a corpus
        slice" shape."""
        if min_match > 1 and mode == "and":
            raise ValueError("min_match applies to mode='or' (mode='and' "
                             "already requires every term)")
        has_filter = filter_ids is not None or filter_sql is not None
        return self._topk_many(
            [query_terms(q) for q in queries], k, mode, use_blockmax,
            filter_df=(self._routed_filter_df(filter_ids, filter_sql)
                       if has_filter else None), min_match=min_match)

    def _topk_many(self, per_q: List[List[str]], k: int, mode: str,
                   use_blockmax, filter_df: Optional[DataFrame] = None,
                   min_match: int = 1,
                   after: Optional[Tuple[int, float]] = None
                   ) -> List[List[Tuple[int, float]]]:
        """Shared distributed scoring core: topk(distributed=True) is the
        1-query case, topk_batch the N-query case — ONE implementation so
        the two can never diverge (rank identity is test-enforced).
        filter_df: pseg-routed (seg, doc_id) allow-list rows
        (_routed_filter_df); cogrouped per segment alongside the
        tombstones — never broadcast."""
        results: List[List[Tuple[int, float]]] = [[] for _ in per_q]
        all_terms = list(dict.fromkeys(t for ts in per_q for t in ts))
        if not all_terms or k <= 0:
            return results
        dfs = self._global_dfs_dist(all_terms)
        idfs = self._idfs(dfs)
        # P4 short-circuit per query; queries whose terms ALL miss scan
        # nothing (their term set contributes nothing to `needed`)
        active = []
        for qi, ts in enumerate(per_q):
            live = [t for t in ts if dfs[t] > 0]
            if not live or (mode == "and" and len(live) < len(ts)):
                continue
            if mode != "and" and len(live) < min_match:
                continue  # msm unreachable: fewer live terms than required
            active.append((qi, live if mode == "or" else ts, len(ts)))
        if not active:
            return results
        needed = list(dict.fromkeys(t for _, ts, _ in active for t in ts))
        avgdl, kk, md, ubm = self.avgdl, k, mode, use_blockmax
        scales = {int(s): self._bound_scale(s) for s in self.pack_avgdl}
        has_filter = filter_df is not None

        def run(key, pdf: pd.DataFrame,
                ddf: Optional[pd.DataFrame] = None) -> pd.DataFrame:
            by_term: Dict[str, dict] = {}
            for r in pdf.to_dict("records"):
                by_term[r["term"]] = r  # one row per (term, seg)
            deleted, allowed = _split_aux(ddf, has_filter)
            scale = scales.get(int(key[0]), 1.0)
            q_l, d_l, s_l = [], [], []
            for qi, ts, uniq in active:
                rows = [by_term[t] for t in ts if t in by_term]
                if not rows:
                    continue
                d, s = score_segment_rows(rows, idfs, uniq, kk, md, ubm,
                                          avgdl, scale, deleted=deleted,
                                          allowed=allowed,
                                          min_match=min_match,
                                          after=after)
                q_l.append(np.full(d.size, qi, dtype=np.int64))
                d_l.append(d)
                s_l.append(s)
            if not q_l:
                return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                     "doc_id": pd.Series([], dtype="int64"),
                                     "score": pd.Series([], dtype="float64")})
            return pd.DataFrame({"qid": np.concatenate(q_l),
                                 "doc_id": np.concatenate(d_l),
                                 "score": np.concatenate(s_l)})

        grouped = self.postings_df(needed).select(*QUERY_COLS).groupBy("seg")
        schema = "qid long, doc_id long, score double"
        if not self.delete_files and not has_filter:
            scored = grouped.applyInPandas(
                lambda key, pdf: run(key, pdf, None), schema)
        else:
            scored = grouped.cogroup(
                self._seg_aux_grouped(filter_df)).applyInPandas(run, schema)
        out = scored.toPandas()  # ≤ segments × k rows per query
        for qi, grp in out.groupby("qid"):
            results[int(qi)] = W.topk_merge(
                [(grp["doc_id"].to_numpy(np.int64),
                  grp["score"].to_numpy(np.float64))], k)
        return results

    # ------------------------------------------------- distributed paths --
    def _global_dfs_dist(self, terms: List[str]) -> Dict[str, int]:
        """Global df per query term via the pruned postings scan — the
        shared first step of every distributed path (P4 short-circuit
        input); terms absent from the index get 0."""
        rows = (self.postings_df(terms).groupBy("term")
                .agg(F.sum("df").alias("df")).collect())
        dfs = {t: 0 for t in terms}
        dfs.update({r["term"]: int(r["df"]) for r in rows})
        return dfs

    def _routed_deletes_df(self) -> DataFrame:
        """Pending tombstones as (seg, doc_id) rows keyed by POSTING
        segment — the one routing definition both cogroup helpers build
        on. The scan is restricted to the snapshot's posting segments
        (pseg is a hive partition column, so the filter prunes stale
        directories); finer per-query pruning isn't available driver-side
        because which segments hold the query's terms is only known
        inside the job."""
        psegs = [int(s) for s in self.snapshot.get(
            "posting_segments", self.snapshot["segments"])]
        return (self._pending_deletes_df()
                .filter(F.col("pseg").isin(psegs))
                .select(F.col("pseg").alias("seg"), "doc_id"))

    def _seg_deletes_grouped(self):
        """Tombstones grouped per posting segment for cogrouping with the
        per-segment postings kernels — each segment's task sees only its
        own delete rows, never a broadcast global set."""
        return self._routed_deletes_df().groupBy("seg")

    def _seg_aux_grouped(self, filter_df: Optional[DataFrame] = None):
        """Tombstones (kind=0) and filter allow-list rows (kind=1) unioned
        into ONE per-posting-segment grouped frame — cogroup takes a
        single right side, and the scoring kernel needs both masks. Either
        part may be absent; at least one caller-side condition (pending
        deletes or an active filter) guarantees the union is non-empty
        schema-wise."""
        parts = []
        if self.delete_files:
            parts.append(self._routed_deletes_df()
                         .select("seg", "doc_id", F.lit(0).alias("kind")))
        if filter_df is not None:
            parts.append(filter_df.select(
                "seg", "doc_id", F.lit(1).alias("kind")))
        aux = parts[0]
        for p in parts[1:]:
            aux = aux.unionByName(p)
        return aux.groupBy("seg")

    def _matching_ids_dist(self, terms: List[str], mode: str,
                           exclude: Optional[List[str]] = None,
                           filter_df: Optional[DataFrame] = None,
                           min_match: int = 1,
                           groups: Optional[List[List[str]]] = None
                           ) -> DataFrame:
        """Per-segment boolean kernel as a DataFrame of matching doc_ids —
        the building block every distributed path (and the scalable
        search_df surface) shares; nothing is collected here. Pending
        tombstones are masked inside the kernel via cogroup. `exclude`
        terms ride the SAME pruned scan; their per-segment union is
        subtracted from the matches with the sorted-mask kernel (AND-NOT
        never materializes the exclusion set globally). `filter_df`:
        pseg-routed (seg, doc_id) allow-list rows — cogrouped alongside
        the tombstones, never broadcast. mode="min": docs matching at
        least `min_match` distinct terms (Lucene msm; union shape, so no
        missing-term short-circuit)."""
        exc_set = set(exclude or ())
        n_terms = len(set(terms))
        has_filter = filter_df is not None

        def match(pdf: pd.DataFrame, ddf: Optional[pd.DataFrame]
                  ) -> pd.DataFrame:
            rows = pdf.to_dict("records")
            exc_rows = [r for r in rows if r["term"] in exc_set]
            rows = [r for r in rows if r["term"] not in exc_set]
            if mode == "and":
                if len(rows) < n_terms:
                    return pd.DataFrame(
                        {"doc_id": pd.Series([], dtype="int64")})
                ids = I.intersect_packed(rows)
            elif mode == "min":
                ids = I.min_match_sorted(
                    [codec.unpack_docs(r["docs"], int(r["df"]))
                     for r in rows], min_match)
            elif mode == "groups":
                # synonym groups: union within group, intersect across
                by_term = {r["term"]: r for r in rows}
                unions = []
                for g in groups:
                    grows = [by_term[t] for t in g if t in by_term]
                    unions.append(I.union_sorted(
                        [codec.unpack_docs(r["docs"], int(r["df"]))
                         for r in grows]))
                if any(u.size == 0 for u in unions):
                    return pd.DataFrame(
                        {"doc_id": pd.Series([], dtype="int64")})
                ids = I.intersect_sorted(unions)
            else:
                ids = I.union_sorted(
                    [codec.unpack_docs(r["docs"], int(r["df"]))
                     for r in rows])
            if exc_rows and ids.size:
                excl = I.union_sorted(
                    [codec.unpack_docs(r["docs"], int(r["df"]))
                     for r in exc_rows])
                ids = _mask_deleted(ids, excl)
            deleted, allowed = _split_aux(ddf, has_filter)
            ids = _mask_deleted(ids, deleted)
            if has_filter and ids.size:
                ids = ids[_allowed_mask(ids, allowed)]
            return pd.DataFrame({"doc_id": ids})

        scan_terms = list(terms) + [t for t in exc_set if t not in terms]
        grouped = self.postings_df(scan_terms).select(*BOOL_COLS).groupBy("seg")
        if not self.delete_files and not has_filter:
            return grouped.applyInPandas(
                lambda key, pdf: match(pdf, None), "doc_id long")
        return grouped.cogroup(
            self._seg_aux_grouped(filter_df)).applyInPandas(
            lambda key, pdf, ddf: match(pdf, ddf), "doc_id long")

    def search_df(self, query: str, mode: str = "and",
                  slop: int = 0, exclude: str = "",
                  filter_ids=None, filter_sql: Optional[str] = None,
                  min_match: int = 1, in_order: bool = True) -> DataFrame:
        """The 10^12-doc search surface: matching (doc_id, url) as a LAZY
        DataFrame — per-segment kernels produce ids, a join against the
        docmap resolves names, and NOTHING reaches the driver; sink with
        .write or feed downstream joins. (search() stays the interactive
        list-returning API.) mode: "and" | "or" | "phrase" | "prefix" |
        "near" (prefix: `query` is a single term prefix, expanded against
        the dictionary then unioned like "or"; near: proximity within
        `slop`, ordered or unordered per `in_order` — see
        search_near_ids). `exclude` (and/or modes):
        NOT terms, subtracted per segment inside the kernel.
        filter_ids/filter_sql (and/or/prefix/wildcard/min modes):
        allow-list filter, cogrouped per posting segment inside the
        kernel — the lazy path never collects or broadcasts it (see
        topk). mode="wildcard": `query` is one wildcard pattern (*/?),
        expanded against the dictionary then unioned like "or".
        mode="min": docs matching ≥ `min_match` distinct terms (Lucene
        minimumNumberShouldMatch)."""
        kernel = None
        has_filter = filter_ids is not None or filter_sql is not None
        exc = query_terms(exclude) if exclude else []
        if (exc or has_filter) and mode in ("phrase", "near"):
            raise ValueError(
                "exclude/filter are supported for and/or/prefix/"
                "wildcard/min modes")
        min_match = max(1, int(min_match))
        if mode == "or" and min_match > 1:
            mode = "min"  # msm IS the or-mode dial; honor it, don't drop it
        elif min_match > 1 and mode != "min":
            raise ValueError("min_match is supported for or/min modes")
        if mode in ("phrase", "near"):
            if mode == "near":
                kernel = self._near_kernel(slop, in_order)
            terms = self._phrase_terms(query)
            mode = "phrase"
        elif mode == "prefix":
            terms = self.expand_prefix(query)
            mode = "or"
        elif mode == "wildcard":
            terms = self.expand_wildcard(query)
            mode = "or"
        elif mode == "min":
            terms = query_terms(query)  # deduped (first occurrence wins)
            if min_match > len(terms):
                terms = []
        else:
            terms = query_terms(query)
        empty = self.spark.createDataFrame([], "doc_id long, url string")
        if not terms:
            return empty
        if mode in ("and", "phrase"):
            distinct = list(dict.fromkeys(terms))
            dfs = self._global_dfs_dist(distinct)
            if any(dfs[t] == 0 for t in distinct):  # P4 short-circuit
                return empty
        ids = (self._phrase_ids_dist_df(terms, kernel) if mode == "phrase"
               else self._matching_ids_dist(
                   terms, mode, exclude=exc or None, min_match=min_match,
                   filter_df=(self._routed_filter_df(filter_ids, filter_sql)
                              if has_filter else None)))
        return ids.join(self._docmap.select("doc_id", "url"), "doc_id")

    def _search_and_ids_dist(self, terms: List[str],
                             filter_df: Optional[DataFrame] = None
                             ) -> np.ndarray:
        dfs = self._global_dfs_dist(terms)
        if any(dfs[t] == 0 for t in terms):
            return np.empty(0, dtype=np.int64)
        out = (self._matching_ids_dist(terms, "and", filter_df=filter_df)
               .orderBy("doc_id").toPandas())  # Arrow path, not Row objects
        return out["doc_id"].to_numpy(np.int64)

    def _search_or_ids_dist(self, terms: List[str],
                            filter_df: Optional[DataFrame] = None
                            ) -> np.ndarray:
        """Distributed OR: per-segment sorted union inside applyInPandas —
        only the segment's matching doc ids cross to the driver, never the
        raw postings of a hot term (the 10^12-doc path; the driver path
        collects all query-term postings first). Reference analogue: the
        derivable union of §2.7 (no short-circuit,
        inverted_index_skip_list.py:198-240)."""
        out = (self._matching_ids_dist(terms, "or", filter_df=filter_df)
               .orderBy("doc_id").toPandas())
        return out["doc_id"].to_numpy(np.int64)

    def _count_and_dist(self, terms: List[str],
                        filter_df: Optional[DataFrame] = None) -> int:
        """Distributed COUNT: per-segment intersection SIZES only — no docID
        materialization or collect of matches (the reference's count_and,
        inverted_index_skip_list.py:252-298, which counts without building
        the result list; here additionally summed across segments). An
        active filter keeps that property: the allow-mask runs inside the
        cogrouped kernel, sizes stay the only thing collected."""
        if not terms:
            return 0
        dfs = self._global_dfs_dist(terms)
        if any(dfs[t] == 0 for t in terms):
            return 0
        n_terms = len(set(terms))
        has_filter = filter_df is not None

        def cnt(pdf: pd.DataFrame, ddf: Optional[pd.DataFrame]
                ) -> pd.DataFrame:
            rows = pdf.to_dict("records")
            if len(rows) < n_terms:
                return pd.DataFrame({"cnt": pd.Series([0], dtype="int64")})
            ids = I.intersect_packed(rows)
            deleted, allowed = _split_aux(ddf, has_filter)
            ids = _mask_deleted(ids, deleted)
            if has_filter and ids.size:
                ids = ids[_allowed_mask(ids, allowed)]
            return pd.DataFrame({"cnt": pd.Series([ids.size],
                                                  dtype="int64")})

        grouped = self.postings_df(terms).select(*BOOL_COLS).groupBy("seg")
        if not self.delete_files and not has_filter:
            counted = grouped.applyInPandas(
                lambda key, pdf: cnt(pdf, None), "cnt long")
        else:
            # per-segment sizes stay the ONLY thing collected: the
            # tombstone mask runs inside the cogrouped kernel
            counted = grouped.cogroup(
                self._seg_aux_grouped(filter_df)).applyInPandas(
                lambda key, pdf, ddf: cnt(pdf, ddf), "cnt long")
        out = counted.agg(F.sum("cnt").alias("total")).collect()
        return int(out[0]["total"] or 0)
