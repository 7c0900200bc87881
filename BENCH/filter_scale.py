"""Filtered / min-should-match / wildcard queries at scale: 1M
deterministic synthetic docs (datagen.generate_pages), unpinned
local[32], one plain index.

Measures (interleaved best-of-3, round-workflow protocol)
  * BM25 top-10 latency unfiltered vs filtered — filter given as a SQL
    predicate over the docmap (doc_len >= median, ~half the corpus) and
    as an externally-supplied doc_id DataFrame (the "quality-pass
    output" pipeline shape) — both resolve per query, so the numbers
    include the allow-list job, not a cached id set — and via a
    prepare_filter() FilterHandle (resolution paid once up front, the
    repeated-filtered-query shape);
  * distributed boolean AND count unfiltered vs filtered (cogrouped
    allow rows; only per-segment sizes collected);
  * min-should-match (3-of-4) boolean count, distributed, vs the plain
    OR and AND bounds it must sit between;
  * wildcard dictionary expansion + OR-union count (literal-prefix
    pattern and the leading-wildcard worst case).

Sanity is asserted inline (filtered ids satisfy the predicate, msm
counts monotone in m, BOTH wildcard counts == their expansions' OR).

Usage: python BENCH/filter_scale.py [n_docs] → one JSON line + writes
BENCH/filter_scale.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearchlite_spark.session import get_spark  # noqa: E402

Q_BM25 = "high school"         # Zipf ranks 3+4: the hot ranked case
Q_AND = "united states"        # mid-frequency conjunction
Q_MSM = "united states constitution petersburg"  # msm: 3 of 4
W_PREFIXED = "w0000?"          # literal prefix + 10-term expansion union
W_LEADING = "*titution"        # leading wildcard → full dictionary scan


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index

    spark = get_spark("filter_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n, "cpus": 32, "pinned": False}

    pages_dir = tempfile.mkdtemp(prefix="filter_scale_pages_")
    idx_dir = tempfile.mkdtemp(prefix="filter_scale_idx_")
    try:
        pages = generate_pages(spark, n, seed=42).select("url", "text")
        pages.write.mode("overwrite").parquet(pages_dir)
        docs = spark.read.parquet(pages_dir)

        t0 = time.monotonic()
        build_index(spark, docs, idx_dir, url_col="url",
                    segment_docs=1 << 18)
        out["build_sec"] = round(time.monotonic() - t0, 2)
        idx = SearchIndex(spark, idx_dir)

        # median doc_len → a ~50% allow-list, like a real quality cut
        med = int(idx._docmap.approxQuantile("doc_len", [0.5], 0.01)[0])
        pred = f"doc_len >= {med}"
        out["filter_pred"] = pred
        allow_df = idx._docmap.filter(pred).select("doc_id")
        out["allow_frac"] = round(allow_df.count() / idx.n_docs, 3)

        best: dict = {}

        def probe(key, fn):
            t0 = time.monotonic()
            r = fn()
            dt = time.monotonic() - t0
            best[key] = min(best.get(key, dt), dt)
            return r

        # reusable resolved-filter handles: the first query pays the
        # allow-list resolution once; later queries reuse the cached
        # shapes (the VERDICT r3 task-3 criterion: second filtered query
        # within ~1.1x of unfiltered)
        h_sql = idx.prepare_filter(filter_sql=pred)
        h_df = idx.prepare_filter(filter_ids=allow_df)
        t0 = time.monotonic()
        top_h_first = idx.topk(Q_BM25, k=10, filter_ids=h_sql)
        out["bm25_top10_handle_first_sec"] = round(time.monotonic() - t0, 3)

        for _ in range(3):
            top_plain = probe("bm25_top10", lambda: idx.topk(Q_BM25, k=10))
            # clear the plain-API LRU first so this key KEEPS its original
            # semantics (per-query allow-list resolution) now that
            # filter_sql= transparently caches repeated predicates
            idx.clear_filter_cache()
            top_sql = probe("bm25_top10_filter_sql",
                            lambda: idx.topk(Q_BM25, k=10, filter_sql=pred))
            top_ids = probe("bm25_top10_filter_df",
                            lambda: idx.topk(Q_BM25, k=10,
                                             filter_ids=allow_df))
            top_h = probe("bm25_top10_handle",
                          lambda: idx.topk(Q_BM25, k=10, filter_ids=h_sql))
            top_hdf = probe("bm25_top10_handle_df",
                            lambda: idx.topk(Q_BM25, k=10,
                                             filter_ids=h_df))
            n_and = probe("count_and_dist",
                          lambda: idx.count(Q_AND, distributed=True))
            idx.clear_filter_cache()  # same: keep the uncached semantics
            n_and_f = probe("count_and_dist_filtered",
                            lambda: idx.count(Q_AND, distributed=True,
                                              filter_sql=pred))
            n_and_h = probe("count_and_dist_handle",
                            lambda: idx.count(Q_AND, distributed=True,
                                              filter_ids=h_sql))
            n_msm = probe("count_msm3of4_dist",
                          lambda: idx.count_min_match(Q_MSM, 3,
                                                      distributed=True))
            terms_p = probe("wildcard_expand_prefixed",
                            lambda: idx.expand_wildcard(W_PREFIXED))
            n_wp = probe("count_wildcard_prefixed",
                         lambda: idx.count_wildcard(W_PREFIXED))
            terms_l = probe("wildcard_expand_leading",
                            lambda: idx.expand_wildcard(W_LEADING))
            n_wl = probe("count_wildcard_leading",
                         lambda: idx.count_wildcard(W_LEADING))

        # the plain-API amortization (r3 task-8 criterion: the SECOND
        # identical filter_sql query through topk() — no prepare_filter —
        # lands within ~1.1x of unfiltered, because the engine LRU-caches
        # the resolved handle behind the predicate string)
        idx.clear_filter_cache()
        t0 = time.monotonic()
        top_cold = idx.topk(Q_BM25, k=10, filter_sql=pred)
        out["bm25_top10_filter_sql_cold_sec"] = round(
            time.monotonic() - t0, 3)
        top_rep = None
        for _ in range(3):
            # paired with an unfiltered probe in the SAME window: the
            # overhead ratio divides same-minute numbers (this host's
            # deliverable CPU drifts between the main loop and this tail)
            top_rep = probe("bm25_top10_filter_sql_repeat",
                            lambda: idx.topk(Q_BM25, k=10, filter_sql=pred))
            probe("bm25_top10_paired", lambda: idx.topk(Q_BM25, k=10))
        assert top_cold == top_rep, "LRU-cached filter changed the answer"

        # ---- sanity: the measured answers are the right answers --------
        assert top_sql == top_ids, "two filter spellings disagree"
        assert top_rep == top_sql, "plain-API cached path diverged"
        assert top_h == top_sql == top_h_first == top_hdf, \
            "FilterHandle path diverged from the per-query path"
        assert n_and_h == n_and_f, "handle changed a filtered count"
        lens = {r["doc_id"]: r["doc_len"] for r in
                idx._docmap.filter(
                    F.col("doc_id").isin([d for d, _ in top_sql]))
                .select("doc_id", "doc_len").collect()}
        assert all(lens[d] >= med for d, _ in top_sql)
        by_id = dict(idx.topk(Q_BM25, k=10_000, use_blockmax=False))
        assert all(abs(by_id[d] - s) < 1e-12 for d, s in top_sql
                   if d in by_id), "filter changed a surviving score"
        assert n_and_f <= n_and
        n_or = idx.count_min_match(Q_MSM, 1, distributed=True)
        n_all = idx.count_min_match(Q_MSM, 4, distributed=True)
        assert n_all <= n_msm <= n_or
        assert n_wp == int(idx.search_or_ids(" ".join(terms_p)).size)
        assert n_wl == int(idx.search_or_ids(" ".join(terms_l)).size)
        out["count_and"] = n_and
        out["count_and_filtered"] = n_and_f
        out["count_msm3of4"] = n_msm
        out["count_msm_or_bound"] = n_or
        out["count_msm_and_bound"] = n_all
        out["wildcard_prefixed_terms"] = len(terms_p)
        out["wildcard_prefixed_matches"] = n_wp
        out["wildcard_leading_terms"] = len(terms_l)
        out["wildcard_leading_matches"] = n_wl
        for k, v in best.items():
            out[f"{k}_sec"] = round(v, 3)
        out["filter_overhead_sql"] = round(
            best["bm25_top10_filter_sql"] / best["bm25_top10"], 2)
        out["filter_overhead_df"] = round(
            best["bm25_top10_filter_df"] / best["bm25_top10"], 2)
        out["filter_overhead_handle"] = round(
            best["bm25_top10_handle"] / best["bm25_top10"], 2)
        out["filter_overhead_handle_df"] = round(
            best["bm25_top10_handle_df"] / best["bm25_top10"], 2)
        out["filter_overhead_sql_repeat"] = round(
            best["bm25_top10_filter_sql_repeat"]
            / best["bm25_top10_paired"], 2)
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)
        shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()

    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "filter_scale.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
