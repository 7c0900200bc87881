"""Round-4 query/aggregation surface at scale: 1M deterministic synthetic
docs, one plain index, unpinned local[32]. Measures (best-of-3):

* suggest — ranked dictionary neighbours: cold (one 2-column dictionary
  scan job) and warm (candidate-vectorized numpy DP over the preloaded
  dictionary, no Spark dispatch);
* more_like_this — tf·idf term selection + disjunctive BM25 top-10;
* term_stats — distributed (df, totalTermFreq) with in-task tf decode;
* search_sorted — top-10 by doc_len via TakeOrderedAndProject;
* significant_terms — the FULL postings scan cogrouped with the routed
  foreground (the batch aggregation shape; scan cost is the honest
  number, there is no index shortcut for "look at every term");
* search_collapse — BM25 field collapsing over the full scored match
  set, on a ~100-value key (heavy map-side combine: one row per group
  per partition crosses the exchange) AND a ~500k-value key (combine
  nearly useless — the honest high-cardinality bound).

Sanity asserted inline: for an AND foreground each query term's fg_df
equals the foreground size; suggest output is distance-sorted.

Usage: python BENCH/aggs_scale.py [n_docs] → one JSON line + writes
BENCH/aggs_scale.json.
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

Q = "high school"          # Zipf-head AND query (the foreground)
SUGGEST_T = "schol"        # 1 edit from 'school'
MLT_TEXT = ("the high school history of the united states and the "
            "people who wrote about it")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index

    spark = get_spark("aggs_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n, "cpus": 32, "pinned": False, "query": Q}

    pages_dir = tempfile.mkdtemp(prefix="aggs_scale_pages_")
    idx_dir = tempfile.mkdtemp(prefix="aggs_scale_idx_")
    try:
        pages = generate_pages(spark, n, seed=42).select("url", "text")
        pages.write.mode("overwrite").parquet(pages_dir)
        docs = spark.read.parquet(pages_dir)
        t0 = time.monotonic()
        build_index(spark, docs, idx_dir, url_col="url",
                    segment_docs=1 << 18)
        out["build_sec"] = round(time.monotonic() - t0, 2)
        idx = SearchIndex(spark, idx_dir)

        best: dict = {}

        def probe(key, fn):
            t0 = time.monotonic()
            r = fn()
            dt = time.monotonic() - t0
            best[key] = min(best.get(key, dt), dt)
            return r

        fn_count = idx.count(Q)
        out["count_and"] = fn_count
        for _ in range(3):
            sug = probe("suggest",
                        lambda: idx.suggest(SUGGEST_T, k=10, max_edits=2))
            probe("more_like_this_top10",
                  lambda: idx.more_like_this(MLT_TEXT, k=10,
                                             max_query_terms=6, min_df=2))
            st = probe("term_stats",
                       lambda: idx.term_stats(
                           ["high", "school", "united", "states", "the"],
                           distributed=True))
            probe("search_sorted_top10",
                  lambda: idx.search_sorted(Q, by="doc_len", k=10)
                  .collect())
            sig = probe("significant_terms",
                        lambda: idx.significant_terms(Q, k=20, min_fg=10))
        # collapse keys derived JVM-side from the docmap (site100 models
        # "one result per site"; site500k models a near-unique key where
        # map-side combine stops helping)
        from pyspark.sql import functions as F
        cdocs = idx.docmap_df().select(
            "doc_id",
            (F.abs(F.xxhash64("url")) % 100).alias("site100"),
            (F.abs(F.xxhash64("url")) % 500_000).alias("site500k"))
        for _ in range(3):
            c100 = probe("collapse_100_top10",
                         lambda: idx.search_collapse(
                             Q, cdocs, "site100", k=10).collect())
            c500 = probe("collapse_500k_top10",
                         lambda: idx.search_collapse(
                             Q, cdocs, "site500k", k=10).collect())
        assert len(c100) == 10 and len(c500) == 10
        assert len({r["collapse"] for r in c100}) == 10  # distinct groups
        assert [d for _, d, _ in sug] == sorted(d for _, d, _ in sug)
        assert all(c >= d for _, d, c in st)  # cf >= df always
        by_term = {t: f for t, f, _, _ in sig}
        for qt in Q.split():
            assert by_term.get(qt) == fn_count, (qt, by_term.get(qt),
                                                 fn_count)
        out["n_suggestions"] = len(sug)
        out["dict_terms"] = int(
            idx._postings.select("term").distinct().count())

        # warm paths: preloaded dictionary (the mmap-residency analogue)
        idx.preload()
        for _ in range(3):
            probe("suggest_warm",
                  lambda: idx.suggest(SUGGEST_T, k=10, max_edits=2))
            probe("more_like_this_warm",
                  lambda: idx.more_like_this(MLT_TEXT, k=10,
                                             max_query_terms=6, min_df=2))
        for k, v in best.items():
            out[f"{k}_sec"] = round(v, 4)
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)
        shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()

    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "aggs_scale.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
