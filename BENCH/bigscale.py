"""Big-scale stress: multi-million-doc build + hot-term queries +
compaction, unpinned local[32]. (Round-1's 9.4M-doc run is preserved in
bigscale.json; this script makes the run reproducible.)

Checks, at Zipf-head skew (hot terms matching >60% of the corpus):
  * full html→segments build throughput;
  * driver vs distributed COUNT agree exactly (cross-path consistency is
    the oracle at this scale);
  * BM25 top-k runs on both paths;
  * optional compaction preserves counts bit-for-bit.

Usage: python BENCH/bigscale.py [n_pages] [--compact] → one JSON line +
writes BENCH/bigscale_r2.json.
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


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 4_800_000
    do_compact = "--compact" in sys.argv

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index
    from pysearchlite_spark.plans.compaction import compact_segments

    spark = get_spark("bigscale", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    data = tempfile.mkdtemp(prefix="bigscale_pages_")
    idx_dir = tempfile.mkdtemp(prefix="bigscale_idx_")
    out: dict = {"n_pages": n, "cpus": 32, "pinned": False}
    try:
        generate_pages(spark, n, seed=42, partitions=256) \
            .write.mode("overwrite").parquet(data)
        pages = spark.read.parquet(data)

        t0 = time.monotonic()
        res = build_index(spark, pages, idx_dir, html_col="html",
                          lang_filter="en", segment_docs=1 << 20)
        out["build_sec"] = round(time.monotonic() - t0, 1)
        out["n_docs"] = res.n_docs
        out["docs_per_sec"] = round(res.n_docs / out["build_sec"], 1)
        out["segments"] = len(res.segments)
        out["index_bytes"] = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(idx_dir) for f in fs)

        idx = SearchIndex(spark, idx_dir)
        queries = ["united states constitution", "the", "usb hub"]
        counts, t0 = {}, time.monotonic()
        for q in queries:
            counts[q] = idx.count(q)
        out["count_ms_cold"] = round(
            1000 * (time.monotonic() - t0) / len(queries), 1)
        t0 = time.monotonic()
        dist = {q: idx.count(q, distributed=True) for q in queries}
        out["count_ms_distributed"] = round(
            1000 * (time.monotonic() - t0) / len(queries), 1)
        assert dist == counts, (dist, counts)
        out["counts"] = counts
        out["paths_agree"] = True

        t0 = time.monotonic()
        top = idx.topk("united states constitution", k=10)
        out["bm25_ms_cold"] = round(1000 * (time.monotonic() - t0), 1)
        t0 = time.monotonic()
        top_d = idx.topk("united states constitution", k=10,
                         distributed=True)
        out["bm25_ms_distributed"] = round(1000 * (time.monotonic() - t0), 1)
        assert [d for d, _ in top] == [d for d, _ in top_d]

        if do_compact:
            t0 = time.monotonic()
            compact_segments(spark, idx_dir)
            out["compact_sec"] = round(time.monotonic() - t0, 1)
            idx2 = SearchIndex(spark, idx_dir)
            assert {q: idx2.count(q) for q in queries} == counts
            t0 = time.monotonic()
            idx2.count(queries[0])
            out["count_ms_after_compact"] = round(
                1000 * (time.monotonic() - t0), 1)
            out["compaction_counts_preserved"] = True

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.environ.get("PSL_BIGSCALE_OUT", "bigscale_r2.json"))
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(data, ignore_errors=True)
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
