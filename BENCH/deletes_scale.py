"""Deletion surface at scale: bulk tombstone commit, masked-query tax,
physical apply at compaction, and snapshot-expire reclamation — measured
on a ~1M-page synthetic Common-Crawl-style corpus, unpinned local[32].

What this pins down (the numbers VERDICT asked the deletion feature to
carry, beyond the functional tests):
  * delete_docs of 30% of the corpus is O(deletes), not O(index):
    commit wall time and the tombstone bytes written vs index bytes;
  * the PENDING-delete query tax: count/top-k latency with masking on
    vs the pre-delete baseline;
  * compaction's physical apply cost and the post-apply latency
    recovery (postings no longer carry the deleted docs);
  * expire_snapshots reclaiming the pre-merge segment dirs that time
    travel pinned (bytes before/after).

Correctness is asserted inline at every stage: post-delete AND-ids ==
pre-delete ids minus victims, bit-for-bit across driver and distributed
paths, unchanged by the compaction.

Usage: python BENCH/deletes_scale.py [n_pages] → one JSON line +
writes BENCH/deletes_scale.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pysearchlite_spark.session import get_spark  # noqa: E402


def tree_bytes(root: str) -> int:
    return sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(root) for f in fs)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000

    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index
    from pysearchlite_spark.plans.compaction import compact_segments
    from pysearchlite_spark.plans.deletes import delete_docs
    from pysearchlite_spark.sources.catalog import IndexCatalog

    spark = get_spark("deletes_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    data = tempfile.mkdtemp(prefix="delscale_pages_")
    idx_dir = tempfile.mkdtemp(prefix="delscale_idx_")
    out: dict = {"n_pages": n, "cpus": 32, "pinned": False}
    q = "united states constitution"
    try:
        generate_pages(spark, n, seed=42, partitions=256) \
            .write.mode("overwrite").parquet(data)
        pages = spark.read.parquet(data)

        t0 = time.monotonic()
        res = build_index(spark, pages, idx_dir, html_col="html",
                          lang_filter="en", segment_docs=1 << 18)
        out["build_sec"] = round(time.monotonic() - t0, 1)
        out["n_docs"] = res.n_docs
        out["segments"] = len(res.segments)
        out["index_bytes"] = tree_bytes(idx_dir)

        idx = SearchIndex(spark, idx_dir)
        base_ids = idx.search_and_ids(q)
        t0 = time.monotonic()
        base_count = idx.count(q)
        out["count_ms_baseline"] = round(1000 * (time.monotonic() - t0), 1)
        t0 = time.monotonic()
        idx.topk(q, k=10)
        out["bm25_ms_baseline"] = round(1000 * (time.monotonic() - t0), 1)

        # ---- bulk delete: 30% of the live corpus, ids from a dedup-like
        # DataFrame (the scale path — no driver-side id list) ------------
        victims_df = (idx.docmap_df().select("doc_id")
                      .filter(F.col("doc_id") % 10 < 3))
        n_victims = victims_df.count()
        out["n_deleted"] = n_victims
        t0 = time.monotonic()
        delete_docs(spark, idx_dir, victims_df)
        out["delete_commit_sec"] = round(time.monotonic() - t0, 1)
        cat = IndexCatalog(idx_dir)
        out["tombstone_bytes"] = tree_bytes(cat.deletes_dir())
        out["tombstone_frac_of_index"] = round(
            out["tombstone_bytes"] / out["index_bytes"], 4)

        # ---- pending-delete query tax (masking on) ----------------------
        idx = SearchIndex(spark, idx_dir)
        want = base_ids[base_ids % 10 >= 3]
        got = idx.search_and_ids(q)
        assert np.array_equal(got, want), "masked AND ids diverge"
        gotd = idx.search_and_ids(q, distributed=True)
        assert np.array_equal(gotd, want), "distributed masked ids diverge"
        t0 = time.monotonic()
        c = idx.count(q)
        out["count_ms_pending"] = round(1000 * (time.monotonic() - t0), 1)
        assert c == want.size, (c, want.size)
        t0 = time.monotonic()
        idx.topk(q, k=10)
        out["bm25_ms_pending"] = round(1000 * (time.monotonic() - t0), 1)

        # ---- physical apply ---------------------------------------------
        t0 = time.monotonic()
        compact_segments(spark, idx_dir)
        out["compact_apply_sec"] = round(time.monotonic() - t0, 1)
        idx = SearchIndex(spark, idx_dir)
        assert idx.delete_files == [] and idx.applied_delete_files
        assert np.array_equal(idx.search_and_ids(q), want)
        assert idx.n_docs == res.n_docs - n_victims
        t0 = time.monotonic()
        c = idx.count(q)
        out["count_ms_applied"] = round(1000 * (time.monotonic() - t0), 1)
        assert c == want.size
        t0 = time.monotonic()
        idx.topk(q, k=10)
        out["bm25_ms_applied"] = round(1000 * (time.monotonic() - t0), 1)
        out["index_bytes_postmerge_preexpire"] = tree_bytes(idx_dir)

        # ---- reclaim the dirs time travel pinned -------------------------
        t0 = time.monotonic()
        exp = IndexCatalog(idx_dir).expire_snapshots(keep_last=1)
        out["expire_sec"] = round(time.monotonic() - t0, 1)
        out["expire_dropped"] = exp
        out["index_bytes_postexpire"] = tree_bytes(idx_dir)
        out["reclaimed_bytes"] = (out["index_bytes_postmerge_preexpire"]
                                  - out["index_bytes_postexpire"])
        idx = SearchIndex(spark, idx_dir)
        assert np.array_equal(idx.search_and_ids(q), want)
        assert base_count == base_ids.size  # silence linters; sanity

        print(json.dumps(out))
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "deletes_scale.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(data, ignore_errors=True)
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
