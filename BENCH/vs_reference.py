"""Head-to-head vs the actual reference (stn/pysearchlite) on identical data:
single-node indexing throughput and query latency.

The reference is imported read-only from /root/reference (run, not copied).
Both engines index the SAME deterministic text corpus; queries run against
warm indexes (reference: mmap restore; ours: SearchIndex.preload — the
equivalent residency mode). Output: one JSON line.

Usage: python BENCH/vs_reference.py [--n-docs 50000] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

QUERIES = ["st petersburg high school", "united states constitution",
           "search", "los angeles", "the national football league",
           "the book of life", "care a lot", "usb hub"]


def run_reference(docs) -> dict:
    import pysearchlite as psl
    idx_dir = tempfile.mkdtemp(prefix="ref_idx_")
    try:
        t0 = time.monotonic()
        psl.init(idx_dir)
        for name, text in docs:
            psl.index(name, text)
        psl.save_index()
        t_index = time.monotonic() - t0
        psl.clear_index()
        psl.restore_index()
        # warm-up
        for q in QUERIES:
            psl.search(q)
        reps = 20
        t0 = time.monotonic()
        for _ in range(reps):
            for q in QUERIES:
                psl.search(q)
        t_q = (time.monotonic() - t0) / (reps * len(QUERIES))
        counts = {q: psl.count(q) for q in QUERIES}
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return {"index_sec": round(t_index, 3),
            "docs_per_sec": round(len(docs) / t_index, 1),
            "query_ms": round(t_q * 1000, 3), "counts": counts}


def run_spark(docs, cpus: int) -> dict:
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index, doc_sort_key
    from pysearchlite_spark.session import get_spark

    spark = get_spark("vsref", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus * 2))
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(docs, "url string, text string")
    df.limit(10).count()  # warm scheduler
    idx_dir = tempfile.mkdtemp(prefix="psl_idx_")
    try:
        t0 = time.monotonic()
        build_index(spark, df, idx_dir, segment_docs=1 << 17)
        t_index = time.monotonic() - t0
        idx = SearchIndex(spark, idx_dir)
        idx.preload()  # residency mode == reference's mmap restore
        for q in QUERIES:
            idx.search(q)
        reps = 20
        t0 = time.monotonic()
        for _ in range(reps):
            for q in QUERIES:
                # kernel latency: ids only (name lookup measured separately —
                # the reference's DocList is a resident python list)
                idx.search_and_ids(q)
        t_q = (time.monotonic() - t0) / (reps * len(QUERIES))
        t0 = time.monotonic()
        for _ in range(reps):
            for q in QUERIES:
                idx.topk(q, k=10)
        t_topk = (time.monotonic() - t0) / (reps * len(QUERIES))
        counts = {q: idx.count(q) for q in QUERIES}
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()
    return {"index_sec": round(t_index, 3),
            "docs_per_sec": round(len(docs) / t_index, 1),
            "query_ms": round(t_q * 1000, 3),
            "bm25_topk_ms": round(t_topk * 1000, 3), "counts": counts}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=50_000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pysearchlite_spark.datagen import page_text
    from pysearchlite_spark.plans.builder import doc_sort_key
    docs = [(f"doc{i:07d}", page_text(42, i)) for i in range(args.n_docs)]
    # feed the reference in OUR docID order so result docIDs/names align
    docs_sorted = sorted(docs, key=lambda d: doc_sort_key(d[0]))

    ref = run_reference(docs_sorted)
    spk = run_spark(docs, args.cpus)
    assert ref["counts"] == spk["counts"], (ref["counts"], spk["counts"])
    out = {
        "n_docs": args.n_docs, "cpus_spark": args.cpus,
        "reference": {k: v for k, v in ref.items() if k != "counts"},
        "pysearchlite_spark": {k: v for k, v in spk.items()
                               if k != "counts"},
        "counts_match": True,
        "index_speedup": round(spk["docs_per_sec"] / ref["docs_per_sec"], 2),
        "query_speedup": round(ref["query_ms"] / spk["query_ms"], 2),
    }
    with open(os.path.join(REPO, "BENCH", "vs_reference.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
