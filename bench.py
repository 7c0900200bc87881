"""Benchmark harness — one JSON line on stdout.

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:
  * full inverted-index build over `documents` (docs/sec recorded),
  * boolean COUNT / AND / OR and BM25 top-10 (block-max) query latency,
  * distributed BM25 path,
  * dedup (exact, MinHash-LSH), ANN cosine top-k, text-quality scan,
  * events hourly windowed aggregation.

Output: {"metric": "e2e_bench_sec", "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <dir>, ...extras}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.operators.ann import brute_cosine_topk
    from pysearchlite_spark.operators.dedup import (exact_dedup,
                                                    minhash_lsh_pairs)
    from pysearchlite_spark.functions.text import quality_stats
    from pysearchlite_spark.plans.builder import build_index
    from pysearchlite_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    timings: dict[str, float] = {}
    extras: dict = {"n_docs": n_docs, "cpus": int(cpus)}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.monotonic()

            def __exit__(self, *a):
                timings[name] = round(time.monotonic() - self.t0, 4)

        return _T()

    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        with timed("index_build"):
            build_index(spark, docs, idx_dir, id_col="doc_id",
                        segment_docs=1024)
        extras["index_docs_per_sec"] = round(n_docs / timings["index_build"], 2)

        idx = SearchIndex(spark, idx_dir)
        qset = ["table part", "query value", "spark merge",
                "key scan filter", "window group order"]
        with timed("count_and"):
            for q in qset:
                idx.count(q)
        with timed("search_and"):
            for q in qset:
                idx.search_and_ids(q)
        with timed("search_or"):
            for q in qset:
                idx.search_or_ids(q)
        with timed("bm25_top10"):
            for q in qset:
                idx.topk(q, k=10)
        with timed("bm25_top10_distributed"):
            idx.topk(qset[0], k=10, distributed=True)
        extras["query_latency_ms"] = round(
            1000 * timings["bm25_top10"] / len(qset), 2)
        # warm path: preloaded term cache (the reference's mmap-residency
        # analogue) — no Spark dispatch per query
        idx.preload()
        with timed("bm25_top10_preloaded"):
            for _ in range(10):
                for q in qset:
                    idx.topk(q, k=10)
        extras["query_latency_warm_ms"] = round(
            1000 * timings["bm25_top10_preloaded"] / (10 * len(qset)), 3)

        with timed("exact_dedup"):
            exact_dedup(docs).count()
        with timed("minhash_lsh_pairs"):
            minhash_lsh_pairs(docs, threshold=0.5).count()
        with timed("ann_cosine_top10"):
            qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
            brute_cosine_topk(emb, list(qv), k=10).collect()
        from pysearchlite_spark.operators.ann import AnnIndex
        ann_dir = tempfile.mkdtemp(prefix="bench_ann_")
        try:
            with timed("ann_index_build"):
                ann = AnnIndex.build(spark, emb, ann_dir)
            with timed("ann_lsh_top10"):
                for _ in range(3):
                    ann.topk(list(qv), k=10).collect()
            timings["ann_lsh_top10"] = round(timings["ann_lsh_top10"] / 3, 4)
        finally:
            shutil.rmtree(ann_dir, ignore_errors=True)
        with timed("quality_stats"):
            quality_stats(docs).count()
        with timed("events_hourly"):
            (events.groupBy(F.window("ts", "1 hour"), "event_type")
             .agg(F.count("*"), F.sum("value")).count())
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()

    total = round(sum(timings.values()), 4)
    print(json.dumps({"metric": "e2e_bench_sec", "value": total,
                      "unit": "sec", "queries": timings,
                      "sf": sf_dir, **extras}))


if __name__ == "__main__":
    sys.stderr.write("bench: starting\n")
    main()
