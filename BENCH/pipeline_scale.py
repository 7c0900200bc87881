"""Scale check for the repetition / repeated-span pipeline operators:
1M deterministic synthetic docs (datagen.generate_pages text column),
unpinned local[32].

Measures wall time and docs/sec for
  * repetition_stats — per-doc Gopher repetition fractions (shuffle-free);
  * repeated_spans(n=20) — cross-doc exact-substring signal at the
    production span length (64-bit window-hash span keys);
  * repeated_spans(n=8) — the bench key's span length (denser collisions).

Usage: python BENCH/pipeline_scale.py [n_docs] → one JSON line + writes
BENCH/pipeline_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearchlite_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.functions.text import repetition_stats
    from pysearchlite_spark.operators.dedup import repeated_spans

    spark = get_spark("pipeline_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n, "cpus": 32, "pinned": False}
    data = tempfile.mkdtemp(prefix="pipescale_")
    try:
        (generate_pages(spark, n, seed=42)
         .select(F.xxhash64("url").alias("doc_id"), "text")
         .write.mode("overwrite").parquet(data))
        docs = spark.read.parquet(data)

        # force the computed columns — a bare .count() lets Catalyst prune
        # the whole stat computation out of the plan and times only the scan
        t0 = time.monotonic()
        agg = (repetition_stats(docs)
               .agg(F.count("*").alias("rows"),
                    F.sum("top2gram_frac").alias("s2"),
                    F.sum("dup5gram_frac").alias("s5")).collect()[0])
        out["repetition_rows"] = int(agg["rows"])
        out["repetition_sec"] = round(time.monotonic() - t0, 2)
        out["repetition_docs_per_sec"] = round(n / out["repetition_sec"], 1)

        for span_n in (20, 8):
            t0 = time.monotonic()
            agg = (repeated_spans(docs, n=span_n)
                   .agg(F.count("*").alias("rows"),
                        F.sum("dup_spans").alias("dup_spans")).collect()[0])
            sec = round(time.monotonic() - t0, 2)
            out[f"spans{span_n}_sec"] = sec
            out[f"spans{span_n}_docs_per_sec"] = round(n / sec, 1)
            out[f"spans{span_n}_rows"] = int(agg["rows"])
            out[f"spans{span_n}_dup_spans"] = int(agg["dup_spans"])
            # each run persists its own span frame; release it so the
            # next measurement isn't skewed by occupied storage memory
            spark.catalog.clearCache()
    finally:
        import shutil
        shutil.rmtree(data, ignore_errors=True)
        spark.stop()

    out["ts"] = time.time()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "pipeline_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
