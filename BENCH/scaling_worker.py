"""One scaling measurement: build the full index over a shared pages parquet
at a given parallelism, print one JSON line. Run in its own process so each
parallelism level gets a fresh JVM (the sandbox realization of "same job at
N and 4N executors on the same input", BASELINE.md)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--input", required=True)
    args = ap.parse_args()

    from pysearchlite_spark.plans.builder import build_index
    from pysearchlite_spark.session import get_spark

    spark = get_spark(f"scaling-{args.cpus}", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(8, args.cpus * 2))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.input)
    n = pages.count()
    # warm the JVM/scheduler so fixed startup cost doesn't pollute the
    # throughput measurement (identical warmup at both levels)
    pages.limit(100).count()

    idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{args.cpus}_")
    try:
        t0 = time.monotonic()
        res = build_index(spark, pages, idx_dir, html_col="html",
                          lang_filter="en", segment_docs=1 << 17)
        dt = time.monotonic() - t0
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()
    print(json.dumps({"cpus": args.cpus, "n_input_rows": n,
                      "n_docs": res.n_docs, "build_sec": round(dt, 3),
                      "docs_per_sec": round(res.n_docs / dt, 2)}))


if __name__ == "__main__":
    sys.exit(main())
