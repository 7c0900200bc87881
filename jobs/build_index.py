"""spark-submit entrypoint: build the inverted index.

    spark-submit --py-files pysearchlite_spark.zip jobs/build_index.py \
        --input /path/to/pages_parquet --index-dir /path/to/idx \
        [--html-col html] [--lang en] [--segment-docs 1048576] \
        [--buckets 16] [--id-col doc_id]

Resumable: re-running after a failure skips staged segments and commits the
snapshot when all segments are present (plans/builder.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--html-col", default=None)
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--lang", default=None)
    ap.add_argument("--segment-docs", type=int, default=1 << 20)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--max-segments", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pysearchlite_spark.plans.builder import build_index

    spark = SparkSession.builder.appName("psl-build-index").getOrCreate()
    pages = spark.read.parquet(args.input)
    res = build_index(
        spark, pages, args.index_dir, html_col=args.html_col,
        id_col=args.id_col, url_col=args.url_col, lang_filter=args.lang,
        segment_docs=args.segment_docs, n_buckets=args.buckets,
        max_segments=args.max_segments,
        lineage={"source": args.input, "job": "jobs/build_index.py"})
    print(json.dumps({"snapshot_id": res.snapshot_id, "n_docs": res.n_docs,
                      "avgdl": res.avgdl, "segments": res.segments,
                      "elapsed_sec": round(res.elapsed_sec, 3),
                      "docs_per_sec": round(res.n_docs /
                                            max(res.elapsed_sec, 1e-9), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
