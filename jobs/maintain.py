"""spark-submit entrypoint: index maintenance — delete, upsert, compact.

    spark-submit --py-files pysearchlite_spark.zip jobs/maintain.py \
        --index-dir /path/to/idx delete --ids /path/to/ids_parquet \
        [--id-col doc_id]
    spark-submit ... jobs/maintain.py --index-dir idx upsert \
        --input /path/to/pages_parquet [--html-col html] [--lang en]
    spark-submit ... jobs/maintain.py --index-dir idx compact \
        [--group-size 4]

The delete subcommand takes a parquet of doc ids (e.g. the output of a
dedup pass) and commits an equality-delete file (plans/deletes.py);
compact folds pending deletes into the postings and refreshes BM25 stats;
upsert replaces re-crawled urls (streaming/ingest.upsert_batch). Each
prints one JSON line with the resulting snapshot id.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("delete", help="tombstone doc ids from a parquet")
    d.add_argument("--ids", required=True,
                   help="parquet path with the ids to delete")
    d.add_argument("--id-col", default="doc_id")

    u = sub.add_parser("upsert", help="replace re-crawled urls / append new")
    u.add_argument("--input", required=True)
    u.add_argument("--html-col", default=None)
    u.add_argument("--url-col", default="url")
    u.add_argument("--lang", default=None)
    u.add_argument("--segment-docs", type=int, default=1 << 20)

    c = sub.add_parser("compact", help="merge segments, apply deletes")
    c.add_argument("--group-size", type=int, default=None)

    e = sub.add_parser("expire", help="expire old snapshots, free disk")
    e.add_argument("--keep-last", type=int, default=1)

    args = ap.parse_args()

    if args.cmd == "expire":
        # pure catalog metadata + file ops — no Spark session needed
        from pysearchlite_spark.sources.catalog import IndexCatalog
        res = IndexCatalog(args.index_dir).expire_snapshots(args.keep_last)
        print(json.dumps({"cmd": "expire", **res}))
        return

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        f"psl-maintain-{args.cmd}").getOrCreate()

    if args.cmd == "delete":
        from pysearchlite_spark.plans.deletes import delete_docs
        ids = spark.read.parquet(args.ids)
        sid = delete_docs(spark, args.index_dir, ids, id_col=args.id_col)
    elif args.cmd == "upsert":
        from pysearchlite_spark.streaming.ingest import upsert_batch
        pages = spark.read.parquet(args.input)
        sid = upsert_batch(spark, pages, args.index_dir,
                           html_col=args.html_col, url_col=args.url_col,
                           lang_filter=args.lang,
                           segment_docs=args.segment_docs)
    else:
        from pysearchlite_spark.plans.compaction import compact_segments
        sid = compact_segments(spark, args.index_dir,
                               group_size=args.group_size)

    from pysearchlite_spark.sources.catalog import IndexCatalog
    snap = IndexCatalog(args.index_dir).snapshot(sid)
    print(json.dumps({"cmd": args.cmd, "snapshot_id": sid,
                      "n_docs": snap["stats"].get("n_docs"),
                      "delete_files": snap.get("delete_files"),
                      "posting_segments": snap.get("posting_segments")}))
    spark.stop()


if __name__ == "__main__":
    main()
