"""spark-submit entrypoint: incremental near-dedup via a persisted
NearDupIndex (operators/neardup.py) — the recurring "check today's
crawl against the lake" job.

    spark-submit --py-files pysearchlite_spark.zip jobs/dedup_check.py \
        --index-dir nd/ build --input corpus.parquet \
        [--n-perm 64] [--bands 16] [--shingle-k 3] [--seed 7]
    spark-submit ... jobs/dedup_check.py --index-dir nd/ check \
        --input batch.parquet --out pairs.parquet \
        [--threshold 0.8] [--max-bucket 100000]
    spark-submit ... jobs/dedup_check.py --index-dir nd/ add \
        --input accepted_batch.parquet

`check` writes (corpus_id, batch_id, jaccard) pairs to --out; the
batch's near-dedup keep-list is a left-anti join of the batch against
the pairs' batch_id column. The typical loop is check → drop matched
batch docs → `add` the survivors so tomorrow's crawl sees them. Each
subcommand prints one JSON report line.
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
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the index over a corpus")
    b.add_argument("--input", required=True)
    b.add_argument("--n-perm", type=int, default=64)
    b.add_argument("--bands", type=int, default=16)
    b.add_argument("--shingle-k", type=int, default=3)
    b.add_argument("--seed", type=int, default=7)

    c = sub.add_parser("check", help="near-dup pairs for a new batch")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True,
                   help="parquet path for (corpus_id, batch_id, jaccard)")
    c.add_argument("--threshold", type=float, default=0.8)
    c.add_argument("--max-bucket", type=int, default=100_000)

    a = sub.add_parser("add", help="commit a batch as a new generation")
    a.add_argument("--input", required=True)

    sub.add_parser("compact", help="fold all generations into one "
                                   "(streaming commits one per "
                                   "micro-batch)")

    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pysearchlite_spark.operators.neardup import NearDupIndex

    spark = SparkSession.builder.appName("psl-dedup-check").getOrCreate()
    if args.cmd == "compact":
        rep = NearDupIndex(spark, args.index_dir).compact()
        print(json.dumps({"cmd": "compact", **rep}))
        spark.stop()
        return
    df = spark.read.parquet(args.input)

    if args.cmd == "build":
        idx = NearDupIndex.build(
            spark, df, args.index_dir, id_col=args.id_col,
            text_col=args.text_col, n_perm=args.n_perm, bands=args.bands,
            shingle_k=args.shingle_k, seed=args.seed)
        print(json.dumps({"cmd": "build", "n_docs": idx.meta["n_docs"],
                          "adds": idx.meta["adds"]}))
    elif args.cmd == "add":
        idx = NearDupIndex(spark, args.index_dir)
        n = idx.add_batch(df, id_col=args.id_col, text_col=args.text_col)
        print(json.dumps({"cmd": "add", "added": n,
                          "n_docs": idx.meta["n_docs"],
                          "adds": idx.meta["adds"]}))
    else:
        idx = NearDupIndex(spark, args.index_dir)
        pairs = idx.check(df, threshold=args.threshold,
                          id_col=args.id_col, text_col=args.text_col,
                          max_bucket=args.max_bucket)
        pairs.write.mode("overwrite").parquet(args.out)
        got = spark.read.parquet(args.out)
        from pyspark.sql import functions as F
        agg = got.agg(
            F.count("*").alias("pairs"),
            F.countDistinct("batch_id").alias("dup_batch_docs")
        ).collect()[0]
        print(json.dumps({"cmd": "check",
                          "pairs": int(agg["pairs"]),
                          "dup_batch_docs": int(agg["dup_batch_docs"]),
                          "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
