"""spark-submit entrypoint: training-sequence export — the last mile
after `jobs/prepare_corpus.py`. Reads a cleaned corpus parquet, turns it
into fixed-length token-id sequences (`functions/sequences.py`) and
writes size-bounded parquet shards a dataloader can stream; prints one
JSON report line.

    spark-submit --py-files pysearchlite_spark.zip jobs/export_sequences.py \
        --input cleaned/ --out-dir sequences/ --seq-len 2048 \
        [--mode pack|chunk] [--eod-id N] [--id-col doc_id] \
        [--text-col text] [--n-buckets 64] \
        [--rows-per-shard 100000]

Modes:
  * pack  (default) — cross-doc packed sequences in doc_id order (the
    GPT-pretraining dataloader shape; only the final sequence ragged;
    optional --eod-id separator after each document).
  * chunk — per-doc chunks (retrieval-friendly: every chunk traceable
    to its doc_id; ragged tail per doc, never padded).

Shards are bounded by --rows-per-shard via Spark's native
maxRecordsPerFile (a writer knob, not an extra shuffle); at the default
2048-token sequences, 100k rows ≈ 1.6 GB of raw ids per shard. The
report's token totals let the caller cross-check conservation against
`functions/text.token_counts` on the same corpus.
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
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--seq-len", type=int, required=True)
    ap.add_argument("--mode", default="pack", choices=["pack", "chunk"])
    ap.add_argument("--eod-id", type=int, default=None,
                    help="pack mode: token id appended after each doc")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-buckets", type=int, default=64,
                    help="pack mode: prefix-sum buckets (a few x the "
                         "cluster's cores; never changes the output)")
    ap.add_argument("--rows-per-shard", type=int, default=100_000)
    args = ap.parse_args()
    if args.mode == "chunk" and args.eod_id is not None:
        raise SystemExit("--eod-id only applies to --mode pack")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pysearchlite_spark.functions.sequences import (chunk_tokens,
                                                        pack_tokens)

    spark = SparkSession.builder.appName("psl-export-sequences").getOrCreate()
    df = spark.read.parquet(args.input)
    if args.mode == "pack":
        seqs = pack_tokens(df, args.seq_len, eod_id=args.eod_id,
                           id_col=args.id_col, text_col=args.text_col,
                           n_buckets=args.n_buckets)
    else:
        seqs = chunk_tokens(df, args.seq_len, id_col=args.id_col,
                            text_col=args.text_col)
    (seqs.write.mode("overwrite")
     .option("maxRecordsPerFile", args.rows_per_shard)
     .parquet(args.out_dir))

    out = spark.read.parquet(args.out_dir)
    agg = out.agg(F.count("*").alias("n_seqs"),
                  F.sum("n_tokens").alias("n_tokens"),
                  F.sum((F.col("n_tokens") == args.seq_len).cast("long"))
                  .alias("n_full")).collect()[0]
    n_files = len([f for f in os.listdir(args.out_dir)
                   if f.endswith(".parquet")]) if os.path.isdir(
                       args.out_dir) else None
    print(json.dumps({
        "mode": args.mode, "seq_len": args.seq_len,
        "n_seqs": int(agg["n_seqs"] or 0),
        "n_tokens": int(agg["n_tokens"] or 0),
        "n_full": int(agg["n_full"] or 0),
        "n_shards": n_files, "out_dir": args.out_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
