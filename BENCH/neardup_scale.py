"""Incremental near-dedup at scale: check a 10k crawl batch against a
PERSISTED 1M-doc NearDupIndex, vs the one-shot minhash_lsh_pairs re-run
over the combined 1.01M corpus — the "daily crawl vs the lake" shape.

Batch composition (deterministic): 5k docs duplicate corpus members
(2.5k byte-exact, 2.5k near-dup with an appended suffix), 5k are fresh.
Inline correctness: every exact planted pair must be found at
jaccard == 1.0 against its intended corpus source; the near-dup planted
pairs must be found above the 0.7 threshold; fresh docs must match
nothing. The incremental check's pair set is ALSO asserted equal to the
one-shot operator's cross-(corpus, batch) subset at identical config —
same answer, fraction of the cost.

Usage: python BENCH/neardup_scale.py [n_corpus] [n_batch]
→ one JSON line + BENCH/neardup_scale.json.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.operators.dedup import minhash_lsh_pairs
    from pysearchlite_spark.operators.neardup import NearDupIndex

    spark = get_spark("neardup_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_corpus": n, "n_batch": nb, "cpus": 32, "pinned": False}
    work = tempfile.mkdtemp(prefix="neardup_")
    try:
        d = F.xxhash64("url")
        corpus_raw = (generate_pages(spark, n, seed=42)
                      .select(d.alias("doc_id"), "text"))
        corpus_path = os.path.join(work, "corpus")
        corpus_raw.write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)

        # batch: nb/2 dup-of-corpus (half exact, half near), nb/2 fresh.
        # ids offset into a disjoint positive range; near-dups append a
        # short suffix (higher shingle overlap than the 0.7 threshold on
        # the ~150-token synthetic texts).
        from pyspark.sql.window import Window
        half = nb // 2
        src = (corpus.orderBy("doc_id").limit(half)
               .select(F.col("doc_id").alias("src_id"), "text"))
        src = src.withColumn(
            "rn", F.row_number().over(Window.orderBy("src_id")) - 1)
        dup = src.select(
            (F.lit(10 ** 15) + F.col("rn")).alias("doc_id"),
            F.when(F.col("rn") % 2 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"),
                                F.lit(" trailing crawl banner suffix")))
            .alias("text"),
            "src_id", (F.col("rn") % 2 == 0).alias("is_exact"))
        fresh = (generate_pages(spark, nb - half, seed=777)
                 .select((F.lit(2 * 10 ** 15)
                          + F.xxhash64("url") % (10 ** 12)).alias("doc_id"),
                         "text"))
        batch_path = os.path.join(work, "batch")
        dup.select("doc_id", "text").unionByName(fresh) \
           .write.parquet(batch_path)
        batch = spark.read.parquet(batch_path)
        truth = {(int(r["src_id"]), int(r["doc_id"])): bool(r["is_exact"])
                 for r in dup.select("src_id", "doc_id",
                                     "is_exact").collect()}
        out["n_batch_real"] = batch.count()

        # ---- build the persisted index over the corpus (one-time cost)
        t0 = time.monotonic()
        idx = NearDupIndex.build(spark, corpus,
                                 os.path.join(work, "idx"))
        out["index_build_sec"] = round(time.monotonic() - t0, 3)

        # ---- incremental check (recurring per-crawl cost) vs the
        # one-shot re-dedup of corpus ∪ batch, STRICTLY INTERLEAVED
        # best-of-3 (BASELINE.md protocol: this host's co-tenant weather
        # swings 2x between back-to-back runs — only an interleaved
        # ratio is meaningful)
        combined = corpus.unionByName(batch)
        best_chk = best_one = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            pairs = {(int(r["corpus_id"]), int(r["batch_id"])):
                     float(r["jaccard"])
                     for r in idx.check(batch, threshold=0.7).collect()}
            best_chk = min(best_chk, time.monotonic() - t0)
            spark.catalog.clearCache()
            t0 = time.monotonic()
            ones = {(int(r["a"]), int(r["b"])): float(r["jaccard"])
                    for r in minhash_lsh_pairs(combined, threshold=0.7)
                    .collect()}
            best_one = min(best_one, time.monotonic() - t0)
            spark.catalog.clearCache()
        out["check_sec"] = round(best_chk, 3)
        out["check_docs_per_sec"] = round(out["n_batch_real"] / best_chk, 1)
        out["n_pairs"] = len(pairs)
        out["oneshot_sec"] = round(best_one, 3)
        out["speedup_vs_oneshot"] = round(best_one / best_chk, 2)

        # inline truth: every planted pair found, right jaccard regime,
        # fresh docs silent
        batch_ids = {int(r["doc_id"]) for r in
                     batch.select("doc_id").collect()}
        dup_ids = {b for _, b in truth}
        fresh_ids = batch_ids - dup_ids
        for (s, b), exact in truth.items():
            assert (s, b) in pairs, (s, b, exact)
            if exact:
                assert pairs[(s, b)] == 1.0, (s, b, pairs[(s, b)])
            else:
                assert 0.7 <= pairs[(s, b)] < 1.0, (s, b, pairs[(s, b)])
        assert not any(b in fresh_ids for _, b in pairs), \
            "fresh docs must match nothing"
        out["planted_pairs_found"] = len(truth)

        # equivalence on the cross subset — classified by exact batch-id
        # membership (xxhash64 corpus ids span the full 64-bit range, so
        # range tests would misclassify), normalized to (corpus, batch)
        cross = {}
        for (a, b), v in ones.items():
            a_in, b_in = a in batch_ids, b in batch_ids
            if a_in != b_in:
                cross[(a, b) if b_in else (b, a)] = v
        assert pairs == cross, (len(pairs), len(cross),
                                sorted(set(pairs) ^ set(cross))[:3])
        out["equivalence"] = True
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    out["ts"] = time.time()
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "neardup_scale.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
