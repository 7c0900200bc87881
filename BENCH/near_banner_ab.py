"""Paired A/B: does a corpus-wide repeated banner line make MinHash-LSH
near-dedup more expensive? VERDICT (near_banner_ab.json, 1M docs,
interleaved, fresh JVM per trial): YES — 3.3× (47/52 s plain vs
156/174 s banner, best-of-2 each, verified-pair counts identical up to
one borderline organic pair).

Mechanism (why the naive probability argument fails): for a typical
~150-shingle doc the chance a 4-row LSH band's minima all come from the
7 shared banner shingles is ~(7/155)^4 — negligible. But page lengths
are Zipf-ish: for a SHORT doc the banner dominates its shingle set, the
band minima become the banner's OWN hash values, and every such doc
lands in the SAME bucket per band. Bucket growth is then linear in the
number of short carriers, and candidate generation inside a bucket is
quadratic up to max_bucket — the exact-Jaccard verification join over
those candidates is the 3.3×. The verified PAIR set is unchanged
(banner Jaccard contribution stays far below threshold); only the
candidate volume explodes.

Consequences for pipeline design (see pipeline.prepare_corpus): this is
the measured cost of running boilerplate-line removal AFTER near-dedup
(the Dolma order, needed so dup copies don't gut each other) — on
boilerplate-heavy corpora, strip lines BETWEEN exact-dedup and
near-dedup instead (strip_lines_stage="after_exact"): exact copies are
already gone so line-dedup can't gut them, and near-dedup runs on
banner-free text.

Usage: python BENCH/near_banner_ab.py [n_docs] [rounds] → one JSON line
+ writes BENCH/near_banner_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearchlite_spark.session import get_spark  # noqa: E402

BANNER = "subscribe to our newsletter for all the latest updates"
NEAR = {"threshold": 0.7, "n_perm": 64, "bands": 16, "shingle_k": 3}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.operators.cluster import dedup_clusters
    from pysearchlite_spark.operators.dedup import minhash_lsh_pairs

    spark = get_spark("near_banner_ab", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n, "rounds": rounds, "cpus": 32,
                 "pinned": False, "interleaved": True,
                 "fresh_jvm_per_trial": True}
    base_dir = tempfile.mkdtemp(prefix="nb_plain_")
    ban_dir = tempfile.mkdtemp(prefix="nb_banner_")
    try:
        base = (generate_pages(spark, n, seed=42)
                .select(F.xxhash64("url").alias("doc_id"), "text"))
        # plant a real near-dup lattice (1/20 of docs get a near copy)
        # so clustering has actual work in BOTH variants
        src = base.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
        near = src.select((F.col("doc_id") + 1).alias("doc_id"),
                          F.concat("text", F.lit(" zz")).alias("text"))
        plain = base.unionByName(near)
        plain.write.mode("overwrite").parquet(base_dir)
        # banner keyed on floor(doc_id/2) so a src (even id) and its near
        # copy (id+1) always carry it TOGETHER — asymmetric insertion
        # genuinely lowers pair Jaccard (9 extra tokens on one side push
        # short-doc pairs under the 0.7 threshold; observed at 100k:
        # 4983 -> 4932 pairs) and would confound the timing comparison
        (plain.select(
            "doc_id",
            F.when(F.pmod(F.floor(F.col("doc_id") / 2), F.lit(7)) == 1,
                   F.concat("text", F.lit("\n" + BANNER)))
            .otherwise(F.col("text")).alias("text"))
         .write.mode("overwrite").parquet(ban_dir))

        # fresh JVM per trial: a 1M near-dedup leaves GBs of shuffle
        # files that the ContextCleaner only reclaims on RDD GC — four
        # back-to-back in-session runs transiently filled /tmp (ENOSPC).
        # Restarting also matches ab_r3_r5's fresh-JVM interleave.
        def run(path: str) -> tuple[float, int, int]:
            s2 = get_spark("near_banner_ab_trial", master="local[32]",
                           shuffle_partitions=64)
            s2.sparkContext.setLogLevel("ERROR")
            try:
                docs = s2.read.parquet(path)
                t0 = time.monotonic()
                # persist the (k-bounded) pair list so the clustering
                # pass reuses it instead of re-materializing the whole
                # LSH+verification DAG — the double materialization
                # doubled peak shuffle spill and hit ENOSPC at 1M
                pairs = minhash_lsh_pairs(docs, **NEAR).persist()
                n_pairs = pairs.count()
                verd = dedup_clusters(docs, pairs=pairs)
                n_dups = verd.filter(F.col("is_dup")).count()
                sec = time.monotonic() - t0
            finally:
                s2.stop()
            return sec, n_pairs, n_dups

        spark.stop()  # trials each own a fresh session (see run())

        best = {"plain": float("inf"), "banner": float("inf")}
        counts: dict = {}
        trials = {"plain": [], "banner": []}
        for _ in range(rounds):
            for name, path in (("plain", base_dir), ("banner", ban_dir)):
                sec, n_pairs, n_dups = run(path)
                print(f"[ab] {name}: {sec:.1f}s pairs={n_pairs} "
                      f"dups={n_dups}", flush=True)
                trials[name].append(round(sec, 2))
                best[name] = min(best[name], sec)
                counts[name] = {"pairs": n_pairs, "dups": n_dups}
        out["trials"] = trials
        out["best_plain_sec"] = round(best["plain"], 2)
        out["best_banner_sec"] = round(best["banner"], 2)
        out["counts"] = counts
        out["ratio_banner_vs_plain"] = round(
            best["banner"] / best["plain"], 3)
        # near-IDENTICAL lattice: planted pairs carry the banner together
        # (floor(doc_id/2) keying), but ORGANIC near-dup pairs have
        # independent banner status, and a borderline pair whose one
        # member gains 9 tokens can cross the 0.7 threshold either way
        # (observed: exactly 1 of 50,382 pairs at 1M). Allow that sliver.
        diff = abs(counts["banner"]["dups"] - counts["plain"]["dups"])
        assert diff <= max(2, counts["plain"]["dups"] // 5000), counts
        out["banner_exonerated"] = out["ratio_banner_vs_plain"] <= 1.25
    finally:
        import shutil
        shutil.rmtree(base_dir, ignore_errors=True)
        shutil.rmtree(ban_dir, ignore_errors=True)

    out["ts"] = time.time()
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "near_banner_ab.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
