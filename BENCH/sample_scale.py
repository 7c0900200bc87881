"""Stratified capping at scale, in TWO skew regimes — and the plan
finding the numbers forced: Spark's native WindowGroupLimit makes the
single-window form skew-safe.

Regime "mild": 1M ids-only rows, 256-way site key with one hot domain
holding ~30% of the corpus. Regime "extreme": 4M rows carrying a
~200-byte payload column, one hot domain holding ~90% of the corpus
(3.6M rows through one PARTITION BY value).

The textbook expectation is that the single-window form
(`row_number() OVER (PARTITION BY site ...)`, salts=1) funnels every
hot-domain row through ONE reducer and the hand-salted two-phase form
wins under skew. MEASURED RESULT: the single-window form wins BOTH
regimes (~0.6x the salted runtime), because Spark >= 3.5's
InferWindowGroupLimit inserts a `WindowGroupLimit(..., Partial)` BEFORE
the exchange — each map task forwards at most `cap` rows per key, i.e.
the engine already runs phase 1 natively, with no extra exchange. The
script asserts that plan shape inline (Partial WindowGroupLimit under
the final window's Exchange) so the reading can't silently describe a
different plan. cap_per_key's default is therefore salts=1; salts>1
remains for pinning the final per-key window to cap*salts rows
independent of cluster width (see operators/sample.py docstring).

Measures both forms in both regimes (best-of-3, interleaved) and
asserts inline that they return the IDENTICAL kept set (count + id
signature — salt invariance at scale), every key lands at <= cap, and
the hot key is exactly at cap. The extreme regime also times
weighted_sample_n (10k-doc weighted draw from the 4M-row payload
corpus), asserting its plan is TakeOrderedAndProject with NO exchange —
the sampling operators never shuffle the corpus.

Usage: python BENCH/sample_scale.py [mild_n] [extreme_n]
  → one JSON line + writes BENCH/sample_scale.json.
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

CAP = 1000


def run_regime(spark, n: int, hot_frac: float, payload: bool,
               pages_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.operators.sample import cap_per_key

    out: dict = {"n_docs": n, "hot_frac": hot_frac, "payload": payload}
    # 256 sites, then route hot_frac of docs to one hot domain by doc_id
    # band — deterministic, no extra shuffle
    pages = (generate_pages(spark, n, seed=42)
             .withColumn("doc_id", F.xxhash64("url"))
             .withColumn(
                 "site",
                 F.when(F.pmod(F.col("doc_id"), F.lit(1000))
                        < int(1000 * hot_frac), F.lit("hot.example"))
                 .otherwise(F.concat(
                     F.lit("site"),
                     F.pmod(F.col("doc_id"), F.lit(256))))))
    if payload:
        # ~200 B per row: what actually rides the shuffle when a real
        # pipeline caps documents rather than bare ids
        pages = pages.withColumn(
            "body", F.repeat(F.md5(F.col("url")), 6))
        pages = pages.select("doc_id", "site", "body")
    else:
        pages = pages.select("doc_id", "site")
    pages.write.mode("overwrite").parquet(pages_dir)
    docs = spark.read.parquet(pages_dir)
    hot_n = docs.filter(F.col("site") == "hot.example").count()
    out["hot_docs"] = int(hot_n)

    # the native map-side bound must actually be in the plan for the
    # salts=1 reading to mean what this file says it means
    plan = (cap_per_key(docs, "site", CAP, salts=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:2000]
    assert "SinglePartition" not in plan

    best: dict = {}
    kept: dict = {}
    for _ in range(3):
        for name, salts in (("salted_s16", 16), ("native_s1", 1)):
            t0 = time.monotonic()
            ids = (cap_per_key(docs, "site", CAP, salts=salts)
                   .agg(F.count("*").alias("n"),
                        F.sum(F.hash("doc_id").cast("long"))
                        .alias("sig")).collect()[0])
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, dt), dt)
            kept[name] = (ids["n"], ids["sig"])
    assert kept["salted_s16"] == kept["native_s1"], \
        f"salt changed the kept set: {kept}"  # count+signature identical
    per_key = (cap_per_key(docs, "site", CAP)
               .groupBy("site").count().toPandas())
    assert (per_key["count"] <= CAP).all()
    assert int(per_key.loc[per_key["site"] == "hot.example",
                           "count"].iloc[0]) == CAP
    out["kept_rows"] = int(kept["native_s1"][0])
    out["n_keys"] = int(len(per_key))
    for k, v in best.items():
        out[f"{k}_sec"] = round(v, 3)
    out["native_speedup_vs_salted"] = round(
        best["salted_s16"] / best["native_s1"], 2)

    if payload:
        # weighted sampling w/o replacement over the same corpus:
        # TakeOrderedAndProject (size-n heap per partition, no shuffle) —
        # the training-mix draw costs one scan regardless of corpus size
        from pysearchlite_spark.operators.sample import weighted_sample_n
        wdocs = docs.withColumn("w", (F.length("body") + 1).cast("double"))
        ws = weighted_sample_n(wdocs, 10_000, "w")
        plan = ws._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan and "Exchange" not in plan
        wbest = float("inf")
        wn = 0
        for _ in range(3):
            t0 = time.monotonic()
            wn = ws.count()
            wbest = min(wbest, time.monotonic() - t0)
        assert wn == 10_000, wn
        out["wsample_10k_sec"] = round(wbest, 3)
    return out


def main() -> None:
    mild_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    extreme_n = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    spark = get_spark("sample_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": 32, "pinned": False, "cap": CAP}

    for regime, n, hot_frac, payload in (
            ("mild", mild_n, 0.3, False),
            ("extreme", extreme_n, 0.9, True)):
        pages_dir = tempfile.mkdtemp(prefix=f"sample_scale_{regime}_")
        try:
            out[regime] = run_regime(spark, n, hot_frac, payload, pages_dir)
        finally:
            shutil.rmtree(pages_dir, ignore_errors=True)
    spark.stop()

    line = json.dumps(out)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sample_scale.json"), "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
