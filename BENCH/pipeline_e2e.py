"""End-to-end prepare_corpus at >=1M docs — the composed 100-TB
cleaning-pipeline story (round-3 verdict task 2, extended round 5 with
the url/line/PII stages): canonical-URL dedup → lang → quality →
repetition → exact dedup → duplicate-line removal
(strip_lines_stage="after_exact" — this corpus has a planted banner on
~1/7 of docs, and near_banner_ab.json measured a 3.3× near-dedup LSH
cost when the banner survives to that stage) → near dedup (MinHash-LSH
+ connected-component clustering) → benchmark decontamination → PII
redaction — all NINE stages in ONE call, per-stage wall times and kept
counts from the pipeline's own report.

Corpus: n base pages (datagen.generate_pages, Zipf text; ~1/53 of them
lang='xx') + 5%% injected EXACT duplicates (same text, higher doc_id) +
5%% injected NEAR duplicates (two tokens appended — shingle Jaccard well
above the LSH threshold) + a 1000-doc probe slice treated as the
held-out benchmark for decontamination. Injection is deterministic, so
every stage's kept count has a replayable ground truth.

Verification (the "kept-counts asserted against the per-operator
results" criterion): the bench REPLAYS each stage standalone — same
operators, same frontier semantics — and asserts the replayed survivor
count equals the pipeline report's, stage by stage. The pipeline can't
silently wire a stage to the wrong frontier and still pass.

Usage: python BENCH/pipeline_e2e.py [n_base] → one JSON line + writes
BENCH/pipeline_e2e.json.
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

BANNER = "subscribe to our newsletter for all the latest updates"
QUALITY = {"min_n_tokens": 25, "max_punct_ratio": 0.3}
REPETITION = {"max_top2gram_frac": 0.6}
NEAR = {"threshold": 0.7, "n_perm": 64, "bands": 16, "shingle_k": 3}
DECON_SPAN = 8


def build_input(spark, n_base: int, data_dir: str):
    """base pages + 5% exact dups + 5% near dups, written to parquet.
    doc_id encodes provenance: [0, n) base, [n, 1.05n) exact copies of
    doc_id-n, [1.05n, 1.1n) near copies of doc_id-1.05n."""
    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages

    # stable dense id from the deterministic url (generate_pages row index)
    base = (generate_pages(spark, n_base, seed=42)
            .select("url", "text", "lang")
            .withColumn("doc_id",
                        F.regexp_extract("url", r"/p/(\d+)$", 1)
                        .cast("long")))
    # deterministic PII injection into ~1/31 of base texts BEFORE the
    # copies are derived (so dup relations still hold); the redact_pii
    # stage must erase every occurrence from the output. The email local
    # part carries doc_id so every 8-token window of the suffix is
    # doc-unique — a SHARED suffix would hand decontamination a common
    # span with any injected probe doc and wipe the whole injected slice
    # (observed at 20k before this fix)
    base = base.withColumn(
        "text",
        F.when((F.col("doc_id") % 31) == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com or call 555-123-4567")))
        .otherwise(F.col("text")))
    # boilerplate-line injection (AFTER PII so the banner line stays
    # byte-identical across carriers): ~1/7 of NON-copied base docs gain
    # a shared banner line the strip_lines stage must remove everywhere.
    # Copy sources (doc_id%20==0) are excluded so the dup lattice and
    # its exact/near accounting stay byte-stable.
    base = base.withColumn(
        "text",
        F.when(((F.col("doc_id") % 7) == 1) & ((F.col("doc_id") % 20) != 0),
               F.concat(F.col("text"), F.lit("\n" + BANNER)))
        .otherwise(F.col("text")))
    step = 20  # every 20th doc gets one exact, one near and one re-crawl copy
    src = base.filter((F.col("doc_id") % step) == 0)
    exact = (src.select(
        (F.col("doc_id") + n_base).alias("doc_id"),
        F.concat(F.lit("dup-"), F.col("url")).alias("url"),
        F.col("text"), F.col("lang")))
    # one appended token → 3-shingle Jaccard >= (m-2)/(m-1) ~ 0.96 at the
    # quality floor of 25 tokens, far above the LSH threshold
    near = (src.select(
        (F.col("doc_id") + 2 * n_base).alias("doc_id"),
        F.concat(F.lit("near-"), F.col("url")).alias("url"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        F.col("lang")))
    # re-crawl copies: SAME text, decorated URL variant (uppercase
    # scheme+host, default port, tracking param, fragment) that
    # canonicalizes back to the source's url — the url_dedup stage must
    # drop every one of these before any text stage runs
    head = F.regexp_extract("url", r"^https://[^/]*", 0)
    rest = F.col("url").substr(F.length(head) + F.lit(1),
                               F.length("url"))
    recrawl = (src.select(
        (F.col("doc_id") + 3 * n_base).alias("doc_id"),
        F.concat(F.upper(head), F.lit(":443"), rest,
                 F.lit("?utm_source=r#f")).alias("url"),
        F.col("text"), F.col("lang")))
    (base.select("doc_id", "url", "text", "lang")
     .unionByName(exact).unionByName(near).unionByName(recrawl)
     .write.mode("overwrite").parquet(data_dir))
    return spark.read.parquet(data_dir)


def replay(spark, docs, probe):
    """Stage-by-stage standalone replay with the same operators the
    pipeline composes — returns the per-stage survivor counts."""
    from pyspark.sql import functions as F

    from pysearchlite_spark.functions import text as T
    from pysearchlite_spark.operators import dedup as D
    from pysearchlite_spark.operators.cluster import dedup_clusters
    from pysearchlite_spark.pipeline import _threshold_pred

    from pysearchlite_spark.functions.url import url_dedup

    counts = {}
    cur = docs.persist()
    cur.count()

    verd = url_dedup(cur)
    keep = verd.filter(~F.col("is_dup")).select("doc_id")
    cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
    counts["url_dedup"] = cur.count()

    # same frontier-truncation discipline as prepare_corpus (the plan
    # otherwise grows ~3^stage and driver analysis dominates)
    keep = (T.lang_id(cur).filter(F.col("lang_pred") == "en")
            .select("doc_id"))
    cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
    counts["lang"] = cur.count()

    stats = T.quality_stats(cur)
    ok = set(stats.columns) - {"doc_id"}
    keep = stats.filter(_threshold_pred(QUALITY, ok)).select("doc_id")
    cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
    counts["quality"] = cur.count()

    stats = T.repetition_stats(cur)
    ok = set(stats.columns) - {"doc_id"}
    keep = stats.filter(_threshold_pred(REPETITION, ok)).select("doc_id")
    cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
    counts["repetition"] = cur.count()

    verd = D.exact_dedup(cur)
    keep = verd.filter(~F.col("is_dup")).select("doc_id")
    cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
    counts["exact_dedup"] = cur.count()

    from pysearchlite_spark.functions.lines import strip_duplicate_lines
    cur = (strip_duplicate_lines(cur, min_count=2)
           .drop("n_lines", "n_removed").localCheckpoint())
    counts["strip_lines"] = cur.count()

    pairs = D.minhash_lsh_pairs(cur, **NEAR)
    verd = dedup_clusters(cur, pairs=pairs)
    keep = verd.filter(~F.col("is_dup")).select("doc_id")
    cur = cur.join(keep, "doc_id", "left_semi").localCheckpoint()
    counts["near_dedup"] = cur.count()

    sig = D.span_contamination(cur, probe, n=DECON_SPAN)
    keep = (sig.filter(F.col("contamination_frac") <= 0.0)
            .select("doc_id"))
    cur = cur.join(keep, "doc_id", "left_semi")
    counts["decontaminate"] = cur.count()
    # redact_pii is a transform, never a filter
    counts["redact_pii"] = counts["decontaminate"]
    spark.catalog.clearCache()
    return counts


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from pysearchlite_spark.pipeline import prepare_corpus

    spark = get_spark("pipeline_e2e", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_base": n_base, "cpus": 32, "pinned": False,
                 "quality": QUALITY, "repetition": REPETITION,
                 "near_dedup": NEAR}

    data_dir = tempfile.mkdtemp(prefix="pipe_e2e_in_")
    out_dir = tempfile.mkdtemp(prefix="pipe_e2e_out_")
    try:
        docs = build_input(spark, n_base, data_dir)
        out["n_input"] = docs.count()
        # the held-out "benchmark": a deterministic slice of base texts —
        # their source docs must be dropped by decontamination (no limit()
        # so the slice is order-independent)
        probe = (docs.filter((F.col("doc_id") % 997) == 1)
                 .filter(F.col("doc_id") < n_base)
                 .select("text").persist())
        out["probe_rows"] = probe.count()

        print("[e2e] input built", flush=True)
        t0 = time.monotonic()
        report = prepare_corpus(
            spark, docs, out_dir,
            url_dedup_col="url",
            lang="en", strip_lines={"min_count": 2},
            strip_lines_stage="after_exact",
            quality=QUALITY, repetition=REPETITION,
            exact_dedup=True, near_dedup=NEAR,
            decontaminate={"probe": probe, "n": DECON_SPAN,
                           "max_frac": 0.0},
            redact_pii=True,
            release_cache=False)
        out["e2e_sec"] = round(time.monotonic() - t0, 2)
        out["stages"] = report["stages"]
        out["n_out"] = report["n_out"]
        out["docs_per_sec"] = round(out["n_input"] / out["e2e_sec"], 1)
        print(f"[e2e] pipeline done in {out['e2e_sec']}s: "
              f"{[(st['stage'], st['sec']) for st in report['stages']]}",
              flush=True)

        # ---- per-operator replay: every stage's kept count must match
        t0 = time.monotonic()
        replayed = replay(spark, docs, probe)
        out["replay_sec"] = round(time.monotonic() - t0, 2)
        print(f"[e2e] replay done in {out['replay_sec']}s", flush=True)
        for st in report["stages"]:
            want, got = replayed[st["stage"]], st["kept"]
            assert want == got, (st["stage"], want, got)
        out["replay_match"] = True

        # ---- injected-duplicate accounting (ground truth by construction)
        by_stage = {s["stage"]: s for s in report["stages"]}
        # every injected re-crawl (same canonical URL, higher id) must be
        # dropped by the FIRST stage, before any text work
        n_recrawl = docs.filter(F.col("doc_id") >= 3 * n_base).count()
        assert by_stage["url_dedup"]["dropped"] == n_recrawl, (
            by_stage["url_dedup"], n_recrawl)
        out["n_recrawl"] = n_recrawl
        # exact stage must at least remove every injected exact copy that
        # survived the scans (copies share text with their base, base has
        # the smaller id)
        assert by_stage["exact_dedup"]["dropped"] > 0
        assert by_stage["near_dedup"]["dropped"] > 0
        assert by_stage["decontaminate"]["dropped"] > 0
        # no injected duplicate may survive end-to-end
        survivors = spark.read.parquet(out_dir)
        dup_suffix = survivors.filter(F.col("doc_id") >= n_base)
        paired = dup_suffix.withColumn(
            "src_id", F.col("doc_id") % n_base).join(
            survivors.select(F.col("doc_id").alias("src_id")),
            "src_id", "left_semi")
        out["surviving_injected_with_source"] = paired.count()
        assert out["surviving_injected_with_source"] == 0
        # ---- PII accounting: the injected emails/phones are gone from
        # the output text, the redaction metadata says how many there were
        leaked = survivors.filter(
            F.col("text").contains("@example.com")
            | F.col("text").contains("555-123-4567")).count()
        assert leaked == 0, leaked
        pii_counts = survivors.agg(
            F.sum("n_emails").alias("e"),
            F.sum("n_phones").alias("p")).collect()[0]
        out["pii_emails_redacted"] = int(pii_counts["e"])
        out["pii_phones_redacted"] = int(pii_counts["p"])
        assert pii_counts["e"] > 0 and pii_counts["p"] > 0
        redacted = survivors.filter(
            F.col("text").contains("<EMAIL>")).count()
        out["docs_with_redactions"] = int(redacted)
        assert redacted > 0
        # ---- boilerplate accounting: the planted banner line is gone
        # from every surviving doc (strip_lines is a transform — its
        # stage must have dropped nothing)
        assert by_stage["strip_lines"]["dropped"] == 0
        n_banner = survivors.filter(F.col("text").contains(BANNER)).count()
        out["surviving_banner_docs"] = int(n_banner)
        assert n_banner == 0

        # ---- the last mile: the cleaned corpus packed into 1024-token
        # training sequences (what jobs/export_sequences.py ships) —
        # conservation vs the independent token_counts reading
        from pysearchlite_spark.functions.sequences import pack_tokens
        from pysearchlite_spark.functions.text import token_counts
        t0 = time.monotonic()
        pk = (pack_tokens(survivors, 1024, eod_id=0, n_buckets=256)
              .agg(F.count("*").alias("seqs"),
                   F.sum("n_tokens").alias("toks")).collect()[0])
        out["export_pack_sec"] = round(time.monotonic() - t0, 2)
        want = token_counts(survivors).agg(
            F.sum("n_tokens").alias("t"),
            F.sum((F.col("n_tokens") > 0).cast("long")).alias("d")
        ).collect()[0]
        assert int(pk["toks"]) == int(want["t"]) + int(want["d"]), (
            pk["toks"], want)   # +1 EOD per non-empty doc
        out["packed_seqs"] = int(pk["seqs"])
        out["packed_total_tokens"] = int(pk["toks"])
        print(f"[e2e] export packed {pk['seqs']} seqs in "
              f"{out['export_pack_sec']}s", flush=True)
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()

    out["ts"] = time.time()
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "pipeline_e2e.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
