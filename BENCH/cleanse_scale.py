"""Scale check for the corpus-cleanse / export operators added round 5:
PII redaction (functions/pii.py), canonical-URL dedup
(functions/url.py) and training-sequence export
(functions/sequences.py) at 1M deterministic synthetic docs, unpinned
local[32].

Measures wall time and docs/sec for
  * redact_pii — sequential email/phone/IPv4 count+redact over the full
    text column (PII injected into ~18% of docs doc_id-deterministically
    so the counts are non-trivial); plan-asserted shuffle-free and
    Python-free (pure JVM regexp inside whole-stage codegen);
  * canonical_url — the full canonicalization projection (plan-asserted
    the same way);
  * url_dedup — canonicalize + keep-list groupBy end-to-end; ~1/6 of the
    corpus is re-crawl URL variants (case/port/utm/fragment) of other
    docs, and the measured dup count must equal the planted count.

Inline correctness: a 2k-doc sample's PII counts are recomputed with
Python `re` (Java-compatible syntax) and must match exactly.

Usage: python BENCH/cleanse_scale.py [n_docs] → one JSON line + writes
BENCH/cleanse_scale.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearchlite_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.functions.pii import PII_PATTERNS, redact_pii
    from pysearchlite_spark.functions.url import (canonical_url, url_dedup,
                                                  with_canonical_url)

    spark = get_spark("cleanse_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n, "cpus": 32, "pinned": False}
    data = tempfile.mkdtemp(prefix="cleanse_")
    try:
        d = F.xxhash64("url")
        m = F.pmod(d, F.lit(17))
        # deterministic PII injection: m==0 email, m==1 phone, m==2 ip
        pii_txt = F.concat(
            F.col("text"),
            F.when(m == 0, F.concat(F.lit(" contact user"),
                                    F.pmod(d, F.lit(1000)).cast("string"),
                                    F.lit("@example.com")))
            .when(m == 1, F.lit(" call (202) 555-0199 or 555-123-4567"))
            .when(m == 2, F.concat(F.lit(" from 10.2.0."),
                                   F.pmod(d, F.lit(250)).cast("string")))
            .otherwise(F.lit("")))
        # every doc's CANONICAL url is its base_url (already-canonical:
        # lowercase, pathful, no port/params/fragment); docs with m==3
        # carry a decorated re-crawl VARIANT instead — uppercase
        # scheme+host (path case must survive canonicalization), default
        # port, tracking param, fragment. url_dedup's dup count must
        # therefore equal the base_url-collision count computed
        # independently of the canonicalization chain.
        host = F.concat(F.lit("h"),
                        F.pmod(d, F.lit(n // 3 + 1)).cast("string"),
                        F.lit(".example.com"))
        path = F.concat(F.lit("/p/"),
                        F.pmod(F.floor(d / 17), F.lit(997)).cast("string"))
        base_url = F.concat(F.lit("https://"), host, path)
        raw_url = F.when(m == 3, F.concat(
            F.lit("HTTPS://"), F.upper(host), F.lit(":443"), path,
            F.lit("?utm_source=x#f")))
        (generate_pages(spark, n, seed=42)
         .select(d.alias("doc_id"), pii_txt.alias("text"),
                 F.coalesce(raw_url, base_url).alias("url"),
                 m.alias("m"), base_url.alias("base_url"))
         .write.mode("overwrite").parquet(data))
        docs = spark.read.parquet(data).persist()
        n_real = docs.count()
        out["n_rows"] = n_real

        # --- redact_pii: full-corpus scan, force every output column
        red = redact_pii(docs)
        plan = red._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "redact_pii must not shuffle"
        assert "EvalPython" not in plan, "redact_pii must stay JVM-side"
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            agg = red.agg(F.sum("n_emails").alias("e"),
                          F.sum("n_phones").alias("p"),
                          F.sum("n_ipv4").alias("i"),
                          F.sum(F.length("text_clean")).alias("len")
                          ).collect()[0]
            best = min(best, time.monotonic() - t0)
        out["redact_pii_sec"] = round(best, 3)
        out["redact_pii_docs_per_sec"] = round(n_real / best, 1)
        out["pii_emails"] = int(agg["e"])
        out["pii_phones"] = int(agg["p"])
        out["pii_ipv4"] = int(agg["i"])
        assert agg["e"] >= 0.9 * n_real / 17, "planted emails missing"
        assert agg["p"] >= 1.8 * n_real / 17, "planted phones missing"
        assert agg["i"] >= 0.9 * n_real / 17, "planted IPs missing"

        # inline parity: 2k-doc sample recomputed with Python re
        sample = (docs.filter(F.pmod(F.col("doc_id"), F.lit(499)) == 0)
                  .select("doc_id", "text").limit(2000).collect())
        got = {r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ipv4"])
               for r in red.filter(
                   F.pmod(F.col("doc_id"), F.lit(499)) == 0)
               .select("doc_id", "n_emails", "n_phones", "n_ipv4")
               .limit(2000).collect()}
        checked = 0
        for r in sample:
            cur, counts = r["text"], {}
            for name, pat, repl in PII_PATTERNS:
                counts[name] = len(re.findall(pat, cur))
                cur = re.sub(pat, repl, cur)
            if r["doc_id"] in got:
                assert got[r["doc_id"]] == (
                    counts["email"], counts["phone"], counts["ipv4"]), r
                checked += 1
        assert checked >= 100, checked
        out["pii_parity_docs"] = checked

        # --- canonical_url: pure projection
        canon = with_canonical_url(docs.select("doc_id", "url"))
        plan = canon._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            canon.agg(F.sum(F.length("canonical_url"))).collect()
            best = min(best, time.monotonic() - t0)
        out["canonical_url_sec"] = round(best, 3)
        out["canonical_url_docs_per_sec"] = round(n_real / best, 1)

        # oracle dup count from the planted structure, computed WITHOUT
        # the canonicalization chain: every doc canonicalizes to its
        # base_url, so dups == base_url collisions
        planted = (docs.groupBy("base_url").count()
                   .filter(F.col("count") > 1)
                   .agg(F.sum(F.col("count") - 1)).collect()[0][0]) or 0

        # --- url_dedup end-to-end
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            n_dups = (url_dedup(docs).filter(F.col("is_dup"))
                      .count())
            best = min(best, time.monotonic() - t0)
        out["url_dedup_sec"] = round(best, 3)
        out["url_dedup_docs_per_sec"] = round(n_real / best, 1)
        out["url_dups"] = int(n_dups)
        assert n_dups == planted, (n_dups, planted)

        # canonical really erased the variant decorations
        v = (canon.filter(F.col("url").rlike("^HTTPS"))
             .select("canonical_url").first())
        if v is not None:
            assert ":443" not in v[0] and "utm_" not in v[0] \
                and "#" not in v[0] and v[0].islower()

        # --- chunk_tokens: training-sequence export (seq_len 1024 over
        # ~150-token docs -> 1 chunk/doc; the cost IS tokenize+id-map).
        # Inline conservation law: sum of chunk n_tokens == corpus token
        # count from the independent token_counts operator.
        from pysearchlite_spark.functions.sequences import chunk_tokens
        from pysearchlite_spark.functions.text import token_counts
        ch = chunk_tokens(docs, 1024)
        plan = ch._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "chunk_tokens must not shuffle"
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            agg = ch.agg(F.count("*").alias("chunks"),
                         F.sum("n_tokens").alias("toks")).collect()[0]
            best = min(best, time.monotonic() - t0)
        out["chunk_tokens_sec"] = round(best, 3)
        out["chunk_tokens_docs_per_sec"] = round(n_real / best, 1)
        out["chunks"] = int(agg["chunks"])
        out["chunk_total_tokens"] = int(agg["toks"])
        want_toks = token_counts(docs).agg(
            F.sum("n_tokens")).collect()[0][0]
        assert agg["toks"] == want_toks, (agg["toks"], want_toks)

        # --- pack_tokens: cross-doc PACKED sequences (GPT-dataloader
        # shape), seq_len 1024 — the two-phase bucketed prefix sum +
        # one seq_id exchange. Conservation: packed total tokens ==
        # the independent corpus token count; every sequence except
        # the last is exactly full.
        from pysearchlite_spark.functions.sequences import pack_tokens
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            pk = (pack_tokens(docs, 1024, n_buckets=256)
                  .agg(F.count("*").alias("seqs"),
                       F.sum("n_tokens").alias("toks"),
                       F.sum((F.col("n_tokens") == 1024).cast("long"))
                       .alias("full")).collect()[0])
            best = min(best, time.monotonic() - t0)
            spark.catalog.clearCache()   # drop the operator's persisted
            docs.persist(); docs.count()  # base; re-warm docs (untimed)
        out["pack_tokens_sec"] = round(best, 3)
        out["pack_tokens_docs_per_sec"] = round(n_real / best, 1)
        out["packed_seqs"] = int(pk["seqs"])
        out["packed_total_tokens"] = int(pk["toks"])
        assert pk["toks"] == want_toks, (pk["toks"], want_toks)
        assert pk["full"] >= pk["seqs"] - 1, "only the tail may be ragged"
        assert pk["seqs"] == -(-int(pk["toks"]) // 1024)

        # --- strip_duplicate_lines: corpus-wide boilerplate-line removal
        # (CCNet paragraph dedup). ~3/17 of docs carry a planted banner
        # line; body lines are unique (asserted), so removed == carriers.
        from pysearchlite_spark.functions.lines import strip_duplicate_lines
        banner = "subscribe to our newsletter for all the latest updates"
        mdocs = docs.select(
            "doc_id",
            F.when(m.isin(5, 6, 7),
                   F.concat(F.col("text"), F.lit("\n" + banner)))
            .otherwise(F.col("text")).alias("text"))
        carriers = mdocs.filter(F.col("text").contains(banner)).count()
        assert docs.agg(F.countDistinct("text")).collect()[0][0] == n_real
        best = float("inf")
        rem = 0
        for _ in range(3):
            t0 = time.monotonic()
            rem = (strip_duplicate_lines(mdocs)
                   .agg(F.sum("n_removed")).collect()[0][0])
            best = min(best, time.monotonic() - t0)
            spark.catalog.clearCache()  # operator-persisted lines frame
        out["strip_lines_sec"] = round(best, 3)
        out["strip_lines_docs_per_sec"] = round(n_real / best, 1)
        out["boilerplate_lines_removed"] = int(rem)
        assert rem == carriers, (rem, carriers)
        # (clearCache also dropped the docs persist — this is the last
        # measurement, nothing downstream re-reads it)
    finally:
        import shutil
        shutil.rmtree(data, ignore_errors=True)
        spark.stop()

    out["ts"] = time.time()
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cleanse_scale.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
