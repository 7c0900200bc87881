"""Multi-field index at scale: 1M deterministic synthetic docs
(datagen.generate_pages), two fields — title (first-8-token head) and
body (full text) — unpinned local[32].

Measures
  * per-field build cost and postings bytes: the title index is a tiny
    fraction of the body index, which is the POINT of per-field term
    spaces — a title-scoped query touches only title postings;
  * query latency: title-scoped vs body-scoped BM25 top-10 for the same
    query string (interleaved best-of-3);
  * dismax latency across both fields (tie_breaker=0 exact path, and a
    tie_breaker=0.3 rescoring path);
  * cross-field AND count (distributed kernels + id intersect).

Sanity asserted inline: title matches ⊆ body matches for the same
conjunctive query (the head is a subset of the text), and the
tie_breaker=0 dismax equals the per-field merge definition recomputed
from the collected per-field lists.

Usage: python BENCH/fields_scale.py [n_docs] → one JSON line + writes
BENCH/fields_scale.json.
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

TITLE_EXPR = ("concat_ws(' ', slice(filter(split(lower(text), "
              "'[^a-z0-9]+'), x -> x != ''), 1, 8))")
Q = "high school"
Q_AND = {"title": "united", "body": "states constitution"}


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.fields import build_multi_field

    spark = get_spark("fields_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n, "cpus": 32, "pinned": False}

    pages_dir = tempfile.mkdtemp(prefix="fields_scale_pages_")
    root = tempfile.mkdtemp(prefix="fields_scale_idx_")
    try:
        pages = (generate_pages(spark, n, seed=42)
                 .select(F.monotonically_increasing_id().alias("doc_id"),
                         "url", "text"))
        pages.write.mode("overwrite").parquet(pages_dir)
        docs = spark.read.parquet(pages_dir)

        t0 = time.monotonic()
        mfi = build_multi_field(spark, docs, root,
                                fields={"title": TITLE_EXPR,
                                        "body": "text"},
                                id_col="doc_id", url_col="url",
                                segment_docs=1 << 18)
        out["build_both_sec"] = round(time.monotonic() - t0, 2)
        for f in ("title", "body"):
            out[f"postings_{f}_bytes"] = _du(
                os.path.join(root, "fields", f, "postings"))
        out["title_bytes_frac"] = round(
            out["postings_title_bytes"] / out["postings_body_bytes"], 4)

        best: dict = {}

        def probe(key, fn):
            t0 = time.monotonic()
            r = fn()
            dt = time.monotonic() - t0
            best[key] = min(best.get(key, dt), dt)
            return r

        for _ in range(3):
            top_t = probe("bm25_title_top10",
                          lambda: mfi.field("title").topk(Q, k=10))
            top_b = probe("bm25_body_top10",
                          lambda: mfi.field("body").topk(Q, k=10))
            dis0 = probe("dismax_top10",
                         lambda: mfi.topk_dismax(Q, k=10))
            probe("dismax_tie_top10",
                  lambda: mfi.topk_dismax(Q, k=10, tie_breaker=0.3))
            n_x = probe("cross_field_and_dist",
                        lambda: mfi.count_and(Q_AND, distributed=True))

        # ---- sanity -----------------------------------------------------
        assert top_t and top_b and len(dis0) == 10
        t_ids = set(mfi.field("title").search_and_ids(Q).tolist())
        b_ids = set(mfi.field("body").search_and_ids(Q).tolist())
        assert t_ids <= b_ids, "head tokens must be a subset of the text"
        per = {f: dict(mfi.field(f).topk(Q, k=10)) for f in mfi.fields}
        want = sorted(((d, max(s for p in per.values()
                               for dd, s in p.items() if dd == d))
                       for d in {d for p in per.values() for d in p}),
                      key=lambda t: (-t[1], t[0]))[:10]
        assert dis0 == want, "dismax(tie=0) != per-field merge definition"
        out["cross_field_and_matches"] = n_x
        out["title_and_matches"] = len(t_ids)
        out["body_and_matches"] = len(b_ids)
        for k, v in best.items():
            out[f"{k}_sec"] = round(v, 3)
        out["title_vs_body_query_speedup"] = round(
            best["bm25_body_top10"] / best["bm25_title_top10"], 2)
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()

    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fields_scale.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
